"""Deterministic scale-factor data generator for the SCALING STUDY.

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md); the 100 TB design
claims need at least one measured decade above that. This tool
regenerates the same ten-table synthetic schema at an arbitrary SF,
matching the driver data's observed distributions (profiled from
/root/testdata/sf0.1 — see PERF.md "scaling study" for the profile):

- row counts scale linearly; per 1.0 SF: customer 150k, supplier 10k,
  part 200k, orders 1.5M (lineitem ~4 lines/order, Poisson), events 1M
  over 15k users, documents 50k, embeddings 20k; region/nation fixed
  (5/25).
- categorical domains are read from the driver's sf0.1 files verbatim
  (brands, types, segments, priorities, event types, langs, sources,
  the 30-word document vocabulary), so filters hit the same fractions.
- events: ts sorted-uniform over Jan 2024 (micros), value ~ Exp(50),
  props = {"k": 0..99}; the IoT derivation (entrypoints.py) keys off
  event_id mods, which stay sequential from 0.
- documents: n_words ~ U[10,100] from the 30-word vocab; ~4.9 % of
  docs are near-copies of an earlier doc with one word replaced by the
  sentinel token 'dup', ~0.16 % exact copies (matches the observed
  8 exact / ~230 prefix-collision groups per 5 000 docs).
- embeddings: 64-dim unit-normalized Gaussian float32, label ~ U[0,10).
- warehouse: TPC-H-ish ranges as observed (quantity 1..50,
  unitprice 900..2100, dates 1995..2001, shipdate = orderdate + U[1,95]d).

Usage::

    python tools/gen_scale_data.py 1.0 /root/repo/.scaledata/sf1.0

NOT part of the product engine — a test-data tool, pure numpy/pyarrow,
seeded (SeedSequence(20260816, table-index, int(sf*1000))) so reruns
are byte-stable.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REF_SF01 = "/root/testdata/sf0.1"
SEED_ROOT = 20260816

# rows per 1.0 SF unit (linear; region/nation fixed)
ROWS = {
    "customer": 150_000,
    "supplier": 10_000,
    "part": 200_000,
    "orders": 1_500_000,
    "events": 1_000_000,
    "documents": 50_000,
    "embeddings": 20_000,
}
EVENT_USERS_PER_SF = 15_000
LINES_PER_ORDER = 4.0  # Poisson mean (zeros allowed, as observed)
DOC_COPY_RATE = 0.049  # near-copy with one 'dup' substitution
DOC_EXACT_RATE = 0.0016
EMB_DIM = 64

_US = 1_000_000


def _rng(sf: float, table_idx: int) -> np.random.Generator:
    return np.random.default_rng(
        np.random.SeedSequence([SEED_ROOT, table_idx, int(round(sf * 1000))])
    )


def _domains() -> dict:
    """Categorical domains lifted verbatim from the driver's sf0.1."""
    import duckdb

    con = duckdb.connect()
    p = lambda t: f"read_parquet('{REF_SF01}/{t}.parquet')"  # noqa: E731
    one = lambda q: [r[0] for r in con.execute(q).fetchall()]  # noqa: E731
    return {
        "mktsegment": one(f"SELECT DISTINCT c_mktsegment FROM {p('customer')} ORDER BY 1"),
        "brand": one(f"SELECT DISTINCT p_brand FROM {p('part')} ORDER BY 1"),
        "ptype": one(f"SELECT DISTINCT p_type FROM {p('part')} ORDER BY 1"),
        "pname_adj": one(
            f"SELECT DISTINCT string_split(p_name,' ')[1] FROM {p('part')} ORDER BY 1"
        ),
        "pname_noun": one(
            f"SELECT DISTINCT string_split(p_name,' ')[2] FROM {p('part')} ORDER BY 1"
        ),
        "ostatus": one(f"SELECT DISTINCT o_orderstatus FROM {p('orders')} ORDER BY 1"),
        "oprio": one(f"SELECT DISTINCT o_orderpriority FROM {p('orders')} ORDER BY 1"),
        "rflag": one(f"SELECT DISTINCT l_returnflag FROM {p('lineitem')} ORDER BY 1"),
        "lstatus": one(f"SELECT DISTINCT l_linestatus FROM {p('lineitem')} ORDER BY 1"),
        "etype": one(f"SELECT DISTINCT event_type FROM {p('events')} ORDER BY 1"),
        "lang": con.execute(
            f"SELECT lang, count(*) FROM {p('documents')} GROUP BY 1 ORDER BY 1"
        ).fetchall(),
        "source": one(f"SELECT DISTINCT source FROM {p('documents')} ORDER BY 1"),
        "vocab": one(
            "SELECT DISTINCT w FROM (SELECT unnest(string_split(text,' ')) w "
            f"FROM {p('documents')}) WHERE w <> 'dup' ORDER BY 1"
        ),
    }


def _write(outdir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows", flush=True)


def _pick(rng, choices, n, p=None):
    return np.array(choices, dtype=object)[rng.choice(len(choices), size=n, p=p)]


def gen(sf: float, outdir: str, tables: set | None = None) -> None:
    """``tables=None`` generates the full ten-table schema. A subset
    (e.g. {"events", "lineitem"}) skips the other tables' array builds
    — per-table RNG streams (``_rng(sf, table_idx)``) make every table
    byte-identical whether generated alone or with the rest. Needed at
    sf10, where the full build is dominated by the unused documents
    Python loop."""
    want = (lambda t: tables is None or t in tables)
    os.makedirs(outdir, exist_ok=True)
    dom = _domains()
    n = {t: max(1, int(round(c * sf))) for t, c in ROWS.items()}
    # the driver floors documents/embeddings at 500 below sf0.01
    n["documents"] = max(500, n["documents"])
    n["embeddings"] = max(500, n["embeddings"])
    n_users = max(1, int(round(EVENT_USERS_PER_SF * sf)))
    nc, ns, np_, no = n["customer"], n["supplier"], n["part"], n["orders"]

    # region / nation: fixed-size dims, copied from the driver data.
    for t in ("region", "nation"):
        if want(t):
            _write(outdir, t, pq.read_table(f"{REF_SF01}/{t}.parquet"))

    # customer ----------------------------------------------------------
    r = _rng(sf, 1)
    if want("customer"):
        _write(outdir, "customer", pa.table({
            "c_custkey": pa.array(np.arange(nc), pa.int64()),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(nc)]),
            "c_nationkey": pa.array(r.integers(0, 25, nc).astype(np.int32), pa.int32()),
            "c_acctbal": pa.array(np.round(r.uniform(-1000, 10000, nc), 2)),
            "c_mktsegment": pa.array(_pick(r, dom["mktsegment"], nc).astype(str)),
        }))

    # supplier ----------------------------------------------------------
    r = _rng(sf, 2)
    if want("supplier"):
        _write(outdir, "supplier", pa.table({
            "s_suppkey": pa.array(np.arange(ns), pa.int64()),
            "s_name": pa.array([f"Supplier#{i:09d}" for i in range(ns)]),
            "s_nationkey": pa.array(r.integers(0, 25, ns).astype(np.int32), pa.int32()),
            "s_acctbal": pa.array(np.round(r.uniform(-1000, 10000, ns), 2)),
        }))

    # part ---------------------------------------------------------------
    r = _rng(sf, 3)
    if want("part"):
        adj = _pick(r, dom["pname_adj"], np_)
        noun = _pick(r, dom["pname_noun"], np_)
        _write(outdir, "part", pa.table({
            "p_partkey": pa.array(np.arange(np_), pa.int64()),
            "p_name": pa.array([f"{a} {b}" for a, b in zip(adj, noun)]),
            "p_brand": pa.array(_pick(r, dom["brand"], np_).astype(str)),
            "p_type": pa.array(_pick(r, dom["ptype"], np_).astype(str)),
            "p_size": pa.array(r.integers(1, 51, np_).astype(np.int32), pa.int32()),
            "p_retailprice": pa.array(np.round(r.uniform(900, 1000, np_), 2)),
        }))

    # orders --------------------------------------------------------------
    # (lineitem derives shipdate from the order dates, so the orders
    # arithmetic runs whenever either table is wanted)
    r = _rng(sf, 4)
    d0 = np.datetime64("1995-01-01")
    odate_days = r.integers(0, 2404, no)  # .. 2001-08-01
    odate = d0 + odate_days.astype("timedelta64[D]")
    if want("orders"):
        _write(outdir, "orders", pa.table({
            "o_orderkey": pa.array(np.arange(no), pa.int64()),
            "o_custkey": pa.array(r.integers(0, nc, no), pa.int64()),
            "o_orderstatus": pa.array(_pick(r, dom["ostatus"], no).astype(str)),
            "o_totalprice": pa.array(np.round(r.uniform(1000, 500000, no), 2)),
            "o_orderdate": pa.array(odate.astype("datetime64[us]"), pa.timestamp("us")),
            "o_orderpriority": pa.array(_pick(r, dom["oprio"], no).astype(str)),
        }))

    # lineitem -------------------------------------------------------------
    r = _rng(sf, 5)
    if want("lineitem"):
        lines = r.poisson(LINES_PER_ORDER, no)
        okeys = np.repeat(np.arange(no), lines)
        nl = okeys.size
        linenum = (
            np.arange(nl) - np.repeat(np.concatenate(([0], np.cumsum(lines)[:-1])), lines) + 1
        )
        qty = r.integers(1, 51, nl).astype(np.float64)
        shipdate = (
            d0
            + np.repeat(odate_days, lines).astype("timedelta64[D]")
            + r.integers(1, 96, nl).astype("timedelta64[D]")
        )
        _write(outdir, "lineitem", pa.table({
            "l_orderkey": pa.array(okeys, pa.int64()),
            "l_partkey": pa.array(r.integers(0, np_, nl), pa.int64()),
            "l_suppkey": pa.array(r.integers(0, ns, nl), pa.int64()),
            "l_linenumber": pa.array(linenum.astype(np.int32), pa.int32()),
            "l_quantity": pa.array(qty),
            "l_extendedprice": pa.array(np.round(qty * r.uniform(900, 2100, nl), 2)),
            "l_discount": pa.array(np.round(r.uniform(0, 0.1, nl), 2)),
            "l_tax": pa.array(np.round(r.uniform(0, 0.08, nl), 2)),
            "l_returnflag": pa.array(_pick(r, dom["rflag"], nl).astype(str)),
            "l_linestatus": pa.array(_pick(r, dom["lstatus"], nl).astype(str)),
            "l_shipdate": pa.array(shipdate.astype("datetime64[us]"), pa.timestamp("us")),
        }))

    # events ----------------------------------------------------------------
    r = _rng(sf, 6)
    if want("events"):
        ne = n["events"]
        span_us = 30 * 86400 * _US
        ts = np.sort(r.integers(0, span_us, ne)) + np.datetime64(
            "2024-01-01T00:00:00", "us"
        ).astype(np.int64)
        k = r.integers(0, 100, ne)
        _write(outdir, "events", pa.table({
            "event_id": pa.array(np.arange(ne), pa.int64()),
            "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
            "user_id": pa.array(r.integers(0, n_users, ne), pa.int64()),
            "event_type": pa.array(_pick(r, dom["etype"], ne).astype(str)),
            "value": pa.array(np.round(r.exponential(50.0, ne), 2)),
            "props": pa.array([f'{{"k": {v}}}' for v in k]),
        }))

    # documents ---------------------------------------------------------------
    r = _rng(sf, 7)
    if want("documents"):
        nd = n["documents"]
        langs = [l for l, _ in dom["lang"]]
        counts = np.array([c for _, c in dom["lang"]], dtype=float)
        vocab = list(dom["vocab"])
        nw = r.integers(10, 101, nd)
        word_idx = [r.integers(0, len(vocab), k) for k in nw]
        texts: list[str] = []
        kind = r.uniform(size=nd)
        src_of = r.integers(0, np.maximum(np.arange(nd), 1))  # earlier doc to copy
        for i in range(nd):
            if i > 0 and kind[i] < DOC_EXACT_RATE:
                texts.append(texts[src_of[i]])
            elif i > 0 and kind[i] < DOC_EXACT_RATE + DOC_COPY_RATE:
                words = texts[src_of[i]].split(" ")
                words[r.integers(0, len(words))] = "dup"
                texts.append(" ".join(words))
            else:
                texts.append(" ".join(vocab[j] for j in word_idx[i]))
        _write(outdir, "documents", pa.table({
            "doc_id": pa.array(np.arange(nd), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(_pick(r, langs, nd, p=counts / counts.sum()).astype(str)),
            "source": pa.array(_pick(r, dom["source"], nd).astype(str)),
            "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
        }))

    # embeddings ------------------------------------------------------------
    r = _rng(sf, 8)
    if want("embeddings"):
        nv = n["embeddings"]
        V = r.normal(size=(nv, EMB_DIM))
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        V = V.astype(np.float32)
        _write(outdir, "embeddings", pa.table({
            "vec_id": pa.array(np.arange(nv), pa.int64()),
            "embedding": pa.array(list(V), pa.list_(pa.float32())),
            "label": pa.array(r.integers(0, 10, nv).astype(np.int32), pa.int32()),
        }))

    with open(os.path.join(outdir, "GENERATED.json"), "w") as f:
        json.dump({"sf": sf, "seed_root": SEED_ROOT, "rows": n}, f)


if __name__ == "__main__":
    sf = float(sys.argv[1])
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"/root/repo/.scaledata/sf{sf}"
    only = os.environ.get("SPARK_GRAFT_GEN_TABLES")
    gen(sf, outdir, set(only.split(",")) if only else None)
