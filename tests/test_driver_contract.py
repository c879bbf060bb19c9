"""The __spark_entry__ contract: key parity and oracle well-formedness."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402


def test_every_oracle_has_a_query():
    q, o = E.queries(), E.oracle_sql()
    assert set(o) <= set(q)


def test_plan_audit_covers_every_registered_query():
    """Definition-of-done (VERDICT r5 item 2): a query cannot land
    without its PLAN_AUDIT.md row — regenerate with
    ``python tools/plan_report.py`` whenever the registry changes."""
    import re

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "PLAN_AUDIT.md")) as f:
        audit = f.read()
    audited = set(re.findall(r"^\| (\w+) \|", audit, flags=re.M))
    missing = sorted(set(E.queries()) - audited)
    assert not missing, f"queries missing a PLAN_AUDIT row: {missing}"


def test_driver_window_leads_with_unevidenced_queries():
    """The self-rotating window: after the (computed) sentinels, every
    query that already has a driver CORRECTNESS row must sort BEHIND
    every query that never had one."""
    full = E.queries()
    names = list(full)
    seen = E._driver_seen()
    tail = names[len(E._sentinels(full)):]
    first_seen = next((i for i, n in enumerate(tail) if n in seen), len(tail))
    assert all(n in seen for n in tail[first_seen:]), (
        "an unevidenced query sorted behind an evidenced one"
    )


def test_driver_sentinels_self_heal():
    """Pinned queries unpin once their latest driver row is green, and
    the family canaries yield while the never-seen backlog is large
    but return when it drains. Every state is SIMULATED through
    injected seen/green sets — the r8 verdict caught the original
    form of this test asserting the live CORRECTNESS_r*.json state,
    which the driver falsifies the moment the intended self-healing
    outcome (a green row for a pinned query) lands on disk."""
    full = E.queries()
    pins = [k for k in E._PINNED_UNTIL_GREEN if k in full]
    orig_seen, orig_green = E._driver_seen, E._driver_latest_green
    try:
        # State A — pins red + large backlog: pins only, canaries bench.
        E._driver_seen = lambda: set()
        E._driver_latest_green = lambda: set()
        current = E._sentinels(full)
        assert current == pins
        assert "validation_status_counts" not in current
        # State B — pins green, backlog still large: pins release and
        # the canaries stay benched (no room in the window yet).
        E._driver_seen = lambda: set(pins)
        E._driver_latest_green = lambda: set(pins)
        assert E._sentinels(full) == []
        # State C — backlog drained + everything green: canaries return.
        E._driver_seen = lambda: set(full)
        E._driver_latest_green = lambda: set(full)
        healed = E._sentinels(full)
        assert healed == [k for k in E._FAMILY_SENTINELS if k in full]
        # State D — drained backlog but a pin regressed to red: the pin
        # re-enters AHEAD of the returning canaries.
        if pins:
            E._driver_latest_green = lambda: set(full) - {pins[0]}
            relapsed = E._sentinels(full)
            assert relapsed[0] == pins[0]
            assert relapsed[1:] == [
                k for k in E._FAMILY_SENTINELS if k in full
            ]
    finally:
        E._driver_seen, E._driver_latest_green = orig_seen, orig_green


def test_oracle_sql_parses_in_duckdb():
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    for name, sql in E.oracle_sql().items():
        con.execute(f"EXPLAIN {sql}")  # parse + bind, no execution


def test_oracle_output_types_are_driver_stable():
    """Type-lint over every oracle (VERDICT r7 item 2): the driver's
    value-hash is TYPE-sensitive, so a DuckDB column that widens past
    Spark's type system (sum(BIGINT) -> HUGEINT/int128, or DECIMAL)
    hash-mismatches even when every value is bit-identical — exactly
    the r07 docs_source_mix / docs_source_lang_matrix failure. The
    local value-comparison gate is blind to it (Python ints compare
    equal regardless of width), so this lint is the only local tripwire:
    every oracle output column must bind to a type Spark can emit.
    INTEGER/SMALLINT are fine — Spark has int32/int16 and the engines
    agree wherever those appear (year(), nationkey, ...); the killers
    are the types with NO Spark analog, led by sum(BIGINT)'s silent
    HUGEINT widening."""
    import re

    import duckdb

    # DuckDB types Spark's engine can never produce — any oracle column
    # binding to one of these is a guaranteed driver hash mismatch.
    denied = re.compile(
        r"HUGEINT|UHUGEINT|UBIGINT|UINTEGER|USMALLINT|UTINYINT"
        r"|DECIMAL|TIME\b|INTERVAL|BIT|UUID|ENUM",
    )
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    offenders = []
    for name, sql in E.oracle_sql().items():
        rel = con.sql(sql)  # bind only; .types needs no execution
        for col, typ in zip(rel.columns, rel.types):
            if denied.search(str(typ)):
                offenders.append(f"{name}.{col}: {typ}")
    assert not offenders, (
        "oracle columns with driver-unstable types (cast them, e.g. "
        f"CAST(sum(...) AS BIGINT)): {offenders}"
    )


def test_readme_query_count_matches_registry():
    """README's headline query count must equal len(queries()) — the
    r6 verdict caught three prose docs drifting from the registry;
    this pins the one count users see first."""
    import os
    import re

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "README.md")) as f:
        m = re.search(r"\*\*(\d+) oracle-checked queries\*\*", f.read())
    assert m, "README.md lost its 'N oracle-checked queries' headline"
    assert int(m.group(1)) == len(E.queries()), (
        f"README says {m.group(1)} but the registry has "
        f"{len(E.queries())} — update README.md"
    )
