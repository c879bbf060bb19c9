"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The query surface lives in ``iot_real_time_data_pipeline_spark``:
- ``driver_queries``: the IoT pipeline / star-schema / dashboard
  operators (SURVEY.md §2) with DuckDB oracle twins;
- ``operators.dedup`` / ``operators.similarity`` /
  ``operators.text_analysis`` / ``operators.curation`` /
  ``operators.multimodal``: the LLM-training-data operators over
  documents/embeddings.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from iot_real_time_data_pipeline_spark import driver_queries as _iot
from iot_real_time_data_pipeline_spark.entrypoints import iot_star
from iot_real_time_data_pipeline_spark.operators import dashboard as _dash


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full pipeline (derive → validate → star) + the
    D1 dashboard tile on sf0.001."""
    star = iot_star(spark, "/root/testdata/sf0.001")
    return _dash.avg_temperature(star["fact_sensor_readings"])


# Driver evaluation order. The driver's correctness gate records at
# most ~50 rows per round, so the FIRST ~50 names decide which operators
# get driver-side evidence. The window SELF-ROTATES: ~10 per-family
# sentinels stay fixed at the front, then every query that has never
# had a driver row (no key in any committed CORRECTNESS_r*.json) is
# queued in registry order, then everything already evidenced. Each
# round's new CORRECTNESS file shrinks the never-seen set, so over a
# few rounds every registered query accumulates builder-independent
# evidence without manual curation.
# Queries pinned to the FRONT of the window until their MOST RECENT
# driver row is fully green — self-unpinning evidence for past driver
# FAILs. Both entries failed the r07 hash on the uncast-DuckDB-sum
# HUGEINT artifact (values bit-identical); round 8 cast the oracles.
_PINNED_UNTIL_GREEN = [
    "docs_source_mix",
    "docs_source_lang_matrix",
]

# Per-family canaries: TWO stable queries per operator family (round
# 10, VERDICT r9 item 7 — with the never-seen backlog at zero, the
# sentinels are the round-over-round regression net, so one per family
# was thin), re-run every round so a regression in an already-evidenced
# family still surfaces in driver data. They YIELD their window slots
# while the never-seen backlog is large (the round-8 situation: a
# 50-query backlog in a ~50-row window) and return as it drains.
_FAMILY_SENTINELS = [
    "validation_status_counts",    # iot validation engine
    "staging",                     # iot pipeline projection contract
    "fact",                        # iot star schema (exercises all dims)
    "watermark_max",               # incremental-load scalar
    "staging_from_lake",           # partitioned-lake round-trip
    "route_counts",                # 3-way status router / lake layout
    "d4_health_donut",             # dashboard + share-of-total window
    "d5_temp_humidity_by_hour",    # dashboard + dim_time join
    "throttled_alerts_stateful_replay",  # stateful throttle, batch replay
    "events_sessionize",           # clickstream family
    "events_funnel",               # clickstream ordered-step family
    "events_kmv_distinct",         # sketch family
    "events_hll_distinct",         # sketch family (integer-exact HLL)
    "wh_q1_pricing_summary",       # warehouse scan-agg
    "wh_q9_product_profit",        # warehouse multi-join tree
    "docs_minhash_lsh_pairs",      # docs dedup family
    "docs_dup_clusters",           # docs dedup (iterated components)
    "docs_tfidf_top_terms",        # text-analysis family
    "docs_mixture_apportion",      # curation/sampling family
    "emb_ivf_topk",                # embeddings/ANN family
    "emb_kmeans_lloyd2",           # embeddings clustering family
    "mm_wav_features",             # multimodal codec family
    "mm_bmp_features",             # multimodal image codec
]

# Family sentinels re-enter when pinned + backlog leave this much room
# in the ~50-row window (window ≈ 50 minus the 24 sentinels).
_SENTINEL_ROOM = 26

# Families whose round-5/6/7 additions repeatedly landed at the END of
# the evaluation window and got starved when runs were cut short.
# Promoted to the front of the never-seen queue (VERDICT r7 item 5).
_EARLY_PREFIXES = ("mm_",)


def _correctness_files() -> list[str]:
    """Committed driver evidence, OLDEST ROUND FIRST. Sorted by the
    parsed round number, not the filename — lexicographic order breaks
    the 'later rounds overwrite' invariant at three digits
    (CORRECTNESS_r100 < CORRECTNESS_r99 as strings)."""
    import glob
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    paths = glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))

    def _round(p: str) -> int:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    return sorted(paths, key=_round)


def _driver_seen() -> set[str]:
    """Query names with a row in any committed CORRECTNESS_r*.json —
    i.e. queries that already have builder-independent evidence."""
    import json

    seen: set[str] = set()
    for path in _correctness_files():
        try:
            with open(path) as f:
                seen.update(json.load(f).keys())
        except (OSError, ValueError):
            continue
    return seen


def _driver_latest_green() -> set[str]:
    """Query names whose MOST RECENT driver row was fully green."""
    import json

    latest: dict[str, bool] = {}
    for path in _correctness_files():  # sorted: later rounds overwrite
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict):
                latest[name] = bool(
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match")
                    and row.get("err") is None
                )
    return {k for k, ok in latest.items() if ok}


def _driver_last_round() -> dict[str, int]:
    """Round number of each query's most recent driver evidence row —
    the staleness signal for the rotation in :func:`_reorder`."""
    import json
    import re

    last: dict[str, int] = {}
    for path in _correctness_files():
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else -1
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name in rows:
            last[name] = rnd
    return last


def _sentinels(full: dict, seen: set[str] | None = None) -> list[str]:
    green = _driver_latest_green()
    if seen is None:  # hoisted: one evidence scan, not one per query
        seen = _driver_seen()
    pinned = [k for k in _PINNED_UNTIL_GREEN if k in full and k not in green]
    never = [k for k in full if k not in seen]
    if len(pinned) + len(never) <= _SENTINEL_ROOM:
        return pinned + [k for k in _FAMILY_SENTINELS if k in full]
    return pinned


def _reorder(full: dict) -> dict:
    seen = _driver_seen()
    window = _sentinels(full, seen)
    never = [k for k in full if k not in seen and k not in window]
    window += [k for k in never if k.startswith(_EARLY_PREFIXES)]
    window += [k for k in never if not k.startswith(_EARLY_PREFIXES)]
    # Already-evidenced tail, STALEST FIRST (round 10): with the
    # never-seen backlog at zero, registry order would re-run the same
    # ~26 non-sentinel queries every round; ordering by the round of
    # each query's latest driver row makes the window cycle through the
    # whole registry, refreshing every query's evidence over ~4 rounds.
    last = _driver_last_round()
    order = {k: i for i, k in enumerate(full)}
    window += sorted(
        (k for k in full if k in seen and k not in window),
        key=lambda k: (last.get(k, -1), order[k]),
    )
    head = {k: full[k] for k in window if k in full}
    head.update(full)  # dict update keeps head's insertion order
    return head


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(_iot.iot_queries())
    try:
        from iot_real_time_data_pipeline_spark import events_queries as _ev

        out.update(_ev.events_queries())
    except ImportError:
        pass
    try:
        from iot_real_time_data_pipeline_spark import warehouse_queries as _wh

        out.update(_wh.warehouse_queries())
    except ImportError:
        pass
    try:
        from iot_real_time_data_pipeline_spark import llm_queries as _llm

        out.update(_llm.llm_queries())
    except ImportError:
        pass
    return _reorder(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(_iot.iot_oracle_sql())
    try:
        from iot_real_time_data_pipeline_spark import llm_queries as _llm

        out.update(_llm.llm_oracle_sql())
    except ImportError:
        pass
    try:
        from iot_real_time_data_pipeline_spark import events_queries as _ev

        out.update(_ev.events_oracle_sql())
    except ImportError:
        pass
    try:
        from iot_real_time_data_pipeline_spark import warehouse_queries as _wh

        out.update(_wh.warehouse_oracle_sql())
    except ImportError:
        pass
    return out
