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
DRIVER_SENTINELS = [
    # Round-8 window budget: the driver records ~50 rows per round and
    # exactly 50 queries have never had a driver row, plus the two
    # HUGEINT-fix queries below need re-evidence — 52 candidates for a
    # ~50-row window. The ten per-family sentinels (all green in r07)
    # therefore sit out THIS round so the never-seen backlog drains in
    # one pass; restore them once the pre-round-8 220 all have rows
    # (round 8 adds docs_rrf_fusion and emb_cluster_coreset, which
    # join the never-seen queue behind the backlog).
    "docs_source_mix",             # pinned: failed r03/r07 driver hash —
                                   # r07 root cause was an uncast DuckDB
                                   # sum() (HUGEINT vs int64); oracle now
                                   # casts. Keep until a green driver row.
    "docs_source_lang_matrix",     # pinned: same HUGEINT root cause as
                                   # docs_source_mix (failed r07); keep
                                   # until a green driver row lands.
]

# Families whose round-5/6/7 additions repeatedly landed at the END of
# the evaluation window and got starved when runs were cut short.
# Promoted to the front of the never-seen queue (VERDICT r7 item 5).
_EARLY_PREFIXES = ("mm_",)


def _driver_seen() -> set[str]:
    """Query names with a row in any committed CORRECTNESS_r*.json —
    i.e. queries that already have builder-independent evidence."""
    import glob
    import json
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                seen.update(json.load(f).keys())
        except (OSError, ValueError):
            continue
    return seen


def _reorder(full: dict) -> dict:
    seen = _driver_seen()
    window = list(DRIVER_SENTINELS)
    never = [k for k in full if k not in seen and k not in window]
    window += [k for k in never if k.startswith(_EARLY_PREFIXES)]
    window += [k for k in never if not k.startswith(_EARLY_PREFIXES)]
    window += [k for k in full if k in seen and k not in window]
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
