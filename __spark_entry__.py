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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Order = driver evaluation order. The round-3 driver run was cut
    # short at the tail, so families with no prior driver-side evidence
    # (events, warehouse — all sub-second) run BEFORE the long LLM
    # block; a truncated run then still records them.
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
    return out


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
