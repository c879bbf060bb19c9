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
# most ~50 rows per round, so the FIRST 50 names decide which operators
# get driver-side evidence — r4's family-sequential order spent the
# whole window on iot+events and left every wh_/docs_/emb_/mm_ query
# without a driver row, ever. This list interleaves all seven families
# into the window: 15 iot pipeline/star + 2 dashboard + lake round-trip
# + 7 events + 1 sketch + 8 warehouse + 10 docs + 4 emb + 2 multimodal.
# Everything not named here follows in registry order.
DRIVER_WINDOW = [
    # iot pipeline + star (15)
    "validation_status_counts", "route_counts", "staging", "dim_location",
    "dim_time", "dim_soil", "dim_weather", "fact", "watermark_max",
    "incremental_filter_count", "batch_summary", "alerts_by_type",
    "alert_actions", "throttled_alert_counts", "weather_enriched",
    # dashboard representatives (2) + partitioned-lake round-trip (1)
    "d4_health_donut", "d10_sliced", "staging_from_lake",
    # clickstream (7) + sketch (1)
    "events_sessionize", "events_asof_join", "events_retention_cohorts",
    "events_scd2_intervals", "events_heavy_hitters", "events_gapfill_locf",
    "events_funnel_within", "events_kmv_distinct",
    # warehouse (8)
    "wh_q1_pricing_summary", "wh_q9_product_profit",
    "wh_q18_large_volume_customers", "wh_q8_market_share",
    "wh_q22_dormant_customers", "wh_sales_cube", "wh_customer_rfm",
    "wh_priority_month_pivot",
    # documents (10)
    "docs_minhash_lsh_pairs", "docs_dup_clusters", "docs_curation",
    "docs_bpe_train", "docs_exact_dedup", "docs_shingle_jaccard_pairs",
    "docs_simhash_dup_pairs", "docs_decontaminate", "docs_token_stats",
    "docs_pagerank",
    # embeddings (4) + multimodal (2)
    "emb_cosine_dup_pairs", "emb_gram_matrix", "emb_ivf_topk",
    "emb_int8_rerank_topk", "mm_image_features", "mm_wav_features",
]


def _reorder(full: dict) -> dict:
    head = {k: full[k] for k in DRIVER_WINDOW if k in full}
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
