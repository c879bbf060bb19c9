"""Streaming SCD2 dimension maintenance: a change stream keeps a
versioned (type-2) dimension table current via per-micro-batch MERGE.

The batch operator (``operators.events_analytics.scd2_intervals``)
builds the full history in one pass; real warehouses receive changes
continuously and cannot re-read all history per batch. This module is
the incremental form: each micro-batch rebuilds ONLY the users it
touches, by treating their existing intervals as weighted change
points (``valid_from_sec`` carrying ``n_events``) unioned with the new
events — the run-collapse then reproduces exactly what a full-history
rebuild would, so the maintained table never drifts from the batch
semantics (equivalence is pinned by
``test_scd2_stream_matches_batch_rebuild``).

Ordering contract: per-user changes arrive in event-time order across
batches (the standard CDC shape under a watermark). A late change
older than its user's current interval start would need the compressed
run's interior events to re-split — information an interval table by
design no longer has; route such stragglers to the dead-letter path
upstream.

Scale shape: the dimension parquet is partitioned by a user hash
bucket; a micro-batch reads and rewrites only the buckets its users
map to (dynamic partition overwrite — untouched buckets are never
opened, touched buckets swap atomically at commit). State per batch is
interval rows for touched users, not raw history, so batch cost tracks
batch size, not table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

SCD2_BUCKETS = 16

CHANGE_STREAM_SCHEMA = (
    "event_id long, user_id long, event_type string, ts timestamp"
)

_DIM_COLS = [
    "user_id", "version", "event_type", "valid_from_sec",
    "valid_to_sec", "n_events", "is_current", "bucket",
]


def _rebuild_intervals(points: DataFrame) -> DataFrame:
    """Run-collapse weighted change points (src 0 = existing interval,
    1 = new event; the tiebreak keeps existing state first at equal
    seconds) into SCD2 intervals — same geometry as the batch
    ``scd2_intervals``, with ``n_events`` summing weights."""
    w = Window.partitionBy("user_id").orderBy("ts_sec", "src", "event_id")
    prev_type = F.lag("event_type").over(w)
    is_change = F.when(
        prev_type.isNull() | (prev_type != F.col("event_type")), F.lit(1)
    ).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    versioned = points.withColumn(
        "version", F.sum(is_change).over(run).cast("long")
    )
    iv = versioned.groupBy("user_id", "version").agg(
        F.min("event_type").alias("event_type"),
        F.min("ts_sec").alias("valid_from_sec"),
        F.sum("weight").cast("long").alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("version")
    return (
        iv.withColumn(
            "valid_to_sec",
            F.coalesce(F.lead("valid_from_sec").over(w2), F.lit(-1)).cast(
                "long"
            ),
        )
        .withColumn("is_current", (F.col("valid_to_sec") == -1).cast("long"))
        .withColumn(
            "bucket", (F.col("user_id") % SCD2_BUCKETS).cast("long")
        )
        .select(*_DIM_COLS)
    )


def merge_scd2_batch(
    spark: SparkSession, batch_df: DataFrame, dim_dir: str
) -> None:
    """MERGE one micro-batch of changes into the bucketed SCD2 table."""
    changes = batch_df.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("long").alias("ts_sec"),
        F.lit(1).cast("long").alias("weight"),
        F.lit(1).alias("src"),
    )
    if not changes.take(1):
        return

    try:
        dim = spark.read.parquet(dim_dir)
        have_dim = True
    except Exception:  # first batch: no table yet  # noqa: BLE001
        have_dim = False

    users = changes.select("user_id").distinct()
    if have_dim:
        buckets = [
            r.bucket
            for r in users.select(
                (F.col("user_id") % SCD2_BUCKETS).alias("bucket")
            )
            .distinct()
            .collect()
        ]
        touched = dim.filter(F.col("bucket").isin(buckets))
        # existing intervals of touched USERS become weighted points;
        # other users in the same buckets pass through untouched
        existing = touched.join(F.broadcast(users), "user_id", "inner")
        passthrough = touched.join(F.broadcast(users), "user_id", "left_anti")
        points = existing.select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            "event_type",
            F.col("valid_from_sec").alias("ts_sec"),
            F.col("n_events").alias("weight"),
            F.lit(0).alias("src"),
        ).unionByName(changes)
        rebuilt = _rebuild_intervals(points).unionByName(
            passthrough.select(*_DIM_COLS)
        )
    else:
        rebuilt = _rebuild_intervals(changes)

    (
        rebuilt.repartition("bucket")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(dim_dir)
    )


def run_scd2_stream(
    spark: SparkSession,
    source_dir: str,
    dim_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Wire a JSONL change-stream drop directory into the maintained
    SCD2 dimension. Returns the started StreamingQuery."""
    stream = (
        spark.readStream.schema(CHANGE_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(source_dir)
    )
    writer = stream.writeStream.foreachBatch(
        lambda bdf, _eid: merge_scd2_batch(bdf.sparkSession, bdf, dim_dir)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
