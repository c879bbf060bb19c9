"""Measured persisted-frame sizes per family at big SFs (VERDICT r10
item 8): the 100x runbook names the knob per family; this adds the
MEMORY a deployer must size executors for — the bytes each family's
shared persisted frame actually holds in the block-manager store at
the given SF, measured (getRDDStorageInfo), not estimated.

Frames measured (the ones bench.py / the operators persist):

- corpus tables: documents, embeddings (the warm-deployment scans)
- near-dup pairs: the banded-MinHash verified-pair frame the dup-graph
  stack (clusters, pagerank, labelprop, agreement) shares
- staging: the validated/renamed staging frame the star build reads
- star: the five fact/dim frames together

Usage::

    python tools/mem_sizes.py out.json DIR [DIR ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _storage_bytes(spark) -> int:
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return int(sum(i.memSize() for i in infos))


def main() -> int:
    out_path = sys.argv[1]
    sf_dirs = sys.argv[2:]

    from pyspark.sql import SparkSession

    from iot_real_time_data_pipeline_spark import llm_queries as LQ
    from iot_real_time_data_pipeline_spark.entrypoints import (
        iot_staging,
        read_table,
    )
    from iot_real_time_data_pipeline_spark.operators import dedup as DD
    from iot_real_time_data_pipeline_spark.operators.dedup import (
        release_session_caches,
    )
    from iot_real_time_data_pipeline_spark.operators.star_schema import (
        incremental_load,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("mem-sizes")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {}
    for sf_dir in sf_dirs:
        label = os.path.basename(sf_dir.rstrip("/"))
        sizes: dict[str, int] = {}

        def measure(name: str, build):
            release_session_caches(spark)
            base = _storage_bytes(spark)
            df = build()
            df.persist()
            df.count() if not isinstance(df, dict) else None
            sizes[name] = _storage_bytes(spark) - base

        measure(
            "documents", lambda: read_table(spark, sf_dir, "documents")
        )
        measure(
            "embeddings", lambda: read_table(spark, sf_dir, "embeddings")
        )
        measure(
            "neardup_pairs",
            lambda: DD.minhash_lsh_pairs(
                read_table(spark, sf_dir, "documents"),
                threshold=LQ.JACCARD_THRESHOLD,
            ),
        )
        measure("staging", lambda: iot_staging(spark, sf_dir))

        # star: five frames persisted together (the bench's build_star)
        release_session_caches(spark)
        base = _storage_bytes(spark)
        star = incremental_load(
            iot_staging(spark, sf_dir), existing=None, dense_keys=False
        )
        for df in star.values():
            df.persist()
        for df in star.values():
            df.count()
        sizes["star_all"] = _storage_bytes(spark) - base
        release_session_caches(spark)

        out[label] = sizes
        print(label, json.dumps({k: f"{v/2**20:.1f}MiB" for k, v in sizes.items()}),
              flush=True)

    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {out_path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
