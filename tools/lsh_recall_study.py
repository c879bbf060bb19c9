"""Empirical suffix-bit LSH recall at a generated big SF (VERDICT r10
item 3): round 10 asserted the suffix-knob recall cost from the p^m
analytic bound only; this measures it. At the given SF dir it computes
the EXACT near-dup pair set (all-pairs cosine, the test baseline) and
the LSH pair set ``cosine_dup_pairs`` produces with the auto-engaged
shared-suffix bits, at both the registered threshold (0.45) and the
production dedup threshold (0.85), plus the suffix-disabled control.

Precision is 1.0 by construction (LSH candidates are exact-cosine
verified, so the LSH set is a subset of the exact set — asserted);
recall = |LSH| / |exact|.

Usage::

    python tools/lsh_recall_study.py out.json /root/repo/.scaledata/sf1.0
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESHOLDS = (0.45, 0.85)


def main() -> int:
    out_path = sys.argv[1]
    sf_dir = sys.argv[2]

    from pyspark.sql import SparkSession

    from iot_real_time_data_pipeline_spark.operators import similarity as SIM
    from iot_real_time_data_pipeline_spark.operators.dedup import (
        release_session_caches,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("lsh-recall-study")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    results: dict = {"sf_dir": sf_dir, "n_vectors": n, "thresholds": {}}
    for thr in THRESHOLDS:
        rows = SIM.rh_rows_for(thr)
        m = SIM.rh_suffix_bits(n, rows)
        t0 = time.perf_counter()
        exact = {
            (r.vec_a, r.vec_b)
            for r in SIM.cosine_dup_pairs_exact(emb, thr)
            .select("vec_a", "vec_b")
            .collect()
        }
        t_exact = time.perf_counter() - t0
        release_session_caches(spark)

        variants = {}
        for label, sbits in (("auto", None), ("no_suffix", 0)):
            t0 = time.perf_counter()
            lsh = {
                (r.vec_a, r.vec_b)
                for r in SIM.cosine_dup_pairs(emb, thr, suffix_bits=sbits)
                .select("vec_a", "vec_b")
                .collect()
            }
            wall = time.perf_counter() - t0
            release_session_caches(spark)
            assert lsh <= exact, "verified LSH pairs must be a subset of exact"
            variants[label] = {
                "suffix_bits": m if sbits is None else sbits,
                "n_pairs": len(lsh),
                "recall": round(len(lsh) / len(exact), 4) if exact else None,
                "precision": 1.0,
                "wall_s": round(wall, 2),
            }
        results["thresholds"][str(thr)] = {
            "rows_per_band": rows,
            "n_exact_pairs": len(exact),
            "exact_wall_s": round(t_exact, 2),
            **variants,
        }
        print(f"thr={thr}: exact={len(exact)} " + json.dumps(variants), flush=True)

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out_path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
