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
    from pyspark.sql import functions as F

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

    # The generated corpus is one parquet file -> one scan partition;
    # under the exact path's crossJoin(broadcast(queries)) that means
    # ONE task computing all n^2/2 cosines. Repartition the corpus side
    # so the all-pairs baseline parallelizes across the local cores
    # (pure measurement plumbing — pair sets are partitioning-invariant).
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(
        int(cpus) * 4
    )
    n = emb.count()

    def planted_corpus():
        """Corpus + perturbed clones of every 20th vector at exact
        target cosines 0.86..0.98: the isotropic generated corpus has
        ZERO true pairs at the production dedup threshold (measured),
        so production-threshold recall needs planted ground truth.
        v' = c*v + sqrt(1-c^2)*|v|*g_perp gives cos(v, v') = c exactly
        (g orthogonalized against v), seeded -> reproducible."""
        import numpy as np

        rows = emb.select("vec_id", "embedding").collect()
        rng = np.random.default_rng(20260816)
        clones = []
        for r in rows:
            if r.vec_id % 20 != 0:
                continue
            v = np.asarray(r.embedding, dtype=np.float64)
            c = 0.86 + 0.12 * rng.random()
            g = rng.standard_normal(v.shape)
            g -= (g @ v) / (v @ v) * v
            g *= np.linalg.norm(v) / np.linalg.norm(g)
            vp = c * v + np.sqrt(1.0 - c * c) * g
            clones.append((1_000_000 + r.vec_id, [float(x) for x in vp]))
        extra = spark.createDataFrame(
            clones, "vec_id bigint, embedding array<double>"
        )
        base = emb.select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        return base.unionByName(extra).repartition(int(cpus) * 4)
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

    # --- production-threshold recall on planted ground truth ----------
    pc = planted_corpus().persist()
    np_ = pc.count()
    thr = 0.85
    exact = {
        (r.vec_a, r.vec_b)
        for r in SIM.cosine_dup_pairs_exact(pc, thr)
        .select("vec_a", "vec_b")
        .collect()
    }
    planted = {}
    for label, sbits in (("auto", None), ("no_suffix", 0)):
        lsh = {
            (r.vec_a, r.vec_b)
            for r in SIM.cosine_dup_pairs(pc, thr, suffix_bits=sbits)
            .select("vec_a", "vec_b")
            .collect()
        }
        release_session_caches(spark)
        pc.persist()  # release clears it; re-pin for the next variant
        assert lsh <= exact
        planted[label] = {
            "suffix_bits": SIM.rh_suffix_bits(np_, SIM.rh_rows_for(thr))
            if sbits is None
            else sbits,
            "n_pairs": len(lsh),
            "recall": round(len(lsh) / len(exact), 4) if exact else None,
            "precision": 1.0,
        }
    results["planted_0.85"] = {
        "n_vectors": np_,
        "n_exact_pairs": len(exact),
        **planted,
    }
    print(f"planted thr=0.85: exact={len(exact)} " + json.dumps(planted), flush=True)

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out_path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
