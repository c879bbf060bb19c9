"""IVF recall one decade further + off the isotropic worst case
(round 12, VERDICT r11 item 5).

Round 11 proved the auto-(bits, radius) pairing at the generated
sf1.0 (20k vectors → (9, 4): recall@3 0.841 vs 0.338 at fixed radius
2, probed-bucket fraction ≤ 0.5). Two open questions:

1. **One decade further**: at sf3.0 (60k vectors) the knob resolves
   to (10, 4) — does recall stay ≥ 0.75 with the probed fraction
   still bounded by the calibrated 0.5?
2. **Off the worst case**: the isotropic random corpus is the sign
   quantizer's stated worst case (every hyperplane splits every
   "cluster" 50/50, so true neighbors land in far buckets at the
   maximum possible rate). Real embedding corpora are CLUSTERED. A
   mixture-of-Gaussians corpus (50 centers, within-cluster spread set
   so nearest neighbors are overwhelmingly same-cluster) measures the
   expected upside where real embeddings live.

For each corpus this runs ``ann_recall_audit`` — the same first-class
oracle-checked audit the engine ships (`similarity.py:1823`) — at the
deployed auto geometry AND at the r10-style fixed radius control,
plus the analytic probed-bucket fraction sum(C(bits,0..r))/2^bits and
the ``ivf_topk`` wall time.

Usage::

    python tools/ivf_recall_study.py SCALE_IVF_r12.json \
        /root/repo/.scaledata/sf1.0 /root/repo/.scaledata/sf3.0
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERY_MOD = 50  # matches the registered emb_* workload (llm_queries.py:24)
K = 3
CLUSTER_CENTERS = 50
CLUSTER_SIGMA = 0.35  # within-cluster spread relative to unit centers


def probed_fraction(bits: int, radius: int) -> float:
    return sum(math.comb(bits, r) for r in range(radius + 1)) / float(2**bits)


def clustered_corpus(spark, n: int, dim: int, seed: int = 20260816):
    """Mixture-of-Gaussians synthetic: unit-norm centers, per-point
    cluster ~ uniform, x = normalize(center + sigma * g). Seeded numpy
    → byte-stable. Same schema as embeddings.parquet."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((CLUSTER_CENTERS, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, CLUSTER_CENTERS, n)
    x = centers[labels] + CLUSTER_SIGMA * rng.standard_normal((n, dim))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    rows = [
        (int(i), [float(v) for v in x[i]], int(labels[i])) for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )


def main() -> int:
    out_path = sys.argv[1]
    sf_dirs = sys.argv[2:]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from iot_real_time_data_pipeline_spark.operators import similarity as SIM
    from iot_real_time_data_pipeline_spark.operators.dedup import (
        release_session_caches,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ivf-recall-study")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def audit(corpus, tag: str) -> dict:
        corpus = corpus.repartition(int(cpus) * 4).persist()
        n = corpus.count()
        queries = corpus.filter(F.col("vec_id") % QUERY_MOD == 0)
        bits = SIM.ivf_bits_for(n)
        auto_r = SIM.ivf_probe_radius_for(bits)
        out: dict = {"n_vectors": n, "bits": bits}
        for label, radius in (("auto", auto_r), ("fixed", SIM.IVF_PROBE_RADIUS)):
            t0 = time.perf_counter()
            rows = SIM.ann_recall_audit(
                corpus, queries, k=K, bits=bits, probe_radius=radius
            ).collect()
            wall = time.perf_counter() - t0
            recall = (
                sum(r.recall_milli for r in rows) / (1000.0 * len(rows))
                if rows
                else None
            )
            # wall time of the deployed query alone (audit pays the
            # exact side too; time the index path separately)
            t0 = time.perf_counter()
            SIM.ivf_topk(corpus, queries, K, bits, radius).collect()
            wall_ivf = time.perf_counter() - t0
            out[label] = {
                "radius": radius,
                "recall_at_3": round(recall, 3) if recall is not None else None,
                "n_queries": len(rows),
                "probed_fraction": round(probed_fraction(bits, radius), 4),
                "audit_wall_s": round(wall, 2),
                "ivf_topk_wall_s": round(wall_ivf, 2),
            }
            print(f"{tag} {label}: " + json.dumps(out[label]), flush=True)
        corpus.unpersist()
        release_session_caches(spark)
        return out

    results: dict = {"k": K, "query_mod": QUERY_MOD, "corpora": {}}

    for sf_dir in sf_dirs:
        label = os.path.basename(sf_dir.rstrip("/"))
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        results["corpora"][f"isotropic_{label}"] = audit(emb, f"isotropic_{label}")

    # Clustered corpus at the sf3-equivalent size (the decade target).
    n_clustered = 60_000
    results["corpora"]["clustered_60k"] = {
        "centers": CLUSTER_CENTERS,
        "sigma": CLUSTER_SIGMA,
        **audit(
            clustered_corpus(spark, n_clustered, SIM.EMB_DIM), "clustered_60k"
        ),
    }

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out_path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
