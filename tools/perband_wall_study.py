"""Wall-clock side of the round-11 per-band suffix-plane upgrade
(round 12, VERDICT r11 item 4).

LSH_RECALL_r11_perband.json proved the recall side (planted recall at
the production 0.85 threshold: 0.564 shared → 0.903 per-band at
identical expected candidate volume) but recorded no post-change wall
times: with m suffix bits the signature stage now folds
``bands*(rows+m)`` hyperplanes instead of ``bands*rows + m`` — up to
112 vs 64+m dot products per vector. This measures
{shared, per-band} × {wall s, recall, candidates} at each given SF on
the planted-ground-truth corpus (same protocol as
tools/lsh_recall_study.py: perturbed clones of every 20th vector at
exact target cosines 0.86..0.98, seeded).

The "shared" control reconstructs the ROUND-10 band-key layout (one
common suffix pool at planes nbits..nbits+m-1, appended to every
band) purely inside this tool — the product knob was upgraded in
place and does not keep a legacy mode.

Usage::

    python tools/perband_wall_study.py PERBAND_WALL_r12.json \
        /root/repo/.scaledata/sf1.0 /root/repo/.scaledata/sf3.0
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESHOLD = 0.85  # production dedup threshold (rows_per_band = 6)


def main() -> int:
    out_path = sys.argv[1]
    sf_dirs = sys.argv[2:]

    import numpy as np
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from iot_real_time_data_pipeline_spark.operators import similarity as SIM
    from iot_real_time_data_pipeline_spark.operators.dedup import (
        release_session_caches,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("perband-wall-study")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def planted(emb):
        """Clones of every 20th vector at exact cosine 0.86..0.98
        (lsh_recall_study.py protocol, same seed)."""
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
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        return base.unionByName(extra).repartition(int(cpus) * 4)

    def shared_candidate_pairs(embeddings, bands, rows, m):
        """ROUND-10 control: ONE shared suffix pool (planes
        nbits..nbits+m-1) appended to every band key. Measurement-only
        reconstruction of the pre-r11 layout."""
        v = SIM.as_double(F.col("embedding"))
        nbits = bands * rows
        plane_ids = list(range(nbits + m))
        bits = [
            (SIM.dot(v, F.array(*[F.lit(x) for x in SIM.RH_PLANES[i]])) > 0)
            .cast("int")
            .alias(f"b{i}")
            for i in plane_ids
        ]
        sig = embeddings.select(F.col("vec_id"), *bits)
        band_keys = F.array(*[
            F.concat_ws(
                ":",
                F.lit(str(band)),
                *[F.col(f"b{band * rows + r}") for r in range(rows)],
                *[F.col(f"b{nbits + s}") for s in range(m)],
            )
            for band in range(bands)
        ])
        bands_df = sig.select(
            "vec_id", F.explode(band_keys).alias("band_key")
        ).persist()
        x, y = bands_df.alias("x"), bands_df.alias("y")
        return (
            x.join(
                y,
                (F.col("x.band_key") == F.col("y.band_key"))
                & (F.col("x.vec_id") < F.col("y.vec_id")),
            )
            .select(
                F.col("x.vec_id").alias("vec_a"),
                F.col("y.vec_id").alias("vec_b"),
            )
            .distinct()
        )

    results: dict = {"threshold": THRESHOLD, "corpora": {}}
    rows_pb = SIM.rh_rows_for(THRESHOLD)

    for sf_dir in sf_dirs:
        label = os.path.basename(sf_dir.rstrip("/"))
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        pc = planted(emb).persist()
        n = pc.count()
        m = SIM.rh_suffix_bits(n, rows_pb)

        exact = {
            (r.vec_a, r.vec_b)
            for r in SIM.cosine_dup_pairs_exact(pc, THRESHOLD)
            .select("vec_a", "vec_b")
            .collect()
        }
        release_session_caches(spark)
        pc.persist().count()

        entry: dict = {
            "n_vectors": n,
            "suffix_bits": m,
            "rows_per_band": rows_pb,
            "n_exact_pairs": len(exact),
        }
        e = pc.select("vec_id", F.col("embedding").alias("v"))
        for variant in ("per_band", "shared"):
            t0 = time.perf_counter()
            if variant == "per_band":
                cands = SIM.rh_candidate_pairs(pc, SIM.RH_BANDS, rows_pb, m)
            else:
                cands = shared_candidate_pairs(pc, SIM.RH_BANDS, rows_pb, m)
            n_cands = cands.count()
            t_cand = time.perf_counter() - t0
            t0 = time.perf_counter()
            lsh = {
                (r.vec_a, r.vec_b)
                for r in SIM._verified_pairs(e, cands, THRESHOLD)
                .select("vec_a", "vec_b")
                .collect()
            }
            t_verify = time.perf_counter() - t0
            assert lsh <= exact
            entry[variant] = {
                "wall_s": round(t_cand + t_verify, 2),
                "candidate_wall_s": round(t_cand, 2),
                "n_candidates": n_cands,
                "n_pairs": len(lsh),
                "recall": round(len(lsh) / len(exact), 4) if exact else None,
            }
            print(f"{label} {variant}: " + json.dumps(entry[variant]), flush=True)
            release_session_caches(spark)
            pc.persist().count()

        results["corpora"][label] = entry
        pc.unpersist()

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out_path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
