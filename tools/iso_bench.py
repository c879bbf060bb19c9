"""Isolated per-query bench adjudicator (round 12, VERDICT r11 item 1).

Round 11's driver bench recorded four per-query regressions (2-4x vs
round 10) with tight in-session repeats and IDENTICAL plan shapes:
``docs_minhash_lsh_pairs``, ``docs_dedup_funnel``, ``emb_ivf_int8_topk``,
``docs_curation_v2``. Tight repeats rule out a one-off spike but NOT a
sustained host-state shift (the whole r11 bench ran 15+ min on a shared
runner; the trivial control ``docs_exact_dedup`` also doubled). The
in-block readings additionally ride whatever cache state the ~115-item
LLM block accumulated by each query's list position.

This tool removes both confounds: each query runs in its OWN fresh JVM
(subprocess → fresh SparkSession, same configs as bench.py), with the
canonical warm context re-established untimed (corpus tables persisted,
shared near-dup pairs frame primed — both costs bench.py pays and
reports once as ``load_corpus_tables`` / ``prime_neardup_pairs``), then
3 repeats with ``.collect()`` — timed_repeat semantics. The medians are
directly comparable to the ``repeats[query].median`` column of
BENCH_DETAIL_r{10,11}.json.

Usage::

    python tools/iso_bench.py OUT.json q1 q2 ...        # defaults below
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 (default)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The four r11 regressions + two controls: docs_exact_dedup (trivial,
# untouched, also ~2x in r11 → host-noise tracer) and emb_ivf_topk
# (the auto-radius sibling of the regressed fixed-radius int8 variant).
DEFAULT_QUERIES = [
    "docs_minhash_lsh_pairs",
    "docs_dedup_funnel",
    "emb_ivf_int8_topk",
    "docs_curation_v2",
    "docs_exact_dedup",
    "emb_ivf_topk",
]

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {here!r})
name = {name!r}
sf_dir = {sf_dir!r}
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master(f"local[{{cpus}}]")
    .appName(f"iso-{{name}}")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", "64m")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from iot_real_time_data_pipeline_spark import llm_queries as LQ
from iot_real_time_data_pipeline_spark.entrypoints import read_table
from iot_real_time_data_pipeline_spark.operators import dedup as DD

# Canonical warm context, untimed (bench.py reports these costs once
# as load_corpus_tables / prime_neardup_pairs).
for t in ("documents", "embeddings"):
    read_table(spark, sf_dir, t).persist().count()
DD.minhash_lsh_pairs(
    read_table(spark, sf_dir, "documents"), threshold=LQ.JACCARD_THRESHOLD
).persist().count()

fn = LQ.llm_queries()[name]
runs = []
for _ in range(3):
    t0 = time.perf_counter()
    fn(spark, sf_dir).collect()
    runs.append(time.perf_counter() - t0)
runs_sorted = sorted(runs)
print("ISO_RESULT " + json.dumps({{
    "query": name,
    "first": round(runs[0], 3),
    "median": round(runs_sorted[1], 3),
    "min": round(runs_sorted[0], 3),
    "max": round(runs_sorted[2], 3),
}}))
spark.stop()
"""


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "ISO_BENCH.json"
    names = sys.argv[2:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    results: dict[str, dict] = {}
    for name in names:
        script = CHILD.format(here=HERE, name=name, sf_dir=sf_dir)
        proc = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        row = None
        for line in proc.stdout.splitlines():
            if line.startswith("ISO_RESULT "):
                row = json.loads(line[len("ISO_RESULT "):])
        if row is None:
            row = {"query": name, "err": proc.stderr[-2000:]}
        results[name] = row
        print(json.dumps(row), flush=True)

    # Load-average bookends so the record shows the host was quiet.
    try:
        with open("/proc/loadavg") as f:
            results["_loadavg_end"] = f.read().split()[:3]
    except OSError:
        pass
    results["_sf_dir"] = sf_dir
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
