"""Skew stress A/B (VERDICT r9 item 5): measure, don't assert.

Three joins of the same deliberately-skewed data — 90 % of the big
side's rows on ONE key, the rest uniform over ``n_keys`` — against a
small-but-unbroadcastable dimension:

  A. plain sort-merge join, AQE skew handling OFF  (the straggler)
  B. ``functions.skew.salted_join``, AQE OFF       (the manual fix)
  C. plain join, AQE skewJoin ON                   (the default fix)

plus the stateful-throttle state-size probe: a 90 %-skewed alert
stream driven through ``throttle_alerts_stateful``, recording the
state store's ``numRowsTotal`` from the streaming progress — state is
one row per (loc_id, alert_type) KEY, so a hot key adds zero state.

Writes one JSON file (default SKEW_AB_r10.json) with median seconds
per variant; PERF.md quotes it. Run on a quiet host::

    python tools/skew_stress.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BIG = 8_000_000
N_KEYS = 100_000
HOT_SHARE = 0.9
SALT_MOD = 16
REPEATS = 3


def _session(aqe_skew: bool):
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"skew-stress-{aqe_skew}")
        .config("spark.sql.shuffle.partitions", cpus)
        # Force the shuffle join path: broadcasting the dim would hide
        # the skew entirely (and IS the right fix when it fits).
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", str(aqe_skew).lower())
        # AQE partition coalescing stays on in both variants; only the
        # skew-split is A/B'd.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    b.sparkContext.setLogLevel("ERROR")
    return b


def _frames(spark):
    from pyspark.sql import functions as F

    # 90% of rows key 0, the rest uniform over [1, N_KEYS)
    big = spark.range(N_BIG).select(
        F.when(
            F.pmod(F.hash("id"), F.lit(100)) < int(HOT_SHARE * 100), F.lit(0)
        )
        .otherwise(F.pmod(F.hash("id", F.lit(7)), F.lit(N_KEYS - 1)) + 1)
        .cast("long")
        .alias("k"),
        (F.col("id") % 1000).alias("v"),
    )
    small = spark.range(N_KEYS).select(
        F.col("id").alias("k2"), (F.col("id") * 3).alias("w")
    )
    return big, small


def _run(fn) -> float:
    runs = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    runs.sort()
    return round(runs[len(runs) // 2], 3)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def bench_joins() -> dict:
    from pyspark.sql import functions as F

    from iot_real_time_data_pipeline_spark.functions.skew import salted_join

    out: dict[str, float] = {}

    spark = _session(aqe_skew=False)
    big, small = _frames(spark)
    expected = big.join(small, big["k"] == small["k2"]).count()

    out["plain_join_aqe_off"] = _run(
        lambda: _noop(big.join(small, big["k"] == small["k2"]))
    )
    out["salted_join_aqe_off"] = _run(
        lambda: _noop(salted_join(big, small, "k", "k2", salt_mod=SALT_MOD))
    )
    # exactness: the salted join returns the same row multiset
    n_salted = salted_join(big, small, "k", "k2", salt_mod=SALT_MOD).count()
    assert n_salted == expected, (n_salted, expected)
    out["n_joined_rows"] = expected
    spark.stop()

    spark = _session(aqe_skew=True)
    big, small = _frames(spark)
    out["plain_join_aqe_skew_on"] = _run(
        lambda: _noop(big.join(small, big["k"] == small["k2"]))
    )
    # agg control: sum/count over the same skewed key — partial (map-
    # side) aggregation already flattens it, measured to document WHY
    # salted_agg is reserved for non-algebraic paths.
    out["groupby_sum_skewed"] = _run(
        lambda: _noop(big.groupBy("k").agg(F.sum("v").alias("s")))
    )
    from iot_real_time_data_pipeline_spark.functions.skew import salted_agg

    out["salted_agg_sum_skewed"] = _run(
        lambda: _noop(salted_agg(big, ["k"], {"s": ("v", "sum")}))
    )
    spark.stop()
    return out


def bench_throttle_state() -> dict:
    """Skewed alert stream through the EXACT stateful throttle: state
    rows == distinct (loc_id, alert_type) keys, independent of the 90 %
    hot-key mass."""
    import tempfile

    from pyspark.sql import functions as F

    from iot_real_time_data_pipeline_spark.streaming.throttle import (
        throttle_alerts_stateful,
    )

    spark = _session(aqe_skew=True)
    n = 200_000
    n_locs = 100
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "src")
        (
            spark.range(n)
            .select(
                F.concat(F.lit("evt_"), F.col("id")).alias("event_id"),
                F.when(F.pmod(F.hash("id"), F.lit(100)) < 90, F.lit("loc_hot"))
                .otherwise(
                    F.concat(
                        F.lit("loc_"), F.pmod(F.hash("id", F.lit(3)), F.lit(n_locs))
                    )
                )
                .alias("loc_id"),
                F.lit("High Temperature").alias("alert_type"),
                F.lit("HIGH").alias("priority"),
                F.lit("skew probe").alias("description"),
                (
                    F.lit("2024-03-01 00:00:00").cast("timestamp")
                    + F.make_interval(secs=F.col("id") % 86400)
                ).alias("timestamp"),
            )
            .coalesce(4)
            .write.parquet(src)
        )
        stream = spark.readStream.schema(
            "event_id string, loc_id string, alert_type string, "
            "priority string, description string, timestamp timestamp"
        ).parquet(src)
        t0 = time.perf_counter()
        q = (
            throttle_alerts_stateful(stream)
            .writeStream.format("noop")
            .option("checkpointLocation", os.path.join(td, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        wall = round(time.perf_counter() - t0, 3)
        state_rows = None
        for p in q.recentProgress:
            for so in p.get("stateOperators", []) if isinstance(p, dict) else []:
                state_rows = so.get("numRowsTotal", state_rows)
    spark.stop()
    return {
        "n_alerts": n,
        "hot_share": 0.9,
        "distinct_keys": n_locs + 1,
        "state_rows_total": state_rows,
        "wall_sec": wall,
    }


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SKEW_AB_r10.json"
    payload = {
        "n_big": N_BIG,
        "n_keys": N_KEYS,
        "hot_share": HOT_SHARE,
        "salt_mod": SALT_MOD,
        "repeats": REPEATS,
        "joins": bench_joins(),
        "throttle_state": bench_throttle_state(),
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
