"""Throttle-under-skew streaming soak (VERDICT r10 item 7): the
SKEW_AB_r10 state probe ran the 90 %-hot-key alert mix through ONE
availableNow pass; this drives the same skew through MANY micro-batches
(maxFilesPerTrigger=1) so cross-batch state chaining is exercised under
the hot key, then asserts the two properties that make the stateful
throttle scale-safe:

1. **State is keyed, not volume-keyed**: the state store's
   ``numRowsTotal`` stays <= distinct (loc_id, alert_type) keys no
   matter how many alerts the hot key absorbs (reference semantics,
   ``Lambda/lamda.py:246-283`` — one (last_sent, counter) pair per key).
2. **Replay parity under skew**: per-key (n_sent, n_suppressed,
   last_sent_at) from the streamed run equals the batch
   ``throttle_stateful_replay`` fold over the same alerts — the greedy
   decisions are identical whether the key's sequence arrives in 30
   micro-batches or one.

Timestamps increase globally across batch files, so per-batch arrival
order equals global (timestamp, event_id) order (the replay's fold
order) and nothing is watermark-late. TTL eviction cannot diverge the
two paths at the shipped CONSECUTIVE_THRESHOLD=1: the suppression
window (300 s) is far inside the TTL (3600 s), so any post-eviction
alert would have been past the suppression window anyway.
"""

from __future__ import annotations

import json
import random

import pytest
from pyspark.sql import functions as F

from iot_real_time_data_pipeline_spark.streaming import (
    throttle_alerts_stateful,
    throttle_stateful_replay,
)

N_BATCHES = 30
EVENTS_PER_BATCH = 2000
HOT_SHARE = 0.9
N_COLD_LOCS = 50
SEED = 20260816

ALERT_SCHEMA = (
    "event_id string, loc_id string, timestamp timestamp, "
    "alert_type string, priority string, description string"
)


def _skewed_alerts() -> list[dict]:
    rng = random.Random(SEED)
    rows = []
    t = 0.0
    for i in range(N_BATCHES * EVENTS_PER_BATCH):
        # strictly increasing: deterministic per-key fold order on both
        # paths; steps 1-30 s keep the hot key mostly inside the 5-min
        # suppression window (the skew stress: ~10 alerts/5min/key hot)
        t += rng.uniform(1.0, 30.0)
        hot = rng.random() < HOT_SHARE
        rows.append(
            {
                "event_id": f"evt_{i:06d}",
                "loc_id": "loc_hot" if hot else f"loc_{rng.randrange(N_COLD_LOCS)}",
                "timestamp": t,
                "alert_type": "High Temperature",
                "priority": "CRITICAL" if rng.random() < 0.02 else "HIGH",
                "description": "skew soak",
            }
        )
    return rows


def _iso(epoch: float) -> str:
    from datetime import datetime, timezone

    return datetime.fromtimestamp(
        1709251200.0 + epoch, tz=timezone.utc
    ).strftime("%Y-%m-%dT%H:%M:%S.%f")


@pytest.mark.slow
@pytest.mark.soak
def test_throttle_skew_soak_state_bounded_and_replay_parity(spark, tmp_path):
    import time

    rows = _skewed_alerts()
    src = tmp_path / "src"
    src.mkdir()
    for b in range(N_BATCHES):
        with open(src / f"b{b:03d}.jsonl", "w") as fh:
            for r in rows[b * EVENTS_PER_BATCH : (b + 1) * EVENTS_PER_BATCH]:
                fh.write(
                    json.dumps({**r, "timestamp": _iso(r["timestamp"])}) + "\n"
                )

    stream = (
        spark.readStream.schema(ALERT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    # recentProgress retains only the last numRecentProgressUpdates
    # entries (default 100) — fine at N_BATCHES=30, but raise it so a
    # future scale-up of the soak can't silently undercount batches and
    # fail the >= N_BATCHES assert below (ADVICE r11).
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates", str(4 * N_BATCHES)
    )
    t0 = time.perf_counter()
    q = (
        throttle_alerts_stateful(stream)
        .writeStream.format("memory")
        .queryName("throttled_skew")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(900)
    wall = time.perf_counter() - t0
    if q.isActive:
        # Timeout: stop the query BEFORE asserting so a failure doesn't
        # leak an active stateful stream + memory sink into the shared
        # spark fixture for subsequent tests (ADVICE r11).
        q.stop()
    assert finished, f"skew soak did not drain within 900s (wall {wall:.0f}s)"

    # --- 1. state bounded by keys, not volume -------------------------
    distinct_keys = len({(r["loc_id"], r["alert_type"]) for r in rows})
    state_rows = None
    n_batches_seen = 0
    for p in q.recentProgress:
        d = p if isinstance(p, dict) else json.loads(p.json)
        if d.get("numInputRows", 0):
            n_batches_seen += 1
        for so in d.get("stateOperators", []):
            state_rows = so.get("numRowsTotal", state_rows)
    assert n_batches_seen >= N_BATCHES  # one file per trigger
    assert state_rows is not None and 0 < state_rows <= distinct_keys, (
        state_rows,
        distinct_keys,
    )

    # --- 2. replay parity: per-key counters + last send ----------------
    sent = spark.sql(
        "select loc_id, alert_type, event_id, sent_timestamp "
        "from throttled_skew"
    ).collect()
    # exactly-once per alert even across 30 stateful batches
    assert len({r.event_id for r in sent}) == len(sent)
    streamed: dict[tuple, list] = {}
    for r in sent:
        streamed.setdefault((r.loc_id, r.alert_type), []).append(r)
    n_alerts_per_key: dict[tuple, int] = {}
    for r in rows:
        k = (r["loc_id"], r["alert_type"])
        n_alerts_per_key[k] = n_alerts_per_key.get(k, 0) + 1

    batch_df = spark.createDataFrame(
        [
            (
                r["event_id"],
                r["loc_id"],
                _iso(r["timestamp"]),
                r["alert_type"],
                r["priority"],
                r["description"],
            )
            for r in rows
        ],
        ALERT_SCHEMA.replace("timestamp timestamp", "timestamp string"),
    ).withColumn("timestamp", F.to_timestamp("timestamp"))
    replay = {
        (r.loc_id, r.alert_type): r
        for r in throttle_stateful_replay(batch_df).collect()
    }
    assert set(replay) == set(n_alerts_per_key)
    for key, rr in replay.items():
        got = streamed.get(key, [])
        assert rr.n_sent == len(got), (key, rr.n_sent, len(got))
        assert rr.n_suppressed == n_alerts_per_key[key] - len(got), key
        if got:
            assert rr.last_sent_at == max(r.sent_timestamp for r in got), key

    # the hot key really is hot AND really is throttled: >= 85 % of its
    # non-critical alerts suppressed (5-min window, ~16 s mean gap)
    hot = replay[("loc_hot", "High Temperature")]
    assert n_alerts_per_key[("loc_hot", "High Temperature")] > 0.85 * len(rows)
    assert hot.n_suppressed > 0.85 * (
        n_alerts_per_key[("loc_hot", "High Temperature")] - hot.n_critical_sent
    )

    # PERF.md evidence line (state rows, wall) — printed for the record
    print(
        f"\nTHROTTLE_SKEW_SOAK n_alerts={len(rows)} batches={N_BATCHES} "
        f"distinct_keys={distinct_keys} state_rows={state_rows} "
        f"wall={wall:.1f}s sent={len(sent)}"
    )
