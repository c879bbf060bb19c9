"""Stateful alert throttle (reference T2/T3, ``Lambda/lamda.py:246-283``).

Semantics, per key ``(loc_id, alert_type)``:

- CRITICAL alerts always send (bypass, lamda.py:257-261);
- otherwise an alert is suppressed if one was sent for the same key less
  than ALERT_INTERVAL (5 min) earlier (lamda.py:264-269);
- a consecutive-hit counter gates the first send; the reference ships
  CONSECUTIVE_RECORDS_THRESHOLD = 1 (lamda.py:21), making the counter
  vestigial — the throttle is purely time-based. We keep the counter so
  the threshold is configurable, defaulting to the reference's 1.
- state TTL: the reference purges entries older than 1 h with
  probability 0.1 per invocation (lamda.py:402-416); the state-store
  timeout makes that deterministic, which is strictly better — and
  with the default event-time timeout (round 4), eviction is pinned to
  the watermark, so replays evict at the same stream position as live.

The clock is the *event* timestamp column, not wall clock, so tests and
replays are deterministic (SURVEY §7.3 "throttle exactness").

Two implementations:

- ``throttle_alerts_stateful``: exact greedy semantics via
  ``applyInPandasWithState`` on a streaming DataFrame. Shuffles by key
  once; state is one (timestamp, int) pair per key — trivially sized
  even with millions of keys.
- ``throttle_batch_window``  : batch approximation — first alert per
  (key, 5-min tumbling window) sends. Same guarantee ("≤1 send per key
  per 5 min") but window-aligned instead of greedy; documented fallback
  for batch backfills.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALERT_INTERVAL_SECONDS = 300.0  # lamda.py:20
CONSECUTIVE_THRESHOLD = 1  # lamda.py:21
STATE_TTL_SECONDS = 3600.0  # lamda.py:408

THROTTLE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("loc_id", T.StringType()),
        T.StructField("alert_type", T.StringType()),
        T.StructField("event_id", T.StringType()),
        T.StructField("priority", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("sent_timestamp", T.TimestampType()),
    ]
)

THROTTLE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_sent_epoch", T.DoubleType()),
        T.StructField("consecutive", T.IntegerType()),
    ]
)


def _make_throttle_group(consecutive_threshold: int, event_time_ttl: bool):
    def _throttle_group(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        loc_id, alert_type = key
        if state.hasTimedOut:
            state.remove()
            return

        last_sent, consecutive = (
            state.get if state.exists else (None, 0)
        )

        rows: list[dict[str, Any]] = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        # event_id tie-break: same-timestamp alerts must throttle in a
        # replay-stable order, not shuffle arrival order.
        batch = batch.sort_values(["timestamp", "event_id"], kind="stable")
        max_seen = None
        for rec in batch.itertuples(index=False):
            now = rec.timestamp.timestamp()
            max_seen = now if max_seen is None else max(max_seen, now)
            send = False
            if rec.priority == "CRITICAL":
                # bypass: sends + refreshes last_sent, but does NOT touch
                # the consecutive counter (lamda.py:257-261).
                send = True
                last_sent = now
            elif last_sent is not None and now - last_sent < ALERT_INTERVAL_SECONDS:
                send = False  # suppressed; counter untouched (lamda.py:264-269)
            else:
                consecutive += 1
                if consecutive >= consecutive_threshold:
                    send = True
                    last_sent = now
                    consecutive = 0
            if send:
                rows.append(
                    {
                        "loc_id": loc_id,
                        "alert_type": alert_type,
                        "event_id": rec.event_id,
                        "priority": rec.priority,
                        "description": rec.description,
                        "sent_timestamp": rec.timestamp,
                    }
                )

        state.update((last_sent, consecutive))
        # Deterministic TTL replacing the reference's probabilistic purge.
        if event_time_ttl:
            # Evict when the WATERMARK passes (last event seen + TTL):
            # a pure function of event time, so a replay/backfill evicts
            # at exactly the same point in the stream as the live run.
            # The watermark guard covers pathological late batches whose
            # horizon would otherwise not be in the future.
            horizon_ms = int((max_seen + STATE_TTL_SECONDS) * 1000)
            state.setTimeoutTimestamp(
                max(horizon_ms, state.getCurrentWatermarkMs() + 1000)
            )
        else:
            state.setTimeoutDuration(int(STATE_TTL_SECONDS * 1000))
        if rows:
            yield pd.DataFrame(
                rows, columns=[f.name for f in THROTTLE_OUTPUT_SCHEMA.fields]
            )

    return _throttle_group


def throttle_alerts_stateful(
    exploded_alerts: DataFrame,
    consecutive_threshold: int = CONSECUTIVE_THRESHOLD,
    ttl_clock: str = "event",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Exact stateful throttle over a *streaming* exploded-alerts frame.

    Input contract: columns (event_id, loc_id, timestamp, alert_type,
    priority, description) — ``operators.pipeline.exploded_alerts``.

    State TTL: the throttle clock is the *event* timestamp, and with
    the default ``ttl_clock="event"`` so is eviction — the state
    timeout is an EventTimeTimeout at (last event seen + 1 h), pinned
    to the watermark (``withWatermark`` is applied here, with
    ``watermark_delay`` bounding how out-of-order alerts may arrive
    before being dropped as late). Replays and backfills therefore
    evict at exactly the same point in the stream as the live run
    (proven by test: a key evicted mid-sequence re-arms its
    consecutive counter identically on replay).

    ``ttl_clock="processing"`` restores round-3 behavior — 1 h of
    wall-clock idleness per key, the deterministic form of the
    reference's probabilistic wall-clock purge (lamda.py:402-416).
    A wall-compressed replay then evicts *later* relative to event
    time than live (only ever retaining suppression state longer,
    never dropping it early); use it only where no watermark can be
    defined. Caveat (round-11 triage): with ProcessingTimeTimeout,
    Spark keeps scheduling empty timeout-check micro-batches after the
    source is exhausted, so an ``availableNow`` run with pending
    wall-clock timeouts may not self-terminate until they fire — for
    finite replays/backfills use the default event-time clock, or stop
    the query explicitly once the sink converges.
    """
    if ttl_clock == "event":
        src = exploded_alerts.withWatermark("timestamp", watermark_delay)
        timeout_conf = GroupStateTimeout.EventTimeTimeout
    elif ttl_clock == "processing":
        src = exploded_alerts
        timeout_conf = GroupStateTimeout.ProcessingTimeTimeout
    else:
        raise ValueError(f"unknown ttl_clock: {ttl_clock!r}")
    return src.groupBy("loc_id", "alert_type").applyInPandasWithState(
        _make_throttle_group(consecutive_threshold, ttl_clock == "event"),
        outputStructType=THROTTLE_OUTPUT_SCHEMA,
        stateStructType=THROTTLE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )


def throttle_stateful_replay(
    exploded_alerts: DataFrame,
    interval_seconds: float = ALERT_INTERVAL_SECONDS,
) -> DataFrame:
    """Batch REPLAY of the exact greedy stateful throttle (T2), per-key
    counters out — the oracle-checkable twin of
    ``throttle_alerts_stateful`` the same way the windowed-HLL batch
    replay twins the streaming sketch.

    Semantics replayed exactly (reference ``Lambda/lamda.py:246-283``
    at its shipped CONSECUTIVE_RECORDS_THRESHOLD = 1, which makes the
    consecutive counter vestigial): per (loc_id, alert_type) in
    (timestamp, event_id) order, an alert SENDS iff it is CRITICAL
    (bypass, refreshing last_sent) or no send happened in the last
    ``interval_seconds``; otherwise it is SUPPRESSED. This greedy fold
    is sequential per key — each decision depends on every prior send —
    so no window function expresses it; instead each key's sequence is
    folded JVM-side with the ``aggregate`` higher-order function (no
    Python UDF, whole fold inside codegen).

    Scale: state is one scalar accumulator per key, but ``collect_list``
    materializes each key's replay sequence on one executor — bounded by
    alerts-per-key *within the replay window*, the same bound the
    streaming operator has per micro-batch. Replaying an unbounded
    history would instead shard the fold by day and chain the carry-out
    last_sent, exactly like the streaming op chains state across
    batches; for the verification-replay use case (a backfill window)
    the direct fold is the right shape.

    Returns one row per key: n_sent, n_critical_sent, n_suppressed,
    last_sent_at.
    """
    seq = exploded_alerts.groupBy("loc_id", "alert_type").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("timestamp").alias("ts"),
                    F.col("event_id").alias("event_id"),
                    F.col("priority").alias("priority"),
                )
            )
        ).alias("seq")
    )
    # acc: (last send epoch-seconds | NULL, sent/critical/suppressed
    # counters, last sent timestamp). Epoch math in DOUBLE on both
    # engines (Spark CAST(ts AS DOUBLE) == DuckDB epoch(ts)), so the
    # >= boundary resolves identically.
    send_cond = (
        "e.priority = 'CRITICAL' OR acc.last IS NULL "
        f"OR CAST(e.ts AS DOUBLE) - acc.last >= {float(interval_seconds)!r}"
    )
    fold = F.expr(
        f"""
        aggregate(
          seq,
          struct(
            CAST(NULL AS DOUBLE) AS last,
            CAST(0 AS BIGINT) AS n_sent,
            CAST(0 AS BIGINT) AS n_crit,
            CAST(0 AS BIGINT) AS n_sup,
            CAST(NULL AS TIMESTAMP) AS last_sent_at
          ),
          (acc, e) -> CASE WHEN {send_cond} THEN struct(
              CAST(e.ts AS DOUBLE) AS last,
              acc.n_sent + CAST(1 AS BIGINT) AS n_sent,
              acc.n_crit + CAST(
                CASE WHEN e.priority = 'CRITICAL' THEN 1 ELSE 0 END
                AS BIGINT) AS n_crit,
              acc.n_sup AS n_sup,
              e.ts AS last_sent_at)
            ELSE struct(
              acc.last AS last,
              acc.n_sent AS n_sent,
              acc.n_crit AS n_crit,
              acc.n_sup + CAST(1 AS BIGINT) AS n_sup,
              acc.last_sent_at AS last_sent_at)
          END
        )
        """
    )
    return seq.withColumn("acc", fold).select(
        "loc_id",
        "alert_type",
        F.col("acc.n_sent").alias("n_sent"),
        F.col("acc.n_crit").alias("n_critical_sent"),
        F.col("acc.n_sup").alias("n_suppressed"),
        F.col("acc.last_sent_at").alias("last_sent_at"),
    )


def throttle_batch_window(exploded_alerts: DataFrame) -> DataFrame:
    """Batch approximation: first alert per (key, 5-min tumbling window).

    CRITICAL alerts bypass entirely. Equivalent rate guarantee to the
    greedy throttle, aligned to window boundaries instead of the last
    send time.
    """
    from pyspark.sql import Window

    critical = exploded_alerts.filter(F.col("priority") == "CRITICAL")
    rest = exploded_alerts.filter(F.col("priority") != "CRITICAL")
    w = Window.partitionBy(
        "loc_id", "alert_type", F.window("timestamp", "5 minutes")
    ).orderBy("timestamp", "event_id")
    first = (
        rest.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    out_cols = ["loc_id", "alert_type", "event_id", "priority", "description",
                F.col("timestamp").alias("sent_timestamp")]
    return critical.select(*out_cols).unionByName(first.select(*out_cols))
