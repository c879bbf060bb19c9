"""Streaming: stateful throttle (T2/T3), batch-window fallback, and the
end-to-end micro-batch pipeline with all sinks (T1/T5, S5/S6/S7/S10)."""

from __future__ import annotations

import datetime
import json
import os

import pyspark.sql.functions as F
import pytest

from .conftest import event_json

ALERT_SCHEMA = (
    "event_id string, loc_id string, timestamp timestamp, "
    "alert_type string, priority string, description string"
)


def ts(minute: int, second: int = 0):
    return datetime.datetime(2024, 3, 1, 6, minute, second)


ALERT_ROWS = [
    # key (loc_1, High Temperature): t=0 sent, +60s suppressed, +400s sent
    ("e1", "loc_1", ts(0), "High Temperature", "HIGH", "d1"),
    ("e2", "loc_1", ts(1), "High Temperature", "HIGH", "d2"),
    ("e3", "loc_1", ts(6, 40), "High Temperature", "HIGH", "d3"),
    # CRITICAL bypasses throttling entirely (two in 1 min, both sent)
    ("e4", "loc_1", ts(0), "Sensor Failure", "CRITICAL", "d4"),
    ("e5", "loc_1", ts(1), "Sensor Failure", "CRITICAL", "d5"),
    # different key unaffected
    ("e6", "loc_2", ts(1), "High Temperature", "HIGH", "d6"),
]


def test_throttle_batch_window(spark):
    from iot_real_time_data_pipeline_spark.streaming import throttle_batch_window

    df = spark.createDataFrame(ALERT_ROWS, ALERT_SCHEMA)
    sent = {r.event_id for r in throttle_batch_window(df).collect()}
    # window-aligned: e1 first in [06:00,06:05), e2 suppressed, e3 first
    # in [06:05,06:10); criticals always pass; e6 own key.
    assert sent == {"e1", "e3", "e4", "e5", "e6"}


def test_throttle_stateful_greedy(spark, tmp_path):
    from iot_real_time_data_pipeline_spark.streaming import throttle_alerts_stateful

    src = tmp_path / "alerts_src"
    src.mkdir()
    # one file per micro-batch, ordered -> exercises cross-batch state
    batches = [ALERT_ROWS[:2], ALERT_ROWS[2:4], ALERT_ROWS[4:]]
    for i, rows in enumerate(batches):
        with open(src / f"b{i}.jsonl", "w") as fh:
            for r in rows:
                fh.write(json.dumps({
                    "event_id": r[0], "loc_id": r[1],
                    "timestamp": r[2].isoformat(),
                    "alert_type": r[3], "priority": r[4], "description": r[5],
                }) + "\n")

    stream = (
        spark.readStream.schema(ALERT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        throttle_alerts_stateful(stream)
        .writeStream.format("memory")
        .queryName("throttled")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240), "stream did not finish (host-load timeout, not a data bug)"
    sent = {r.event_id for r in spark.sql("select * from throttled").collect()}
    # exact greedy: e1 sent (t0), e2 suppressed (60s < 5min), e3 sent
    # (400s), criticals e4/e5 always, e6 own key.
    assert sent == {"e1", "e3", "e4", "e5", "e6"}


def test_throttle_stateful_replay_matches_greedy(spark):
    """The batch REPLAY (driver-visible twin of the stateful op) folds
    each key with the exact greedy semantics: same sends as
    test_throttle_stateful_greedy on the same rows, counters out."""
    from iot_real_time_data_pipeline_spark.streaming import (
        throttle_stateful_replay,
    )

    df = spark.createDataFrame(ALERT_ROWS, ALERT_SCHEMA)
    got = {
        (r.loc_id, r.alert_type): (
            r.n_sent, r.n_critical_sent, r.n_suppressed, r.last_sent_at
        )
        for r in throttle_stateful_replay(df).collect()
    }
    assert got == {
        # e1 sent, e2 suppressed (60s), e3 sent (400s >= 300s)
        ("loc_1", "High Temperature"): (2, 0, 1, ts(6, 40)),
        # criticals bypass: both sent
        ("loc_1", "Sensor Failure"): (2, 2, 0, ts(1)),
        ("loc_2", "High Temperature"): (1, 0, 0, ts(1)),
    }


def test_throttle_stateful_replay_boundary_and_critical_refresh(spark):
    """Two edges the counters must pin: (a) a gap of EXACTLY the
    5-minute interval sends (>=, not >) and suppressed alerts do not
    advance last_sent; (b) a CRITICAL bypass REFRESHES last_sent
    (lamda.py:257-261), re-arming the suppression window."""
    from iot_real_time_data_pipeline_spark.streaming import (
        throttle_stateful_replay,
    )

    rows = [
        # key A: t0 send; +299s suppressed; +300s (vs t0 — the
        # suppressed alert left last_sent alone) boundary -> send
        ("a1", "loc_1", ts(0, 0), "High Temperature", "HIGH", "d"),
        ("a2", "loc_1", ts(4, 59), "High Temperature", "HIGH", "d"),
        ("a3", "loc_1", ts(5, 0), "High Temperature", "HIGH", "d"),
        # key B: t0 HIGH send; +100s CRITICAL send refreshes last_sent;
        # +350s HIGH is 250s past the REFRESHED send -> suppressed
        ("b1", "loc_2", ts(0, 0), "Low Water Level", "HIGH", "d"),
        ("b2", "loc_2", ts(1, 40), "Low Water Level", "CRITICAL", "d"),
        ("b3", "loc_2", ts(5, 50), "Low Water Level", "HIGH", "d"),
    ]
    df = spark.createDataFrame(rows, ALERT_SCHEMA)
    got = {
        (r.loc_id, r.alert_type): (r.n_sent, r.n_critical_sent, r.n_suppressed)
        for r in throttle_stateful_replay(df).collect()
    }
    assert got == {
        ("loc_1", "High Temperature"): (2, 0, 1),
        ("loc_2", "Low Water Level"): (2, 1, 1),
    }


def test_throttle_stateful_consecutive_threshold_2(spark, tmp_path):
    """The counter path the reference ships disabled (threshold=1,
    lamda.py:21): at threshold 2 a first hit only arms the counter, the
    second sends and resets it, suppression leaves it untouched."""
    from iot_real_time_data_pipeline_spark.streaming import throttle_alerts_stateful

    rows = [
        ("e1", "loc_1", ts(0), "High Temperature", "HIGH", "d1"),   # arms (1)
        ("e2", "loc_1", ts(1), "High Temperature", "HIGH", "d2"),   # 2 -> send, reset
        ("e3", "loc_1", ts(2), "High Temperature", "HIGH", "d3"),   # suppressed (<5min)
        ("e4", "loc_1", ts(7), "High Temperature", "HIGH", "d4"),   # arms (1)
        ("e5", "loc_1", ts(13), "High Temperature", "HIGH", "d5"),  # 2 -> send
    ]
    src = tmp_path / "thr2_src"
    src.mkdir()
    batches = [rows[:2], rows[2:4], rows[4:]]  # cross-batch state
    for i, batch in enumerate(batches):
        with open(src / f"b{i}.jsonl", "w") as fh:
            for r in batch:
                fh.write(json.dumps({
                    "event_id": r[0], "loc_id": r[1], "timestamp": r[2].isoformat(),
                    "alert_type": r[3], "priority": r[4], "description": r[5],
                }) + "\n")
    stream = (
        spark.readStream.schema(ALERT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        throttle_alerts_stateful(stream, consecutive_threshold=2)
        .writeStream.format("memory")
        .queryName("throttled2")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(480), "stream did not finish (host-load timeout, not a data bug)"
    sent = {r.event_id for r in spark.sql("select * from throttled2").collect()}
    assert sent == {"e2", "e5"}


def _write_batches(src, batches):
    import os
    import time

    src.mkdir()
    now = time.time()
    for i, batch in enumerate(batches):
        path = src / f"b{i}.jsonl"
        with open(path, "w") as fh:
            for r in batch:
                fh.write(json.dumps({
                    "event_id": r[0], "loc_id": r[1], "timestamp": r[2].isoformat(),
                    "alert_type": r[3], "priority": r[4], "description": r[5],
                }) + "\n")
        # FileStreamSource orders files by modification time; files
        # written in the same clock tick would batch in ARBITRARY order
        # under maxFilesPerTrigger=1, so space the mtimes explicitly.
        os.utime(path, (now + i * 10, now + i * 10))


def _run_throttle(spark, src, ckpt, name, **kwargs):
    from iot_real_time_data_pipeline_spark.streaming import throttle_alerts_stateful

    stream = (
        spark.readStream.schema(ALERT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        throttle_alerts_stateful(stream, **kwargs)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(480), "stream did not finish (host-load timeout, not a data bug)"
    return {r.event_id for r in spark.sql(f"select * from {name}").collect()}


def test_throttle_event_time_ttl_evicts_replay_stably(spark, tmp_path):
    """T3 event-time TTL: eviction is a function of EVENT time, so a
    replayed run evicts at the same stream position as the live run.

    With consecutive_threshold=2 an armed-but-unsent counter makes
    eviction observable: e1 arms (loc_1, High Temperature) and sets an
    event-time timeout at t0+1h; two filler batches on another key push
    the watermark past that horizon (watermark advances from the
    previous batch's max event time), so loc_1's state is evicted in
    batch b2 — and e2 at t0+92min then re-ARMS a fresh counter instead
    of firing the old one. Wall-clock TTL could never evict here (the
    whole test runs in seconds), which the processing-clock run proves.
    """
    base = ts(0)

    def at(seconds):
        return base + datetime.timedelta(seconds=seconds)

    rows = [
        ("e1", "loc_1", at(0), "High Temperature", "HIGH", "arm"),
        ("f1", "loc_9", at(4500), "High Temperature", "HIGH", "filler-arms"),
        ("f2", "loc_9", at(5000), "High Temperature", "HIGH", "filler-sends"),
        ("e2", "loc_1", at(5520), "High Temperature", "HIGH", "post-evict"),
    ]
    batches = [rows[:1], rows[1:2], rows[2:3], rows[3:]]

    # Live run: e1 arms; watermark after b1 = 4500-600 = 3900 > 3600 ->
    # loc_1 evicted during b2 (no loc_1 data there); f2 sends (counter
    # 2 on loc_9); e2 re-arms a fresh counter -> NOT sent.
    src1 = tmp_path / "ttl_live"
    _write_batches(src1, batches)
    live = _run_throttle(
        spark, src1, tmp_path / "ttl_ckpt1", "ttl_live",
        consecutive_threshold=2,
    )
    assert live == {"f2"}

    # Replay: identical batches, fresh checkpoint -> identical evictions
    # and identical sends (event-time TTL has no wall-clock input).
    src2 = tmp_path / "ttl_replay"
    _write_batches(src2, batches)
    replay = _run_throttle(
        spark, src2, tmp_path / "ttl_ckpt2", "ttl_replay",
        consecutive_threshold=2,
    )
    assert replay == live

    # Contrast: wall-clock TTL cannot evict inside this compressed
    # replay, so the stale armed counter survives and e2 fires it —
    # the round-3 divergence this round fixed.
    #
    # ProcessingTimeTimeout + availableNow does NOT reliably self-
    # terminate: with wall-clock timeouts registered (1 h out), Spark's
    # shouldRunAnotherBatch keeps scheduling empty timeout-check
    # micro-batches after the data is exhausted (observed: hundreds of
    # empty batches, round-11 triage). So the contrast run polls the
    # sink for the expected decisions and stops the query explicitly —
    # the SEMANTICS (no eviction: e2 fires the stale armed counter) are
    # what this block asserts, not self-termination, which is exactly
    # why ttl_clock="event" is the shipped default for finite replays.
    import time as _time

    from iot_real_time_data_pipeline_spark.streaming import (
        throttle_alerts_stateful,
    )

    src3 = tmp_path / "ttl_proc"
    _write_batches(src3, batches)
    stream3 = (
        spark.readStream.schema(ALERT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src3))
    )
    q3 = (
        throttle_alerts_stateful(
            stream3, consecutive_threshold=2, ttl_clock="processing"
        )
        .writeStream.format("memory")
        .queryName("ttl_proc")
        .option("checkpointLocation", str(tmp_path / "ttl_ckpt3"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    deadline = _time.time() + 480
    proc: set[str] = set()
    while _time.time() < deadline:
        proc = {
            r.event_id
            for r in spark.sql("select * from ttl_proc").collect()
        }
        if proc == {"f2", "e2"} or not q3.isActive:
            break
        _time.sleep(2)
    if q3.isActive:
        q3.stop()
    # Re-collect AFTER the query is fully stopped (ADVICE r11): the poll
    # loop can break on `not q3.isActive` holding a snapshot taken just
    # before the final micro-batch committed, which would flake the
    # assert even though the sink ends up correct.
    proc = {
        r.event_id for r in spark.sql("select * from ttl_proc").collect()
    }
    assert proc == {"f2", "e2"}


def test_jsonl_mirror_holds_flat_lake_rows(spark, tmp_path):
    """S4 — the debug JSONL mirror (producer.py:446-447): with
    ``jsonl_mirror=True`` every flat lake row is also appended as one
    line of line-delimited JSON under lake_jsonl/, field-for-field
    equal to the parquet lake."""
    from iot_real_time_data_pipeline_spark.streaming import run_stream

    src = tmp_path / "events_src"
    src.mkdir()
    wh = str(tmp_path / "wh")
    lines = [
        event_json(event_id="evt_m1", timestamp="2024-03-01T06:01:00Z"),
        event_json(event_id="evt_m2", timestamp="2024-03-01T06:02:00Z"),
    ]
    (src / "f0.jsonl").write_text("\n".join(lines) + "\n")

    q = run_stream(
        spark, str(src), wh, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, jsonl_mirror=True,
    )
    assert q.awaitTermination(480), "stream did not finish (host-load timeout, not a data bug)"

    lake = spark.read.parquet(f"{wh}/lake")
    mirror = spark.read.json(f"{wh}/lake_jsonl")
    assert mirror.count() == lake.count() == 2
    assert {r.event_id for r in mirror.collect()} == {"evt_m1", "evt_m2"}
    # field-for-field: every lake column survives the JSON round-trip
    # (date/timestamp become strings in JSON — compare as strings)
    lk = {r["event_id"]: r.asDict() for r in lake.collect()}
    mr = {r["event_id"]: r.asDict() for r in mirror.collect()}
    # JSON lines omit null fields, so a column absent from the mirror
    # must be all-null in the lake; every present column matches.
    missing = set(lk["evt_m1"]) - set(mr["evt_m1"])
    for col in missing:
        assert all(lk[eid][col] is None for eid in lk), col
    for eid in lk:
        for col, v in lk[eid].items():
            if col in missing:
                continue
            mv = mr[eid].get(col)
            if v is None:
                assert mv is None, (eid, col)
            else:
                assert str(mv)[:10] == str(v)[:10] or mv == v, (eid, col)


@pytest.mark.slow
def test_stream_end_to_end(spark, tmp_path):
    from iot_real_time_data_pipeline_spark.streaming import run_stream

    src = tmp_path / "events_src"
    src.mkdir()
    wh = str(tmp_path / "wh")
    base = datetime.datetime(2024, 3, 1, 6, 0, 0)

    def payload(i, minute, **kw):
        return event_json(
            event_id=f"evt_{i:03d}",
            timestamp=base.replace(minute=minute).isoformat() + "Z",
            **kw,
        )

    # batch 1: 2 valid; batch 2: 1 warning + 1 invalid + garbage;
    # batch 3: replay of evt_001 (must dedup) + 1 new valid
    files = [
        [payload(1, 1), payload(2, 2)],
        [payload(3, 3, sensors={"humidity": 93.0}),
         payload(4, 4, loc_id="loc_9"), "<<garbage>>"],
        [payload(1, 1), payload(5, 5)],
    ]
    for i, lines in enumerate(files):
        (src / f"f{i}.jsonl").write_text("\n".join(lines) + "\n")

    q = run_stream(
        spark, str(src), wh, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    assert q.awaitTermination(480), "stream did not finish (host-load timeout, not a data bug)"

    fact = spark.read.parquet(f"{wh}/star/fact_sensor_readings")
    facts = {r.evt_id for r in fact.collect()}
    # VALID + WARNING reach the fact table; INVALID & garbage don't;
    # the replayed evt_001 loads exactly once.
    assert facts == {"evt_001", "evt_002", "evt_003", "evt_005"}
    assert fact.count() == 4
    ids = [r.fact_id for r in fact.collect()]
    assert len(ids) == len(set(ids))

    lake = spark.read.parquet(f"{wh}/lake")
    assert set(r.validation_status for r in lake.collect()) == {
        "VALID", "WARNING", "INVALID"
    }

    # S5 layout: the lake partitions by (status, loc, DATE) — SURVEY §4's
    # fix for the reference's unprunable S3 keys (lamda.py:365-367).
    import glob

    assert glob.glob(f"{wh}/lake/validation_status=VALID/loc_id_part=loc_1/date=2024-03-01")
    # ... and a date-bounded read prunes statically (partition filter,
    # not a post-scan filter).
    pruned = lake.filter(F.col("date") == "2024-03-01")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "date" in plan.split("PartitionFilters")[1][:200]

    # alerts_sent write-back: every lake row of an event whose alert
    # cleared the throttle records [{type, priority, sent_timestamp}];
    # rows with no sent alerts stay null (the reference's absent key).
    alerts = spark.read.parquet(f"{wh}/alerts")
    sent_ids = {r.event_id for r in alerts.collect()}
    by_event = {r.event_id: r.alerts_sent for r in lake.collect()}
    for eid in sent_ids:
        assert by_event[eid] is not None and '"type":' in by_event[eid]
    for eid, sent in by_event.items():
        if eid not in sent_ids:
            assert sent is None

    # S6 dead letters: error-class partition dirs (errors/json_decode/ ↔
    # errors/processing/), plus the error message and source sequence
    # the reference stores with each record (lamda.py:488-530).
    dead = spark.read.parquet(f"{wh}/dead_letter")
    assert dead.count() == 1
    dl = dead.collect()[0]
    assert dl.error_type == "json_decode_error"
    assert "JSONDecodeError" in dl.error_message
    assert dl.source_seq is not None
    assert glob.glob(f"{wh}/dead_letter/error_type=json_decode_error")

    dim_loc = spark.read.parquet(f"{wh}/star/dim_location")
    assert dim_loc.count() == 1  # loc_1 appended once across batches


def test_session_window_streaming(spark, tmp_path):
    """T6 extension — gap-based event-time session windows."""
    from iot_real_time_data_pipeline_spark.operators.pipeline import process_events
    from iot_real_time_data_pipeline_spark.sources.events import (
        read_raw_events_stream,
    )
    from iot_real_time_data_pipeline_spark.streaming.windows import session_activity

    src = tmp_path / "sess_src"
    src.mkdir()
    base = datetime.datetime(2024, 3, 1, 6, 0, 0)
    lines = [
        event_json(
            event_id=f"evt_{i}",
            timestamp=(base + datetime.timedelta(minutes=m)).isoformat() + "Z",
        )
        for i, m in enumerate([0, 1, 2, 20])
    ]
    (src / "a.jsonl").write_text("\n".join(lines) + "\n")

    stream = read_raw_events_stream(spark, str(src))
    agg = session_activity(process_events(stream), gap="5 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_act")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240), "stream did not finish (host-load timeout, not a data bug)"
    rows = sorted(
        spark.sql("select * from sess_act").collect(),
        key=lambda r: r.session_start,
    )
    # 06:00/06:01/06:02 merge into one session ending 06:02+gap; the
    # 06:20 event is its own session.
    assert len(rows) == 2
    assert rows[0].n_events == 3 and rows[0].session_start.minute == 0
    assert rows[0].session_end.minute == 7  # last event 06:02 + 5 min gap
    assert rows[1].n_events == 1 and rows[1].session_start.minute == 20


def test_windowed_health_streaming(spark, tmp_path):
    """T6 — tumbling event-time window + watermark on the live stream."""
    import json as _json

    from iot_real_time_data_pipeline_spark.sources.events import (
        read_raw_events_stream,
    )
    from iot_real_time_data_pipeline_spark.operators.pipeline import process_events
    from iot_real_time_data_pipeline_spark.streaming.windows import windowed_health

    src = tmp_path / "win_src"
    src.mkdir()
    base = datetime.datetime(2024, 3, 1, 6, 0, 0)
    lines = [
        event_json(event_id=f"evt_{i}", timestamp=(base + datetime.timedelta(minutes=m)).isoformat() + "Z")
        for i, m in enumerate([0, 1, 2, 6, 7])
    ]
    (src / "a.jsonl").write_text("\n".join(lines) + "\n")

    stream = read_raw_events_stream(spark, str(src))
    agg = windowed_health(process_events(stream))
    # complete mode: append would emit a window only after the watermark
    # passes its end, which a single availableNow batch never reaches.
    q = (
        agg.writeStream.format("memory")
        .queryName("win_health")
        .option("checkpointLocation", str(tmp_path / "ckpt_win"))
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240), "stream did not finish (host-load timeout, not a data bug)"
    rows = {r.window_start.minute: r for r in spark.sql("select * from win_health").collect()}
    assert rows[0].n_events == 3 and rows[5].n_events == 2
    assert rows[0].n_invalid == 0
    assert rows[0].avg_temperature == pytest.approx(25.0)


def test_corpus_stream_dedups_and_curates(spark, tmp_path):
    """Streaming curation: cross-batch exact dedup within the watermark,
    the batch pipeline's quality gate + language ID, and a corpus sink
    partitioned by predicted language."""
    import os
    import time

    from iot_real_time_data_pipeline_spark.streaming import run_corpus_stream

    base = datetime.datetime(2024, 3, 1, 6, 0)
    good_en = "the cat and the dog sat in the house of the king"
    good_de = "der hund und die katze sind nicht mit der maus in das haus"
    rows = [
        # b0: one good English doc + a short doc (quality-gated out)
        [(1, good_en, "en", "s1", base),
         (2, "too short", "en", "s1", base)],
        # b1: EXACT duplicate of doc 1 (different id, later ts, same
        # batch-crossing text) -> dropped by watermark dedup; plus a
        # German doc
        [(3, good_en, "en", "s2", base + datetime.timedelta(minutes=1)),
         (4, good_de, "de", "s1", base + datetime.timedelta(minutes=1))],
        # b2: digit flood (quality-gated out)
        [(5, "1 2 3 4 5 6 7 8 9 10 11 12", "en", "s1",
          base + datetime.timedelta(minutes=2))],
    ]
    src = tmp_path / "docs_src"
    src.mkdir()
    now = time.time()
    for i, batch in enumerate(rows):
        p = src / f"b{i}.jsonl"
        with open(p, "w") as fh:
            for doc_id, text, lang, source, ts_ in batch:
                fh.write(json.dumps({
                    "doc_id": doc_id, "text": text, "lang": lang,
                    "source": source, "ingest_ts": ts_.isoformat(),
                }) + "\n")
        os.utime(p, (now + i * 10, now + i * 10))

    q = run_corpus_stream(
        spark, str(src), str(tmp_path / "corpus"), str(tmp_path / "ckpt")
    )
    assert q.awaitTermination(480), "stream did not finish (host-load timeout, not a data bug)"

    out = spark.read.parquet(str(tmp_path / "corpus"))
    got = {r.doc_id: r for r in out.collect()}
    # doc 1 kept; dup doc 3 dropped; short doc 2 and digit-flood doc 5
    # quality-gated; German doc 4 kept with its language detected
    assert set(got) == {1, 4}
    assert got[1].predicted_lang == "en"
    assert got[4].predicted_lang == "de"
    # language is a PARTITION value -> static pruning for readers
    langs = {d for d in os.listdir(tmp_path / "corpus") if d.startswith("predicted_lang=")}
    assert langs == {"predicted_lang=en", "predicted_lang=de"}


def test_corpus_kafka_shaped_records_parse(spark):
    """The Kafka-source contract columns parse into the document stream
    schema with partition-offset traceability, same as the events path."""
    from iot_real_time_data_pipeline_spark.streaming.corpus import (
        parse_kafka_documents,
    )

    payload = json.dumps({
        "doc_id": 7, "text": "hello kafka world", "lang": "en",
        "source": "s1", "ingest_ts": "2024-03-01T06:00:00",
    })
    records = spark.createDataFrame(
        [(bytearray(payload, "utf-8"), 2, 41)],
        "value binary, partition int, offset long",
    )
    out = parse_kafka_documents(records).collect()
    assert len(out) == 1
    r = out[0]
    assert r.doc_id == 7 and r.text == "hello kafka world"
    assert r.source_seq == "2-41"
    assert r.ingest_ts == datetime.datetime(2024, 3, 1, 6, 0)


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join (alert correlation):
    append-mode streaming output must equal the identical plan run in
    batch — and only readings inside the lookback window qualify."""
    import json as _json

    from pyspark.sql import types as T

    from iot_real_time_data_pipeline_spark.streaming.windows import correlate_streams

    base = datetime.datetime(2024, 3, 1, 6, 0, 0)

    def ts(m):
        return (base + datetime.timedelta(minutes=m)).isoformat()

    readings = [
        # (event_id, loc, minute, temp)
        ("r1", "loc_1", 0, 20.0),
        ("r2", "loc_1", 8, 21.0),
        ("r3", "loc_1", 30, 22.0),   # outside any alert's lookback
        ("r4", "loc_2", 9, 30.0),    # right loc_2 window
        ("r5", "loc_2", 11, 31.0),   # after the alert: excluded
    ]
    alerts = [
        # (loc, minute, type)
        ("loc_1", 10, "HIGH_TEMPERATURE"),
        ("loc_2", 10, "LOW_WATER_LEVEL"),
    ]
    r_schema = T.StructType(
        [
            T.StructField("event_id", T.StringType()),
            T.StructField("loc_id", T.StringType()),
            T.StructField("event_ts", T.TimestampType()),
            T.StructField("sensor_temperature", T.DoubleType()),
        ]
    )
    a_schema = T.StructType(
        [
            T.StructField("loc_id", T.StringType()),
            T.StructField("alert_ts", T.TimestampType()),
            T.StructField("alert_type", T.StringType()),
        ]
    )
    rdir, adir = tmp_path / "r_src", tmp_path / "a_src"
    rdir.mkdir(), adir.mkdir()
    (rdir / "r.jsonl").write_text(
        "\n".join(
            _json.dumps(
                {"event_id": e, "loc_id": l, "event_ts": ts(m), "sensor_temperature": t}
            )
            for e, l, m, t in readings
        )
    )
    (adir / "a.jsonl").write_text(
        "\n".join(
            _json.dumps({"loc_id": l, "alert_ts": ts(m), "alert_type": ty})
            for l, m, ty in alerts
        )
    )

    r_stream = spark.readStream.schema(r_schema).json(str(rdir))
    a_stream = spark.readStream.schema(a_schema).json(str(adir))
    q = (
        correlate_streams(r_stream, a_stream)
        .writeStream.format("memory")
        .queryName("corr")
        .option("checkpointLocation", str(tmp_path / "ckpt_corr"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240), "stream did not finish (host-load timeout, not a data bug)"
    got = {
        (r.loc_id, r.alert_type, r.reading_event_id)
        for r in spark.sql("select * from corr").collect()
    }
    assert got == {
        ("loc_1", "HIGH_TEMPERATURE", "r1"),
        ("loc_1", "HIGH_TEMPERATURE", "r2"),
        ("loc_2", "LOW_WATER_LEVEL", "r4"),
    }

    # batch parity: the same function on batch frames gives the same rows
    r_batch = spark.read.schema(r_schema).json(str(rdir))
    a_batch = spark.read.schema(a_schema).json(str(adir))
    batch = {
        (r.loc_id, r.alert_type, r.reading_event_id)
        for r in correlate_streams(r_batch, a_batch).collect()
    }
    assert batch == got


def test_restart_from_checkpoint_is_exactly_once(spark, tmp_path):
    """Stop a running sink and RESTART it from the same checkpoint with
    new source files present: the restarted query must pick up only the
    unseen offsets — no batch-1 reprocessing (no duplicate event_ids in
    the sink), no batch-2 loss. This is the recovery contract every
    production deployment leans on after an executor/driver crash."""
    import json as _json

    src = tmp_path / "restart_src"
    sink = tmp_path / "restart_sink"
    ckpt = tmp_path / "restart_ckpt"
    src.mkdir()

    def write_batch(name: str, ids: range) -> None:
        (src / name).write_text(
            "\n".join(
                _json.dumps(
                    {"event_id": i, "user_id": i % 3, "value": float(i),
                     "ts": "2024-01-01T00:00:00"}
                )
                for i in ids
            )
        )

    schema = "event_id long, user_id long, value double, ts timestamp"

    def start():
        return (
            spark.readStream.schema(schema)
            .json(str(src))
            .writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )

    write_batch("b1.json", range(0, 50))
    q1 = start()
    assert q1.awaitTermination(240), "stream did not finish (host-load timeout, not a data bug)"
    first = spark.read.parquet(str(sink)).count()
    assert first == 50

    write_batch("b2.json", range(50, 80))
    q2 = start()
    assert q2.awaitTermination(240), "stream did not finish (host-load timeout, not a data bug)"

    rows = spark.read.parquet(str(sink)).collect()
    ids = [r.event_id for r in rows]
    assert len(ids) == 80  # batch 1 not reprocessed, batch 2 not lost
    assert len(set(ids)) == 80  # and no duplicates
    assert set(ids) == set(range(80))


def test_lake_compaction_preserves_rows_and_bounds_files(spark, tmp_path):
    """Small-file compaction: a lake written in many appends collapses
    to <= target files per partition with IDENTICAL row content, and a
    second pass is a no-op (idempotent)."""
    from pyspark.sql import functions as F

    from iot_real_time_data_pipeline_spark.operators import maintenance as MX

    root = str(tmp_path / "lake")
    df = spark.range(0, 300).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("part"),
        (F.col("id") * 7).alias("val"),
    )
    # 5 appends x repartition(4) -> up to 20 files per partition dir
    for _ in range(5):
        df.repartition(4).write.mode("append").partitionBy("part").parquet(root)

    before = {r.partition: r.n_files for r in MX.lake_file_stats(spark, root).collect()}
    assert all(n > 1 for n in before.values())
    rows_before = sorted(
        (r.id, r.part, r.val) for r in spark.read.parquet(root).collect()
    )

    report = MX.compact_lake(spark, root, target_files=1)
    assert all(e["action"] == "compacted" for e in report)
    after = {r.partition: r.n_files for r in MX.lake_file_stats(spark, root).collect()}
    assert set(after) == set(before) and all(n == 1 for n in after.values())
    rows_after = sorted(
        (r.id, r.part, r.val) for r in spark.read.parquet(root).collect()
    )
    assert rows_after == rows_before

    # idempotent second pass
    report2 = MX.compact_lake(spark, root, target_files=1)
    assert all(e["action"] == "skip" for e in report2)


def test_hidden_scratch_dirs_invisible_to_lake_readers(spark, tmp_path):
    """The swap protocol's safety premise: a dot-prefixed staging dir
    INSIDE the lake root (where compact_lake stages each partition's
    rewrite) is ignored by Spark's listing, so a concurrent reader
    during the stage phase sees exactly the old rows."""
    from iot_real_time_data_pipeline_spark.operators import maintenance as MX

    root = tmp_path / "lake"
    df = spark.createDataFrame([(i, str(i % 2)) for i in range(20)],
                               "id long, part string")
    df.write.mode("overwrite").partitionBy("part").parquet(str(root))
    before = sorted(r.id for r in spark.read.parquet(str(root)).collect())

    # simulate mid-compaction: a staged rewrite with DIFFERENT rows
    leaf = str(root / "part=0")
    staged = MX._hidden_sibling(leaf, "._compacting")
    spark.createDataFrame([(999, )], "id long").write.mode(
        "overwrite"
    ).parquet(staged)

    during = sorted(r.id for r in spark.read.parquet(str(root)).collect())
    assert during == before  # scratch invisible
    assert MX._leaf_partition_dirs(str(root)) == sorted(
        [str(root / "part=0"), str(root / "part=1")]
    )  # our own listing skips it too


def test_vacuum_lake_removes_only_crash_debris(spark, tmp_path):
    """vacuum_lake deletes leftover hidden scratch dirs from an
    interrupted swap and touches nothing else; dry_run only lists."""
    from iot_real_time_data_pipeline_spark.operators import maintenance as MX

    root = tmp_path / "lake"
    spark.createDataFrame([(i, str(i % 2)) for i in range(10)],
                          "id long, part string").write.mode(
        "overwrite").partitionBy("part").parquet(str(root))
    leaf = str(root / "part=0")
    for suffix in ("._old", "._compacting"):
        d = MX._hidden_sibling(leaf, suffix)
        os.makedirs(d)
        open(os.path.join(d, "junk.parquet"), "w").write("x")
    # a hidden dir NOT from our protocol must survive
    keep = str(root / ".user_notes")
    os.makedirs(keep)

    listed = MX.vacuum_lake(str(root), dry_run=True)
    assert len(listed) == 2 and all("part=0" in p for p in listed)
    assert all(os.path.exists(p) for p in listed)

    removed = MX.vacuum_lake(str(root))
    assert removed == listed
    assert not any(os.path.exists(p) for p in removed)
    assert os.path.exists(keep)
    assert sorted(r.id for r in
                  spark.read.parquet(str(root)).collect()) == list(range(10))


def test_lake_compaction_global_one_job_variant(spark, tmp_path):
    """compact_lake_global: the single-shuffle whole-lake compactor for
    partition-COUNT-bound lakes — identical rows, one file per leaf,
    multi-level hive layout preserved through the root swap."""
    from pyspark.sql import functions as F

    from iot_real_time_data_pipeline_spark.operators import maintenance as MX

    root = str(tmp_path / "lake")
    df = spark.range(0, 240).select(
        F.col("id"),
        (F.col("id") % 2).cast("string").alias("status"),
        (F.col("id") % 3).cast("string").alias("loc"),
        (F.col("id") * 3).alias("val"),
    )
    for _ in range(4):
        df.repartition(4).write.mode("append").partitionBy(
            "status", "loc"
        ).parquet(root)
    rows_before = sorted(
        (r.id, r.status, r.loc, r.val)
        for r in spark.read.parquet(root).collect()
    )
    before = {r.partition: r.n_files
              for r in MX.lake_file_stats(spark, root).collect()}
    assert len(before) == 6 and all(n > 1 for n in before.values())

    rep = MX.compact_lake_global(spark, root, target_files=1)
    assert rep["n_partitions"] == 6
    assert rep["files_before"] == sum(before.values())
    assert rep["files_after"] == 6  # exactly one per leaf

    after = {r.partition: r.n_files
             for r in MX.lake_file_stats(spark, root).collect()}
    assert set(after) == set(before) and all(n == 1 for n in after.values())
    rows_after = sorted(
        (r.id, r.status, r.loc, r.val)
        for r in spark.read.parquet(root).collect()
    )
    assert rows_after == rows_before


def test_scd2_stream_matches_batch_rebuild(spark, tmp_path):
    """Incremental SCD2 maintenance never drifts from the batch
    semantics: after three micro-batches the maintained table equals
    scd2_intervals over the concatenated history."""
    import time

    from iot_real_time_data_pipeline_spark.operators import (
        events_analytics as EA,
    )
    from iot_real_time_data_pipeline_spark.streaming import run_scd2_stream

    base = 1_700_000_000
    batches = [
        # b0: user 10 starts viewing (2 events), user 20 clicks
        [(1, 10, "view", 0), (2, 10, "view", 10), (3, 20, "click", 20)],
        # b1: user 10 flips to click; user 20 extends its click run
        [(4, 10, "click", 30), (5, 20, "click", 40)],
        # b2: user 10 back to view; brand-new user 30
        [(6, 10, "view", 50), (7, 30, "signup", 60)],
    ]
    src = tmp_path / "changes"
    src.mkdir()
    now = time.time()
    for i, batch in enumerate(batches):
        p = src / f"b{i}.jsonl"
        with open(p, "w") as fh:
            for eid, uid, etype, off in batch:
                iso = datetime.datetime.fromtimestamp(
                    base + off, datetime.timezone.utc
                ).isoformat()
                fh.write(json.dumps({
                    "event_id": eid, "user_id": uid,
                    "event_type": etype, "ts": iso,
                }) + "\n")
        os.utime(p, (now + i * 10, now + i * 10))

    dim_dir = str(tmp_path / "dim")
    q = run_scd2_stream(spark, str(src), dim_dir, str(tmp_path / "ckpt"))
    assert q.awaitTermination(480), "stream did not finish (host-load timeout, not a data bug)"

    got = {
        (r.user_id, r.version, r.event_type, r.valid_from_sec,
         r.valid_to_sec, r.n_events, r.is_current)
        for r in spark.read.parquet(dim_dir).collect()
    }
    all_rows = [
        (eid, uid, etype, base + off)
        for b in batches for (eid, uid, etype, off) in b
    ]
    ref_df = spark.createDataFrame(
        all_rows, "event_id long, user_id long, event_type string, ts_sec long"
    )
    want = {
        (r.user_id, r.version, r.event_type, r.valid_from_sec,
         r.valid_to_sec, r.n_events, r.is_current)
        for r in EA.scd2_intervals(ref_df).collect()
    }
    assert got == want
    # spot-pin the interesting geometry: user 10 has 3 versions
    # (view 2 events, click 1, view 1 current), user 20 ONE version
    # spanning both batches (the same-type run merged, n_events 2)
    u10 = sorted(t for t in got if t[0] == 10)
    assert [(t[2], t[5], t[6]) for t in u10] == [
        ("view", 2, 0), ("click", 1, 0), ("view", 1, 1)]
    u20 = [t for t in got if t[0] == 20]
    assert u20 == [(20, 1, "click", base + 20, -1, 2, 1)]


def test_windowed_distinct_hll_streaming_matches_batch_replay(spark, tmp_path):
    """Streaming windowed HLL (T6 extension): distinct loc_ids per
    event-time window via one mergeable 64-register aggregation, and
    a batch replay of the identical rows reproduces the streaming
    partials + estimate bit-for-bit (the sketch is algebraic, so
    micro-batch boundaries cannot change the answer)."""
    import datetime

    from pyspark.sql import functions as F

    from iot_real_time_data_pipeline_spark.operators.pipeline import process_events
    from iot_real_time_data_pipeline_spark.sources.events import (
        read_raw_events_stream,
    )
    from iot_real_time_data_pipeline_spark.streaming.windows import (
        windowed_distinct_hll,
    )

    src = tmp_path / "hll_src"
    src.mkdir()
    base = datetime.datetime(2024, 3, 1, 6, 0, 0)
    lines = []
    # window [06:00, 06:05): locs 1,2,3 (loc_1 twice); window
    # [06:05, 06:10): locs 1,9
    for i, (m, loc) in enumerate(
        [(0, "loc_1"), (1, "loc_2"), (2, "loc_3"), (3, "loc_1"),
         (6, "loc_1"), (7, "loc_9")]
    ):
        lines.append(
            event_json(
                event_id=f"evt_hll_{i}",
                timestamp=(base + datetime.timedelta(minutes=m)).isoformat() + "Z",
                loc_id=loc,
            )
        )
    (src / "a.jsonl").write_text("\n".join(lines) + "\n")

    stream = read_raw_events_stream(spark, str(src))
    agg = windowed_distinct_hll(process_events(stream))
    q = (
        agg.writeStream.format("memory")
        .queryName("win_hll")
        .option("checkpointLocation", str(tmp_path / "ckpt_hll"))
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240), "stream did not finish (host-load timeout, not a data bug)"
    live = {
        r.window_start.minute: r
        for r in spark.sql("select * from win_hll").collect()
    }
    assert set(live) == {0, 5}
    # n=3 and n=2 distincts: linear counting is active (n << m), so the
    # estimate is within a fraction of a unit of the truth
    assert live[0].n_buckets_hit == 3
    assert abs(live[0].hll_estimate - 3) < 0.2
    assert live[5].n_buckets_hit == 2
    assert abs(live[5].hll_estimate - 2) < 0.2

    # batch replay: same (loc_id, event_ts) rows through the SAME
    # operator as a plain frame (watermark is a no-op on batch)
    rows = [
        ("loc_1", base), ("loc_2", base + datetime.timedelta(minutes=1)),
        ("loc_3", base + datetime.timedelta(minutes=2)),
        ("loc_1", base + datetime.timedelta(minutes=3)),
        ("loc_1", base + datetime.timedelta(minutes=6)),
        ("loc_9", base + datetime.timedelta(minutes=7)),
    ]
    bdf = spark.createDataFrame(rows, "loc_id string, event_ts timestamp")
    replay = {
        r.window_start.minute: r
        for r in windowed_distinct_hll(bdf).collect()
    }
    for minute in (0, 5):
        a, b = live[minute], replay[minute]
        assert (a.n_buckets_hit, a.sum_scaled, a.hll_raw_estimate,
                a.hll_estimate) == (
            b.n_buckets_hit, b.sum_scaled, b.hll_raw_estimate, b.hll_estimate
        )


def test_windowed_hist_quantiles_streaming_matches_batch_replay(spark, tmp_path):
    """Streaming per-window percentiles via the fixed-bin histogram
    CDF (one mergeable aggregation; counts are algebraic so
    micro-batch boundaries cannot change the answer): a two-batch file
    stream and a batch replay of the identical rows agree exactly,
    and the estimates match hand-derived bin edges."""
    import datetime
    import json as _json

    from iot_real_time_data_pipeline_spark.streaming.windows import (
        windowed_hist_quantiles,
    )

    base = datetime.datetime(2024, 3, 1, 6, 0, 0)
    # window [06:00,06:05): values 1..10 -> p50 at value 5 (bin 0 at
    # width 8 covers 1..7 with count 7 >= k=5 -> upper 8.0), p90 at
    # k=9 (cum bin1 = 10 -> upper 16.0); window [06:05,06:10):
    # values 100, 300 (clamped into the top bin at n_bins=32 ->
    # upper 32*8=256 for every quantile)
    rows = [(float(v), base + datetime.timedelta(seconds=v)) for v in range(1, 11)]
    rows += [(100.0, base + datetime.timedelta(minutes=6)),
             (300.0, base + datetime.timedelta(minutes=7))]
    src = tmp_path / "hq_src"
    src.mkdir()
    for i, chunk in enumerate((rows[:6], rows[6:])):  # two micro-batches
        (src / f"b{i}.jsonl").write_text(
            "\n".join(
                _json.dumps({"value": v, "event_ts": ts.isoformat()})
                for v, ts in chunk
            )
            + "\n"
        )
    stream = (
        spark.readStream.schema("value double, event_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    agg = windowed_hist_quantiles(stream, "value")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_hq")
        .option("checkpointLocation", str(tmp_path / "ckpt_hq"))
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240), "stream did not finish (host-load timeout, not a data bug)"
    live = {
        r.window_start.minute: r for r in spark.sql("select * from win_hq").collect()
    }
    assert set(live) == {0, 5}
    assert (live[0].n, live[0].p50_upper, live[0].p90_upper, live[0].p99_upper) == (
        10, 8.0, 16.0, 16.0)
    # 100/8=12 (in range), 300 clamps into bin 31 -> p90/p99 upper 256
    assert (live[5].n, live[5].p50_upper, live[5].p99_upper) == (2, 104.0, 256.0)

    # batch replay of the same rows through the SAME operator
    bdf = spark.createDataFrame(rows, "value double, event_ts timestamp")
    replay = {
        r.window_start.minute: r
        for r in windowed_hist_quantiles(bdf, "value").collect()
    }
    for minute in (0, 5):
        a, b = live[minute], replay[minute]
        assert (a.n, a.p50_upper, a.p90_upper, a.p99_upper) == (
            b.n, b.p50_upper, b.p90_upper, b.p99_upper)
