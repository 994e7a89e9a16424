"""Streaming windowed aggregation + watermark semantics (SURVEY.md
W3/W4) and incremental-pipeline checkpoint/restart (W6).

These use event-time-only operators (no processing-time timers), so
``processAllAvailable`` is a safe synchronous drain — batches are
driven by writing files between drains.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sfs3_kinesis_spark.streaming.windows import status_counts

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


EVENT_SCHEMA = "txn_id string, status string, event_time timestamp"


def _write(spark, path, rows):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(str(path))


def test_tumbling_counts_and_late_drop(spark, tmp_path):
    """Append-mode tumbling counts: windows emit once the watermark
    passes; an event older than the watermark is dropped (the
    engine's principled form of the reference's orphan-drop policy,
    svckinesis.js:178-181)."""
    src_dir = tmp_path / "events"
    src_dir.mkdir()
    _write(
        spark,
        src_dir,
        [
            ("t1", "SUCCEEDED", ts(0)),
            ("t2", "SUCCEEDED", ts(0.5)),
            ("t3", "FAILED", ts(1.2)),
        ],
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(str(src_dir))
    out = status_counts(stream, window="1 minute", watermark="5 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # nothing final yet: watermark hasn't passed any window end
        assert spark.sql("SELECT * FROM win_counts").count() == 0

        # batch 2: event far in the future pushes the watermark past
        # the first windows -> they finalize and emit
        _write(spark, src_dir, [("t9", "SUCCEEDED", ts(30))])
        q.processAllAvailable()

        # batch 3: a late SUCCEEDED event for the (closed) first
        # window, beyond the watermark -> silently dropped
        _write(spark, src_dir, [("t-late", "SUCCEEDED", ts(0.1))])
        q.processAllAvailable()
        # batch 4: push watermark far enough to close everything else
        _write(spark, src_dir, [("t10", "SUCCEEDED", ts(90))])
        q.processAllAvailable()

        rows = {
            (r["window_start"], r["status"]): r["n"]
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
    finally:
        q.stop()

    # first window counted only the two on-time SUCCEEDED rows — the
    # late t-late row did NOT bump the finalized count
    assert rows[(ts(0), "SUCCEEDED")] == 2
    assert rows[(ts(1), "FAILED")] == 1
    assert (ts(0), "FAILED") not in rows


def test_streaming_counts_match_batch_twin(spark, tmp_path):
    """The streaming plan and the batch plan are the same Catalyst
    plan — totals must agree exactly once all windows close."""
    src_dir = tmp_path / "events2"
    src_dir.mkdir()
    rows = [(f"t{i}", "SUCCEEDED" if i % 3 else "FAILED", ts(i * 0.7)) for i in range(30)]
    _write(spark, src_dir, rows)

    batch = spark.createDataFrame(rows, EVENT_SCHEMA)
    expected = {
        (r["window_start"], r["status"]): r["n"]
        for r in status_counts(batch, window="1 minute").collect()
    }

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(str(src_dir))
    q = (
        status_counts(stream, window="1 minute", watermark="1 minute")
        .writeStream.format("memory")
        .queryName("win_twin")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        _write(spark, src_dir, [("t-close", "SUCCEEDED", ts(600))])  # close all windows
        q.processAllAvailable()
        got = {
            (r["window_start"], r["status"]): r["n"]
            for r in spark.sql("SELECT * FROM win_twin").collect()
        }
    finally:
        q.stop()
    # every original window matches the batch twin (the closer event's
    # own window may not have emitted yet — that's watermark semantics)
    for k, v in expected.items():
        assert got.get(k) == v, (k, v, got.get(k))


def test_incremental_pipeline_checkpoint_restart(spark, tmp_path):
    """W6: stop the streaming pipeline mid-run, restart from the
    checkpoint, feed more requests — no duplicated state rows, new
    txns processed, upsert is idempotent."""
    from sfs3_kinesis_spark.sources.sinks import KeyedUpsertSink
    from sfs3_kinesis_spark.streaming.incremental import IncrementalPipeline

    req_dir = tmp_path / "requests"
    req_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    store = str(tmp_path / "store")

    def write_requests(ids):
        spark.createDataFrame(
            [(str(i), '{"foo": true}') for i in ids], "txn_id string, request string"
        ).coalesce(1).write.mode("append").parquet(str(req_dir))

    def make_stream():
        return spark.readStream.schema("txn_id string, request string").parquet(str(req_dir))

    sink = KeyedUpsertSink(spark, store)
    pipe = IncrementalPipeline(sink)

    write_requests(range(3))
    q = pipe.start(make_stream(), ckpt)
    q.processAllAvailable()
    q.stop()
    first = sink.current().select("txn_id", "status").collect()
    assert len(first) == 3
    assert all(r["status"] == "SUCCEEDED" for r in first)

    # restart from the same checkpoint; feed two more requests
    write_requests(range(3, 5))
    q2 = pipe.start(make_stream(), ckpt)
    q2.processAllAvailable()
    q2.stop()
    final = sink.current().select("txn_id").collect()
    txns = sorted(r["txn_id"] for r in final)
    assert txns == ["0", "1", "2", "3", "4"]  # no dupes, no losses


def test_streaming_session_windows_match_batch(spark, tmp_path):
    """session_window (gap-close) in streaming append mode equals the
    batch plan once the watermark closes the sessions (W4)."""
    from sfs3_kinesis_spark.streaming.windows import session_counts

    src_dir = tmp_path / "sess"
    src_dir.mkdir()
    schema = "user_id long, ts timestamp"
    rows = [
        (1, ts(0)), (1, ts(2)), (1, ts(500)),   # user 1: 2 sessions (gap > 5 min)
        (2, ts(1)),                              # user 2: 1 session
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(str(src_dir))

    batch = session_counts(
        spark.createDataFrame(rows, schema), gap="5 minutes", time_col="ts", key="user_id"
    )
    expected = {(r["user_id"], r["session_start"]): r["n_events"] for r in batch.collect()}
    assert len(expected) == 3

    stream = spark.readStream.schema(schema).parquet(str(src_dir))
    q = (
        session_counts(stream, gap="5 minutes", time_col="ts", key="user_id")
        .writeStream.format("memory")
        .queryName("sess_win")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # close every session: event far past the watermark horizon
        spark.createDataFrame([(9, ts(100000))], schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src_dir))
        q.processAllAvailable()
        got = {
            (r["user_id"], r["session_start"]): r["n_events"]
            for r in spark.sql("SELECT * FROM sess_win").collect()
        }
    finally:
        q.stop()
    for k, v in expected.items():
        assert got.get(k) == v, (k, v, got)


def test_continuous_rollup_updates_in_place(spark, tmp_path):
    """The materialized-rollup write path: a late-arriving second
    batch lands in an already-materialized window and must UPDATE
    that row (merge by window/status key), not append a duplicate."""
    from sfs3_kinesis_spark.sources.sinks import KeyedUpsertSink
    from sfs3_kinesis_spark.streaming.windows import continuous_rollup

    src = tmp_path / "ev"
    src.mkdir()
    _write(spark, src, [("1", "SUCCEEDED", ts(0)), ("2", "FAILED", ts(0.5))])

    sink = KeyedUpsertSink(spark, str(tmp_path / "rollup"), key_col="rollup_key")
    stream = spark.readStream.schema("txn_id string, status string, event_time timestamp").parquet(
        str(src)
    )
    q = continuous_rollup(stream, sink, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        first = {r["rollup_key"]: r["n"] for r in sink.current().collect()}
        assert list(first.values()) == [1, 1] or set(first.values()) == {1}

        # two more SUCCEEDED in the SAME minute window: the succeeded
        # row must update to 3, the failed row stay at 1, total rows 2
        _write(spark, src, [("3", "SUCCEEDED", ts(0.2)), ("4", "SUCCEEDED", ts(0.7))])
        q.processAllAvailable()
        rows = sink.current().collect()
        assert len(rows) == 2
        by_status = {r["status"]: r["n"] for r in rows}
        assert by_status == {"SUCCEEDED": 3, "FAILED": 1}
    finally:
        q.stop()
