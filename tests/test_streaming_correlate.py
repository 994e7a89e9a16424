"""Streaming correlation operator (reference T12/P6/W3/W5):
hit, failure, orphan, duplicate and timeout semantics.

Drain strategy: with ``ProcessingTimeTimeout`` the engine runs a
micro-batch every trigger to advance the timer clock, so
``processAllAvailable`` never sees an idle source — tests poll the
memory sink for the expected row count instead (wait_for_rows).
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from sfs3_kinesis_spark.sources.sinks import run_stateful_to_memory, wait_for_rows
from sfs3_kinesis_spark.sources.stream import stream_from_batch
from sfs3_kinesis_spark.streaming.correlate import correlate, unioned_input


def _requests_df(spark, rows):
    return spark.createDataFrame(
        rows, "txn_id string, submitted_at timestamp, timeout_ms long"
    )


def _events_df(spark, rows):
    return spark.createDataFrame(rows, "txn_id string, status string, event_time timestamp")


def _correlated(stream):
    return correlate(
        stream.filter(F.col("kind") == "request").select(
            "txn_id", F.col("ts").alias("submitted_at"), "timeout_ms"
        ),
        stream.filter(F.col("kind") == "event").select(
            "txn_id", "status", F.col("ts").alias("event_time")
        ),
    )


@pytest.fixture()
def scenario(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    requests = _requests_df(
        spark,
        [
            ("t-hit", ts(0), 3_600_000),
            ("t-fail", ts(0), 3_600_000),
            ("t-pending", ts(0), 3_600_000),
        ],
    )
    events = _events_df(
        spark,
        [
            ("t-hit", "SUCCEEDED", ts(5)),
            ("t-fail", "FAILED", ts(7)),
            ("t-orphan", "SUCCEEDED", ts(9)),  # no pending request
        ],
    )
    return requests, events, tmp_path


def test_correlation_hit_fail_orphan(spark, scenario):
    requests, events, tmp_path = scenario
    merged = unioned_input(requests, events)
    stream = stream_from_batch(merged, str(tmp_path))
    out = _correlated(stream)
    q = run_stateful_to_memory(out, "corr_out")
    try:
        n = wait_for_rows(spark, "SELECT count(*) FROM corr_out", 3)
        assert n == 3, f"expected 3 output rows, got {n}"
        rows = {r["txn_id"]: r for r in spark.sql("SELECT * FROM corr_out").collect()}
    finally:
        q.stop()

    assert rows["t-hit"]["outcome"] == "matched"
    assert rows["t-hit"]["http_code"] == 200
    assert rows["t-hit"]["latency_ms"] == 5000
    # non-SUCCEEDED completes with 400 (svckinesis.js:97-104)
    assert rows["t-fail"]["outcome"] == "matched"
    assert rows["t-fail"]["http_code"] == 400
    # unknown txn => orphan (svckinesis.js:178-181)
    assert rows["t-orphan"]["outcome"] == "orphan"
    assert rows["t-orphan"]["http_code"] is None
    # pending request with no event emits nothing yet
    assert "t-pending" not in rows


def test_correlation_timeout_and_late_orphan(spark, tmp_path):
    """Request times out (processing-time) → eviction row; a later
    event for it is an orphan (svckinesis.js:80-88 + 178-181)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()

    req = unioned_input(
        _requests_df(spark, [("t-slow", t0, 700)]),  # 0.7 s timeout
        _events_df(spark, []),
    )
    req.write.mode("append").parquet(str(stream_dir))

    stream = spark.readStream.schema(req.schema).parquet(str(stream_dir))
    out = _correlated(stream)
    q = run_stateful_to_memory(out, "corr_timeout")
    try:
        # timer fires ~0.7 s after the request batch registers state
        n = wait_for_rows(spark, "SELECT count(*) FROM corr_timeout", 1, timeout_s=60)
        assert n >= 1, "timeout row never emitted"
        # the late event for the evicted txn must be an orphan
        late = unioned_input(
            _requests_df(spark, []),
            _events_df(spark, [("t-slow", "SUCCEEDED", t0 + dt.timedelta(seconds=2))]),
        )
        late.write.mode("append").parquet(str(stream_dir))
        wait_for_rows(spark, "SELECT count(*) FROM corr_timeout", 2, timeout_s=60)
        rows = spark.sql("SELECT * FROM corr_timeout").collect()
    finally:
        q.stop()

    outcomes = {(r["txn_id"], r["outcome"]) for r in rows}
    assert ("t-slow", "timeout") in outcomes
    assert ("t-slow", "orphan") in outcomes


def test_correlation_throughput_smoke(spark, tmp_path):
    """Engine must sustain >> 3.3 events/s (the reference's polite-
    polling ceiling, BASELINE.md) — 2000 matched pairs through the
    operator in one drain."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    n = 2000
    requests = spark.range(n).select(
        F.concat(F.lit("t-"), F.col("id")).alias("txn_id"),
        F.lit(t0).alias("submitted_at"),
        F.lit(3_600_000).alias("timeout_ms"),
    )
    events = spark.range(n).select(
        F.concat(F.lit("t-"), F.col("id")).alias("txn_id"),
        F.lit("SUCCEEDED").alias("status"),
        (F.unix_timestamp(F.lit(t0)) + 1).cast("timestamp").alias("event_time"),
    )
    merged = unioned_input(requests, events)
    stream = stream_from_batch(merged, str(tmp_path))
    out = _correlated(stream)
    start = time.time()
    q = run_stateful_to_memory(out, "corr_tp")
    try:
        matched = wait_for_rows(
            spark, "SELECT count(*) FROM corr_tp WHERE outcome = 'matched'", n, timeout_s=120
        )
    finally:
        q.stop()
    elapsed = time.time() - start
    assert matched == n
    assert n / elapsed > 33  # 10x the reference ceiling, conservatively


def test_correlation_checkpoint_restart(spark, tmp_path):
    """Keyed state survives stop + restart from checkpoint (W6): a
    request registered before the stop matches an event delivered
    after the restart — exactly once, with the original latency.
    This is the stateful-operator half of the delivery guarantee
    (the pipeline half is
    test_streaming_windows.py::test_incremental_pipeline_checkpoint_restart)."""
    import datetime as dt
    import os
    import time

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    out_dir = str(tmp_path / "out")

    def start(name):
        # memory sink cannot recover from a checkpoint; foreachBatch
        # into parquet is the restartable test sink
        stream = spark.readStream.schema(schema).parquet(str(stream_dir))
        return (
            _correlated(stream)
            .writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(out_dir)
            )
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="200 milliseconds")
            .start()
        )

    def read_out():
        try:
            return spark.read.parquet(out_dir).collect()
        except Exception:
            return []

    phase1 = unioned_input(
        _requests_df(spark, [("t-restart", t0, 3_600_000)]),
        _events_df(spark, []),
    )
    schema = phase1.schema
    phase1.write.mode("append").parquet(str(stream_dir))

    q1 = start("corr_restart1")
    try:
        # wait until the request batch is committed (state persisted)
        deadline = time.time() + 60
        commits = os.path.join(ckpt, "commits")
        while time.time() < deadline and not (
            os.path.isdir(commits) and len(os.listdir(commits)) >= 1
        ):
            time.sleep(0.2)
        assert os.path.isdir(commits) and len(os.listdir(commits)) >= 1
    finally:
        q1.stop()

    # event arrives while the query is DOWN; restart must recover the
    # pending-request state from the checkpoint and match it
    late_event = unioned_input(
        _requests_df(spark, []),
        _events_df(spark, [("t-restart", "SUCCEEDED", t0 + dt.timedelta(seconds=5))]),
    )
    late_event.write.mode("append").parquet(str(stream_dir))

    q2 = start("corr_restart2")
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not read_out():
            time.sleep(0.3)
        assert read_out(), "no output after restart"
        time.sleep(1.0)  # allow a duplicate to surface if one would
        rows = read_out()
    finally:
        q2.stop()

    matched = [r for r in rows if r["txn_id"] == "t-restart"]
    assert len(matched) == 1, f"expected exactly one emission, got {matched}"
    assert matched[0]["outcome"] == "matched"
    assert matched[0]["http_code"] == 200
    assert matched[0]["latency_ms"] == 5000


def test_pydatasource_feeds_correlation_end_to_end(spark, tmp_path):
    """Full path: custom Python DataSource (status_jsonl, paced) →
    correlation state machine → memory sink.  The engine twin of the
    reference's Kinesis-consumer→pending-map→HTTP-response chain
    (svckinesis.js:173-212), with a declarative connector instead of
    a hand-rolled iterator loop."""
    import datetime as dt
    import json

    from sfs3_kinesis_spark.sources import pydatasource
    from sfs3_kinesis_spark.sources.stream import stream_from_batch

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    txns = [f"0x{i:04x}" for i in range(12)]

    # two shards (txn hash-split across them, like Kinesis partition
    # keys) — the correlator must match across BOTH shard cursors
    shard_dir = tmp_path / "status_shards"
    shard_dir.mkdir()
    shards: dict[str, list[tuple[int, str]]] = {"s0.jsonl": [], "s1.jsonl": []}
    for i, txn in enumerate(txns):
        shards[f"s{i % 2}.jsonl"].append((i, txn))
    for name, members in shards.items():
        with open(shard_dir / name, "w") as fh:
            for i, txn in members:
                fh.write(
                    json.dumps(
                        {"txnId": txn, "status": "SUCCEEDED" if i % 4 else "FAILED"}
                    )
                    + "\n"
                )

    pydatasource.register(spark)
    event_stream = (
        spark.readStream.format("status_jsonl")
        .option("path", str(shard_dir))
        .option("maxRecordsPerBatch", "5")
        .load()
        .select(
            "txn_id",
            "status",
            (F.lit(t0) + F.make_interval(secs=F.col("seq"))).alias("event_time"),
        )
    )
    requests = _requests_df(spark, [(txn, t0, 3_600_000) for txn in txns])
    out = correlate(stream_from_batch(requests, tmp_path / "req"), event_stream)
    q = run_stateful_to_memory(out, "pyds_correlated", trigger_ms=200)
    try:
        n = wait_for_rows(
            spark,
            "SELECT count(*) FROM pyds_correlated WHERE outcome = 'matched'",
            12,
            timeout_s=90,
        )
        assert n >= 12
        rows = spark.table("pyds_correlated").collect()
        by_txn = {r.txn_id: r for r in rows if r.outcome == "matched"}
        assert len(by_txn) == 12
        assert by_txn["0x0000"].http_code == 400  # FAILED -> 400
        assert by_txn["0x0001"].http_code == 200
    finally:
        q.stop()


def test_failover_event_path_silent_poller_completes(spark, tmp_path):
    """The polling↔events handoff (svckinesis.js:70-78,126-152,
    r02 verdict next-round #6): the event path never delivers, the
    request times out and is evicted, the POLLING path completes it
    from the process-state store with the same 200 routing — and the
    late event stays an accountable orphan, never a double-complete."""
    import datetime as dt

    from sfs3_kinesis_spark.engine import Engine
    from sfs3_kinesis_spark.streaming.correlate import failover_resolve

    # 1. the pipeline itself finishes the txn (state store says
    # SUCCEEDED) — only the EVENT DELIVERY to the correlator is down
    eng = Engine(spark, str(tmp_path / "eng"))
    q_pipe = eng.start()
    try:
        txn = eng.submit('{"foo": true}')
        assert eng.await_completion(txn, timeout_s=60) == "SUCCEEDED"
    finally:
        q_pipe.stop()

    # 2. the correlator sees the request but no event within budget
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    req = unioned_input(
        _requests_df(spark, [(txn, t0, 700)]),  # 0.7 s budget
        _events_df(spark, []),
    )
    req.write.mode("append").parquet(str(stream_dir))
    stream = spark.readStream.schema(req.schema).parquet(str(stream_dir))
    q = run_stateful_to_memory(_correlated(stream), "corr_failover")
    try:
        n = wait_for_rows(spark, "SELECT count(*) FROM corr_failover", 1, timeout_s=60)
        assert n >= 1, "timeout row never emitted"

        # 3. the handoff: timeout rows + state store -> completed poll
        out = spark.sql("SELECT * FROM corr_failover")
        resolved = {r["txn_id"]: r for r in failover_resolve(out, eng._sink.current()).collect()}
        assert resolved[txn]["outcome"] == "failover"
        assert resolved[txn]["status"] == "SUCCEEDED"
        assert resolved[txn]["http_code"] == 200

        # a txn the pipeline has NOT finished stays timeout
        ghost = spark.createDataFrame(
            [("t-ghost", "timeout", None, None, None)], out.schema
        )
        unresolved = failover_resolve(ghost, eng._sink.current()).collect()[0]
        assert unresolved["outcome"] == "timeout" and unresolved["status"] is None

        # 4. the late event is an orphan in the correlate output —
        # the evicted entry can never double-complete
        late = unioned_input(
            _requests_df(spark, []),
            _events_df(spark, [(txn, "SUCCEEDED", t0 + dt.timedelta(seconds=2))]),
        )
        late.write.mode("append").parquet(str(stream_dir))
        wait_for_rows(spark, "SELECT count(*) FROM corr_failover", 2, timeout_s=60)
        outcomes = {
            (r["txn_id"], r["outcome"])
            for r in spark.sql("SELECT * FROM corr_failover").collect()
        }
        assert (txn, "timeout") in outcomes
        assert (txn, "orphan") in outcomes
        assert (txn, "matched") not in outcomes
    finally:
        q.stop()


def test_failover_running_state_carries_no_http_code(spark):
    """http_code belongs to RESOLVED rows only (ADVICE r03): a txn
    whose state store row is still non-terminal (RUNNING) stays
    outcome='timeout' with a NULL http_code — identical routing to a
    txn with no state row at all; only SUCCEEDED/FAILED map to
    200/400."""
    from sfs3_kinesis_spark.streaming.correlate import OUTPUT_SCHEMA, failover_resolve

    timeouts = spark.createDataFrame(
        [
            ("t-run", "timeout", None, None, None),
            ("t-none", "timeout", None, None, None),
            ("t-ok", "timeout", None, None, None),
            ("t-bad", "timeout", None, None, None),
        ],
        OUTPUT_SCHEMA,
    )
    state = spark.createDataFrame(
        [("t-run", "RUNNING"), ("t-ok", "SUCCEEDED"), ("t-bad", "FAILED")],
        "txn_id string, status string",
    )
    rows = {r["txn_id"]: r for r in failover_resolve(timeouts, state).collect()}
    assert rows["t-run"]["outcome"] == "timeout" and rows["t-run"]["http_code"] is None
    assert rows["t-none"]["outcome"] == "timeout" and rows["t-none"]["http_code"] is None
    assert rows["t-ok"]["outcome"] == "failover" and rows["t-ok"]["http_code"] == 200
    assert rows["t-bad"]["outcome"] == "failover" and rows["t-bad"]["http_code"] == 400


def test_correlate_event_time_deterministic_eviction(spark, tmp_path):
    """Event-time timers (W5 deepened): the request's deadline is
    submitted_at + timeout on the EVENT-TIME axis and fires when the
    WATERMARK crosses it — wall-clock independent, so the eviction
    set is a pure function of the input data.  A later event for the
    evicted txn is an accountable orphan; an in-budget event matches
    normally."""
    import datetime as dt

    from sfs3_kinesis_spark.streaming.correlate import correlate_event_time

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()

    # batch 1: two requests with a 5 s event-time budget, plus an
    # in-budget event for t-fast (matches) — watermark still early
    b1 = unioned_input(
        _requests_df(spark, [("t-fast", t0, 5_000), ("t-slow", t0, 5_000)]),
        _events_df(spark, [("t-fast", "SUCCEEDED", t0 + dt.timedelta(seconds=2))]),
    )
    b1.write.mode("append").parquet(str(stream_dir))

    stream = spark.readStream.schema(b1.schema).parquet(str(stream_dir))
    out = correlate_event_time(
        stream.filter(F.col("kind") == "request").select(
            "txn_id", F.col("ts").alias("submitted_at"), "timeout_ms"
        ),
        stream.filter(F.col("kind") == "event").select(
            "txn_id", "status", F.col("ts").alias("event_time")
        ),
        watermark="1 second",
    )
    q = run_stateful_to_memory(out, "corr_evt")
    try:
        wait_for_rows(spark, "SELECT count(*) FROM corr_evt", 1, timeout_s=60)

        # batch 2: an unrelated far-future event pushes the watermark
        # past t0+5s — t-slow's deadline fires DATA-driven, no sleep
        # arithmetic involved
        b2 = unioned_input(
            _requests_df(spark, []),
            _events_df(spark, [("t-other", "SUCCEEDED", t0 + dt.timedelta(seconds=120))]),
        )
        b2.write.mode("append").parquet(str(stream_dir))
        wait_for_rows(
            spark,
            "SELECT count(*) FROM corr_evt WHERE outcome = 'timeout'",
            1,
            timeout_s=60,
        )

        # batch 3: the late event for the evicted txn -> orphan
        b3 = unioned_input(
            _requests_df(spark, []),
            _events_df(spark, [("t-slow", "SUCCEEDED", t0 + dt.timedelta(seconds=121))]),
        )
        b3.write.mode("append").parquet(str(stream_dir))
        # two orphans total: t-other (batch 2, no pending request) and
        # t-slow's late event after its eviction
        wait_for_rows(
            spark,
            "SELECT count(*) FROM corr_evt WHERE outcome = 'orphan'",
            2,
            timeout_s=60,
        )
        rows = spark.sql("SELECT * FROM corr_evt").collect()
    finally:
        q.stop()

    outcomes = {(r["txn_id"], r["outcome"]) for r in rows}
    assert ("t-fast", "matched") in outcomes
    # regression (pandas GroupState bridge): a matched request's
    # already-armed timer must NOT produce a spurious eviction row
    assert ("t-fast", "timeout") not in outcomes
    assert ("t-slow", "timeout") in outcomes
    assert ("t-slow", "orphan") in outcomes
    assert ("t-slow", "matched") not in outcomes
    # t-other's own event is an orphan too (no pending request)
    assert ("t-other", "orphan") in outcomes


def test_correlate_event_time_backfill_request_behind_watermark(spark, tmp_path):
    """Backfill hazard: a request whose event-time deadline is ALREADY
    below the eviction watermark (the watermark advanced by more than
    the budget between batches — exactly the replay/backfill scenario
    event-time timers exist for).  setTimeoutTimestamp raises on a
    deadline at/under the watermark; the operator must clamp to the
    next watermark tick and evict the stale request as a timeout
    instead of killing the query."""
    import datetime as dt

    from sfs3_kinesis_spark.streaming.correlate import correlate_event_time

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()

    # batch 1: a far-future event drives the watermark way past t0
    b1 = unioned_input(
        _requests_df(spark, []),
        _events_df(spark, [("t-wm", "SUCCEEDED", t0 + dt.timedelta(seconds=600))]),
    )
    b1.write.mode("append").parquet(str(stream_dir))

    stream = spark.readStream.schema(b1.schema).parquet(str(stream_dir))
    out = correlate_event_time(
        stream.filter(F.col("kind") == "request").select(
            "txn_id", F.col("ts").alias("submitted_at"), "timeout_ms"
        ),
        stream.filter(F.col("kind") == "event").select(
            "txn_id", "status", F.col("ts").alias("event_time")
        ),
        watermark="1 second",
    )
    q = run_stateful_to_memory(out, "corr_backfill")
    try:
        wait_for_rows(spark, "SELECT count(*) FROM corr_backfill", 1, timeout_s=60)

        # batch 2: a BACKFILLED request stamped hundreds of seconds
        # behind the watermark with a 5 s budget — its deadline is
        # long past; pre-clamp this crashed the query with
        # INVALID_TIMEOUT_TIMESTAMP
        b2 = unioned_input(
            _requests_df(spark, [("t-stale", t0, 5_000)]),
            _events_df(spark, []),
        )
        b2.write.mode("append").parquet(str(stream_dir))
        q.processAllAvailable()
        assert q.exception() is None, q.exception()

        # batch 3: any event advances the watermark one more tick and
        # fires the clamped timer -> the stale request times out
        b3 = unioned_input(
            _requests_df(spark, []),
            _events_df(spark, [("t-wm2", "SUCCEEDED", t0 + dt.timedelta(seconds=700))]),
        )
        b3.write.mode("append").parquet(str(stream_dir))
        wait_for_rows(
            spark,
            "SELECT count(*) FROM corr_backfill"
            " WHERE outcome = 'timeout' AND txn_id = 't-stale'",
            1,
            timeout_s=60,
        )
    finally:
        q.stop()
