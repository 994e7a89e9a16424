"""transformWithStateInPandas correlator twin — protobuf-gated
equivalence suite (r07 verdict next-round #2).

``google.protobuf`` is absent in this container, so the runtime
tests SKIP with a recorded reason and pass wherever the dependency
exists (the self-closing-gap pattern of the jar-gated Kinesis round
trip).  The contract tests at the bottom run UNCONDITIONALLY: the
module must import cleanly, the probe must record the exact missing
dependency, and the constructors must fail LOUDLY (never silently
fall back) where the runtime is absent.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sfs3_kinesis_spark.streaming import correlate_tws as tws_mod
from sfs3_kinesis_spark.streaming.correlate import OUTPUT_SCHEMA, correlate
from sfs3_kinesis_spark.streaming.correlate_tws import (
    CorrelateProcessor,
    correlate_tws,
    tws_available,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(s: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=s)


def _fixture(spark, tmp_path):
    """The hit/fail/orphan/timeout fixture both operators must agree
    on: three pending requests (one matched OK, one matched FAILED,
    one never completed -> timeout), plus an orphan event."""
    requests = spark.createDataFrame(
        [
            ("t-hit", _ts(0), 3_600_000),
            ("t-fail", _ts(0), 3_600_000),
            ("t-timeout", _ts(0), 2_000),  # 2 s budget -> evicted
        ],
        "txn_id string, submitted_at timestamp, timeout_ms long",
    )
    events = spark.createDataFrame(
        [
            ("t-hit", "SUCCEEDED", _ts(5)),
            ("t-fail", "FAILED", _ts(7)),
            ("t-orphan", "SUCCEEDED", _ts(9)),
        ],
        "txn_id string, status string, event_time timestamp",
    )
    return requests, events


def _run_to_outcomes(spark, tmp_path, build, n_expected: int) -> dict:
    from sfs3_kinesis_spark.sources.sinks import run_stateful_to_memory, wait_for_rows
    from sfs3_kinesis_spark.sources.stream import stream_from_batch
    from sfs3_kinesis_spark.streaming.correlate import unioned_input

    requests, events = _fixture(spark, tmp_path)
    merged = unioned_input(requests, events)
    stream = stream_from_batch(merged, str(tmp_path))
    out = build(
        stream.filter(F.col("kind") == "request").select(
            "txn_id", F.col("ts").alias("submitted_at"), "timeout_ms"
        ),
        stream.filter(F.col("kind") == "event").select(
            "txn_id", "status", F.col("ts").alias("event_time")
        ),
    )
    name = f"tws_eq_{abs(hash(build)) % 10_000}"
    q = run_stateful_to_memory(out, name)
    try:
        n = wait_for_rows(spark, f"SELECT count(*) FROM {name}", n_expected)
        assert n >= n_expected, f"expected {n_expected} rows, got {n}"
        rows = spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        q.stop()
    return {
        r["txn_id"]: (r["outcome"], r["status"], r["http_code"]) for r in rows
    }


@pytest.mark.skipif(
    not tws_available()[0], reason=tws_available()[1]
)
def test_tws_matches_applyinpandaswithstate_on_same_fixture(spark, tmp_path):
    """Wherever protobuf exists: both operators must produce the
    IDENTICAL outcome map (matched OK / matched FAILED / orphan /
    timeout) on the same fixture."""
    a = _run_to_outcomes(spark, tmp_path / "a", correlate, 4)
    b = _run_to_outcomes(spark, tmp_path / "b", correlate_tws, 4)
    assert a == b
    assert a["t-hit"] == ("matched", "SUCCEEDED", 200)
    assert a["t-fail"] == ("matched", "FAILED", 400)
    assert a["t-orphan"][0] == "orphan"
    assert a["t-timeout"][0] == "timeout"


# ---- unconditional contract tests (run in THIS container) ----


def test_tws_probe_records_the_exact_missing_dependency():
    ok, reason = tws_available()
    if ok:
        assert "protobuf" in reason
    else:
        # the recorded reason must name the dependency AND the
        # documented fallback, so the skip report is actionable
        assert "google.protobuf" in reason
        assert "StateMessage_pb2" in reason
        assert "applyInPandasWithState" in reason


def test_tws_constructors_fail_loudly_when_runtime_absent(spark):
    ok, _ = tws_available()
    if ok:
        pytest.skip("protobuf present — the loud-failure branch is dead here")
    req = spark.createDataFrame(
        [], "txn_id string, submitted_at timestamp, timeout_ms long"
    )
    ev = spark.createDataFrame([], "txn_id string, status string, event_time timestamp")
    with pytest.raises(RuntimeError, match="google.protobuf"):
        correlate_tws(req, ev)
    with pytest.raises(RuntimeError, match="google.protobuf"):
        tws_mod.correlate_tws_event_time(req, ev)


def test_tws_processor_state_machine_logic_without_spark():
    """The processor's keyed logic is plain pandas + the handle
    protocol — drive it with a fake handle so the state machine
    itself (match, orphan, timeout, re-request disarm, stale-timer
    suppression) is exercised IN THIS CONTAINER even though the
    Spark operator that hosts it is protobuf-gated."""
    import pandas as pd

    class FakeValueState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = tuple(v)

        def clear(self):
            self.v = None

    class FakeHandle:
        def __init__(self):
            self.timers = set()

        def getValueState(self, name, schema, ttlDurationMs=None):
            return FakeValueState()

        def registerTimer(self, ms):
            self.timers.add(int(ms))

        def deleteTimer(self, ms):
            self.timers.discard(int(ms))

    class FakeTimerValues:
        def __init__(self, now_ms):
            self.now = now_ms

        def getCurrentProcessingTimeInMs(self):
            return self.now

        def getCurrentWatermarkInMs(self):
            return -1

    class FakeExpired:
        def __init__(self, ms):
            self.ms = ms

        def getExpiryTimeInMs(self):
            return self.ms

    proc = CorrelateProcessor(event_time_timers=False)
    handle = FakeHandle()
    proc.init(handle)

    def batch(rows):
        return pd.DataFrame(
            rows, columns=["txn_id", "kind", "ts", "status", "timeout_ms"]
        )

    # request arms a timer at now + budget
    t_req = pd.Timestamp("2024-01-01 12:00:00")
    out = list(
        proc.handleInputRows(
            ("t-1",),
            iter([batch([("t-1", "request", t_req, None, 2_000)])]),
            FakeTimerValues(1_000_000),
        )
    )
    assert out == []
    assert handle.timers == {1_002_000}

    # a RE-request disarms the stale timer and arms a new one
    list(
        proc.handleInputRows(
            ("t-1",),
            iter([batch([("t-1", "request", t_req, None, 5_000)])]),
            FakeTimerValues(1_500_000),
        )
    )
    assert handle.timers == {1_505_000}

    # the stale (superseded) deadline firing must NOT evict
    assert (
        list(proc.handleExpiredTimer(("t-1",), FakeTimerValues(2_000_000), FakeExpired(1_002_000)))
        == []
    )
    assert proc._pending.exists()

    # matching event -> matched row, state cleared, timer disarmed
    t_ev = pd.Timestamp("2024-01-01 12:00:03")
    out = list(
        proc.handleInputRows(
            ("t-1",),
            iter([batch([("t-1", "event", t_ev, "SUCCEEDED", None)])]),
            FakeTimerValues(2_000_000),
        )
    )
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row["outcome"], row["status"], row["http_code"], row["latency_ms"]) == (
        "matched",
        "SUCCEEDED",
        200,
        3_000,
    )
    assert not proc._pending.exists()
    assert handle.timers == set()

    # event with no pending -> orphan
    out = list(
        proc.handleInputRows(
            ("t-2",),
            iter([batch([("t-2", "event", t_ev, "FAILED", None)])]),
            FakeTimerValues(2_000_000),
        )
    )
    assert out[0].iloc[0]["outcome"] == "orphan"

    # live-deadline expiry -> timeout row + state cleared
    list(
        proc.handleInputRows(
            ("t-3",),
            iter([batch([("t-3", "request", t_req, None, 1_000)])]),
            FakeTimerValues(3_000_000),
        )
    )
    out = list(
        proc.handleExpiredTimer(("t-3",), FakeTimerValues(3_002_000), FakeExpired(3_001_000))
    )
    assert out[0].iloc[0]["outcome"] == "timeout"
    assert not proc._pending.exists()

    # timer with NO state (matched earlier) -> suppressed
    assert (
        list(proc.handleExpiredTimer(("t-3",), FakeTimerValues(3_003_000), FakeExpired(3_001_000)))
        == []
    )

    # output columns line up with the operator schema
    assert list(OUTPUT_SCHEMA.fieldNames()) == [
        "txn_id",
        "outcome",
        "status",
        "http_code",
        "latency_ms",
    ]
