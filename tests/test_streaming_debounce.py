"""Per-key debounce/throttle: the emission anchor is the previous
EMISSION (keyed state), verified across micro-batch boundaries and
against the batch twin that the DuckDB oracle value-verifies."""

from __future__ import annotations

import datetime as dt

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def ts(s):
    return T0 + dt.timedelta(seconds=s)


SCHEMA = "user_id long, ts timestamp, event_type string"


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(str(path))


def test_streaming_debounce_anchors_on_emission(spark, tmp_path):
    from sfs3_kinesis_spark.streaming.debounce import debounce

    src = tmp_path / "in"
    src.mkdir()
    # batch 1: a burst spaced 4 s apart under a 10 s cooldown —
    # events at 0,4,8 collapse to the one at 0; 12 re-arms (12 >= 0+10)
    _write(
        spark,
        src,
        [(1, ts(0), "err"), (1, ts(4), "err"), (1, ts(8), "err"), (1, ts(12), "err"),
         (2, ts(1), "warn")],
    )
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        debounce(stream, cooldown_ms=10_000)
        .writeStream.format("memory")
        .queryName("deb")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {(r.user_id, r.ts) for r in spark.sql("SELECT * FROM deb").collect()}
        assert got == {(1, ts(0)), (1, ts(12)), (2, ts(1))}

        # batch 2: state crosses the micro-batch boundary — 20 is
        # inside the cooldown of the LAST EMISSION (12+10=22), so it
        # is suppressed even though batch 1 ended; 25 re-arms.
        # A fixed-bucket throttle or LAG-based filter would emit 20.
        _write(spark, src, [(1, ts(20), "err"), (1, ts(25), "err")])
        q.processAllAvailable()
        got = {(r.user_id, r.ts) for r in spark.sql("SELECT * FROM deb").collect()}
        assert (1, ts(20)) not in got
        assert (1, ts(25)) in got
    finally:
        q.stop()


def test_debounce_streaming_matches_batch_twin(spark, tmp_path):
    """Single-batch replay: the streaming tier over one micro-batch
    must equal the batch twin (shared _emit_fold recurrence), which
    is itself value-verified by the recursive-CTE oracle
    (events_debounce_throttle)."""
    from sfs3_kinesis_spark.streaming.debounce import debounce, debounce_batch

    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("user_id", "ts", "event_type")
        .limit(2000)
    )
    src = tmp_path / "in"
    src.mkdir()
    events.coalesce(1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        debounce(stream, cooldown_ms=300_000)
        .writeStream.format("memory")
        .queryName("deb_twin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        via_stream = {
            (r.user_id, r.ts, r.event_type)
            for r in spark.sql("SELECT * FROM deb_twin").collect()
        }
    finally:
        q.stop()
    via_batch = {
        (r.user_id, r.ts, r.event_type)
        for r in debounce_batch(events, cooldown_ms=300_000).collect()
    }
    assert via_stream == via_batch and len(via_batch) > 0
