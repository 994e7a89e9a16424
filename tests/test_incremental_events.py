"""Incremental pipeline event side-output (reference T9 + S3op in
streaming mode): terminal SUCCEEDED/FAILED notifications per
micro-batch with idempotent event ids."""

from __future__ import annotations

from pyspark.sql import functions as F

from sfs3_kinesis_spark.operators.pipeline import Step, reference_steps
from sfs3_kinesis_spark.sources.sinks import KeyedUpsertSink
from sfs3_kinesis_spark.streaming.incremental import IncrementalPipeline


def test_incremental_emits_failed_and_succeeded_events(spark, tmp_path):
    req_dir = tmp_path / "req"
    req_dir.mkdir()
    collected: list[tuple[str, str, str]] = []

    def on_events(batch_df, epoch_id):
        collected.extend(
            (r["txn_id"], r["status"], r["event_id"])
            for r in batch_df.select("txn_id", "status", "event_id").collect()
        )

    # fault-inject step C for txn '1' (the reference's per-step catch
    # -> FAILED notification, aprocess.js:111-115)
    steps = reference_steps()
    c = steps[2]
    steps[2] = Step(c.name, c.output_col, c.result, c.gate_on, fail_if=F.col("txn_id") == "1")

    sink = KeyedUpsertSink(spark, str(tmp_path / "store"))
    pipe = IncrementalPipeline(sink, steps=steps, on_events=on_events)

    spark.createDataFrame(
        [(str(i), '{"foo": true}') for i in range(3)], "txn_id string, request string"
    ).coalesce(1).write.mode("append").parquet(str(req_dir))
    stream = spark.readStream.schema("txn_id string, request string").parquet(str(req_dir))
    q = pipe.start(stream, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    by_txn = {t: (s, e) for t, s, e in collected}
    assert by_txn["0"][0] == "SUCCEEDED"
    assert by_txn["1"][0] == "FAILED"
    assert by_txn["2"][0] == "SUCCEEDED"
    # idempotency key: txn/stage — replays dedupe at the sink (W6)
    assert by_txn["1"][1] == "1/step-f"
    # the failed txn's state row records FAILED with no step-c output
    state = {r["txn_id"]: r for r in sink.current().collect()}
    assert state["1"]["status"] == "FAILED"
    assert state["1"]["step_c_output"] is None


def test_upsert_sink_time_travel_and_restart_resume(spark, tmp_path):
    """KeyedUpsertSink: each micro-batch MERGE yields a readable
    snapshot version (time travel), and a NEW sink instance over the
    same path resumes from the on-disk latest instead of version 0
    (restart durability the reference's in-memory map lacks)."""
    from sfs3_kinesis_spark.sources.sinks import KeyedUpsertSink

    path = str(tmp_path / "state")
    sink = KeyedUpsertSink(spark, path, key_col="txn_id")
    b1 = spark.createDataFrame([("a", "RUNNING"), ("b", "RUNNING")], "txn_id string, status string")
    b2 = spark.createDataFrame([("a", "SUCCEEDED")], "txn_id string, status string")
    sink.apply_batch(b1, epoch_id=0)
    sink.apply_batch(b2, epoch_id=1)

    v1 = {r.txn_id: r.status for r in sink.read_version(1).collect()}
    v2 = {r.txn_id: r.status for r in sink.read_version(2).collect()}
    assert v1 == {"a": "RUNNING", "b": "RUNNING"}
    assert v2 == {"a": "SUCCEEDED", "b": "RUNNING"}

    resumed = KeyedUpsertSink(spark, path, key_col="txn_id")
    assert resumed._version == 2
    b3 = spark.createDataFrame([("b", "FAILED")], "txn_id string, status string")
    resumed.apply_batch(b3, epoch_id=2)
    final = {r.txn_id: r.status for r in resumed.current().collect()}
    assert final == {"a": "SUCCEEDED", "b": "FAILED"}


def test_upsert_sink_delta_append_and_compaction(spark, tmp_path):
    """The LSM write path (VERDICT r02 #3): each micro-batch appends
    ONE O(batch) delta dir; every ``compact_every`` versions a
    snapshot folds the tail; time travel stays exact at EVERY
    version, and restart resumes from the mixed snapshot+delta
    layout."""
    import os

    from sfs3_kinesis_spark.sources.sinks import KeyedUpsertSink

    path = str(tmp_path / "state")
    sink = KeyedUpsertSink(spark, path, key_col="k", compact_every=3)
    for i in range(5):
        sink.apply_batch(
            spark.createDataFrame([(f"k{i % 2}", i)], "k string, val int"), epoch_id=i
        )
    dirs = sorted(os.listdir(path))
    assert [d for d in dirs if d.startswith("d")] == ["d1", "d2", "d3", "d4", "d5"]
    # exactly one compaction snapshot (at version 3), NOT one per batch
    assert [d for d in dirs if d.startswith("v")] == ["v3"]
    assert {r.k: r.val for r in sink.current().collect()} == {"k0": 4, "k1": 3}
    # time travel across the compaction boundary
    assert {r.k: r.val for r in sink.read_version(2).collect()} == {"k0": 0, "k1": 1}
    assert {r.k: r.val for r in sink.read_version(4).collect()} == {"k0": 2, "k1": 3}
    resumed = KeyedUpsertSink(spark, path, key_col="k", compact_every=3)
    assert resumed._version == 5
    assert {r.k: r.val for r in resumed.current().collect()} == {"k0": 4, "k1": 3}
    # one more batch crosses the next compaction point
    resumed.apply_batch(
        spark.createDataFrame([("k0", 99)], "k string, val int"), epoch_id=5
    )
    assert sorted(d for d in os.listdir(path) if d.startswith("v")) == ["v3", "v6"]
    assert {r.k: r.val for r in resumed.current().collect()} == {"k0": 99, "k1": 3}


def test_upsert_sink_write_path_never_reads_base(spark, tmp_path):
    """A non-compacting micro-batch write is O(batch): apply_batch
    must not touch ``spark.read`` at all (round 2 re-read and
    rewrote the full snapshot every batch)."""
    from sfs3_kinesis_spark.sources.sinks import KeyedUpsertSink

    path = str(tmp_path / "state")
    sink = KeyedUpsertSink(spark, path, key_col="k", compact_every=100)
    sink.apply_batch(spark.createDataFrame([("a", 1)], "k string, v int"), epoch_id=0)

    class _NoRead:
        def __getattr__(self, name):
            raise AssertionError(f"write path touched spark.{name}")

    real_spark = sink.spark
    sink.spark = _NoRead()
    try:
        sink.apply_batch(
            real_spark.createDataFrame([("b", 2)], "k string, v int"), epoch_id=1
        )
    finally:
        sink.spark = real_spark
    assert {r.k: r.v for r in sink.current().collect()} == {"a": 1, "b": 2}


def test_upsert_sink_schema_evolution_across_compaction(spark, tmp_path):
    """A later micro-batch may carry NEW columns (the reference's
    process documents accrete fields, aprocess.js:57-58): merged
    reads and the compaction fold must evolve the schema — old rows
    get NULLs, no column is dropped, last-writer-wins unchanged."""
    from sfs3_kinesis_spark.sources.sinks import KeyedUpsertSink

    sink = KeyedUpsertSink(spark, str(tmp_path / "st"), key_col="k", compact_every=2)
    sink.apply_batch(
        spark.createDataFrame([("a", "RUNNING")], "k string, status string"),
        epoch_id=0,
    )
    # epoch 1 adds a column AND triggers compaction (2 % 2 == 0)
    sink.apply_batch(
        spark.createDataFrame(
            [("b", "RUNNING", "x")], "k string, status string, extra string"
        ),
        epoch_id=1,
    )
    cur = {r.k: (r.status, r.extra) for r in sink.current().collect()}
    assert cur == {"a": ("RUNNING", None), "b": ("RUNNING", "x")}
    # post-compaction upsert of the OLD schema still merges cleanly
    sink.apply_batch(
        spark.createDataFrame([("a", "SUCCEEDED")], "k string, status string"),
        epoch_id=2,
    )
    cur = {r.k: (r.status, r.extra) for r in sink.current().collect()}
    assert cur == {"a": ("SUCCEEDED", None), "b": ("RUNNING", "x")}


def test_upsert_sink_vacuum_retention(spark, tmp_path):
    """VACUUM: history before the latest compaction anchor is GC'd
    (time travel there forfeited, loudly), everything at or after it
    stays exact, and a restarted sink resumes over the vacuumed
    layout."""
    import pytest

    from sfs3_kinesis_spark.sources.sinks import KeyedUpsertSink

    path = str(tmp_path / "st")
    sink = KeyedUpsertSink(spark, path, key_col="k", compact_every=2)
    for i in range(5):
        sink.apply_batch(
            spark.createDataFrame([(f"k{i % 2}", i)], "k string, val int"), epoch_id=i
        )
    # snapshots at v2, v4; deltas d1..d5
    removed = sink.vacuum()  # default horizon = latest compaction (4)
    assert removed == 5  # d1..d4 + v2
    assert {r.k: r.val for r in sink.current().collect()} == {"k0": 4, "k1": 3}
    assert {r.k: r.val for r in sink.read_version(4).collect()} == {"k0": 2, "k1": 3}
    assert {r.k: r.val for r in sink.read_version(5).collect()} == {"k0": 4, "k1": 3}
    with pytest.raises(ValueError):
        sink.read_version(3).collect()

    resumed = KeyedUpsertSink(spark, path, key_col="k", compact_every=2)
    assert resumed._version == 5
    assert {r.k: r.val for r in resumed.current().collect()} == {"k0": 4, "k1": 3}

    # a horizon with no snapshot anchor below it is refused
    fresh = KeyedUpsertSink(spark, str(tmp_path / "st2"), key_col="k", compact_every=100)
    fresh.apply_batch(spark.createDataFrame([("a", 1)], "k string, v int"), epoch_id=0)
    fresh.apply_batch(spark.createDataFrame([("b", 2)], "k string, v int"), epoch_id=1)
    with pytest.raises(ValueError, match="compact first"):
        fresh.vacuum(keep_from_version=1)


def test_forget_keys_erases_current_and_history(spark, tmp_path):
    """GDPR erasure: forget_keys must remove a subject from the
    CURRENT merged state AND from every time-travel version (a
    tombstone that only masks current reads is not erasure), leave
    all other keys bit-intact at every version, and compose with
    vacuum.  Idempotent: forgetting again removes nothing."""
    from sfs3_kinesis_spark.sources.sinks import KeyedUpsertSink

    path = str(tmp_path / "store")
    sink = KeyedUpsertSink(spark, path, key_col="txn_id", compact_every=2)
    schema = "txn_id string, status string"
    sink.apply_batch(spark.createDataFrame([("a", "RUNNING"), ("b", "RUNNING")], schema), 0)
    sink.apply_batch(spark.createDataFrame([("a", "SUCCEEDED"), ("c", "RUNNING")], schema), 1)
    sink.apply_batch(spark.createDataFrame([("b", "FAILED")], schema), 2)

    removed = sink.forget_keys(["a"])
    assert removed == 3  # v1 snapshot copy + two delta rows (d1, d2)

    # current state: a gone, b/c intact with their latest values
    cur = {r.txn_id: r.status for r in sink.current().collect()}
    assert cur == {"b": "FAILED", "c": "RUNNING"}
    # EVERY historical version is scrubbed too
    for v in range(1, sink._version + 1):
        hist = {r.txn_id for r in sink.read_version(v).collect()}
        assert "a" not in hist, f"version {v} resurrects the forgotten key"
    # version 1 still serves the other keys as of then
    v1 = {r.txn_id: r.status for r in sink.read_version(1).collect()}
    assert v1 == {"b": "RUNNING"}

    # idempotent; DataFrame-typed forget set also accepted
    assert sink.forget_keys(["a"]) == 0
    assert sink.forget_keys(spark.createDataFrame([("zzz",)], ["txn_id"])) == 0

    # erasure survives vacuum + a fresh instance re-scanning disk
    sink.vacuum()
    resumed = KeyedUpsertSink(spark, path, key_col="txn_id", compact_every=2)
    cur2 = {r.txn_id: r.status for r in resumed.current().collect()}
    assert cur2 == {"b": "FAILED", "c": "RUNNING"}


def test_forget_keys_swap_crash_recovery(spark, tmp_path):
    """A crash inside forget_keys' version-directory swap must never
    lose a whole version: on the next instantiation the sink finishes
    the swap — preferring the complete post-erasure ``.tmp`` copy
    (erasure must not un-happen) and restoring ``.old`` only when no
    complete replacement exists; stale leftovers beside an intact
    version are just cleaned up."""
    import os
    import shutil

    from sfs3_kinesis_spark.sources.sinks import KeyedUpsertSink

    path = str(tmp_path / "store")
    sink = KeyedUpsertSink(spark, path, key_col="txn_id", compact_every=100)
    schema = "txn_id string, status string"
    sink.apply_batch(spark.createDataFrame([("a", "RUNNING"), ("b", "RUNNING")], schema), 0)
    sink.apply_batch(spark.createDataFrame([("a", "DONE"), ("c", "RUNNING")], schema), 1)
    d1 = sink._delta_dir(1)

    # crash scenario 1: between the two renames (d -> d.old done,
    # tmp -> d not yet).  tmp holds the complete post-erasure copy.
    scrubbed = spark.read.parquet(d1).filter("txn_id <> 'a'")
    scrubbed.write.mode("overwrite").parquet(d1 + ".tmp")
    os.rename(d1, d1 + ".old")
    resumed = KeyedUpsertSink(spark, path, key_col="txn_id", compact_every=100)
    assert not os.path.exists(d1 + ".tmp") and not os.path.exists(d1 + ".old")
    assert {r.txn_id for r in spark.read.parquet(d1).collect()} == {"b"}
    assert resumed._deltas == [1, 2]

    # crash scenario 2: tmp write died mid-flight (no _SUCCESS) and
    # the original was already moved aside -> the pre-erasure copy
    # comes back (no data loss; the erasure call simply retries).
    os.rename(d1, d1 + ".old")
    os.makedirs(d1 + ".tmp")  # incomplete: no _SUCCESS marker
    KeyedUpsertSink(spark, path, key_col="txn_id", compact_every=100)
    assert {r.txn_id for r in spark.read.parquet(d1).collect()} == {"b"}
    assert not os.path.exists(d1 + ".tmp") and not os.path.exists(d1 + ".old")

    # crash scenario 3: stale leftovers next to an intact version
    shutil.copytree(d1, d1 + ".old")
    shutil.copytree(d1, d1 + ".tmp")
    KeyedUpsertSink(spark, path, key_col="txn_id", compact_every=100)
    assert not os.path.exists(d1 + ".tmp") and not os.path.exists(d1 + ".old")
    assert {r.txn_id for r in spark.read.parquet(d1).collect()} == {"b"}
