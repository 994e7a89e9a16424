"""End-to-end service-facade test: the reference's curl smoke
(README.md:25-28 — POST {"foo":true} -> SUCCEEDED) run through
Engine.submit / await_completion / state_document / events."""

from __future__ import annotations

from sfs3_kinesis_spark.engine import Engine


def test_submit_to_succeeded_roundtrip(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "eng"))
    t1 = eng.submit('{"foo": true}')
    t2 = eng.submit('{"bar": 1}')
    q = eng.start()
    try:
        assert eng.await_completion(t1, timeout_s=60) == "SUCCEEDED"
        assert eng.await_completion(t2, timeout_s=60) == "SUCCEEDED"

        # whole-document read: all six stage outputs accreted
        doc = eng.state_document(t1)
        assert doc is not None and doc["status"] == "SUCCEEDED"
        assert doc["step_a_output"]["status"] == "ok"
        assert doc["step_f_output"]["downstreamExecutionArn"] == f"downstream:{t1}"
        assert all(doc[f"step_{s}_output"] is not None for s in "abcdef")
        # late submit while the stream is live is also processed
        t3 = eng.submit('{"baz": [1,2]}')
        q.processAllAvailable()
        assert eng.status(t3) == "SUCCEEDED"

        # status-event log: one idempotent event per txn
        ev = {r["txn_id"]: r for r in eng.events().collect()}
        assert set(ev) == {t1, t2, t3}
        assert all(r["status"] == "SUCCEEDED" for r in ev.values())
        assert ev[t1]["event_id"] == f"{t1}/step-f"
    finally:
        eng.stop()


def test_unknown_txn_and_timeout_paths(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "eng2"))
    assert eng.status("0xdoesnotexist") is None
    # pipeline not started: the request budget lapses (pollingsvc 20 s
    # semantics, shortened for the test)
    t1 = eng.submit('{"foo": true}')
    assert eng.await_completion(t1, timeout_s=1.0, poll_s=0.2) == "TIMEOUT"


def test_event_log_redelivery_is_idempotent(spark, tmp_path):
    """foreachBatch may redeliver an epoch (crash after the event
    write, before the checkpoint commit): the event log is epoch-
    keyed with overwrite semantics, so the replay replaces its own
    output and events() never shows duplicate event_ids."""
    import datetime as dt

    eng = Engine(spark, str(tmp_path / "eng"))
    batch = spark.createDataFrame(
        [("0xaaa", "SUCCEEDED", "0xaaa/step-f", dt.datetime(2024, 1, 1))],
        "txn_id string, status string, event_id string, event_time timestamp",
    )
    eng._append_events(batch, 7)
    eng._append_events(batch, 7)  # the redelivered epoch
    ev = eng.events()
    assert ev.count() == 1
    assert "epoch" not in ev.columns  # bookkeeping stays internal
    eng._append_events(batch.withColumn("event_id", batch.event_id), 8)
    assert eng.events().count() == 2  # distinct epochs still append


def test_concurrent_submits_all_land(spark, tmp_path):
    """Concurrent submit() calls share the ingest directory; without
    serialization Hadoop's shared _temporary staging dir lets one
    job's commit delete another's in-flight files (a lost accepted
    request).  Eight threads x two submits each must all land."""
    import concurrent.futures

    eng = Engine(spark, str(tmp_path / "eng"))
    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        txns = list(ex.map(lambda _: eng.submit('{"n": 1}'), range(16)))
    assert len(set(txns)) == 16
    landed = {
        r.txn_id for r in spark.read.parquet(eng.requests_dir).collect()
    }
    assert landed == set(txns)


def test_empty_steps_rejected_loudly(spark, tmp_path):
    import pytest

    from sfs3_kinesis_spark.operators.pipeline import run_pipeline

    df = spark.createDataFrame([("0x1", "{}")], "txn_id string, request string")
    with pytest.raises(ValueError, match="non-empty"):
        run_pipeline(df, [])
