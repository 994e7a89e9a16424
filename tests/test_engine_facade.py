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
