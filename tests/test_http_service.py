"""HTTP ingress/egress (reference S7/S8, pollingsvc.js:126-141):
POST /p1 through a real socket drives the streaming pipeline and the
response code follows the reference's terminal routing — 200
SUCCEEDED / 400 FAILED / 500 budget-lapse — plus the status and
state-document reads."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

from pyspark.sql import functions as F

from sfs3_kinesis_spark.engine import Engine
from sfs3_kinesis_spark.http_service import EngineHttpService
from sfs3_kinesis_spark.operators.pipeline import Step, reference_steps


def _post(url: str, body: bytes):
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/json"}
    )
    try:
        with urllib.request.urlopen(req, timeout=90) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(url: str):
    try:
        with urllib.request.urlopen(url, timeout=30) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_post_terminal_routing(spark, tmp_path):
    # fault-inject step C for poison payloads (the per-step catch →
    # FAILED notification, aprocess.js:111-115)
    steps = reference_steps()
    c = steps[2]
    steps[2] = Step(
        c.name, c.output_col, c.result, c.gate_on,
        fail_if=F.col("request").contains("poison"),
    )
    eng = Engine(spark, str(tmp_path / "eng"), steps=steps)
    q = eng.start()
    svc = EngineHttpService(eng, request_budget_s=60)
    port = svc.start()
    base = f"http://127.0.0.1:{port}"
    try:
        # 200: the reference's curl smoke (README.md:25-28)
        code, body = _post(f"{base}/p1", b'{"foo": true}')
        assert code == 200 and body["status"] == "SUCCEEDED"
        txn_ok = body["txn_id"]

        # 400: pipeline FAILED routes to the error response
        code, body = _post(f"{base}/p1", b'{"poison": true}')
        assert code == 400 and body["status"] == "FAILED"
        txn_bad = body["txn_id"]

        # 400 without ever submitting: malformed JSON body
        code, body = _post(f"{base}/p1", b"this is not json")
        assert code == 400 and "txn_id" not in body

        # async variant: 202 + txn id immediately, then poll /status
        code, body = _post(f"{base}/p1?mode=async", b'{"bar": 1}')
        assert code == 202 and body["status"] == "RUNNING"
        assert eng.await_completion(body["txn_id"], timeout_s=60) == "SUCCEEDED"
        code, sbody = _get(f"{base}/status/{body['txn_id']}")
        assert code == 200 and sbody["status"] == "SUCCEEDED"

        # status / state reads
        code, sbody = _get(f"{base}/status/{txn_bad}")
        assert code == 200 and sbody["status"] == "FAILED"
        code, doc = _get(f"{base}/state/{txn_ok}")
        assert code == 200 and doc["status"] == "SUCCEEDED"
        assert doc["step_f_output"]["downstreamExecutionArn"] == f"downstream:{txn_ok}"
        code, _ = _get(f"{base}/status/0xdoesnotexist")
        assert code == 404
        code, _ = _get(f"{base}/nope")
        assert code == 404
    finally:
        svc.stop()
        eng.stop()


def test_http_budget_lapse_is_500(spark, tmp_path):
    """Pipeline not started: the request budget lapses and the
    response is 500 (sendTimeoutResponse, pollingsvc.js:133)."""
    eng = Engine(spark, str(tmp_path / "eng2"))
    svc = EngineHttpService(eng, request_budget_s=1.0)
    port = svc.start()
    try:
        code, body = _post(f"http://127.0.0.1:{port}/p1", b'{"foo": true}')
        assert code == 500 and body["status"] == "TIMEOUT"
    finally:
        svc.stop()


def test_http_engine_error_is_500_not_dropped_connection(spark, tmp_path):
    """An Engine-verb failure must surface as the contract's 500
    (pollingsvc.js:126-131 routes poll errors to 500), never a closed
    socket with a server-side traceback; a malformed Content-Length
    is a client error (400), not a crash."""
    import socket

    eng = Engine(spark, str(tmp_path / "eng"))
    svc = EngineHttpService(eng)
    port = svc.start()
    base = f"http://127.0.0.1:{port}"
    try:
        def boom(raw):
            raise RuntimeError("state store offline")

        eng.submit = boom
        code, body = _post(f"{base}/p1", b'{"foo": true}')
        assert code == 500 and "state store offline" in body["error"]

        with socket.create_connection(("127.0.0.1", port), timeout=10) as s:
            s.sendall(
                b"POST /p1 HTTP/1.1\r\nHost: x\r\n"
                b"Content-Length: abc\r\nConnection: close\r\n\r\n"
            )
            status_line = s.recv(1024).decode("utf-8", "replace").split("\r\n")[0]
        assert " 400 " in status_line, status_line
    finally:
        svc.stop()
