"""Jar-gated REAL-connector integration test (r06 verdict missing #1).

The stub emulator under the identical ``aws-kinesis`` format name
covers option validation, shard routing, LATEST/TRIM_HORIZON,
idempotent commit and resharding (tests/test_sources.py) — but the
actual spark-sql-kinesis connector jar has never executed in this
container (no jar, no network).  This module closes the seam the day
a jar exists:

* the round-trip test SKIPS with a recorded reason when the connector
  class does not resolve on the session's classpath (this container),
  and runs produce -> consume through the REAL connector when it does
  (CI with the jar + localstack, or a real stream);
* the option-contract tests run UNCONDITIONALLY, asserting the
  wrappers' option maps against the connector's documented
  ``kinesis.*`` key names, so a drift in our spelling is caught here
  with no jar at all.

Connector surface per the AWS Labs ``spark-streaming-sql-kinesis-
connector`` docs: format ``aws-kinesis``; reader options
``kinesis.streamName``, ``kinesis.region``,
``kinesis.startingPosition`` (LATEST | TRIM_HORIZON | AT_TIMESTAMP),
``kinesis.consumerType`` (GetRecords | SubscribeToShard),
``kinesis.endpointUrl``; writer options ``kinesis.streamName``,
``kinesis.region``, ``kinesis.endpointUrl``; record schema ``data``
(binary), ``partitionKey``, ``sequenceNumber``,
``approximateArrivalTimestamp``.
"""

from __future__ import annotations

import os
import time
import uuid

import pytest

from sfs3_kinesis_spark.sources.sinks import (
    KINESIS_SINK_FORMAT,
    KINESIS_SINK_PROJECTION,
    kinesis_sink,
    kinesis_writer_options,
)
from sfs3_kinesis_spark.sources.stream import (
    KINESIS_SOURCE_FORMAT,
    kinesis_reader_options,
    kinesis_stream,
    parse_status_events,
)

#: the connector's DataSourceRegister entry points, newest first —
#: resolving ANY of these on the JVM classpath means the real jar is
#: present (the formats register via META-INF/services, but the class
#: probe works without instantiating a stream)
_CONNECTOR_CLASSES = (
    "org.apache.spark.sql.connector.kinesis.KinesisV2TableProvider",
    "org.apache.spark.sql.kinesis.KinesisSourceProvider",
)


def _connector_on_classpath(spark) -> str | None:
    """Return the resolved connector class name, or None (the skip
    reason is derived from this)."""
    jvm = spark.sparkContext._jvm
    for cls in _CONNECTOR_CLASSES:
        try:
            jvm.java.lang.Class.forName(cls)
            return cls
        except Exception:  # noqa: BLE001 — ClassNotFound via py4j
            continue
    return None


def test_reader_options_match_connector_documented_names():
    opts = kinesis_reader_options(
        "status-stream", region="eu-west-1",
        starting_position="TRIM_HORIZON", endpoint_url="http://localhost:4566",
    )
    assert opts == {
        "kinesis.streamName": "status-stream",
        "kinesis.region": "eu-west-1",
        "kinesis.startingPosition": "TRIM_HORIZON",
        "kinesis.consumerType": "GetRecords",
        "kinesis.endpointUrl": "http://localhost:4566",
    }
    assert KINESIS_SOURCE_FORMAT == "aws-kinesis" == KINESIS_SINK_FORMAT


def test_writer_options_and_record_projection_match_connector():
    opts = kinesis_writer_options("status-stream", endpoint_url="http://x:1")
    assert opts == {
        "kinesis.streamName": "status-stream",
        "kinesis.region": "us-east-1",
        "kinesis.endpointUrl": "http://x:1",
    }
    # the sink publishes exactly the two writer-side columns the
    # connector consumes: partitionKey + data
    cols = [p.split(" AS ")[-1] for p in KINESIS_SINK_PROJECTION]
    assert cols == ["partitionKey", "data"]


def test_real_connector_round_trip(spark, tmp_path):
    """Produce -> consume through the REAL connector.  Gated twice:
    on the jar (class probe) and on an endpoint (localstack URL or a
    real stream name via env), each with its own recorded skip
    reason."""
    cls = _connector_on_classpath(spark)
    if cls is None:
        pytest.skip(
            "spark-sql-kinesis connector jar not on the classpath "
            f"(probed {', '.join(_CONNECTOR_CLASSES)}); the in-process "
            "emulator covers the wrapper seam — see tests/test_sources.py"
        )
    endpoint = os.environ.get("KINESIS_IT_ENDPOINT")  # e.g. localstack
    stream = os.environ.get("KINESIS_IT_STREAM", f"sfs3k-it-{uuid.uuid4().hex[:8]}")
    if endpoint is None and "KINESIS_IT_STREAM" not in os.environ:
        pytest.skip(
            "connector jar present but no endpoint configured: set "
            "KINESIS_IT_ENDPOINT (localstack) or KINESIS_IT_STREAM "
            "(a real, pre-created stream with credentials in scope)"
        )

    events = spark.createDataFrame(
        [(f"txn-{i}", "SUCCEEDED" if i % 2 == 0 else "FAILED") for i in range(20)],
        "txn_id string, status string",
    )
    src_dir = str(tmp_path / "src")
    events.repartition(2).write.parquet(src_dir)
    reader = spark.readStream.schema(events.schema).parquet(src_dir)
    writer = kinesis_sink(reader, stream, endpoint_url=endpoint)
    wq = writer.option("checkpointLocation", str(tmp_path / "wck")).start()
    try:
        wq.processAllAvailable()
    finally:
        wq.stop()

    raw = kinesis_stream(
        spark, stream, starting_position="TRIM_HORIZON", endpoint_url=endpoint
    )
    parsed = parse_status_events(raw, value_col="data")
    rq = (
        parsed.writeStream.format("memory")
        .queryName("kinesis_it_roundtrip")
        .option("checkpointLocation", str(tmp_path / "rck"))
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            got = spark.sql("SELECT * FROM kinesis_it_roundtrip").collect()
            if len(got) >= 20:
                break
            time.sleep(2)
        by_txn = {r["txn_id"]: r["status"] for r in got}
        assert len(by_txn) == 20
        assert by_txn["txn-0"] == "SUCCEEDED" and by_txn["txn-1"] == "FAILED"
    finally:
        rq.stop()
