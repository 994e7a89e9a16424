"""observe() metrics (SURVEY.md W3 / S11): orphan/matched/timeout
accounting without a second pass over the data."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import Observation
from pyspark.sql import functions as F

from sfs3_kinesis_spark.plans import REGISTRY


def test_batch_observation_counts_outcomes(spark):
    """Batch: the correlation twin query reports matched/timeout
    splits through an Observation — one pass, no extra job."""
    obs = Observation("corr_batch")
    df = REGISTRY["correlate_requests_events"].spark(spark, "/root/testdata/sf0.001")
    observed = df.observe(
        obs,
        F.count(F.when(F.col("outcome") == "matched", 1)).alias("n_matched"),
        F.count(F.when(F.col("outcome") == "timeout", 1)).alias("n_timeout"),
    )
    total = observed.count()
    got = obs.get
    assert got["n_matched"] + got["n_timeout"] == total
    assert got["n_matched"] > 0


def test_streaming_observed_metrics_surface_orphans(spark, tmp_path):
    """Streaming: orphan counts appear in the query progress without
    re-aggregating the output."""
    from sfs3_kinesis_spark.sources.sinks import run_stateful_to_memory, wait_for_rows
    from sfs3_kinesis_spark.sources.stream import stream_from_batch
    from sfs3_kinesis_spark.streaming.correlate import correlate, outcome_metrics, unioned_input

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    requests = spark.createDataFrame(
        [("t1", t0, 3_600_000)], "txn_id string, submitted_at timestamp, timeout_ms long"
    )
    events = spark.createDataFrame(
        [
            ("t1", "SUCCEEDED", t0 + dt.timedelta(seconds=1)),
            ("ghost", "SUCCEEDED", t0 + dt.timedelta(seconds=2)),
        ],
        "txn_id string, status string, event_time timestamp",
    )
    merged = unioned_input(requests, events)
    stream = stream_from_batch(merged, str(tmp_path))
    out = correlate(
        stream.filter(F.col("kind") == "request").select(
            "txn_id", F.col("ts").alias("submitted_at"), "timeout_ms"
        ),
        stream.filter(F.col("kind") == "event").select(
            "txn_id", "status", F.col("ts").alias("event_time")
        ),
    )
    q = run_stateful_to_memory(outcome_metrics(out), "corr_obs")
    try:
        wait_for_rows(spark, "SELECT count(*) FROM corr_obs", 2)
        # scan recent progress for the micro-batch that carried rows
        deadline = time.time() + 30
        seen = None
        while time.time() < deadline and seen is None:
            for p in q.recentProgress:
                m = p.get("observedMetrics", {}).get("correlate_metrics")
                if m and (m["n_matched"] or m["n_orphan"]):
                    seen = m
                    break
            time.sleep(0.3)
    finally:
        q.stop()
    assert seen is not None, "observed metrics never surfaced in progress"
    assert seen["n_matched"] == 1
    assert seen["n_orphan"] == 1
