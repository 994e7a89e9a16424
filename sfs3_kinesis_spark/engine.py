"""The service facade: the engine's twin of the reference's HTTP
service surface.

A user of the reference interacts through three verbs (SURVEY.md §3):
``POST /p1`` with a JSON payload (pollingsvc.js:139-141 /
svckinesis.js:163-165), poll-or-correlate for the terminal status
(pollingsvc.js:95-124, svckinesis.js:173-185), and read the enriched
state document back from S3.  :class:`Engine` exposes exactly those
verbs over the streaming pipeline:

* :meth:`submit` — assign a txn id (the reference's flake-id hex,
  pollingsvc.js:15-26) and append the request row to the watched
  ingest directory (the stream source's S3-prefix twin);
* :meth:`await_completion` — the polling variant (EP1): watch the
  process-state store for the terminal status, bounded by the
  reference's 20 s request budget (pollingsvc.js:133);
* :meth:`status` / :meth:`state_document` — the Step Functions
  ``describeExecution`` status read (pollingsvc.js:95-111) and the
  whole-document S3 read (aprocess.js:21-24);
* :meth:`events` — the consumer view of the status-event stream
  (svckinesis.js:188-212), here an exactly-once parquet event log
  with idempotent event ids instead of fire-and-forget Kinesis.

Driver-side work is strictly O(1) per verb — a one-row file append
or a keyed point lookup; all transformation happens in the streaming
query.  At scale the ingest dir becomes an object-store prefix (or a
Kafka/Kinesis topic via ``sources.stream``), and the state store a
keyed table — the facade does not change.
"""

from __future__ import annotations

import os
import threading
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfs3_kinesis_spark.operators.pipeline import Step
from sfs3_kinesis_spark.sources.sinks import KeyedUpsertSink
from sfs3_kinesis_spark.streaming.incremental import IncrementalPipeline

REQUEST_SCHEMA = "txn_id string, request string"


class Engine:
    """End-to-end engine instance rooted at ``root_dir``.

    Layout: ``root_dir/requests`` (ingest), ``root_dir/state``
    (keyed process-state store), ``root_dir/events`` (status event
    log), ``root_dir/checkpoint`` (streaming checkpoint).
    """

    def __init__(
        self,
        spark: SparkSession,
        root_dir: str,
        steps: list[Step] | None = None,
    ):
        self.spark = spark
        self.root = root_dir
        self.requests_dir = os.path.join(root_dir, "requests")
        self.events_dir = os.path.join(root_dir, "events")
        os.makedirs(self.requests_dir, exist_ok=True)
        self._sink = KeyedUpsertSink(spark, os.path.join(root_dir, "state"))
        self._pipeline = IncrementalPipeline(
            self._sink, steps=steps, on_events=self._append_events
        )
        self._query = None
        # concurrent submits share requests_dir/_temporary (Hadoop's
        # FileOutputCommitter cleans it per job) — one job's commit
        # can delete another's in-flight task files, silently losing
        # an accepted request.  The facade serializes the one-row
        # appends; real concurrent ingress is the stream source's
        # job, not this veneer.
        self._submit_lock = threading.Lock()

    # -- service verbs ------------------------------------------------ #

    def submit(self, payload_json: str) -> str:
        """Accept a request, assign the txn id, enqueue it.  Returns
        the txn id immediately (the reference returns it only with
        the terminal response; exposing it enables the polling path)."""
        txn_id = f"0x{uuid.uuid4().hex[:16]}"  # flake-id-shaped hex key
        with self._submit_lock:
            (
                self.spark.createDataFrame([(txn_id, payload_json)], REQUEST_SCHEMA)
                .coalesce(1)
                .write.mode("append")
                .parquet(self.requests_dir)
            )
        return txn_id

    def status(self, txn_id: str) -> str | None:
        """Terminal status for a txn, or None while still in flight
        (the 3-way RUNNING/SUCCEEDED/FAILED branch, pollingsvc.js:77-93).
        The key filter is pushed below the state-store merge, so a
        poll is a point lookup, not a full-table merge."""
        cur = self._sink.current(key=txn_id)
        if cur is None:
            return None
        row = cur.select("status").first()
        return row["status"] if row is not None else None

    def state_document(self, txn_id: str) -> dict | None:
        """The whole enriched process-state document (aprocess.js:24).
        Store bookkeeping columns (``_v``, ``_epoch``) are dropped:
        they are LSM version counters whose meaning shifts on
        compaction, not part of the client-facing document."""
        cur = self._sink.current(key=txn_id)
        if cur is None:
            return None
        row = cur.drop("_v", "_epoch").first()
        return row.asDict(recursive=True) if row is not None else None

    def events(self) -> DataFrame | None:
        """The status-event log (txn_id, status, event_id, event_time)
        — exactly-once: the writer lands one ``epoch=N`` partition per
        micro-batch with overwrite semantics, so foreachBatch's
        at-least-once redelivery replaces its own output instead of
        appending a duplicate copy."""
        has_parquet = False
        for _root, _dirs, files in os.walk(self.events_dir):
            if any(f.endswith(".parquet") for f in files):
                has_parquet = True
                break
        if not has_parquet:
            return None
        return self.spark.read.parquet(self.events_dir).drop("epoch")

    def await_completion(self, txn_id: str, timeout_s: float = 20.0, poll_s: float = 0.25) -> str:
        """EP1 polling semantics: poll the state store until terminal
        or the request budget lapses (pollingsvc.js:123,133).  One
        final check after the deadline: the terminal status may have
        landed during the last sleep — reporting TIMEOUT when
        status() already answers is a misreport, not a timeout."""
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            s = self.status(txn_id)
            if s is not None:
                return s
            time.sleep(poll_s)
        s = self.status(txn_id)
        return s if s is not None else "TIMEOUT"

    # -- lifecycle ----------------------------------------------------- #

    def start(self):
        """Start the streaming pipeline over the ingest directory."""
        stream = self.spark.readStream.schema(REQUEST_SCHEMA).parquet(self.requests_dir)
        self._query = self._pipeline.start(
            stream, os.path.join(self.root, "checkpoint")
        )
        return self._query

    def stop(self) -> None:
        if self._query is not None:
            self._query.stop()
            self._query = None

    # -- internal ------------------------------------------------------ #

    def _append_events(self, batch_df: DataFrame, epoch_id: int) -> None:
        # epoch-keyed overwrite = idempotent under foreachBatch's
        # at-least-once redelivery (the docstring's exactly-once
        # claim; same discipline as streaming/neardup._write_epoch)
        (
            batch_df.select("txn_id", "status", "event_id", "event_time")
            .write.mode("overwrite")
            .parquet(os.path.join(self.events_dir, f"epoch={int(epoch_id)}"))
        )
