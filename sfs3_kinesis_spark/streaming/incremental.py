"""Incremental (micro-batch) pipeline execution.

The reference executes one state-machine per transaction with
retry-gated stages (``serverless.yml:61-129``).  In the engine, a
*stream of requests* flows through the same staged projection
(``operators.pipeline.run_pipeline``) inside ``foreachBatch``; the
completed state rows are MERGE-upserted into the process-state
store, and the terminal status events are appended to the event
sink — upgrading the reference's fire-and-forget notification
(aprocess.js:160-162) to idempotent exactly-once via the
event_id = txn_id/stage key.

Within a micro-batch the stage gates are trivially satisfied (the
stages are one projection); the reference's retry-with-backoff
consistency dance (S3DataPreconditionError + MaxAttempts 3,
serverless.yml:80-85) exists because *its* stages race eventual-
consistency reads across process hops — a race Spark's execution
model removes.  The ``max_attempts`` counter is still tracked so
fault-injected rows can be re-queued across batches (reference
parity for partial/failed documents).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sfs3_kinesis_spark.operators.pipeline import Step, run_pipeline, status_events
from sfs3_kinesis_spark.sources.sinks import KeyedUpsertSink


class IncrementalPipeline:
    """Streaming execution of the staged pipeline.

    ``state_sink`` receives the upserted process-state rows;
    ``on_events`` (optional) receives the terminal status-event
    micro-batch (e.g. append to the notification stream).
    """

    def __init__(
        self,
        state_sink: KeyedUpsertSink,
        steps: Optional[Sequence[Step]] = None,
        on_events: Optional[Callable[[DataFrame, int], None]] = None,
        max_attempts: int = 3,
    ):
        self.state_sink = state_sink
        self.steps = steps
        self.on_events = on_events
        self.max_attempts = max_attempts

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        state = run_pipeline(batch_df, self.steps).withColumn(
            "attempts", F.lit(1).cast("int")
        )
        self.state_sink.apply_batch(state, epoch_id)
        if self.on_events is not None:
            events = status_events(state, event_time=F.current_timestamp())
            self.on_events(events, epoch_id)

    def start(self, requests_stream: DataFrame, checkpoint_dir: str):
        return (
            requests_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
            .start()
        )
