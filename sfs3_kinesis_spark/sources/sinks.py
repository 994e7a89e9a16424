"""Sinks.

* ``run_to_memory`` — memory sink for tests (synchronous drain).
* ``KeyedUpsertSink`` — the engine's process-state store: keyed
  whole-row upsert per micro-batch via ``foreachBatch``, the Spark
  form of the reference's whole-document S3 PUT
  (``writeBodyObj``, ``/root/reference/s3-for-process-data/
  aprocess.js:34-45``).  Locally this merges parquet snapshots; on a
  cluster the same ``foreachBatch`` body becomes a Delta/Iceberg
  MERGE INTO keyed on txn_id (idempotent ⇒ exactly-once sink
  semantics under retries, SURVEY.md W6).
* ``kinesis_sink`` — keyed event publish (PartitionKey=txn_id,
  reference S3op) — connector-gated like the source.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Start ``stream_df`` into a memory sink, drain all available
    input synchronously, and return the query (caller reads
    ``SELECT * FROM <name>`` and stops the query).

    Only for stateless / event-time streams.  For stateful operators
    with processing-time timeouts use :func:`run_stateful_to_memory` +
    :func:`wait_for_rows` — with ``ProcessingTimeTimeout`` the engine
    schedules a micro-batch every trigger to advance the timer clock,
    so ``processAllAvailable`` never observes an idle source.
    """
    q = stream_df.writeStream.format("memory").queryName(name).outputMode(output_mode).start()
    q.processAllAvailable()
    return q


def run_stateful_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "append", trigger_ms: int = 200
):
    """Start a stateful stream (processing-time timers) into a memory
    sink with a bounded trigger cadence; caller drains via
    :func:`wait_for_rows`."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(processingTime=f"{trigger_ms} milliseconds")
        .start()
    )


def wait_for_rows(
    spark: SparkSession, sql: str, min_rows: int, timeout_s: float = 90.0, poll_s: float = 0.3
) -> int:
    """Poll ``sql`` (must return one count column) until it reaches
    ``min_rows`` or the deadline passes; return the final count."""
    import time

    deadline = time.time() + timeout_s
    n = 0
    while time.time() < deadline:
        n = spark.sql(sql).collect()[0][0]
        if n >= min_rows:
            return n
        time.sleep(poll_s)
    return n


class KeyedUpsertSink:
    """Keyed whole-row upsert store with last-writer-wins semantics
    per key (the process-state table).

    ``apply_batch`` is the ``foreachBatch`` body: merge the incoming
    micro-batch into the snapshot keyed on ``key_col``; re-delivered
    batches (streaming restart) are idempotent because the merge is
    by key, not append — the engine's answer to the reference's
    at-least-once step execution (serverless.yml:80-85).
    """

    def __init__(self, spark: SparkSession, path: str, key_col: str = "txn_id"):
        self.spark = spark
        self.path = path
        self.key_col = key_col
        # restart-safe: resume from the latest snapshot already on
        # disk (the reference's restart loses its in-memory map
        # entirely, svckinesis.js:66; a Delta/Iceberg table would
        # give us this via its log — versioned directories are the
        # dependency-free equivalent)
        self._version = self._latest_on_disk()

    def _latest_on_disk(self) -> int:
        import re

        if not os.path.isdir(self.path):
            return 0
        versions = [
            int(m.group(1))
            for d in os.listdir(self.path)
            if (m := re.fullmatch(r"v(\d+)", d))
        ]
        return max(versions, default=0)

    def _snapshot_dir(self, version: int) -> str:
        return os.path.join(self.path, f"v{version}")

    def current(self) -> DataFrame | None:
        if self._version == 0:
            return None
        return self.spark.read.parquet(self._snapshot_dir(self._version))

    def read_version(self, version: int) -> DataFrame:
        """Time-travel read: the table AS OF snapshot ``version``
        (1-based; every micro-batch MERGE produced one snapshot) —
        the audit/debug affordance a CDC-compacted table needs."""
        if not 1 <= version <= self._version:
            raise ValueError(f"version {version} not in [1, {self._version}]")
        return self.spark.read.parquet(self._snapshot_dir(version))

    def apply_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = batch_df.withColumn("_epoch", F.lit(int(epoch_id)))
        existing = self.current()
        if existing is None:
            merged = batch_df
        else:
            existing = existing.withColumn("_epoch", F.coalesce(F.col("_epoch"), F.lit(-1)))
            merged = existing.unionByName(batch_df, allowMissingColumns=True)
        # last writer wins per key (MERGE INTO equivalent)
        w = W.partitionBy(self.key_col).orderBy(F.desc("_epoch"))
        deduped = (
            merged.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
        )
        next_version = self._version + 1
        deduped.write.mode("overwrite").parquet(self._snapshot_dir(next_version))
        self._version = next_version

    def writer(self, stream_df: DataFrame):
        return stream_df.writeStream.foreachBatch(self.apply_batch).outputMode("update")


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str],
    mode: str = "overwrite",
    target_file_partitions: int | None = None,
) -> None:
    """Hive-style partitioned parquet layout — the engine's scale
    posture for fact tables: a filter on a partition column becomes
    directory pruning (zero I/O for excluded partitions) instead of
    a full scan + row filter.

    ``target_file_partitions`` optionally repartitions by the
    partition columns first so each directory gets few, large files
    (many tiny files is the classic 100 TB anti-pattern: NN/S3
    listing cost + per-file open overhead dominate).
    """
    if target_file_partitions is not None:
        df = df.repartition(target_file_partitions, *partition_by)
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def kinesis_sink(df: DataFrame, stream_name: str, region: str = "us-east-1"):
    """Publish status events keyed by txn_id (per-key ordering via
    partition key — reference aprocess.js:157)."""
    try:
        return (
            df.selectExpr(
                "txn_id AS partitionKey",
                "to_json(struct(txn_id AS txnId, status)) AS data",
            )
            .writeStream.format("aws-kinesis")
            .option("kinesis.streamName", stream_name)
            .option("kinesis.region", region)
        )
    except Exception as exc:  # pragma: no cover
        raise RuntimeError("Kinesis connector not available") from exc
