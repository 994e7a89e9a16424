"""Custom Python DataSource (Spark 4 API): the clean-room stand-in
for the reference's hand-rolled Kinesis consumer.

The reference implements shard discovery, LATEST iterators, and a
paced ``getRecords(limit=5)`` loop re-armed every 1500 ms by hand
(``/root/reference/svcsample/svckinesis.js:188-248``, SURVEY.md §2.1
S4-S6) and explicitly skips resharding (``svckinesis.js:187``).  On
Spark, a connector is a declarative DataSource: offsets, batching,
and restart are the engine's job.  This module implements that
contract with the Python DataSource API so the engine ships a real,
dependency-free connector for the status-event record shape
``{txnId, status}`` over JSONL files:

* **batch**: ``spark.read.format("status_jsonl").load(path)`` with
  line-range partition splitting (the moral equivalent of reading a
  shard per task);
* **streaming**: ``spark.readStream.format("status_jsonl")`` via
  ``SimpleDataSourceStreamReader`` — the offset is the line number,
  each micro-batch consumes at most ``maxRecordsPerBatch`` records
  (default 5, the reference's getRecords limit), and restart resumes
  from the checkpointed offset (which the reference cannot do at all
  — its LATEST iterator drops history on restart).

The record schema matches ``streaming/correlate.py`` inputs, so this
source can feed the correlation operator end to end.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA_DDL = "seq BIGINT, txn_id STRING, status STRING"
DEFAULT_BATCH_LIMIT = 5  # the reference's getRecords limit (svckinesis.js:193)


def _read_lines(path: str) -> list[str]:
    with open(path, "r", encoding="utf-8") as fh:
        return [ln for ln in fh.read().splitlines() if ln.strip()]


def _parse(seq: int, line: str):
    rec = json.loads(line)
    return (seq, rec.get("txnId"), rec.get("status"))


class _LineRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        self.n_splits = int(options.get("numPartitions", "4"))

    def partitions(self):
        n = len(_read_lines(self.path))
        step = max(1, -(-n // self.n_splits))
        return [_LineRange(i, min(i + step, n)) for i in range(0, n, step)] or [
            _LineRange(0, 0)
        ]

    def read(self, partition: _LineRange):
        lines = _read_lines(self.path)
        for seq in range(partition.start, partition.end):
            yield _parse(seq, lines[seq])


class _PacedStreamReader(SimpleDataSourceStreamReader):
    """Offset = next line number to consume.  ``read`` returns at most
    ``maxRecordsPerBatch`` records per micro-batch — the declarative
    form of the reference's polite 5-records-per-1.5 s loop, with
    exactly-once restart from the checkpoint instead of LATEST."""

    def __init__(self, options):
        self.path = options.get("path")
        self.limit = int(options.get("maxRecordsPerBatch", str(DEFAULT_BATCH_LIMIT)))
        start_at = options.get("startingPosition", "earliest").lower()
        n = len(_read_lines(self.path)) if os.path.exists(self.path) else 0
        self._initial = {"seq": n if start_at == "latest" else 0}

    def initialOffset(self):
        return self._initial

    def read(self, start: dict):
        lines = _read_lines(self.path) if os.path.exists(self.path) else []
        lo = int(start["seq"])
        hi = min(len(lines), lo + self.limit)
        rows = [_parse(seq, lines[seq]) for seq in range(lo, hi)]
        return (iter(rows), {"seq": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        lines = _read_lines(self.path)
        return iter(
            _parse(seq, lines[seq]) for seq in range(int(start["seq"]), int(end["seq"]))
        )


class StatusEventsDataSource(DataSource):
    """``status_jsonl`` — batch + streaming source for the reference's
    status-event records."""

    @classmethod
    def name(cls) -> str:
        return "status_jsonl"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema):
        return _BatchReader(self.options)

    def simpleStreamReader(self, schema):
        return _PacedStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(StatusEventsDataSource)
