"""Custom Python DataSource (Spark 4 API): the clean-room stand-in
for the reference's hand-rolled Kinesis consumer.

The reference implements shard discovery, LATEST iterators, and a
paced ``getRecords(limit=5)`` loop re-armed every 1500 ms by hand
(``/root/reference/svcsample/svckinesis.js:188-248``, SURVEY.md §2.1
S4-S6) and explicitly punts on resharding and multi-page shard
listings (``svckinesis.js:187,230-232``).  On Spark, a connector is
a declarative DataSource: offsets, batching, and restart are the
engine's job.  This module implements that contract with the Python
DataSource API so the engine ships a real, dependency-free connector
for the status-event record shape ``{txnId, status}`` over JSONL:

* **batch**: ``spark.read.format("status_jsonl").load(path)`` with
  per-shard, line-range partition splitting;
* **streaming**: ``spark.readStream.format("status_jsonl")`` via
  ``SimpleDataSourceStreamReader`` — each micro-batch consumes at
  most ``maxRecordsPerBatch`` records *per shard* (default 5, the
  reference's getRecords limit), and restart resumes from the
  checkpointed offsets (which the reference cannot do at all — its
  LATEST iterator drops history on restart).

**Shards**: ``path`` may be a single JSONL file (one shard) or a
directory — every ``*.jsonl`` file inside is an independent shard
with its OWN offset, mirroring one Kinesis shard iterator per shard
(``svckinesis.js:227-236``).  Records carry their shard id; order is
guaranteed *within* a shard (monotone ``seq``), never across shards
— exactly the Kinesis contract (partition-key ordering only).  New
files appearing mid-stream are discovered at the next micro-batch
and consumed from line 0 — the resharding case the reference punts
on.

The record schema matches ``streaming/correlate.py`` inputs, so this
source can feed the correlation operator end to end.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA_DDL = "seq BIGINT, txn_id STRING, status STRING, shard STRING"
DEFAULT_BATCH_LIMIT = 5  # the reference's getRecords limit (svckinesis.js:193)


def _shard_files(path: str) -> list[str]:
    """One shard per file.  A directory is a multi-shard stream; a
    plain file is the single-shard degenerate case."""
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.jsonl")))
    return [path] if os.path.exists(path) else []


def _shard_name(file_path: str) -> str:
    return os.path.basename(file_path)


def _read_lines(path: str) -> list[str]:
    with open(path, "r", encoding="utf-8") as fh:
        return [ln for ln in fh.read().splitlines() if ln.strip()]


def _parse(seq: int, line: str, shard: str):
    rec = json.loads(line)
    return (seq, rec.get("txnId"), rec.get("status"), shard)


class _ShardLineRange(InputPartition):
    def __init__(self, file_path: str, start: int, end: int):
        self.file_path, self.start, self.end = file_path, start, end


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        self.n_splits = int(options.get("numPartitions", "4"))

    def partitions(self):
        parts: list[_ShardLineRange] = []
        for f in _shard_files(self.path):
            n = len(_read_lines(f))
            step = max(1, -(-n // self.n_splits))
            parts.extend(
                _ShardLineRange(f, i, min(i + step, n)) for i in range(0, n, step)
            )
        return parts or [_ShardLineRange(self.path, 0, 0)]

    def read(self, partition: _ShardLineRange):
        if not os.path.exists(partition.file_path):
            return
        lines = _read_lines(partition.file_path)
        shard = _shard_name(partition.file_path)
        for seq in range(partition.start, partition.end):
            yield _parse(seq, lines[seq], shard)


class _PacedStreamReader(SimpleDataSourceStreamReader):
    """Offset = ``{"shards": {shard_name: next_line}}`` — one cursor
    per shard, checkpointed together.  ``read`` returns at most
    ``maxRecordsPerBatch`` records per shard per micro-batch — the
    declarative form of the reference's polite 5-records-per-1.5 s
    per-shard loop, with exactly-once restart from the checkpoint
    instead of LATEST."""

    def __init__(self, options):
        self.path = options.get("path")
        self.limit = int(options.get("maxRecordsPerBatch", str(DEFAULT_BATCH_LIMIT)))
        start_at = options.get("startingPosition", "earliest").lower()
        shards = {}
        for f in _shard_files(self.path):
            shards[_shard_name(f)] = (
                len(_read_lines(f)) if start_at == "latest" else 0
            )
        self._initial = {"shards": shards}

    def initialOffset(self):
        return self._initial

    def read(self, start: dict):
        cursors = dict(start.get("shards", {}))
        rows = []
        for f in _shard_files(self.path):
            shard = _shard_name(f)
            lines = _read_lines(f)
            lo = int(cursors.get(shard, 0))  # new shard: consume from 0
            hi = min(len(lines), lo + self.limit)
            rows.extend(_parse(seq, lines[seq], shard) for seq in range(lo, hi))
            cursors[shard] = hi
        return (iter(rows), {"shards": cursors})

    def readBetweenOffsets(self, start: dict, end: dict):
        s_cur = start.get("shards", {})
        rows = []
        for f in _shard_files(self.path):
            shard = _shard_name(f)
            if shard not in end.get("shards", {}):
                continue
            lines = _read_lines(f)
            lo, hi = int(s_cur.get(shard, 0)), int(end["shards"][shard])
            rows.extend(_parse(seq, lines[seq], shard) for seq in range(lo, hi))
        return iter(rows)


class StatusEventsDataSource(DataSource):
    """``status_jsonl`` — batch + streaming source for the reference's
    status-event records, single- or multi-shard."""

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
