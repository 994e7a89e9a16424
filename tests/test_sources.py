"""Source-layer tests: schema-fixed JSON documents (reference S1)
and rate-limited file-stream batching (reference S6/W8)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from sfs3_kinesis_spark.sources.batch import read_json_documents
from sfs3_kinesis_spark.sources.stream import stream_from_batch


def test_read_json_documents_schema_fixed(spark, tmp_path):
    """JSON is read with an explicit schema — no per-file inference
    (the reference parses dynamically, aprocess.js:24; the engine
    infers once at the edge, then fixes: SURVEY.md §1.4)."""
    p = tmp_path / "docs"
    rows = [
        '{"txn_id": "a", "foo": true, "n": 1}',
        '{"txn_id": "b", "foo": false, "n": 2, "extra": "ignored"}',
        '{"txn_id": "c", "foo": true}',  # missing field -> NULL, not error
    ]
    p.mkdir()
    (p / "part-0.json").write_text("\n".join(rows))
    schema = T.StructType(
        [
            T.StructField("txn_id", T.StringType()),
            T.StructField("foo", T.BooleanType()),
            T.StructField("n", T.LongType()),
        ]
    )
    df = read_json_documents(spark, str(p), schema)
    got = {r["txn_id"]: (r["foo"], r["n"]) for r in df.collect()}
    assert got == {"a": (True, 1), "b": (False, 2), "c": (True, None)}
    assert df.schema == schema  # undeclared keys pruned, not inferred


def test_rate_limited_stream_batches(spark, tmp_path):
    """maxFilesPerTrigger=1 over n_files replay files as ordered
    micro-batches — the engine's knob for the reference's paced
    getRecords consumption (limit=5 / 1.5 s, svckinesis.js:193)."""
    df = spark.range(40).select(F.col("id").cast("long").alias("v"))
    stream = stream_from_batch(df, str(tmp_path), n_files=4)
    q = (
        stream.writeStream.format("memory")
        .queryName("paced")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
        total = spark.sql("SELECT count(*) c FROM paced").collect()[0]["c"]
    finally:
        q.stop()
    assert total == 40
    # 4 files -> 4 non-empty micro-batches (one file per trigger);
    # per-batch sizes vary with the hash split, but no batch may
    # swallow the whole input
    assert len(batches) == 4
    assert all(b["numInputRows"] < 40 for b in batches)
