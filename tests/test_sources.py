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


def test_binaryfile_source_feeds_multimodal_ops(spark, tmp_path):
    """Raw media ingestion via the built-in binaryFile source: files
    land as (path, modificationTime, length, content BINARY) rows —
    the 100 TB pattern for image/audio corpora (one row per object,
    no decode on the scan).  The rows feed the same multimodal
    operators as the parquet fixtures."""
    media = tmp_path / "media"
    media.mkdir()
    payloads = {f"clip_{i}.bin": bytes([i]) * (100 + i) for i in range(5)}
    for fname, data in payloads.items():
        (media / fname).write_bytes(data)

    from pyspark.sql import functions as F

    from sfs3_kinesis_spark.operators.multimodal import with_binary_metadata

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(str(media))
        .select(
            F.element_at(F.split("path", "/"), -1).alias("media_id"),
            F.col("content").alias("payload"),
        )
    )
    out = {r["media_id"]: r for r in with_binary_metadata(df).collect()}
    assert set(out) == set(payloads)
    for fname, data in payloads.items():
        assert out[fname]["byte_len"] == len(data)
    # partition-size control: binaryFile honors maxPartitionBytes, so
    # a 100 TB ingest splits by files, not one task per directory
    assert df.rdd.getNumPartitions() >= 1
