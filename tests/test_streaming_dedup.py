"""Streaming deduplication (the exact-dedup operator's streaming
form): dropDuplicates with keyed state, and
dropDuplicatesWithinWatermark for bounded-state dedup at scale."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def ts(s):
    return T0 + dt.timedelta(seconds=s)


SCHEMA = "event_id string, ts timestamp, payload string"


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(str(path))


def test_streaming_exact_dedup_unbounded(spark, tmp_path):
    """dropDuplicates on a stream: duplicates across micro-batches
    are suppressed by keyed state (unbounded retention)."""
    src = tmp_path / "in"
    src.mkdir()
    _write(spark, src, [("a", ts(0), "p1"), ("b", ts(1), "p2"), ("a", ts(2), "dup-in-batch")])
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        stream.dropDuplicates(["event_id"])
        .writeStream.format("memory")
        .queryName("dd_unbounded")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        _write(spark, src, [("a", ts(100), "dup-across-batch"), ("c", ts(101), "p3")])
        q.processAllAvailable()
        rows = spark.sql("SELECT event_id FROM dd_unbounded").collect()
    finally:
        q.stop()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == ["a", "b", "c"]  # both duplicate deliveries suppressed


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: state is EVICTED once the
    watermark passes — the 100 TB form (bounded memory), at the cost
    of re-admitting duplicates that arrive later than the watermark
    delay (exactly the reference's evict-then-orphan trade,
    svckinesis.js:80-88)."""
    src = tmp_path / "in2"
    src.mkdir()
    _write(spark, src, [("a", ts(0), "first")])
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        stream.withWatermark("ts", "10 seconds")
        .dropDuplicatesWithinWatermark(["event_id"])
        .writeStream.format("memory")
        .queryName("dd_wm")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # duplicate within the watermark horizon -> suppressed
        _write(spark, src, [("a", ts(5), "near-dup")])
        q.processAllAvailable()
        # advance watermark far past the 'a' state, then redeliver
        _write(spark, src, [("z", ts(1000), "advance")])
        q.processAllAvailable()
        _write(spark, src, [("a", ts(1001), "late-redelivery")])
        q.processAllAvailable()
        rows = [r["payload"] for r in spark.sql("SELECT payload FROM dd_wm").collect()]
    finally:
        q.stop()
    assert "first" in rows and "advance" in rows
    assert "near-dup" not in rows  # suppressed while state held
    assert "late-redelivery" in rows  # state evicted -> readmitted


def test_streaming_near_dup_against_historical_index(spark, tmp_path):
    """Continuous near-dup ingestion: each micro-batch is checked
    against the PERSISTED signature index of all prior batches plus
    itself; matches land in an append-only log; the index is the
    state, so a restarted pipeline (fresh operator instance) keeps
    matching against history.  Batch primitives and the streaming
    tier share one band-key expression tree (operators.dedup.
    banded_keys), so they cannot drift."""
    from sfs3_kinesis_spark.streaming.neardup import StreamingNearDup

    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a long tune about distributed systems and parquet files"
    )
    mutated = base.replace("lazy", "sleepy")  # near-dup of base
    other = (
        "completely different content about stochastic gradient descent "
        "and learning rate warmup schedules for very large models"
    )
    doc_schema = "doc_id long, text string"

    src = tmp_path / "in"
    src.mkdir()
    nd = StreamingNearDup(spark, str(tmp_path / "ndx"))

    def feed(rows):
        spark.createDataFrame(rows, doc_schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    stream = spark.readStream.schema(doc_schema).parquet(str(src))
    q = (
        nd.writer(stream)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        feed([(1, base), (2, other)])
        q.processAllAvailable()
        assert nd.matches() is None or nd.matches().count() == 0

        # batch 2: a near-dup of doc 1 (history!) and a within-batch
        # dup pair (4, 5)
        feed([(3, mutated), (4, other + " v2"), (5, other + " v2")])
        q.processAllAvailable()
        got = {(r.new_doc_id, r.dup_of) for r in nd.matches().collect()}
        assert (3, 1) in got, got  # matched against the historical index
        assert (5, 4) in got, got  # within-batch pair (new side = larger id)
        assert all(a > b for a, b in got)  # new doc is always the left side
    finally:
        q.stop()

    # restart with a FRESH operator over the same index: history kept
    nd2 = StreamingNearDup(spark, str(tmp_path / "ndx"))
    stream2 = spark.readStream.schema(doc_schema).parquet(str(src))
    q2 = (
        nd2.writer(stream2)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        feed([(6, base + " extra tail words here")])
        q2.processAllAvailable()
        got = {(r.new_doc_id, r.dup_of) for r in nd2.matches().collect()}
        assert (6, 1) in got, got  # matches the doc ingested before restart
    finally:
        q2.stop()


def test_streaming_near_dup_verify_tier_is_selective(spark, tmp_path):
    """Plan pin (VERDICT r03 'what's wrong' #2): the verify tier must
    NOT union the full historical shingle store into the Jaccard
    join.  The store scan has to carry the candidate filter — a
    LeftSemi join on the candidate dup_of id set sits between the
    store relation and the Jaccard join, so at 100 TB the probe is a
    bucket-local point lookup, not a corpus scan."""
    from sfs3_kinesis_spark.operators.dedup import banded_keys, shingles
    from sfs3_kinesis_spark.streaming.neardup import StreamingNearDup

    nd = StreamingNearDup(spark, str(tmp_path / "ndx"))
    docs = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    sh = shingles(docs, n=3).select("doc_id", "shingles")
    keys = banded_keys(sh, num_hashes=32, bands=8)
    # a fake historical store on disk so _read returns a real relation
    hist = spark.createDataFrame(
        [(1, ["a b c"]), (2, ["d e f"])], "doc_id long, shingles array<string>"
    )
    hist.write.mode("overwrite").parquet(str(tmp_path / "ndx" / "shingles" / "epoch=0"))
    keys.limit(0).write.mode("overwrite").parquet(
        str(tmp_path / "ndx" / "bands" / "epoch=0")
    )

    hist_keys = nd._read(nd.bands_dir, before_epoch=5)
    hist_sh = nd._read(nd.shingles_dir, before_epoch=5)
    cand = nd._candidates(keys, hist_keys)
    matched = nd._verify(cand, sh, hist_sh)
    optimized = matched._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" in optimized, optimized
    # the semi-join must sit over the shingle-store relation: the plan
    # subtree after the LeftSemi node mentions the store's path
    tail = optimized[optimized.index("LeftSemi"):]
    assert "shingles" in tail


def test_streaming_near_dup_retry_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a crash between the matches
    write and the index writes (or before checkpoint commit) re-runs
    the epoch.  Epoch-keyed overwrite writes make the retry replace
    its own output — matches, bands and shingles must all hold
    exactly one copy after a double-run, and the retry must not see
    its own first attempt as 'history' (which would fabricate
    jaccard=1.0 self-matches)."""
    from sfs3_kinesis_spark.streaming.neardup import StreamingNearDup

    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a long tune about distributed systems and parquet files"
    )
    nd = StreamingNearDup(spark, str(tmp_path / "ndx"))
    doc_schema = "doc_id long, text string"
    b0 = spark.createDataFrame([(1, base)], doc_schema)
    nd.process_batch(b0, 0)
    b1 = spark.createDataFrame(
        [(2, base.replace("lazy", "sleepy")), (3, "unrelated text entirely here")],
        doc_schema,
    )
    nd.process_batch(b1, 1)
    first = sorted(
        (r.new_doc_id, r.dup_of) for r in nd.matches().collect()
    )
    assert first == [(2, 1)], first

    # simulate the at-least-once retry: epoch 1 runs again in full
    nd.process_batch(b1, 1)
    again = sorted((r.new_doc_id, r.dup_of) for r in nd.matches().collect())
    assert again == first  # no duplicated match rows, no self-matches

    bands = spark.read.parquet(nd.bands_dir)
    assert bands.count() == bands.dropDuplicates(["doc_id", "band_id"]).count()
    sh_store = spark.read.parquet(nd.shingles_dir)
    assert sh_store.select("doc_id").distinct().count() == sh_store.count() == 3


def test_streaming_ingest_decontamination(spark, tmp_path):
    """Ingest-time benchmark decontamination: each micro-batch of
    documents is flagged against the frozen eval n-gram set inside
    foreachBatch (no cross-batch state); contaminated docs route to
    quarantine, clean docs to the corpus — the gate a training
    pipeline runs before anything lands."""
    from sfs3_kinesis_spark.operators.text import contamination_flags

    bench_text = "the held out benchmark question about spark shuffles and joins"
    bench = spark.createDataFrame([(0, bench_text)], "doc_id long, text string")
    from sfs3_kinesis_spark.operators.dedup import shingles

    bench_grams = shingles(bench, n=5, out_col="g").select(
        F.explode("g").alias("gram")
    )

    clean_dir = str(tmp_path / "clean")
    quar_dir = str(tmp_path / "quarantine")

    def gate(batch_df, epoch_id):
        flagged = contamination_flags(batch_df, bench_grams, n=5)
        flagged.filter("contaminated").write.mode("append").parquet(quar_dir)
        flagged.filter("NOT contaminated").write.mode("append").parquet(clean_dir)

    src = tmp_path / "in"
    src.mkdir()
    leak = "prefix words then " + bench_text + " trailing words"
    ok1 = "a perfectly ordinary training document about gardening tips"
    ok2 = "another clean document covering sourdough hydration ratios"
    spark.createDataFrame(
        [(1, leak), (2, ok1), (3, ok2)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    q = (
        stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    quarantined = {r.doc_id: r.n_shared_grams for r in spark.read.parquet(quar_dir).collect()}
    clean = {r.doc_id for r in spark.read.parquet(clean_dir).collect()}
    assert set(quarantined) == {1} and quarantined[1] > 0
    assert clean == {2, 3}


def test_streaming_near_dup_reads_pre_epoch_layout(spark, tmp_path):
    """Backward compatibility: an index directory written by the old
    append-mode code has flat parquet files with NO epoch partition
    key.  The reader must treat that store as all-history (every row
    predates the current stream) instead of crashing on an unresolved
    'epoch' column."""
    from pyspark.sql import functions as F

    from sfs3_kinesis_spark.streaming.neardup import StreamingNearDup

    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a long tune about distributed systems and parquet files"
    )
    root = str(tmp_path / "ndx")
    doc_schema = "doc_id long, text string"

    # build a real index once, then strip it to the OLD flat layout
    seed = StreamingNearDup(spark, str(tmp_path / "seed"))
    seed.process_batch(spark.createDataFrame([(1, base)], doc_schema), 0)
    import os

    for sub in ("bands", "shingles"):
        src = os.path.join(str(tmp_path / "seed"), sub, "epoch=0")
        spark.read.parquet(src).write.mode("overwrite").parquet(
            os.path.join(root, sub)
        )

    nd = StreamingNearDup(spark, root)
    nd.process_batch(
        spark.createDataFrame([(2, base.replace("lazy", "sleepy"))], doc_schema), 0
    )
    got = [(r.new_doc_id, r.dup_of) for r in nd.matches().collect()]
    assert got == [(2, 1)]  # the flat-layout store counted as history

    # the write must have MIGRATED the flat files into epoch=-1/ (a
    # mixed layout would fail partition discovery on the next read):
    # a second batch reads the store again and matches both ancestors
    assert os.path.isdir(os.path.join(root, "bands", "epoch=-1"))
    nd.process_batch(
        spark.createDataFrame([(3, base.replace("lazy", "busy"))], doc_schema), 1
    )
    got2 = sorted((r.new_doc_id, r.dup_of) for r in nd.matches().collect())
    assert got2 == [(2, 1), (3, 1), (3, 2)]


def test_streaming_near_dup_candidate_cap_bounds_mega_cluster(spark, tmp_path):
    """A template mega-cluster (every doc near-identical) must not
    make the gate's work quadratic in history: with
    max_candidates_per_doc=k each new doc verifies at most k
    candidate ancestors (the deterministic lowest-id ones), and every
    cluster member after the first is still flagged as a duplicate."""
    from pyspark.sql import functions as F

    from sfs3_kinesis_spark.streaming.neardup import StreamingNearDup

    tmpl = (
        "identical template text about spark shuffles joins and "
        "parquet files repeated across every single document here"
    )
    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(tmpl + " nr "), F.col("id")).alias("text"),
    )
    nd = StreamingNearDup(spark, str(tmp_path / "ndx"), max_candidates_per_doc=5)
    nd.process_batch(docs.filter("doc_id < 30"), 0)
    nd.process_batch(docs.filter("doc_id >= 30"), 1)

    m = nd.matches().groupBy("new_doc_id").count().collect()
    per_doc = {r.new_doc_id: r["count"] for r in m}
    # bounded verify output per doc...
    assert max(per_doc.values()) <= 5
    # ...and every cluster member except the oldest is still caught
    assert set(per_doc) == set(range(1, 60))
    # the kept candidates are the oldest cluster members (dup_of asc)
    kept = {
        r.dup_of
        for r in nd.matches().filter(F.col("new_doc_id") == 59).collect()
    }
    assert kept == {0, 1, 2, 3, 4}


def test_streaming_near_dup_history_read_is_partition_pruned(spark, tmp_path):
    """Scale pin: the history read's epoch bound must land in the
    parquet scan's PartitionFilters (directory pruning — a retried
    epoch never even LISTS its own first attempt), not a post-scan
    row filter."""
    import re

    from sfs3_kinesis_spark.streaming.neardup import StreamingNearDup

    nd = StreamingNearDup(spark, str(tmp_path / "ndx"))
    df = spark.createDataFrame([(1, ["a b c"])], "doc_id long, shingles array<string>")
    nd._write_epoch(df, nd.shingles_dir, 0)
    nd._write_epoch(df, nd.shingles_dir, 1)
    hist = nd._read(nd.shingles_dir, before_epoch=1)
    plan = hist._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "epoch" in m.group(1) and "< 1" in m.group(1), plan


def test_streaming_drift_gate(spark, tmp_path):
    """Ingest-time distribution-drift gate: each micro-batch's length
    histogram is TV-compared to a frozen reference inside foreachBatch
    (no cross-batch state); an in-distribution drop passes, a shifted
    drop (much longer docs) trips the threshold.  The drift log is an
    append-only table keyed by epoch — the monitor a data-quality
    pipeline alerts on."""
    from sfs3_kinesis_spark.operators.text import drift_stats

    ref_docs = spark.createDataFrame(
        [(i, "w " * 20) for i in range(50)], "doc_id long, text string"
    )
    ref = ref_docs.groupBy(
        F.expr("CAST(floor(log2(greatest(length(text), 1))) AS BIGINT)").alias("bin")
    ).agg(F.count(F.lit(1)).alias("n"))

    log_dir = str(tmp_path / "driftlog")

    def gate(batch_df, epoch_id):
        out = drift_stats(batch_df, ref).withColumn(
            "epoch", F.lit(int(epoch_id))
        )
        out.write.mode("append").parquet(log_dir)

    src = tmp_path / "in"
    src.mkdir()
    # batch 1: in-distribution (same 41-char shape as the reference)
    spark.createDataFrame(
        [(100 + i, "w " * 20) for i in range(10)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").json(str(src))

    stream = (
        spark.readStream.schema("doc_id long, text string").json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # batch 2: drifted (64x longer docs land in a different bin)
    spark.createDataFrame(
        [(200 + i, "w " * 1280) for i in range(10)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").json(str(src))
    q2 = (
        spark.readStream.schema("doc_id long, text string")
        .json(str(src))
        .writeStream.foreachBatch(gate)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    log = spark.read.parquet(log_dir).orderBy("epoch").collect()
    assert len(log) == 2
    clean, drifted = log[0], log[1]
    assert clean["n_docs"] == 10 and clean["tv_bp"] == 0
    assert drifted["n_docs"] == 10 and drifted["tv_bp"] == 10000


def test_streaming_near_dup_bucket_truncation_keeps_detection(spark, tmp_path):
    """Hot-band protection: with max_bucket_size smaller than a
    mega-cluster, the candidate join only meets each band bucket's
    OLDEST members — yet every cluster member after the first is
    still flagged (one verified ancestor suffices), and the kept
    ancestors are the cluster's oldest docs."""
    from pyspark.sql import functions as F

    from sfs3_kinesis_spark.streaming.neardup import StreamingNearDup

    tmpl = (
        "identical template text about spark shuffles joins and "
        "parquet files repeated across every single document here"
    )
    docs = spark.range(80).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(tmpl + " nr "), F.col("id")).alias("text"),
    )
    nd = StreamingNearDup(
        spark,
        str(tmp_path / "ndx"),
        max_candidates_per_doc=3,
        max_bucket_size=8,
    )
    nd.process_batch(docs.filter("doc_id < 40"), 0)
    nd.process_batch(docs.filter("doc_id >= 40"), 1)

    m = nd.matches().groupBy("new_doc_id").count().collect()
    per_doc = {r.new_doc_id: r["count"] for r in m}
    assert max(per_doc.values()) <= 3
    assert set(per_doc) == set(range(1, 80))
    # ancestors come from the truncated bucket heads: oldest docs only
    kept = {r.dup_of for r in nd.matches().select("dup_of").collect()}
    assert kept <= set(range(8))


def test_streaming_near_dup_exhaustive_mode_disables_bucket_truncation(spark, tmp_path):
    """max_candidates_per_doc=None promises the FULL verified pair
    set; the bucket-truncation default must switch off with it (an
    explicit max_bucket_size re-enables the bound)."""
    from sfs3_kinesis_spark.streaming.neardup import StreamingNearDup

    nd_default = StreamingNearDup(spark, str(tmp_path / "a"))
    assert nd_default.max_bucket_size == 64
    nd_exhaustive = StreamingNearDup(
        spark, str(tmp_path / "b"), max_candidates_per_doc=None
    )
    assert nd_exhaustive.max_bucket_size is None
    nd_both = StreamingNearDup(
        spark, str(tmp_path / "c"), max_candidates_per_doc=None, max_bucket_size=16
    )
    assert nd_both.max_bucket_size == 16


def test_streaming_near_dup_compaction_bounds_index_and_keeps_detection(
    spark, tmp_path
):
    """r04 verdict item 2: the epoch-keyed index must not accrete one
    directory per trigger forever.  Generational compaction (the
    KeyedUpsertSink LSM discipline) folds the delta tail into a base
    generation behind an atomic manifest flip; detection results must
    be IDENTICAL to an uncompacted twin over the same batch sequence,
    docs folded into the base must still be matchable, the delta-dir
    count must stay bounded, and a retried epoch must stay idempotent
    after compaction."""
    import os

    from sfs3_kinesis_spark.streaming.neardup import StreamingNearDup

    base_text = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a long tune about distributed systems and parquet files"
    )
    doc_schema = "doc_id long, text string"
    nd_c = StreamingNearDup(spark, str(tmp_path / "ndx_c"), compact_every=3)
    nd_u = StreamingNearDup(spark, str(tmp_path / "ndx_u"), compact_every=None)

    def batch(rows, epoch):
        df = spark.createDataFrame(rows, doc_schema)
        nd_c.process_batch(df, epoch)
        nd_u.process_batch(df, epoch)

    # epoch 0 carries the ancestor; epochs 1..6 carry unrelated docs
    # (forcing the delta count past compact_every), epoch 7 carries a
    # near-dup of the epoch-0 ancestor — by then the ancestor's keys
    # and shingles live ONLY in the folded base generation
    batch([(1, base_text)], 0)
    for e in range(1, 7):
        batch(
            [(10 * e, f"totally unrelated content number {e} about topic "
                      f"{e} with enough words to shingle properly indeed")],
            e,
        )
    batch([(99, base_text.replace("lazy", "sleepy"))], 7)

    got_c = {(r.new_doc_id, r.dup_of) for r in nd_c.matches().collect()}
    got_u = {(r.new_doc_id, r.dup_of) for r in nd_u.matches().collect()}
    assert got_c == got_u, "compaction changed detection results"
    assert (99, 1) in got_c, "ancestor folded into the base must still match"

    # the delta tail is bounded; the uncompacted twin accreted one
    # dir per non-empty epoch
    n_delta_c = sum(
        1 for d in os.listdir(tmp_path / "ndx_c" / "bands") if d.startswith("epoch=")
    )
    n_delta_u = sum(
        1 for d in os.listdir(tmp_path / "ndx_u" / "bands") if d.startswith("epoch=")
    )
    assert n_delta_u == 8
    assert n_delta_c <= 4, f"delta tail not bounded: {n_delta_c} dirs"
    assert os.path.exists(tmp_path / "ndx_c" / "MANIFEST.json")
    assert os.path.isdir(tmp_path / "ndx_c" / "bands_base")

    # retry idempotency survives compaction: replay the last epoch
    nd_c.process_batch(
        spark.createDataFrame([(99, base_text.replace("lazy", "sleepy"))], doc_schema),
        7,
    )
    again = [
        (r.new_doc_id, r.dup_of) for r in nd_c.matches().collect()
    ]
    assert len(again) == len(set(again)), "replayed epoch duplicated matches"
    assert set(again) == got_c

    # cold restart over the compacted index: a FRESH operator must
    # read the manifest + base generation and keep matching docs whose
    # signatures now live ONLY in the folded base
    nd_r = StreamingNearDup(spark, str(tmp_path / "ndx_c"), compact_every=3)
    nd_r.process_batch(
        spark.createDataFrame(
            [(150, base_text + " with a fresh little tail appended")], doc_schema
        ),
        8,
    )
    got_r = {(r.new_doc_id, r.dup_of) for r in nd_r.matches().collect()}
    assert (150, 1) in got_r, "fresh operator failed to read the compacted base"


def test_streaming_near_dup_compaction_crash_between_flip_and_delete(
    spark, tmp_path
):
    """Crash-window correctness: delta dirs that were already folded
    (manifest flipped) but not yet deleted must be INVISIBLE to reads
    — double-counting a folded band key would fabricate duplicate
    candidate pairs and double Jaccard matches."""
    from sfs3_kinesis_spark.streaming.neardup import StreamingNearDup

    text = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a long tune about distributed systems and parquet files"
    )
    doc_schema = "doc_id long, text string"
    nd = StreamingNearDup(spark, str(tmp_path / "ndx"), compact_every=None)
    nd.process_batch(spark.createDataFrame([(1, text)], doc_schema), 0)
    nd.process_batch(
        spark.createDataFrame([(2, "unrelated words about other things "
                                   "entirely for this second epoch")], doc_schema), 1
    )
    # fold epochs <= 1 but SIMULATE the crash: restore the folded
    # delta dirs from a copy taken before compaction
    import shutil

    pre = tmp_path / "pre_bands"
    shutil.copytree(tmp_path / "ndx" / "bands", pre)
    nd.compact(1)
    for d in pre.iterdir():
        dst = tmp_path / "ndx" / "bands" / d.name
        if not dst.exists():
            shutil.copytree(d, dst)
    # ingest a near-dup of doc 1: its ancestor's keys now exist BOTH
    # in the base and in the resurrected delta dir — exactly-once
    # reads must still yield exactly one match row
    nd.process_batch(
        spark.createDataFrame([(3, text.replace("lazy", "sleepy"))], doc_schema), 2
    )
    rows = [(r.new_doc_id, r.dup_of) for r in nd.matches().collect()]
    assert rows.count((3, 1)) == 1, rows
