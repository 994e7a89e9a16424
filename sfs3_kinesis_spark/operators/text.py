"""Text-analysis operators for training-data pipelines.

All pure column expressions (codegen'd, zero Python): token
counting, quality scoring, language-ID heuristic, fingerprinting
(see ``operators.dedup.fingerprint``).  Each has an exact ANSI-SQL
twin so the DuckDB oracle can verify values, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: tiny stopword inventories for the language-ID heuristic — small
#: on purpose so the oracle SQL stays writable.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "de": ("der", "die", "und", "das", "ist", "nicht"),
}


def _count_in(tokens_col: str, words: tuple[str, ...]) -> str:
    arr = ", ".join(f"'{w}'" for w in words)
    return f"size(filter({tokens_col}, x -> array_contains(array({arr}), x)))"


def with_token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens / distinct ratio / mean token length / stopword
    ratio — the standard quality-filter features."""
    df = docs.withColumn("toks", F.split(F.col(text_col), " "))
    return (
        df.withColumn("n_tokens", F.size("toks").cast("long"))
        .withColumn("n_distinct", F.size(F.array_distinct("toks")).cast("long"))
        .withColumn("distinct_ratio", F.round(F.col("n_distinct") / F.col("n_tokens"), 4))
        .withColumn(
            "avg_token_len",
            F.round((F.length(text_col) - (F.col("n_tokens") - 1)) / F.col("n_tokens"), 4),
        )
        .withColumn(
            "stopword_ratio",
            F.round(F.expr(_count_in("toks", STOPWORDS["en"])) / F.col("n_tokens"), 4),
        )
    )


def with_quality_score(docs: DataFrame) -> DataFrame:
    """Composite quality score in [0,1]: length band + lexical
    diversity + stopword presence (a C4/Gopher-style static filter,
    expressed as one arithmetic column)."""
    df = with_token_stats(docs) if "n_tokens" not in docs.columns else docs
    length_score = F.when((F.col("n_tokens") >= 20) & (F.col("n_tokens") <= 200), 1.0).otherwise(0.5)
    diversity_score = F.least(F.col("distinct_ratio") * 2, F.lit(1.0))
    stop_score = F.when(F.col("stopword_ratio") > 0, 1.0).otherwise(0.0)
    return df.withColumn(
        "quality_score", F.round((length_score + diversity_score + stop_score) / 3, 4)
    )


def with_lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID.  Deterministic and SQL-twinnable;
    a production system would swap in a fastText-style model via
    pandas_udf — the operator shape (narrow projection) is identical."""
    df = docs.withColumn("toks", F.split(F.col(text_col), " "))
    for lang, words in STOPWORDS.items():
        df = df.withColumn(f"n_{lang}", F.expr(_count_in("toks", words)))
    detected = (
        F.when((F.col("n_en") >= F.col("n_es")) & (F.col("n_en") >= F.col("n_de")) & (F.col("n_en") > 0), "en")
        .when((F.col("n_es") >= F.col("n_de")) & (F.col("n_es") > 0), "es")
        .when(F.col("n_de") > 0, "de")
        .otherwise("und")
    )
    return df.withColumn("detected_lang", detected).drop("toks")


def chunk_udtf(max_tokens: int = 32):
    """Text chunker as a Spark 4 Python UDTF (user-defined TABLE
    function) — the lateral-generator spelling of
    :func:`sampling.chunk_text`.

    The reference's entire compute layer is user-defined functions
    composed by config (SURVEY.md §2.11); the engine's UDx surface is
    Column expressions (Step), pandas UDFs (multimodal), stateful
    pandas (correlate) — and this adds the table-function tier: one
    input row expands to N output rows with per-row Python logic,
    invocable from SQL as ``chunk(text)``.  The built-in generator
    form (sampling.chunk_text — pure Catalyst, codegen'd) remains
    the hot-path implementation; the UDTF exists for custom
    expansion logic that built-ins can't express (tokenizer-aware
    splits, sentence boundaries), and its per-partition batching is
    the real plumbing under test.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx BIGINT, chunk_text STRING, n_chunk_tokens BIGINT")
    class ChunkUdtf:
        def eval(self, text: str):  # noqa: A002
            toks = text.split(" ") if text else []
            for i in range(0, max(len(toks), 1), max_tokens):
                chunk = toks[i : i + max_tokens]
                yield (i // max_tokens, " ".join(chunk), len(chunk))

    return ChunkUdtf


def contamination_flags(
    docs: DataFrame, benchmark_grams: DataFrame, *, n: int = 5
) -> DataFrame:
    """Benchmark-decontamination flags, batch OR streaming.

    Every ``n``-gram of each document probes the benchmark n-gram
    set (one column, ``gram``); output is the input plus
    ``n_shared_grams`` / ``contaminated`` columns.  The probe is a
    broadcast join against the benchmark set — small and static by
    construction (frozen eval suites).

    Streaming use: run inside ``foreachBatch`` (each crawl drop is
    one micro-batch) — the gram aggregate is per-doc WITHIN a batch,
    so no cross-batch state, watermark, or state store is involved;
    a direct ``groupBy`` on a live stream would instead demand
    stateful aggregation semantics the operation doesn't need.

    The batch corpus twin is ``dedup_decontaminate``
    (plans/llm_queries.py); this operator is its ingest-time form —
    a training pipeline filters each crawl drop against frozen eval
    benchmarks before anything lands in the corpus.
    """
    from sfs3_kinesis_spark.operators.dedup import shingles

    g = shingles(docs, n=n, out_col="_grams").select(
        "doc_id", F.explode("_grams").alias("gram")
    )
    hits = (
        g.join(F.broadcast(benchmark_grams.select("gram").distinct()), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )
    return (
        docs.join(hits, "doc_id", "left")
        .withColumn(
            "n_shared_grams", F.coalesce("n_shared_grams", F.lit(0)).cast("long")
        )
        .withColumn("contaminated", F.col("n_shared_grams") > 0)
    )


def drift_stats(
    docs: DataFrame,
    reference_hist: DataFrame,
    *,
    text_col: str = "text",
    bin_col: str = "bin",
    count_col: str = "n",
) -> DataFrame:
    """Distribution-drift monitor, batch OR streaming-foreachBatch:
    the input's length histogram (log2 char-length bins — a bounded
    domain) is compared to a FROZEN reference histogram by total-
    variation distance in exact integer basis points:

        tv_bp = 10000 * Σ_b |n_b * N_ref - r_b * N_in| // (2 * N_in * N_ref)

    cross-multiplied so no ratio ever becomes a float.  Returns ONE
    row: (n_docs, tv_bp) — the number a data-quality gate thresholds
    before admitting a crawl drop into the corpus.

    Scale shape: one groupBy over the bounded bin domain (map-side
    combined), a broadcast full-outer join with the reference (≤ bin
    count rows), and a 1-row aggregate.  Streaming use mirrors
    ``contamination_flags``: run inside foreachBatch per crawl drop —
    the histogram is per-batch, so no cross-batch state is needed;
    the reference rides as a broadcast of a tiny static table.  The
    batch corpus twin of the TV arithmetic is the oracle-verified
    ``text_tv_distance_sources`` (plans/llm_queries.py).
    """
    hist = docs.groupBy(
        F.expr(
            f"CAST(floor(log2(greatest(length({text_col}), 1))) AS BIGINT)"
        ).alias(bin_col)
    ).agg(F.count(F.lit(1)).alias("_n_in"))
    ref = reference_hist.select(
        F.col(bin_col), F.col(count_col).cast("long").alias("_n_ref")
    )
    j = hist.join(F.broadcast(ref), bin_col, "full_outer").select(
        F.coalesce("_n_in", F.lit(0)).alias("a"),
        F.coalesce("_n_ref", F.lit(0)).alias("b"),
    )
    # totals ride in as a 1-row broadcast (the bin table is tiny, so
    # the second pass over it is free; the corpus is scanned once)
    tot = j.agg(
        F.sum("a").cast("long").alias("n_in"),
        F.sum("b").cast("long").alias("n_ref"),
    )
    return (
        j.join(F.broadcast(tot))
        .agg(
            F.max("n_in").cast("long").alias("n_docs"),
            F.expr(
                "CAST(CASE WHEN max(n_in) = 0 OR max(n_ref) = 0 THEN 10000 "
                "ELSE (10000 * sum(abs(a * n_ref - b * n_in))) "
                "DIV (2 * max(n_in) * max(n_ref)) END AS BIGINT)"
            ).alias("tv_bp"),
        )
    )
