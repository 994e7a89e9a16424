"""Deduplication operators for large-scale text corpora.

Four tiers, all shuffle-efficient and expressed with JVM-side
built-ins (no Python in the hot path):

* exact        — hash groupBy on the raw or normalized text.
* fingerprint  — deterministic rolling-hash document fingerprint
                 (constant bytes per doc, groupBy on a BIGINT).
* MinHash+LSH  — shingle → minhash signature → banded bucket join →
                 verify Jaccard on candidates only.  The self-join is
                 on (band_id, band_hash) buckets, so at 100 TB the
                 candidate set — not the corpus cross-product —
                 drives cost.
* SimHash      — 64-bit simhash from token hashes; near-dup ==
                 small Hamming distance, bucketed by the top bits.

All hashing uses ``xxhash64`` (Spark built-in, codegen'd).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FINGERPRINT_MOD = 1_000_000_007


def tokens(col: str = "text") -> F.Column:
    return F.split(F.col(col), " ")


def exact_dedup(docs: DataFrame, key_expr: F.Column | None = None) -> DataFrame:
    """Exact dedup: one surviving doc_id per identical key.

    ``key_expr`` defaults to the raw text; pass a normalization
    (lower / strip punctuation / prefix) for canonicalized dedup.
    Single hash-aggregate: partial map-side combine then one shuffle
    on the key — the optimal distributed plan for this operation.
    """
    key = key_expr if key_expr is not None else F.col("text")
    return (
        docs.withColumn("dedup_key", key)
        .groupBy("dedup_key")
        .agg(F.min("doc_id").cast("long").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def fingerprint(docs: DataFrame, out_col: str = "fingerprint") -> DataFrame:
    """Deterministic rolling-hash fingerprint over the token stream.

    Polynomial fold ``acc*131 + (ascii(tok)*31 + len(tok)) mod p`` —
    chosen to be exactly reproducible in ANSI SQL (the DuckDB oracle
    computes the same fold), unlike xxhash64 which is Spark-specific.
    """
    expr = (
        "aggregate(split(text, ' '), CAST(0 AS BIGINT), "
        f"(acc, x) -> (acc * 131 + ascii(x) * 31 + length(x)) % {FINGERPRINT_MOD})"
    )
    return docs.withColumn(out_col, F.expr(expr))


def shingles(docs: DataFrame, n: int = 3, out_col: str = "shingles") -> DataFrame:
    """Distinct word n-gram shingles per document (built-in
    higher-order functions; no UDF)."""
    expr = (
        f"array_distinct(transform(sequence(0, greatest(size(split(text,' ')) - {n}, 0)), "
        f"i -> concat_ws(' ', slice(split(text,' '), i + 1, {n}))))"
    )
    return docs.withColumn(out_col, F.expr(expr))


def minhash_signature(docs_with_shingles: DataFrame, num_hashes: int = 32, out_col: str = "signature") -> DataFrame:
    """MinHash signature: for seed h, min over shingles of
    xxhash64(shingle, h).  One array column, computed in a single
    codegen'd projection."""
    mins = F.array(
        *[
            F.expr(f"array_min(transform(shingles, s -> xxhash64(s, {h})))")
            for h in range(num_hashes)
        ]
    )
    return docs_with_shingles.withColumn(out_col, mins)


def minhash_lsh_pairs(
    docs: DataFrame,
    *,
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH.

    Plan shape (the scale path): signature is a narrow projection;
    candidate generation explodes ``bands`` rows per doc and
    self-joins on (band_id, band_hash) — an equi-join Catalyst
    shuffles on the bucket key, so only colliding docs ever meet.
    Verification computes true shingle Jaccard on candidates only.
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(shingles(docs, n=shingle_n), num_hashes=num_hashes).select(
        "doc_id", "shingles", "signature"
    )
    banded = sig.select(
        "doc_id",
        "shingles",
        F.posexplode(
            F.array(
                *[
                    F.expr(
                        f"xxhash64(concat_ws(',', transform(slice(signature, {b * rows_per_band + 1}, "
                        f"{rows_per_band}), x -> cast(x as string))))"
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_id", "band_hash"),
    )
    left = banded.alias("a")
    right = banded.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    jac = F.expr(
        "size(array_intersect(sh_a, sh_b)) / size(array_union(sh_a, sh_b))"
    )
    return (
        cand.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(docs: DataFrame, out_col: str = "simhash") -> DataFrame:
    """64-bit SimHash over token hashes, as pure SQL expressions:
    for each bit, sum(+1/-1 by token-hash bit) > 0 → bit set.
    One projection, no shuffle."""
    bit_cols = []
    for bit in range(64):
        bit_cols.append(
            f"(CASE WHEN aggregate(toks, 0, (acc, x) -> acc + "
            f"CASE WHEN (xxhash64(x) & shiftleft(1L, {bit})) != 0 THEN 1 ELSE -1 END) > 0 "
            f"THEN shiftleft(1L, {bit}) ELSE 0L END)"
        )
    expr = " + ".join(bit_cols)
    return (
        docs.withColumn("toks", F.expr("array_distinct(split(text, ' '))"))
        .withColumn(out_col, F.expr(expr))
        .drop("toks")
    )


def simhash_near_dup_pairs(docs: DataFrame, max_hamming: int = 8, prefix_bits: int = 16) -> DataFrame:
    """SimHash near-dup candidates bucketed by the top ``prefix_bits``
    bits (docs differing only in low bits still collide), verified by
    exact Hamming distance via bit_count(xor)."""
    sh = simhash(docs).select("doc_id", "simhash")
    bucketed = sh.withColumn("bucket", F.expr(f"shiftrightunsigned(simhash, {64 - prefix_bits})"))
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .withColumn("hamming", F.expr("bit_count(a.simhash ^ b.simhash)"))
        .filter(F.col("hamming") <= max_hamming)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"), "hamming")
    )
