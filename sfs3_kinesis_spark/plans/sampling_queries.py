"""Training-data curation corpus: deterministic sampling, dataset
splitting, stratification, shuffle ordering, token-shard packing,
sequence chunking, and quality-based dedup survivor selection.

The reference has no sampling/splitting surface at all (SURVEY.md
§2.12); this family is the north-star "what a 100 TB training-data
pipeline actually runs".  Everything is keyed off the arithmetic
hash in ``operators.sampling`` so the DuckDB oracle verifies every
value exactly — no rng anywhere (rng breaks retry determinism at
scale; see the module docstring of ``operators/sampling.py``).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from sfs3_kinesis_spark.operators import sampling
from sfs3_kinesis_spark.operators.sampling import hash_sql
from sfs3_kinesis_spark.plans.core import register, t, t_nonnull

_H = hash_sql("doc_id")  # ((doc_id * 2654435761 + 104729) % 1000000007)


@register(
    "sample_hash_bucket",
    f"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
    FROM documents
    WHERE ({_H} % 10) = 3
    """,
    tags=("sampling", "dedup_adjacent"),
    description=(
        "deterministic 10% sample via multiplicative hash — row-local "
        "filter, no shuffle, stable under retries (rand() is not)"
    ),
)
def sample_hash_bucket(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    return sampling.sample_by_hash(d, F.col("doc_id"), keep_of=10, bucket=3).select(
        "doc_id", "lang"
    )


@register(
    "sample_train_val_test",
    f"""
    WITH s AS (
      SELECT n_chars,
             CASE WHEN ({_H} % 100) < 80 THEN 'train'
                  WHEN ({_H} % 100) < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents)
    SELECT split,
           count(*)                     AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM s GROUP BY split
    """,
    tags=("sampling", "split"),
    description=(
        "reproducible 80/10/10 train/val/test split by hash bucket — "
        "membership is a pure function of doc_id, so any engine, run, "
        "or cluster size yields the identical split"
    ),
)
def sample_train_val_test(spark: SparkSession, sf_dir: str):
    d = sampling.split_assign(t(spark, sf_dir, "documents"), F.col("doc_id"), 80, 10)
    return d.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


@register(
    "sample_stratified_lang",
    f"""
    WITH r AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY {_H}, doc_id) AS rn
      FROM documents)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
    FROM r WHERE rn <= 20
    """,
    tags=("sampling", "stratified"),
    description=(
        "equal-allocation stratified sample: first 20 docs per language "
        "in hash order (one shuffle on the stratum key; per-stratum "
        "top-k, not a global sort)"
    ),
)
def sample_stratified_lang(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    return sampling.stratified_sample(d, "lang", F.col("doc_id"), 20).select("doc_id", "lang")


@register(
    "sample_global_shuffle",
    f"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST({_H} AS BIGINT)   AS shuffle_key
    FROM documents
    ORDER BY shuffle_key, doc_id
    LIMIT 100
    """,
    tags=("sampling", "shuffle_order"),
    description=(
        "deterministic global shuffle order (training-epoch ordering): "
        "ORDER BY hash(key) — top-k planned as TakeOrderedAndProject, "
        "full-epoch form is a range-partitioned sort, both scale-safe"
    ),
)
def sample_global_shuffle(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id", sampling.hash_key(F.col("doc_id")).cast("long").alias("shuffle_key")
        )
        .orderBy("shuffle_key", "doc_id")
        .limit(100)
    )


@register(
    "pack_token_shards",
    f"""
    WITH d AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             {_H}                         AS h
      FROM documents WHERE text IS NOT NULL),
    p AS (
      SELECT (h % 8) AS bucket, n_tokens,
             sum(n_tokens) OVER (PARTITION BY (h % 8) ORDER BY h, doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
      FROM d)
    SELECT CAST(bucket AS BIGINT)            AS bucket,
           CAST(cum_before // 2048 AS BIGINT) AS shard_id,
           count(*)                          AS n_docs,
           CAST(sum(n_tokens) AS BIGINT)     AS shard_tokens
    FROM p GROUP BY 1, 2
    """,
    tags=("sampling", "packing", "window"),
    description=(
        "pack documents into ~2048-token training shards: hash into 8 "
        "independent buckets (ONE shuffle), running token total within "
        "each bucket — the global-order single-reducer bottleneck never "
        "exists; buckets scale with the cluster"
    ),
)
def pack_token_shards(spark: SparkSession, sf_dir: str):
    d = t_nonnull(spark, sf_dir, "documents", "text").withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " ")).cast("long")
    )
    packed = sampling.pack_shards(d, F.col("doc_id"), "n_tokens", n_buckets=8, capacity=2048)
    return packed.groupBy(
        F.col("bucket").cast("long").alias("bucket"), "shard_id"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("shard_tokens"),
    )


@register(
    "text_chunking",
    """
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE text IS NOT NULL),
    ex AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, CAST(ceil(len(toks) / 32.0) AS BIGINT) - 1)) AS chunk_idx
      FROM tok)
    SELECT CAST(doc_id AS BIGINT)    AS doc_id,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           array_to_string(toks[chunk_idx*32+1 : chunk_idx*32+32], ' ') AS chunk_text,
           CAST(len(toks[chunk_idx*32+1 : chunk_idx*32+32]) AS BIGINT)  AS n_chunk_tokens
    FROM ex
    """,
    tags=("sampling", "chunking", "generator"),
    description=(
        "fixed-32-token sequence chunking (context-window pre-chunking): "
        "1 doc row -> ceil(n/32) chunk rows via a generator, no Python, "
        "no driver round-trip"
    ),
)
def text_chunking(spark: SparkSession, sf_dir: str):
    return sampling.chunk_text(t_nonnull(spark, sf_dir, "documents", "text"), "doc_id", "text", 32)


_STOP_EN_SQL = "['the','a','of','and','to','in']"


@register(
    "dedup_keep_best_quality",
    f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents WHERE text IS NOT NULL),
    s AS (
      SELECT doc_id,
             array_to_string(toks[1:3], ' ')                AS dedup_key,
             len(toks)                                      AS n_tokens,
             round(len(list_distinct(toks)) / len(toks), 4) AS dr,
             round(len(list_filter(toks, x -> list_contains({_STOP_EN_SQL}, x))) / len(toks), 4)
                                                            AS sr
      FROM d),
    q AS (
      SELECT doc_id, dedup_key,
             round((CASE WHEN n_tokens BETWEEN 20 AND 200 THEN 1.0 ELSE 0.5 END
                    + least(dr * 2, 1.0)
                    + CASE WHEN sr > 0 THEN 1.0 ELSE 0.0 END) / 3, 4) AS quality_score
      FROM s),
    r AS (
      SELECT doc_id, dedup_key, quality_score,
             row_number() OVER (PARTITION BY dedup_key
                                ORDER BY quality_score DESC, doc_id) AS rn,
             count(*)    OVER (PARTITION BY dedup_key)               AS n_members
      FROM q)
    SELECT dedup_key,
           CAST(doc_id AS BIGINT)    AS keeper_doc_id,
           CAST(n_members AS BIGINT) AS n_members,
           quality_score
    FROM r WHERE rn = 1
    """,
    tags=("dedup", "quality", "sampling"),
    description=(
        "dedup survivor selection by quality, not min-id: within each "
        "near-dup group (3-token prefix key) keep the highest-quality "
        "member — the curation policy real pipelines use"
    ),
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.text import with_quality_score

    d = with_quality_score(t_nonnull(spark, sf_dir, "documents", "text"))
    d = d.withColumn("dedup_key", F.concat_ws(" ", F.slice(F.col("toks"), 1, 3)))
    w = Window.partitionBy("dedup_key").orderBy(F.col("quality_score").desc(), F.col("doc_id"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(Window.partitionBy("dedup_key")).cast("long"))
        .filter(F.col("rn") == 1)
        .select("dedup_key", F.col("doc_id").alias("keeper_doc_id"), "n_members", "quality_score")
    )


@register(
    "sample_global_row_index",
    f"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           ROW_NUMBER() OVER (ORDER BY {_H}, doc_id) AS global_idx
    FROM documents
    """,
    tags=("sampling", "indexing", "window"),
    description=(
        "contiguous global row ids in deterministic hash order WITHOUT "
        "the single-reducer global ROW_NUMBER: hash space range-bucketed, "
        "per-bucket counts prefix-summed (a 64-row window), offsets "
        "broadcast back, id = offset + intra-bucket row_number — the "
        "oracle is the global ROW_NUMBER it must equal"
    ),
)
def sample_global_row_index(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents").select("doc_id")
    return sampling.global_row_index(d, F.col("doc_id"))


@register(
    "sample_temperature_lang",
    f"""
    WITH c AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY lang),
    k AS (SELECT lang, n_l,
                 sqrt(CAST(min(n_l) OVER () AS DOUBLE) / CAST(n_l AS DOUBLE)) AS keep_p
          FROM c),
    s AS (SELECT d.lang, d.doc_id, k.n_l, k.keep_p,
                 CAST({hash_sql('d.doc_id')} AS DOUBLE) / 1000000007.0 AS u
          FROM documents d JOIN k USING (lang))
    SELECT lang,
           CAST(max(n_l) AS BIGINT)  AS n_before,
           CAST(count(*) AS BIGINT)  AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS doc_id_sum
    FROM s WHERE u < keep_p
    GROUP BY lang ORDER BY lang
    """,
    tags=("sampling", "temperature", "balance", "multilingual"),
    description=(
        "temperature-balanced language resampling (alpha=0.5): each language "
        "kept with probability sqrt(n_min/n_l) via the deterministic hash-u01 "
        "— majority languages shrink toward the minority; sqrt and divide are "
        "correctly-rounded IEEE so the keep thresholds are bit-identical "
        "across engines (pow would not be); stratum table broadcast back, "
        "zero fact-side shuffle"
    ),
)
def sample_temperature_lang(spark: SparkSession, sf_dir: str):
    docs = t(spark, sf_dir, "documents")
    kept = sampling.temperature_resample(docs, F.col("doc_id"), "lang")
    before = docs.groupBy("lang").agg(F.count("*").cast("long").alias("n_before"))
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.sum("doc_id").cast("long").alias("doc_id_sum"),
        )
        .join(F.broadcast(before), "lang")
        .select("lang", "n_before", "n_kept", "doc_id_sum")
        .orderBy("lang")
    )


#: cumulative Poisson(1) thresholds scaled to the hash modulus
#: (1e9+7): P(X<=k) * MOD for k = 0..5; ties impossible because the
#: hash is integer-valued and the thresholds are fixed integers.
_POIS_CUM = [367879441, 735758882, 919698602, 980988175, 996340153, 999406006]
_BOOT_B = 32  # bootstrap replicates


def _poisson_case(h: str) -> str:
    branches = " ".join(
        f"WHEN {h} < {t} THEN {k}" for k, t in enumerate(_POIS_CUM)
    )
    return f"CASE {branches} ELSE 6 END"


@register(
    "sample_bootstrap_ci",
    f"""
    WITH reps AS (
      SELECT o.o_orderpriority,
             r.r AS rep,
             CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             {_poisson_case(f"((o.o_orderkey * 131 + r.r) * {2654435761} + {104729}) % {1000000007}")} AS w
      FROM orders o
      CROSS JOIN (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS r) r),
    rep_means AS (
      SELECT o_orderpriority, rep,
             sum(w * cents) // sum(w) AS mean_cents
      FROM reps GROUP BY o_orderpriority, rep HAVING sum(w) > 0),
    ranked AS (
      SELECT o_orderpriority, mean_cents,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY mean_cents, rep) AS rnk,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM rep_means)
    SELECT o_orderpriority,
           count(*)            AS n_reps,
           min(mean_cents)     AS lo_cents,
           max(mean_cents)     AS hi_cents,
           sum(CASE WHEN rnk = (n + 1) // 2 THEN mean_cents ELSE 0 END)
         + sum(CASE WHEN rnk = (n + 2) // 2 THEN mean_cents ELSE 0 END)
                               AS median_x2_cents
    FROM ranked GROUP BY o_orderpriority
    """,
    tags=("sampling", "bootstrap", "statistics", "exact_arithmetic"),
    description=(
        "deterministic Poisson bootstrap (the streaming-friendly "
        "resample): each (row, replicate) draws a Poisson(1) weight "
        "from the arithmetic key-hash via an inverse-CDF CASE — no "
        "rng, so every engine, run, and retry produces the identical "
        "32 replicates — then per-replicate floor-div mean revenue "
        "and the replicate spread (min/max/median-pair) per priority: "
        "the confidence-interval machinery for data-quality metrics "
        "at 100 TB, where the replicate loop must be a single scan "
        "(B x row expansion, map-side-combined partials), never B "
        "passes over the data"
    ),
)
def sample_bootstrap_ci(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window as W

    o = t(spark, sf_dir, "orders")
    h = f"((o_orderkey * 131 + r) * {2654435761} + {104729}) % {1000000007}"
    reps = (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            F.expr("CAST(floor(o_totalprice * 100 + 0.5D) AS BIGINT)").alias("cents"),
        )
        .withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))))
        .withColumn("w", F.expr(_poisson_case(h)))
    )
    rep_means = (
        reps.groupBy("o_orderpriority", F.col("r").alias("rep"))
        .agg(F.expr("sum(w * cents) div sum(w)").alias("mean_cents"), F.sum("w").alias("sw"))
        .filter(F.col("sw") > 0)
        .drop("sw")
    )
    wp = W.partitionBy("o_orderpriority")
    ranked = rep_means.select(
        "o_orderpriority",
        "mean_cents",
        F.row_number().over(wp.orderBy("mean_cents", "rep")).alias("rnk"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    return ranked.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_reps"),
        F.min("mean_cents").alias("lo_cents"),
        F.max("mean_cents").alias("hi_cents"),
        (
            F.sum(F.when(F.col("rnk") == F.expr("(n + 1) div 2"), F.col("mean_cents")).otherwise(0))
            + F.sum(F.when(F.col("rnk") == F.expr("(n + 2) div 2"), F.col("mean_cents")).otherwise(0))
        ).alias("median_x2_cents"),
    )


@register(
    "sample_mixture_budget",
    """
    WITH lt AS (
        SELECT lang, SUM(len(string_split(text, ' '))) AS n_tokens
        FROM documents WHERE text IS NOT NULL GROUP BY lang),
    sq AS (
        SELECT lang, n_tokens,
               CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS s0
        FROM lt),
    w AS (
        SELECT lang, n_tokens,
               CASE WHEN (s0 + 1) * (s0 + 1) <= n_tokens THEN s0 + 1
                    WHEN s0 * s0 > n_tokens THEN s0 - 1
                    ELSE s0 END AS wt
        FROM sq),
    tot AS (SELECT SUM(wt) AS total FROM w),
    q AS (
        SELECT lang, n_tokens, wt,
               (1000000 * wt) // total AS fl,
               (1000000 * wt) % total AS rem
        FROM w, tot),
    r AS (
        SELECT lang, n_tokens, wt, fl, rem,
               row_number() OVER (ORDER BY rem DESC, lang) AS rk,
               SUM(fl) OVER () AS allocated
        FROM q)
    SELECT lang,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(wt AS BIGINT) AS weight,
           CAST(fl + CASE WHEN rk <= 1000000 - allocated THEN 1 ELSE 0 END
                AS BIGINT) AS budget_tokens
    FROM r ORDER BY lang
    """,
    tags=("sampling", "mixture", "temperature", "alloc", "exact_arithmetic", "multilingual"),
    description=(
        "temperature-mixture token budget (the per-language sampling "
        "table a multilingual pretraining run is configured from): "
        "per-language whitespace token counts, alpha=0.5 temperature "
        "weights as EXACT integer sqrt (floor(sqrt) with a +/-1 "
        "correction CASE, so perfect-square boundaries can't diverge "
        "across engines), and a 1,000,000-token budget split by "
        "largest-remainder apportionment — allocations sum to the "
        "budget EXACTLY, every value integer end-to-end.  The fact "
        "scan aggregates once; every window/join after runs over "
        "|languages| rows"
    ),
)
def sample_mixture_budget(spark: SparkSession, sf_dir: str):
    d = t_nonnull(spark, sf_dir, "documents", "text")
    lt = d.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens")
    )
    w = lt.withColumn(
        "s0", F.expr("CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)")
    ).withColumn(
        "wt",
        F.expr(
            "CASE WHEN (s0 + 1) * (s0 + 1) <= n_tokens THEN s0 + 1 "
            "WHEN s0 * s0 > n_tokens THEN s0 - 1 ELSE s0 END"
        ),
    )
    tot = w.agg(F.sum("wt").alias("total"))
    q = w.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_tokens",
        "wt",
        F.expr("(1000000 * wt) div total").alias("fl"),
        F.expr("(1000000 * wt) % total").alias("rem"),
    )
    win = Window.orderBy(F.desc("rem"), "lang")
    r = q.withColumn("rk", F.row_number().over(win)).withColumn(
        "allocated", F.sum("fl").over(Window.partitionBy())
    )
    return r.select(
        "lang",
        "n_tokens",
        F.col("wt").cast("long").alias("weight"),
        F.expr(
            "CAST(fl + CASE WHEN rk <= 1000000 - allocated THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("budget_tokens"),
    ).orderBy("lang")


@register(
    "sample_kfold_assign",
    f"""
    WITH f AS (
        SELECT doc_id, lang,
               {hash_sql('doc_id')} % 5 AS fold
        FROM documents)
    SELECT CAST(fold AS BIGINT) AS fold,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS doc_id_sum,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM f GROUP BY fold ORDER BY fold
    """,
    tags=("sampling", "kfold", "cross_validation", "split"),
    description=(
        "deterministic k-fold cross-validation assignment (k=5): "
        "fold = arithmetic key-hash mod k, a pure row-local function "
        "of doc_id — every engine, run, retry, and cluster size "
        "produces the identical folds, and the per-fold rollup "
        "(count, id checksum, language coverage) is the audit that "
        "folds are balanced and exhaustive.  Train-on-4/eval-on-1 is "
        "then a filter, never a reshuffle; the fold column costs "
        "nothing at scan time"
    ),
)
def sample_kfold_assign(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    f = d.select(
        "doc_id", "lang", F.pmod(sampling.hash_key(F.col("doc_id")), F.lit(5)).alias("fold")
    )
    return (
        f.groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("doc_id_sum"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
        )
        .select(F.col("fold").cast("long").alias("fold"), "n_docs", "doc_id_sum", "n_langs")
        .orderBy("fold")
    )


@register(
    "sample_domain_cap",
    """
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rnk
      FROM documents)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
           CAST(rnk AS BIGINT)    AS rnk
    FROM ranked WHERE rnk <= 50
    """,
    tags=("sampling", "dedup_adjacent", "skew"),
    description=(
        "per-domain document cap (the C4/CommonCrawl limit-per-host "
        "rule): keep the top-50 docs per source, longest-first with "
        "doc_id tie-break — two-phase salted window top-k, since "
        "domains are the textbook hot-key distribution"
    ),
)
def sample_domain_cap(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return sampling.domain_cap(
        d,
        "source",
        [F.desc("n_chars"), F.asc("doc_id")],
        cap=50,
        salt_on="doc_id",
    ).select("doc_id", "source", "rnk")


@register(
    "sample_curriculum_stages",
    """
    WITH ranked AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY n_chars, doc_id) AS rnk,
             count(*)     OVER ()                         AS n
      FROM documents WHERE n_chars IS NOT NULL)
    SELECT CAST(doc_id AS BIGINT)                   AS doc_id,
           CAST(((rnk - 1) * 4) // n + 1 AS BIGINT) AS stage
    FROM ranked
    """,
    tags=("sampling", "curriculum"),
    description=(
        "curriculum bucketing: every doc assigned a training stage 1..4 "
        "by global rank on (n_chars, doc_id) — short-and-simple first; "
        "exact integer stage boundaries via the two-phase global_rank "
        "(no single-reducer sort), n broadcast back from a 1-row agg"
    ),
)
def sample_curriculum_stages(spark: SparkSession, sf_dir: str):
    d = t_nonnull(spark, sf_dir, "documents", "n_chars").select("doc_id", "n_chars")
    return sampling.curriculum_stages(
        d, ["n_chars", "doc_id"], n_stages=4
    ).select("doc_id", "stage")


@register(
    "sample_reservoir_per_key",
    f"""
    SELECT source, CAST(doc_id AS BIGINT) AS doc_id, CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT source, doc_id,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY {hash_sql('doc_id')}, doc_id) AS rnk
          FROM documents) r
    WHERE rnk <= 5
    """,
    tags=("sample", "reservoir", "per_key", "topk", "skew"),
    description=(
        "per-key fixed-size uniform sample (the distributed equivalent "
        "of per-key reservoir sampling): keep exactly 5 docs per source "
        "by arithmetic-hash order (doc_id tiebreak) — deterministic, "
        "so retries and replays pick the same sample.  Runs through "
        "the salted two-phase window top-k (operators/scale.py), so a "
        "pathologically hot source spreads over 8 reducers in phase 1 "
        "instead of melting one — the keyed-sample shape that survives "
        "a skewed 100 TB corpus"
    ),
)
def sample_reservoir_per_key(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.scale import salted_window_topk

    d = t(spark, sf_dir, "documents").select(
        "source", "doc_id", F.expr(hash_sql("doc_id")).alias("_h")
    )
    return salted_window_topk(
        d, "source", [F.asc("_h"), F.asc("doc_id")], k=5, salt_on="doc_id"
    ).select("source", F.col("doc_id").cast("long").alias("doc_id"), "rnk")


@register(
    "sample_priority_pps",
    f"""
    WITH p AS (
      SELECT source, doc_id, n_chars,
             CAST(n_chars AS BIGINT) * 1000000007
               // ({hash_sql('doc_id')} + 1) AS pr
      FROM documents),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY pr DESC, doc_id) AS rn
      FROM p),
    tau AS (SELECT source, pr AS tau FROM r WHERE rn = 4),
    s AS (SELECT * FROM r WHERE rn <= 3)
    SELECT s.source,
           list_sort(list(CAST(s.doc_id AS BIGINT)))       AS sampled_ids,
           CAST(SUM(CASE WHEN CAST(s.n_chars AS BIGINT)
                              > COALESCE(t.tau, 0)
                         THEN CAST(s.n_chars AS BIGINT)
                         ELSE t.tau END) AS BIGINT)        AS est_total_chars,
           (SELECT CAST(SUM(n_chars) AS BIGINT)
            FROM documents d WHERE d.source = s.source)    AS true_total_chars
    FROM s LEFT JOIN tau t ON s.source = t.source
    GROUP BY s.source
    """,
    tags=("sampling", "priority", "pps", "weighted", "estimator",
          "exact_arithmetic"),
    description=(
        "priority sampling (Duffield-Lund-Thorup): 3 docs per source "
        "weighted by n_chars via the integer priority surrogate "
        "(w*M) DIV (hash+1) — big documents sampled preferentially, "
        "rng-free and retry-deterministic — PLUS the scheme's point: "
        "the (k+1)-th priority is the threshold tau making "
        "sum(max(w, tau)) over the sample an unbiased estimate of the "
        "source's TOTAL character mass, emitted beside the true total "
        "as a visible audit.  Ranking runs the salted two-phase window "
        "top-k so a hot source spreads over 8 phase-1 reducers; all "
        "arithmetic is BIGINT floor ops both engines evaluate "
        "identically"
    ),
)
def sample_priority_pps(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    ranked = sampling.priority_sample_per_key(
        d, "source", "doc_id", "n_chars", k=3
    )
    tau = ranked.filter(F.col("rnk") == 4).select(
        "source", F.col("_pr").alias("_tau")
    )
    s = ranked.filter(F.col("rnk") <= 3).join(tau, "source", "left")
    totals = d.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("true_total_chars")
    )
    est = (
        s.groupBy("source")
        .agg(
            F.sort_array(F.collect_list(F.col("doc_id").cast("long"))).alias(
                "sampled_ids"
            ),
            F.expr(
                "CAST(SUM(CASE WHEN CAST(n_chars AS BIGINT) "
                "> COALESCE(_tau, 0) "
                "THEN CAST(n_chars AS BIGINT) ELSE _tau END) "
                "AS BIGINT)"
            ).alias("est_total_chars"),
        )
    )
    return est.join(totals, "source").select(
        "source", "sampled_ids", "est_total_chars", "true_total_chars"
    )


@register(
    "pack_padding_waste",
    """
    WITH d AS (
        SELECT len(string_split(text, ' ')) AS n_tokens FROM documents),
    l AS (SELECT unnest([256, 512, 1024]) AS ctx_len),
    w AS (
        SELECT ctx_len,
               n_tokens,
               ((n_tokens + ctx_len - 1) // ctx_len) AS n_seqs
        FROM d, l)
    SELECT CAST(ctx_len AS BIGINT) AS ctx_len,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_seqs) AS BIGINT) AS n_sequences,
           CAST(sum(n_seqs * ctx_len - n_tokens) AS BIGINT) AS padding_tokens,
           CAST((10000 * sum(n_seqs * ctx_len - n_tokens))
                // (sum(n_seqs) * ctx_len) AS BIGINT) AS waste_bp
    FROM w GROUP BY ctx_len
    """,
    tags=("sampling", "packing", "padding", "llm", "exact_arithmetic"),
    description=(
        "sequence-packing efficiency audit: for candidate context "
        "lengths 256/512/1024, the padding a naive one-doc-per-"
        "sequence loader wastes (each doc occupies ceil(n/L) "
        "sequences; waste = seqs*L - n), in exact integer tokens and "
        "floor basis points of the token budget — the number that "
        "decides whether example packing (pack_token_shards) is worth "
        "turning on and at which context length.  One row-local "
        "projection cross-joined with a 3-row literal, one map-side-"
        "combined aggregate; corpus-scale by construction"
    ),
)
def pack_padding_waste(spark: SparkSession, sf_dir: str):
    # NULL-text guard: under non-ANSI Spark size(NULL array) is -1
    # (legacy sizeOfNull) while DuckDB's len() is NULL — the explicit
    # CASE keeps both engines skipping NULL docs identically (verified
    # on the nulled null_sweep fixture).
    d = t(spark, sf_dir, "documents").select(
        F.expr(
            "CASE WHEN text IS NULL THEN NULL "
            "ELSE size(split(text, ' ')) END"
        ).cast("long").alias("n_tokens")
    )
    l = spark.createDataFrame([(256,), (512,), (1024,)], "ctx_len long")
    w = d.crossJoin(F.broadcast(l)).withColumn(
        "n_seqs", F.expr("(n_tokens + ctx_len - 1) DIV ctx_len")
    )
    return w.groupBy("ctx_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("n_seqs").cast("long").alias("n_sequences"),
        F.sum(F.expr("n_seqs * ctx_len - n_tokens"))
        .cast("long")
        .alias("padding_tokens"),
        F.expr(
            "CAST((10000 * sum(n_seqs * ctx_len - n_tokens)) "
            "DIV (sum(n_seqs) * ctx_len) AS BIGINT)"
        ).alias("waste_bp"),
    )
