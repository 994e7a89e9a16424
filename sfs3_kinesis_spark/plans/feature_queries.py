"""Feature-engineering query plans (round-2 green-field family).

The ML-side of a training-data platform: turning curated corpus
tables into model-ready features.  The reference has no feature
surface at all (its per-record "features" are literal struct merges,
aprocess.js:68-179 — SURVEY.md §2.3); these are the operators a
feature store / pretraining featurizer runs at corpus scale:

* hashing-trick bag-of-words (fixed-width vectors, no vocab build)
* leave-one-out target encoding (the no-leakage categorical encoder)
* robust scaling parameters (exact quantiles + IQR outlier fence)
* one-hot vocabulary induction (frequency-ranked contiguous indices)
* OOV-rate audit against a top-k vocabulary
* incremental inverted-index maintenance (base + delta batch)

All arithmetic is exact-integer (md5 integer grid for hashes, cents
for money, basis points for ratios, truncating division) so every
result value-matches the DuckDB oracle bit-for-bit — the corpus
conventions of ``plans/core.py``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

from sfs3_kinesis_spark.plans.core import register, t, t_nonnull

#: hashing-trick width and the OOV vocabulary size — shared by the
#: Spark callables and the oracles (single source of truth).
FH_BUCKETS = 16
VOCAB_TOPK = 32

#: cross-engine md5→BIGINT idiom (same basis as dedup_minhash_exact):
#: 15 hex chars = 60 bits, safely inside BIGINT on both engines.
_MD5_SPARK = "CAST(conv(substr(md5({s}), 1, 15), 16, 10) AS BIGINT)"
_MD5_DUCK = "CAST(('0x' || substr(md5({s}), 1, 15)) AS BIGINT)"


def _fh_oracle() -> str:
    buckets = ", ".join(
        f"count(*) FILTER (WHERE b = {i})" for i in range(FH_BUCKETS)
    )
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    hb AS (
        SELECT doc_id, {_MD5_DUCK.format(s="term")} % {FH_BUCKETS} AS b FROM tok)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_toks,
           [{buckets}] AS fv
    FROM hb GROUP BY doc_id
    """


@register(
    "feature_hashing_trick",
    _fh_oracle(),
    tags=("feature", "hashing_trick", "text", "vectorize"),
    description=(
        "hashing-trick bag-of-words (Weinberger et al. 2009, public): "
        "each token md5-hashes straight into one of %d buckets, so the "
        "fixed-width count vector needs NO vocabulary build, no "
        "dictionary broadcast, and no second pass — the featurizer "
        "that works on an unbounded vocabulary at 100 TB.  One "
        "explode + one groupBy(doc) with conditional counts (map-side "
        "combined); the md5 integer grid makes the bucket assignment "
        "bit-identical across engines" % FH_BUCKETS
    ),
)
def feature_hashing_trick(spark: SparkSession, sf_dir: str):
    tok = t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    hb = tok.select(
        "doc_id",
        (F.expr(_MD5_SPARK.format(s="term")) % FH_BUCKETS).alias("b"),
    )
    return hb.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_toks"),
        F.array(
            *[F.count(F.when(F.col("b") == i, 1)) for i in range(FH_BUCKETS)]
        ).alias("fv"),
    )


@register(
    "feature_target_encoding_loo",
    """
    WITH c AS (
        SELECT o_orderkey, o_orderpriority AS category,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders),
    g AS (SELECT category, sum(cents) AS s, count(*) AS n FROM c GROUP BY category)
    SELECT o_orderkey, category,
           CAST(CASE WHEN n > 1
                     THEN (10000 * (s - cents)) // (n - 1)
                     ELSE NULL END AS BIGINT) AS loo_enc_scaled
    FROM c JOIN g USING (category)
    """,
    tags=("feature", "target_encoding", "leakage_safe", "agg"),
    description=(
        "leave-one-out target encoding: each row's category is encoded "
        "as the mean target (order total, cents x1e4) of all OTHER rows "
        "in the category — the encoder that cannot leak a row's own "
        "label into its feature.  Computed from one tiny per-category "
        "(sum, count) aggregate broadcast back onto the fact "
        "((s - x)/(n - 1), exact truncating integer arithmetic), so "
        "the LOO 'exclusion' costs one subtraction, not a per-row "
        "anti-join; singleton categories encode NULL on both engines"
    ),
)
def feature_target_encoding_loo(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("category"),
        F.expr("CAST(floor(o_totalprice * 100 + 0.5D) AS BIGINT)").alias("cents"),
    )
    g = c.groupBy("category").agg(F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n"))
    return c.join(F.broadcast(g), "category").select(
        "o_orderkey",
        "category",
        F.expr(
            "CAST(CASE WHEN n > 1 THEN (10000 * (s - cents)) DIV (n - 1) "
            "ELSE NULL END AS BIGINT)"
        ).alias("loo_enc_scaled"),
    )


@register(
    "feature_robust_scale_params",
    """
    WITH c AS (
        SELECT event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL),
    r AS (
        SELECT event_type, cents,
               row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM c),
    q AS (
        SELECT event_type,
               max(n) AS n,
               min(cents) AS min_cents,
               max(cents) AS max_cents,
               sum(CASE WHEN rn = greatest(1, (25 * n + 99) // 100)
                        THEN cents END) AS q1,
               sum(CASE WHEN rn = greatest(1, (75 * n + 99) // 100)
                        THEN cents END) AS q3
        FROM r GROUP BY event_type),
    f AS (
        SELECT *, q1 - (3 * (q3 - q1)) // 2 AS lo, q3 + (3 * (q3 - q1)) // 2 AS hi
        FROM q)
    SELECT f.event_type,
           CAST(f.n AS BIGINT) AS n_rows,
           CAST(f.min_cents AS BIGINT) AS min_cents,
           CAST(f.max_cents AS BIGINT) AS max_cents,
           CAST(f.q1 AS BIGINT) AS q1_cents,
           CAST(f.q3 AS BIGINT) AS q3_cents,
           CAST(count(*) FILTER (WHERE c.cents < f.lo OR c.cents > f.hi)
                AS BIGINT) AS n_outliers
    FROM f JOIN c ON c.event_type = f.event_type
    GROUP BY 1, 2, 3, 4, 5, 6
    """,
    tags=("feature", "scaling", "quantile", "outlier", "exact_arithmetic"),
    description=(
        "robust-scaler fit: per event type the exact integer quartiles "
        "(ceiling-rank picks over ONE keyed window — the value at a "
        "rank is deterministic under ties because the sorted multiset "
        "is), the IQR outlier fence (q1/q3 -/+ 1.5*IQR in truncating "
        "integer arithmetic), and the count of rows the fence would "
        "clip — the parameter table a production normalizer broadcasts "
        "to every executor.  One keyed window pass + one tiny "
        "broadcast-back count"
    ),
)
def feature_robust_scale_params(spark: SparkSession, sf_dir: str):
    c = t_nonnull(spark, sf_dir, "events", "value").select(
        "event_type",
        F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)").alias("cents"),
    )
    w = W.partitionBy("event_type").orderBy("cents")
    wn = W.partitionBy("event_type")
    r = c.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(wn)
    )
    q = r.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
        F.sum(
            F.when(F.col("rn") == F.expr("greatest(1, (25 * n + 99) DIV 100)"), F.col("cents"))
        ).alias("q1"),
        F.sum(
            F.when(F.col("rn") == F.expr("greatest(1, (75 * n + 99) DIV 100)"), F.col("cents"))
        ).alias("q3"),
    )
    f = q.withColumn("lo", F.expr("q1 - (3 * (q3 - q1)) DIV 2")).withColumn(
        "hi", F.expr("q3 + (3 * (q3 - q1)) DIV 2")
    )
    return (
        c.join(F.broadcast(f), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_rows"),
            F.max("min_cents").cast("long").alias("min_cents"),
            F.max("max_cents").cast("long").alias("max_cents"),
            F.max("q1").cast("long").alias("q1_cents"),
            F.max("q3").cast("long").alias("q3_cents"),
            F.count(
                F.when((F.col("cents") < F.col("lo")) | (F.col("cents") > F.col("hi")), 1)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


@register(
    "feature_onehot_vocab",
    """
    WITH g AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    tot AS (SELECT sum(n) AS total FROM g)
    SELECT source,
           CAST(row_number() OVER (ORDER BY n DESC, source) - 1 AS BIGINT)
               AS onehot_idx,
           CAST(n AS BIGINT) AS n_docs,
           CAST((10000 * n) // total AS BIGINT) AS share_bp
    FROM g, tot
    """,
    tags=("feature", "onehot", "vocab", "agg"),
    description=(
        "one-hot vocabulary induction: categories ranked by frequency "
        "(name tiebreak) into contiguous indices 0..|V|-1 plus their "
        "corpus share in basis points — the mapping table an encoder "
        "broadcasts.  The rank runs over the CATEGORY table (already "
        "aggregated), never the corpus — and because high-cardinality "
        "categoricals make |V| unbounded in principle, it uses the "
        "two-phase bucketed global_rank rather than a single-partition "
        "window (r02 verdict #5)"
    ),
)
def feature_onehot_vocab(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.scale import global_rank

    g = t(spark, sf_dir, "documents").groupBy("source").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = g.agg(F.sum("n").alias("total"))
    # the category table is a vocabulary — unbounded in principle
    # (high-cardinality categoricals), so the index assignment is the
    # two-phase bucketed global_rank, not a single-partition window
    ranked = global_rank(g, ["-n", "source"], out_col="_rk")
    return ranked.join(F.broadcast(tot)).select(
        "source",
        (F.col("_rk") - 1).cast("long").alias("onehot_idx"),
        F.col("n").cast("long").alias("n_docs"),
        F.expr("CAST((10000 * n) DIV total AS BIGINT)").alias("share_bp"),
    )


@register(
    "vocab_oov_audit",
    f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    freq AS (SELECT term, count(*) AS n FROM tok GROUP BY term),
    vocab AS (
        SELECT term FROM freq ORDER BY n DESC, term LIMIT {VOCAB_TOPK}),
    m AS (
        SELECT tok.doc_id,
               count(*) AS n_toks,
               count(*) FILTER (WHERE vocab.term IS NULL) AS n_oov
        FROM tok LEFT JOIN vocab ON tok.term = vocab.term
        GROUP BY tok.doc_id)
    SELECT doc_id,
           CAST(n_toks AS BIGINT) AS n_toks,
           CAST(n_oov AS BIGINT) AS n_oov,
           CAST((10000 * n_oov) // n_toks AS BIGINT) AS oov_bp
    FROM m
    """,
    tags=("feature", "vocab", "oov", "text", "tokenizer"),
    description=(
        "out-of-vocabulary audit against the top-%d corpus vocabulary "
        "(frequency-ranked, term tiebreak): per-document OOV token "
        "count and rate in basis points — the tokenizer-coverage "
        "check run before committing to a vocab size.  The vocab is a "
        "top-k over the (small) term-frequency table, broadcast back "
        "as a left join onto the token stream; token explode is the "
        "only data-sized shuffle" % VOCAB_TOPK
    ),
)
def vocab_oov_audit(spark: SparkSession, sf_dir: str):
    tok = t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    vocab = freq.orderBy(F.desc("n"), "term").limit(VOCAB_TOPK).select(
        "term", F.lit(1).alias("in_vocab")
    )
    m = (
        tok.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.count(F.when(F.col("in_vocab").isNull(), 1)).alias("n_oov"),
        )
    )
    return m.select(
        "doc_id",
        F.col("n_toks").cast("long").alias("n_toks"),
        F.col("n_oov").cast("long").alias("n_oov"),
        F.expr("CAST((10000 * n_oov) DIV n_toks AS BIGINT)").alias("oov_bp"),
    )


@register(
    "index_delta_update",
    """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    base AS (
        SELECT term, count(DISTINCT doc_id) AS df
        FROM tok WHERE doc_id % 10 <> 0 GROUP BY term),
    delta AS (
        SELECT term, count(DISTINCT doc_id) AS df
        FROM tok WHERE doc_id % 10 = 0 GROUP BY term)
    SELECT coalesce(base.term, delta.term) AS term,
           CAST(coalesce(base.df, 0) AS BIGINT) AS df_base,
           CAST(coalesce(delta.df, 0) AS BIGINT) AS df_delta,
           CAST(coalesce(base.df, 0) + coalesce(delta.df, 0) AS BIGINT) AS df_total,
           CASE WHEN base.term IS NULL THEN 'new'
                WHEN delta.term IS NULL THEN 'unchanged'
                ELSE 'grown' END AS status
    FROM base FULL OUTER JOIN delta ON base.term = delta.term
    """,
    tags=("retrieval", "index_maintenance", "incremental", "text"),
    description=(
        "incremental inverted-index maintenance: a delta batch (every "
        "10th doc) is indexed alone and merged into the base index "
        "with a full-outer join on the term key, classifying each "
        "term as new / grown / unchanged — the MERGE an incremental "
        "indexer runs per ingest batch instead of rebuilding the "
        "corpus index.  Both sub-indexes and the merge share one term "
        "partitioning, so Catalyst plans a single shuffle"
    ),
)
def index_delta_update(spark: SparkSession, sf_dir: str):
    tok = t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    base = (
        tok.filter(F.col("doc_id") % 10 != 0)
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df_b"))
    )
    delta = (
        tok.filter(F.col("doc_id") % 10 == 0)
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df_d"))
    )
    j = base.join(delta, "term", "full_outer")
    return j.select(
        "term",
        F.coalesce("df_b", F.lit(0)).cast("long").alias("df_base"),
        F.coalesce("df_d", F.lit(0)).cast("long").alias("df_delta"),
        (F.coalesce("df_b", F.lit(0)) + F.coalesce("df_d", F.lit(0)))
        .cast("long")
        .alias("df_total"),
        F.when(F.col("df_b").isNull(), "new")
        .when(F.col("df_d").isNull(), "unchanged")
        .otherwise("grown")
        .alias("status"),
    )


@register(
    "text_bpe_merge_induction",
    """
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    wc AS (SELECT w, count(*) AS n FROM tok GROUP BY w),
    pr AS (
        SELECT n, unnest([w[i:i+1] FOR i IN range(1, len(w))]) AS pair
        FROM wc WHERE len(w) >= 2)
    SELECT pair,
           CAST(sum(n) AS BIGINT) AS n_occurrences,
           CAST(count(*) AS BIGINT) AS n_word_types
    FROM pr GROUP BY pair
    ORDER BY n_occurrences DESC, pair LIMIT 20
    """,
    tags=("text", "bpe", "tokenizer", "vocab"),
    description=(
        "BPE merge induction, first step (Sennrich et al. 2016, "
        "public): corpus-weighted adjacent character-pair counts — the "
        "statistic whose argmax becomes the first merge rule of a BPE "
        "tokenizer.  The key scale move: aggregate the corpus to "
        "(word, count) FIRST (vocabulary-sized, not corpus-sized), "
        "then explode pairs over word TYPES weighted by token count — "
        "at 100 TB the pair explosion runs over the tiny type table; "
        "top-20 with full (count DESC, pair) tiebreak"
    ),
)
def text_bpe_merge_induction(spark: SparkSession, sf_dir: str):
    tok = t(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("w")
    )
    wc = tok.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    pr = (
        wc.filter(F.length("w") >= 2)
        .select(
            "n",
            F.explode(
                F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
            ).alias("pair"),
        )
    )
    return (
        pr.groupBy("pair")
        .agg(
            F.sum("n").cast("long").alias("n_occurrences"),
            F.count(F.lit(1)).cast("long").alias("n_word_types"),
        )
        .orderBy(F.desc("n_occurrences"), "pair")
        .limit(20)
    )


@register(
    "profile_completeness",
    """
    WITH s AS (
        SELECT count(*) AS n_rows,
               count(event_id) AS nn_event_id, count(DISTINCT event_id) AS nd_event_id,
               count(ts) AS nn_ts, count(DISTINCT ts) AS nd_ts,
               count(user_id) AS nn_user_id, count(DISTINCT user_id) AS nd_user_id,
               count(event_type) AS nn_event_type,
               count(DISTINCT event_type) AS nd_event_type,
               count(value) AS nn_value, count(DISTINCT value) AS nd_value,
               count(props) AS nn_props, count(DISTINCT props) AS nd_props
        FROM events)
    SELECT 'event_id' AS column_name, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_rows - nn_event_id AS BIGINT) AS n_nulls,
           CAST(nd_event_id AS BIGINT) AS n_distinct FROM s
    UNION ALL SELECT 'ts', n_rows, n_rows - nn_ts, nd_ts FROM s
    UNION ALL SELECT 'user_id', n_rows, n_rows - nn_user_id, nd_user_id FROM s
    UNION ALL SELECT 'event_type', n_rows, n_rows - nn_event_type, nd_event_type FROM s
    UNION ALL SELECT 'value', n_rows, n_rows - nn_value, nd_value FROM s
    UNION ALL SELECT 'props', n_rows, n_rows - nn_props, nd_props FROM s
    """,
    tags=("quality", "profiling", "data_ops", "agg"),
    description=(
        "table profiling (completeness + cardinality): per column the "
        "exact null count and distinct count in ONE scan — the "
        "profile a catalog publishes per ingest batch.  All six "
        "distinct aggregates share a single Expand-based aggregate "
        "pass (Catalyst's multi-distinct rewrite), then the one-row "
        "stat vector unpivots to the per-column report; no per-column "
        "rescans"
    ),
)
def profile_completeness(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    s = e.agg(*aggs)
    stack = ", ".join(f"'{c}', n_rows - nn_{c}, nd_{c}" for c in cols)
    return s.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS (column_name, n_nulls, n_distinct)"
        ),
        "n_rows",
    ).select(
        "column_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
    )


@register(
    "feature_equidepth_bins",
    """
    WITH c AS (
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders WHERE o_totalprice IS NOT NULL),
    r AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents, o_orderkey) AS rnk,
               count(*) OVER () AS n
        FROM c)
    SELECT CAST((rnk - 1) * 10 // n AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(cents) AS BIGINT) AS min_cents,
           CAST(max(cents) AS BIGINT) AS max_cents
    FROM r GROUP BY bin
    """,
    tags=("feature", "binning", "equidepth", "global_rank", "exact_arithmetic"),
    description=(
        "equi-depth (decile) discretization of order totals — the "
        "standard numeric-feature binning / histogram-equalization "
        "step: bin = (global_rank - 1) * 10 div N over a TOTAL order "
        "(cents, orderkey tie-break), reported as per-bin row count "
        "and exact cents boundaries.  The rank comes from the "
        "two-phase bucketed global_rank (operators/scale.py), never a "
        "single-partition ORDER BY window, so the binning survives a "
        "fact-table input; the oracle spells the same arithmetic with "
        "a plain window.  Bin boundaries then drive downstream "
        "quantile-bucketed encoders and stratified samplers"
    ),
)
def feature_equidepth_bins(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.scale import global_rank

    o = t_nonnull(spark, sf_dir, "orders", "o_totalprice").select(
        "o_orderkey",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5D) AS BIGINT)").alias("cents"),
    )
    total = o.groupBy().agg(F.count(F.lit(1)).alias("n"))
    r = global_rank(o, ["cents", "o_orderkey"])
    binned = r.join(F.broadcast(total)).select(
        "cents", F.expr("CAST((rnk - 1) * 10 DIV n AS BIGINT)").alias("bin")
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("cents").cast("long").alias("min_cents"),
        F.max("cents").cast("long").alias("max_cents"),
    )


#: embeddings fixture dim for the Gram oracle (errors on drift, same
#: posture as the k-means oracle's chk CTE)
GRAM_DIM = 64
GRAM_SCALE = 1000


@register(
    "feature_gram_covariance",
    f"""
    WITH chk AS (
      SELECT CASE WHEN min(len(embedding)) = {GRAM_DIM}
                   AND max(len(embedding)) = {GRAM_DIM} THEN 1
             ELSE CAST(error('embeddings dim <> {GRAM_DIM}') AS INT) END AS ok
      FROM embeddings),
    v AS (
      SELECT vec_id AS id, r.i - 1 AS idx,
             CAST(floor(CAST(embedding[r.i] AS DOUBLE) * {GRAM_SCALE} + 0.5)
                  AS HUGEINT) AS val
      FROM embeddings, range(1, {GRAM_DIM + 1}) r(i), chk WHERE chk.ok = 1),
    g AS (SELECT a.idx AS i, b.idx AS j, sum(a.val * b.val) AS sxy
          FROM v a JOIN v b ON a.id = b.id AND a.idx <= b.idx GROUP BY 1, 2),
    s AS (SELECT idx, sum(val) AS sx FROM v GROUP BY idx),
    n AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings)
    SELECT CAST(g.i AS INT) AS i, CAST(g.j AS INT) AS j,
           CAST(n.n AS BIGINT) AS n_rows,
           CAST(CAST(g.sxy AS DECIMAL(38,0)) AS VARCHAR) AS sxy,
           CAST(CAST(n.n * g.sxy - sa.sx * sb.sx AS DECIMAL(38,0)) AS VARCHAR)
               AS cov_scaled
    FROM g JOIN s sa ON sa.idx = g.i JOIN s sb ON sb.idx = g.j CROSS JOIN n
    """,
    tags=("feature", "linalg", "covariance", "gram", "pca", "exact_arithmetic"),
    description=(
        "one-pass Gram/covariance moments over the embedding corpus: "
        "the upper-triangle d x d Gram matrix, per-dimension sums, and "
        "the row count all come out of ONE corpus scan (an Arrow-"
        "batched numpy X^T X per ~10k-row batch emitting d(d+1)/2+d+1 "
        "tiny partials; the only shuffle carries O(d^2) scalars per "
        "batch, never rows), then the scaled covariance n*Sxy - Sx*Sy "
        "is derived in DECIMAL(38,0) — the moment kernel behind PCA "
        "whitening, normal-equation OLS, and feature-correlation "
        "pruning at 100 TB.  Exact integer grid (x1000) makes the "
        "result bit-identical to the oracle's unnest self-join "
        "formulation; DECIMALs emit as canonical digit strings"
    ),
)
def feature_gram_covariance(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.similarity import gram_moments

    mo = gram_moments(
        t(spark, sf_dir, "embeddings"), scale=GRAM_SCALE
    )
    gram = mo.filter("i >= 0 AND j >= 0")
    sums = mo.filter("i >= 0 AND j = -1").select(
        F.col("i").alias("k"), F.col("s").alias("sx")
    )
    n = mo.filter("i = -1").select(F.col("s").alias("n"))
    return (
        gram.join(F.broadcast(sums.select(F.col("k").alias("i"), F.col("sx").alias("sxi"))), "i")
        .join(F.broadcast(sums.select(F.col("k").alias("j"), F.col("sx").alias("sxj"))), "j")
        .join(F.broadcast(n))
        .select(
            F.col("i").cast("int").alias("i"),
            F.col("j").cast("int").alias("j"),
            F.col("n").cast("long").alias("n_rows"),
            F.col("s").cast("decimal(38,0)").cast("string").alias("sxy"),
            F.expr("CAST(n * s - sxi * sxj AS DECIMAL(38,0))")
            .cast("string")
            .alias("cov_scaled"),
        )
    )


#: chi-square feature-selection knobs (shared by Spark and oracle)
CHI2_MIN_SUPPORT = 5
CHI2_TOPK = 10


@register(
    "feature_chi2_token_lang",
    f"""
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents),
    ct AS (SELECT term, lang, CAST(count(*) AS BIGINT) AS a FROM tok GROUP BY 1, 2),
    tt AS (SELECT term, CAST(count(*) AS BIGINT) AS t_tot FROM tok GROUP BY 1),
    lt AS (SELECT lang, CAST(count(*) AS BIGINT) AS l_tot FROM tok GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok),
    x AS (
      SELECT ct.lang, ct.term, ct.a,
             CAST(ct.a AS HUGEINT) * tot.n
               - CAST(tt.t_tot AS HUGEINT) * lt.l_tot AS diff,
             CAST(tt.t_tot AS HUGEINT) * (tot.n - tt.t_tot)
               * lt.l_tot * (tot.n - lt.l_tot) AS den,
             tot.n
      FROM ct JOIN tt USING (term) JOIN lt USING (lang) CROSS JOIN tot
      WHERE ct.a >= {CHI2_MIN_SUPPORT}
        AND tt.t_tot < tot.n AND lt.l_tot < tot.n),
    sc AS (
      SELECT lang, term, a,
             CAST((100 * CAST(n AS HUGEINT) * diff * diff) // den AS BIGINT)
                 AS chi2_x100
      FROM x)
    SELECT lang, term, CAST(a AS BIGINT) AS n_cooccur, chi2_x100,
           CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, row_number() OVER (
              PARTITION BY lang ORDER BY chi2_x100 DESC, term) AS rnk
          FROM sc) r
    WHERE rnk <= {CHI2_TOPK}
    """,
    tags=("feature", "selection", "chi2", "text", "exact_arithmetic"),
    description=(
        "chi-square token<->language feature selection: per (term, "
        "lang) the 2x2 contingency chi^2 statistic in exact integer "
        "cross-multiplication (ad - bc collapses to a*N - t*l, so one "
        "token-pair rollup + two broadcast marginals feed the whole "
        "statistic; DECIMAL(38,0) keeps N*(aN-tl)^2 exact), min-"
        "support %d, top-%d terms per language (chi2 desc, term "
        "tiebreak) over the vocab-sized rollup — the feature-selection "
        "sweep a classifier-data curator runs, shaped so the only "
        "corpus-sized work is the token explode + one term-keyed "
        "shuffle shared by the pair and marginal aggregates"
        % (CHI2_MIN_SUPPORT, CHI2_TOPK)
    ),
)
def feature_chi2_token_lang(spark: SparkSession, sf_dir: str):
    tok = t(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split("text", " ")).alias("term")
    )
    ct = tok.groupBy("term", "lang").agg(F.count(F.lit(1)).alias("a"))
    tt = tok.groupBy("term").agg(F.count(F.lit(1)).alias("t_tot"))
    lt = tok.groupBy("lang").agg(F.count(F.lit(1)).alias("l_tot"))
    tot = tok.agg(F.count(F.lit(1)).alias("n"))
    x = (
        ct.join(tt, "term")
        .join(F.broadcast(lt), "lang")
        .join(F.broadcast(tot))
        .filter(
            (F.col("a") >= CHI2_MIN_SUPPORT)
            & (F.col("t_tot") < F.col("n"))
            & (F.col("l_tot") < F.col("n"))
        )
        .select(
            "lang",
            "term",
            "a",
            F.expr(
                "CAST(CAST(a AS DECIMAL(38,0)) * n "
                "- CAST(t_tot AS DECIMAL(38,0)) * l_tot AS DECIMAL(38,0))"
            ).alias("diff"),
            F.expr(
                "CAST(CAST(CAST(t_tot AS DECIMAL(38,0)) * (n - t_tot) AS DECIMAL(38,0)) "
                "* CAST(CAST(l_tot AS DECIMAL(38,0)) * (n - l_tot) AS DECIMAL(38,0)) "
                "AS DECIMAL(38,0))"
            ).alias("den"),
            F.col("n"),
        )
    )
    # numerator 100 * n * diff^2 in stepwise DECIMAL(38,0); the
    # floor division (num - num % den) / den is exact because both
    # operands are non-negative (diff is squared)
    sc = x.select(
        "lang",
        "term",
        "a",
        F.expr(
            "CAST((CAST(CAST(100 * CAST(n AS DECIMAL(38,0)) * diff AS DECIMAL(38,0)) "
            "* diff AS DECIMAL(38,0))) AS DECIMAL(38,0))"
        ).alias("_num"),
        "den",
    ).select(
        "lang",
        "term",
        "a",
        F.expr("CAST((_num - _num % den) / den AS BIGINT)").alias("chi2_x100"),
    )
    w = W.partitionBy("lang").orderBy(F.desc("chi2_x100"), F.asc("term"))
    return (
        sc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= CHI2_TOPK)
        .select(
            "lang",
            "term",
            F.col("a").cast("long").alias("n_cooccur"),
            "chi2_x100",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


PCA_ITER = 40
PCA_VSCALE = 1_000_000


def _pca_oracle(iterations: int = PCA_ITER, dim: int = GRAM_DIM,
                scale: int = GRAM_SCALE, vscale: int = PCA_VSCALE) -> str:
    """Power iteration UNROLLED into chained CTEs (one matrix-vector
    multiply + renormalize per iteration) — bit-for-bit the driver-
    side integer loop in ``pca_power_scores``: DuckDB's ``//``
    truncates toward zero, and the Spark-side loop uses sign-
    magnitude truncation to match.  A degenerate C·v = 0 step keeps
    the previous vector on both sides."""
    steps = []
    for k in range(iterations):
        steps.append(f"""
    w{k} AS MATERIALIZED (SELECT c.i AS idx, sum(c.cv * p.val) AS wv
             FROM cmat c JOIN it{k} p ON p.idx = c.j GROUP BY c.i),
    m{k} AS MATERIALIZED (SELECT max(abs(wv)) AS m FROM w{k}),
    it{k + 1} AS MATERIALIZED (
        SELECT w.idx,
               CAST(coalesce((w.wv * {vscale}) // NULLIF(m.m, 0), p.val)
                    AS HUGEINT) AS val
        FROM w{k} w JOIN it{k} p ON p.idx = w.idx CROSS JOIN m{k} m)""")
    return f"""
    WITH chk AS (
      SELECT CASE WHEN min(len(embedding)) = {dim}
                   AND max(len(embedding)) = {dim} THEN 1
             ELSE CAST(error('embeddings dim <> {dim}') AS INT) END AS ok
      FROM embeddings),
    v AS MATERIALIZED (
      SELECT vec_id AS id, r.i - 1 AS idx,
             CAST(floor(CAST(embedding[r.i] AS DOUBLE) * {scale} + 0.5)
                  AS HUGEINT) AS val
      FROM embeddings, range(1, {dim + 1}) r(i), chk WHERE chk.ok = 1),
    g AS MATERIALIZED (SELECT a.idx AS i, b.idx AS j, sum(a.val * b.val) AS sxy
          FROM v a JOIN v b ON a.id = b.id GROUP BY 1, 2),
    s AS MATERIALIZED (SELECT idx, sum(val) AS sx FROM v GROUP BY idx),
    nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings),
    cmat AS MATERIALIZED (SELECT g.i, g.j, nn.n * g.sxy - sa.sx * sb.sx AS cv
             FROM g JOIN s sa ON sa.idx = g.i JOIN s sb ON sb.idx = g.j
             CROSS JOIN nn),
    it0 AS MATERIALIZED (SELECT r.i - 1 AS idx, CAST({vscale} AS HUGEINT) AS val
            FROM range(1, {dim + 1}) r(i)),{",".join(steps)},
    proj AS (SELECT v.id, sum(v.val * p.val) AS sc
             FROM v JOIN it{iterations} p ON p.idx = v.idx GROUP BY v.id)
    SELECT CAST(id AS BIGINT) AS vec_id, CAST(sc AS BIGINT) AS pc1_score
    FROM proj
    """


@register(
    "feature_pca_power_scores",
    _pca_oracle(),
    tags=("feature", "pca", "linalg", "power_iteration", "exact_arithmetic"),
    description=(
        "first-principal-component projection, exact end to end: the "
        "d x d integer covariance comes from ONE distributed Gram "
        "scan (Arrow-batched X^T X partials), %d power-iteration "
        "steps run driver-side on that bounded matrix (integer "
        "matrix-vector products, renormalized to |v|=1e6 by sign-"
        "magnitude truncating division — the semantics DuckDB's // "
        "shares, so the oracle unrolls the SAME loop in chained CTEs "
        "and matches bit-for-bit), and the corpus projection x·v is "
        "one codegen zip_with aggregate.  The whitening/dim-reduction "
        "pre-pass of an embedding pipeline with NO float anywhere — "
        "deterministic under retries, partitionings, and engines; "
        "driver state is d^2 ints, never corpus rows" % PCA_ITER
    ),
)
def feature_pca_power_scores(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.similarity import pca_power_scores

    return pca_power_scores(
        t(spark, sf_dir, "embeddings"),
        scale=GRAM_SCALE,
        iterations=PCA_ITER,
        vscale=PCA_VSCALE,
    )
