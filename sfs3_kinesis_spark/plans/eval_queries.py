"""Model-evaluation query plans (round-4 green-field family).

A training-data platform does not stop at producing corpora — it
grades the models trained on them, at corpus scale, without pulling
predictions to one machine.  The reference has no evaluation surface
(its only "metric" is the CloudWatch success counter,
svcsample/pollingsvc.js:38-41 — SURVEY.md §2.12); these are the
distributed evaluation operators every ML platform runs:

* rank-sum AUC (Mann-Whitney U) — tie-aware, via a distinct-score
  rollup + the two-phase ``global_cumsum``; never a single-reducer
  ORDER BY over the prediction table
* per-segment AUC — the same statistic partitioned by a dimension
  (language), the fairness / slice-regression readout
* confusion matrix with per-class precision / recall / F1
* Cohen's kappa — agreement vs chance, exact integer numerator and
  denominator (no truncating division: Spark ``DIV`` truncates
  toward zero while DuckDB ``//`` floors, so a possibly-negative
  quotient is NOT cross-engine stable — the split readout is)
* calibration deciles — predicted-percentile buckets vs observed
  positive rate, on the two-phase ``global_rank``

The "model" under evaluation is a deterministic stand-in (the class
scores are the first ten embedding components on the usual integer
grid, the prediction their argmax; the binary score is component 0):
synthetic embeddings carry no real signal, so the metrics read as
chance level — the deliverable is the distributed metric machinery,
which is agnostic to where the score column came from.

All arithmetic is exact-integer on the ``floor(x*SCALE + 0.5)``
grid with truncating division of non-negative quantities only, so
every result value-matches the DuckDB oracle bit-for-bit
(``plans/core.py`` conventions).

Scale notes (the 100 TB question):

* AUC never materializes pairs: U is a sum over the distinct-score
  rollup of ``n_pos(s) * cum_n_neg(<s)`` — shuffle-bounded by the
  number of distinct scores, prefix-summed by the bucketed two-phase
  ``global_cumsum`` (operators/scale.py), not one WindowExec
  partition.
* per-segment AUC uses windows PARTITIONED by segment — every
  segment's prefix sum runs in parallel.
* confusion / kappa reduce to a #classes²-row table immediately
  (map-side combine); the class-marginal joins are broadcasts.
* calibration ranks on the two-phase ``global_rank``; the only
  1-row broadcast is the global count (allow-listed pattern).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from sfs3_kinesis_spark.plans.core import register, t

#: integer grid for embedding components — same idiom as
#: quality_embedding_norms / the k-means family (llm_queries.py).
EVAL_SCALE = 10_000_000

#: binary relevance threshold: labels 5..9 are the positive class.
POS_MIN_LABEL = 5

# quantized binary score: embedding component 0 on the integer grid
_SCORE_SPARK = (
    f"CAST(floor(CAST(element_at(embedding, 1) AS DOUBLE)"
    f" * {EVAL_SCALE}D + 0.5D) AS BIGINT)"
)
_SCORE_DUCK = (
    f"CAST(floor(CAST(embedding[1] AS DOUBLE)"
    f" * {EVAL_SCALE} + 0.5) AS BIGINT)"
)

# stand-in classifier: argmax of the first 10 quantized components
# (first occurrence wins ties in BOTH engines: array_position /
# list_position return the first index of the max)
_H_SPARK = (
    f"transform(slice(CAST(embedding AS ARRAY<DOUBLE>), 1, 10), "
    f"x -> CAST(floor(x * {EVAL_SCALE}D + 0.5D) AS BIGINT))"
)
_H_DUCK = (
    f"list_transform(CAST(embedding[1:10] AS DOUBLE[]), "
    f"x -> CAST(floor(x * {EVAL_SCALE} + 0.5) AS BIGINT))"
)
_PRED_DUCK = "CAST(list_position(h, list_aggregate(h, 'max')) - 1 AS BIGINT)"


def _scored(spark: SparkSession, sf_dir: str):
    """embeddings → (vec_id, score_q, pos) on the integer grid."""
    e = t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.expr(_SCORE_SPARK).alias("score_q"),
        F.when(F.col("label") >= POS_MIN_LABEL, 1).otherwise(0).alias("pos"),
    )


def _labeled_pred(spark: SparkSession, sf_dir: str):
    """embeddings → (vec_id, label, pred) via the argmax stand-in."""
    e = t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.expr(_H_SPARK).alias("h"),
    ).select(
        "vec_id",
        "label",
        F.expr(
            "CAST(array_position(h, array_max(h)) - 1 AS BIGINT)"
        ).alias("pred"),
    )


@register(
    "eval_auc_rank_sum",
    f"""
    WITH d AS (
        SELECT {_SCORE_DUCK} AS score_q,
               CASE WHEN label >= {POS_MIN_LABEL} THEN 1 ELSE 0 END AS pos
        FROM embeddings),
    g AS (
        SELECT score_q, sum(pos) AS np, sum(1 - pos) AS nn
        FROM d GROUP BY score_q),
    c AS (
        SELECT np, nn,
               sum(nn) OVER (ORDER BY score_q
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnn
        FROM g)
    SELECT CAST(sum(np) AS BIGINT) AS n_pos,
           CAST(sum(nn) AS BIGINT) AS n_neg,
           CAST(sum(np * (2 * (cnn - nn) + nn)) AS BIGINT) AS u_stat_x2,
           CAST((10000 * sum(np * (2 * (cnn - nn) + nn)))
                // (2 * sum(np) * sum(nn)) AS BIGINT) AS auc_bp
    FROM c
    """,
    tags=("eval", "auc", "rank_sum", "global_cumsum", "exact_arithmetic"),
    description=(
        "tie-aware rank-sum AUC (Mann-Whitney U) of the quantized "
        "component-0 score against the binary label split, computed "
        "pairwise-free: U*2 = sum over DISTINCT scores of "
        "n_pos(s) * (2*n_neg(<s) + n_neg(=s)), with the prefix count "
        "from the bucketed two-phase global_cumsum — shuffle-bounded "
        "by distinct scores, no single-reducer sort, no n^2 pairs.  "
        "auc_bp is the truncating basis-point readout (non-negative, "
        "so Spark DIV == DuckDB //)"
    ),
)
def eval_auc_rank_sum(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.scale import global_cumsum

    d = _scored(spark, sf_dir)
    g = d.groupBy("score_q").agg(
        F.sum("pos").alias("np"),
        F.sum(F.lit(1) - F.col("pos")).alias("nn"),
    )
    c = global_cumsum(g, ["score_q"], {"nn": "cnn"})
    return c.agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
        F.sum(
            F.col("np") * (2 * (F.col("cnn") - F.col("nn")) + F.col("nn"))
        ).cast("long").alias("u_stat_x2"),
        F.expr(
            "CAST((10000 * sum(np * (2 * (cnn - nn) + nn)))"
            " DIV (2 * sum(np) * sum(nn)) AS BIGINT)"
        ).alias("auc_bp"),
    )


@register(
    "eval_auc_by_lang",
    f"""
    WITH d AS (
        SELECT doc.lang AS lang, {_SCORE_DUCK} AS score_q,
               CASE WHEN e.label >= {POS_MIN_LABEL} THEN 1 ELSE 0 END AS pos
        FROM embeddings e JOIN documents doc ON e.vec_id = doc.doc_id),
    g AS (
        SELECT lang, score_q, sum(pos) AS np, sum(1 - pos) AS nn
        FROM d GROUP BY lang, score_q),
    c AS (
        SELECT lang, np, nn,
               sum(nn) OVER (PARTITION BY lang ORDER BY score_q
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnn
        FROM g)
    SELECT lang,
           CAST(sum(np) AS BIGINT) AS n_pos,
           CAST(sum(nn) AS BIGINT) AS n_neg,
           CAST(sum(np * (2 * (cnn - nn) + nn)) AS BIGINT) AS u_stat_x2,
           CAST((10000 * sum(np * (2 * (cnn - nn) + nn)))
                // (2 * sum(np) * sum(nn)) AS BIGINT) AS auc_bp
    FROM c GROUP BY lang
    """,
    tags=("eval", "auc", "segment", "fairness", "exact_arithmetic"),
    description=(
        "per-segment (language) rank-sum AUC — the slice-regression / "
        "fairness readout: same pairwise-free U statistic as "
        "eval_auc_rank_sum but with every window PARTITIONED by the "
        "segment key, so each language's prefix sum runs in parallel "
        "on its own partitions.  embeddings joins documents on the "
        "1:1 vec_id = doc_id key (plain co-keyed equi-join).  "
        "Segments where one class is empty would divide by zero; the "
        "synthetic labels populate both classes in every language, "
        "and the operator contract documents the precondition"
    ),
)
def eval_auc_by_lang(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "embeddings")
    doc = t(spark, sf_dir, "documents").select("doc_id", "lang")
    d = e.join(doc, e.vec_id == doc.doc_id).select(
        "lang",
        F.expr(_SCORE_SPARK).alias("score_q"),
        F.when(F.col("label") >= POS_MIN_LABEL, 1).otherwise(0).alias("pos"),
    )
    g = d.groupBy("lang", "score_q").agg(
        F.sum("pos").alias("np"),
        F.sum(F.lit(1) - F.col("pos")).alias("nn"),
    )
    w = (
        W.partitionBy("lang")
        .orderBy("score_q")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    c = g.withColumn("cnn", F.sum("nn").over(w))
    return c.groupBy("lang").agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
        F.sum(
            F.col("np") * (2 * (F.col("cnn") - F.col("nn")) + F.col("nn"))
        ).cast("long").alias("u_stat_x2"),
        F.expr(
            "CAST((10000 * sum(np * (2 * (cnn - nn) + nn)))"
            " DIV (2 * sum(np) * sum(nn)) AS BIGINT)"
        ).alias("auc_bp"),
    )


@register(
    "eval_confusion_prf",
    f"""
    WITH q AS (
        SELECT CAST(label AS BIGINT) AS label, {_H_DUCK} AS h
        FROM embeddings),
    p AS (SELECT label, {_PRED_DUCK} AS pred FROM q),
    act AS (SELECT label AS cls, count(*) AS n_act FROM p GROUP BY cls),
    prd AS (SELECT pred AS cls, count(*) AS n_prd FROM p GROUP BY cls),
    tp AS (SELECT label AS cls, count(*) AS n_tp FROM p
           WHERE label = pred GROUP BY cls),
    m AS (
        SELECT coalesce(act.cls, prd.cls) AS cls,
               coalesce(n_act, 0) AS n_act, coalesce(n_prd, 0) AS n_prd,
               coalesce(n_tp, 0) AS n_tp
        FROM act FULL OUTER JOIN prd ON act.cls = prd.cls
        LEFT JOIN tp ON coalesce(act.cls, prd.cls) = tp.cls)
    SELECT CAST(cls AS BIGINT) AS cls,
           CAST(n_tp AS BIGINT) AS tp,
           CAST(n_prd - n_tp AS BIGINT) AS fp,
           CAST(n_act - n_tp AS BIGINT) AS fn,
           CAST(CASE WHEN n_prd = 0 THEN 0
                ELSE (10000 * n_tp) // n_prd END AS BIGINT) AS precision_bp,
           CAST(CASE WHEN n_act = 0 THEN 0
                ELSE (10000 * n_tp) // n_act END AS BIGINT) AS recall_bp,
           CAST(CASE WHEN n_prd + n_act = 0 THEN 0
                ELSE (20000 * n_tp) // (n_prd + n_act) END AS BIGINT) AS f1_bp
    FROM m
    """,
    tags=("eval", "confusion", "precision_recall", "f1", "exact_arithmetic"),
    description=(
        "per-class confusion readout (tp / fp / fn) with precision, "
        "recall and F1 in truncating basis points, for the argmax "
        "stand-in classifier over the first ten quantized embedding "
        "components.  The prediction table collapses to class "
        "marginals immediately (map-side combine to <= #classes "
        "rows); the marginal joins are broadcast-sized.  F1 = "
        "2*tp/(n_pred + n_actual) — denominators re-expressed so "
        "every division has a non-negative integer numerator and "
        "positive denominator (cross-engine truncation-safe)"
    ),
)
def eval_confusion_prf(spark: SparkSession, sf_dir: str):
    p = _labeled_pred(spark, sf_dir)
    act = p.groupBy(F.col("label").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_act")
    )
    prd = p.groupBy(F.col("pred").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_prd")
    )
    tp = (
        p.filter(F.col("label") == F.col("pred"))
        .groupBy(F.col("label").alias("cls"))
        .agg(F.count(F.lit(1)).alias("n_tp"))
    )
    m = (
        act.join(prd, "cls", "full_outer")
        .join(tp, "cls", "left")
        .select(
            "cls",
            F.coalesce("n_act", F.lit(0)).alias("n_act"),
            F.coalesce("n_prd", F.lit(0)).alias("n_prd"),
            F.coalesce("n_tp", F.lit(0)).alias("n_tp"),
        )
    )
    return m.select(
        F.col("cls").cast("long").alias("cls"),
        F.col("n_tp").cast("long").alias("tp"),
        (F.col("n_prd") - F.col("n_tp")).cast("long").alias("fp"),
        (F.col("n_act") - F.col("n_tp")).cast("long").alias("fn"),
        F.expr(
            "CAST(CASE WHEN n_prd = 0 THEN 0"
            " ELSE (10000 * n_tp) DIV n_prd END AS BIGINT)"
        ).alias("precision_bp"),
        F.expr(
            "CAST(CASE WHEN n_act = 0 THEN 0"
            " ELSE (10000 * n_tp) DIV n_act END AS BIGINT)"
        ).alias("recall_bp"),
        F.expr(
            "CAST(CASE WHEN n_prd + n_act = 0 THEN 0"
            " ELSE (20000 * n_tp) DIV (n_prd + n_act) END AS BIGINT)"
        ).alias("f1_bp"),
    )


@register(
    "eval_cohens_kappa",
    f"""
    WITH q AS (
        SELECT CAST(label AS BIGINT) AS label, {_H_DUCK} AS h
        FROM embeddings),
    p AS (SELECT label, {_PRED_DUCK} AS pred FROM q),
    tot AS (SELECT count(*) AS n,
                   count(*) FILTER (WHERE label = pred) AS agree FROM p),
    act AS (SELECT label AS cls, count(*) AS n_act FROM p GROUP BY cls),
    prd AS (SELECT pred AS cls, count(*) AS n_prd FROM p GROUP BY cls),
    marg AS (
        SELECT sum(coalesce(n_act, 0) * coalesce(n_prd, 0)) AS s
        FROM act FULL OUTER JOIN prd ON act.cls = prd.cls)
    SELECT CAST(n AS BIGINT) AS n_items,
           CAST(agree AS BIGINT) AS n_agree,
           CAST(s AS BIGINT) AS pe_num_x_n2,
           CAST(n * agree - s AS BIGINT) AS kappa_num,
           CAST(n * n - s AS BIGINT) AS kappa_den
    FROM tot, marg
    """,
    tags=("eval", "kappa", "agreement", "exact_arithmetic"),
    description=(
        "Cohen's kappa between the stored label and the argmax "
        "stand-in prediction: chance-corrected agreement.  kappa = "
        "(n*agree - S) / (n^2 - S) with S = sum over classes of "
        "rowTotal*colTotal, emitted as EXACT integer numerator and "
        "denominator — the quotient can be negative, and Spark's DIV "
        "truncates toward zero while DuckDB's // floors, so a "
        "negative basis-point division is not cross-engine stable; "
        "the split readout is bit-exact and loses nothing.  All "
        "work reduces to class marginals (<= #classes rows) before "
        "any join; the final assembly is two 1-row broadcasts"
    ),
)
def eval_cohens_kappa(spark: SparkSession, sf_dir: str):
    p = _labeled_pred(spark, sf_dir)
    tot = p.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("label") == F.col("pred"), 1)).alias("agree"),
    )
    act = p.groupBy(F.col("label").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_act")
    )
    prd = p.groupBy(F.col("pred").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_prd")
    )
    marg = (
        act.join(prd, "cls", "full_outer")
        .agg(
            F.sum(
                F.coalesce("n_act", F.lit(0)) * F.coalesce("n_prd", F.lit(0))
            ).alias("s")
        )
    )
    return (
        tot.crossJoin(F.broadcast(marg))
        .select(
            F.col("n").cast("long").alias("n_items"),
            F.col("agree").cast("long").alias("n_agree"),
            F.col("s").cast("long").alias("pe_num_x_n2"),
            (F.col("n") * F.col("agree") - F.col("s"))
            .cast("long")
            .alias("kappa_num"),
            (F.col("n") * F.col("n") - F.col("s"))
            .cast("long")
            .alias("kappa_den"),
        )
    )


@register(
    "eval_calibration_deciles",
    f"""
    WITH b AS (
        SELECT vec_id, {_SCORE_DUCK} AS score_q,
               CASE WHEN label >= {POS_MIN_LABEL} THEN 1 ELSE 0 END AS pos
        FROM embeddings),
    r AS (
        SELECT pos,
               row_number() OVER (ORDER BY score_q, vec_id) AS rnk,
               count(*) OVER () AS n
        FROM b),
    p AS (
        SELECT pos, ((rnk - 1) * 10000) // (n - 1) AS p_bp FROM r
        WHERE n > 1),
    d AS (
        SELECT pos, p_bp,
               CASE WHEN p_bp // 1000 > 9 THEN 9 ELSE p_bp // 1000 END
                   AS decile
        FROM p)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(p_bp) // count(*) AS BIGINT) AS mean_p_bp,
           CAST((10000 * sum(pos)) // count(*) AS BIGINT)
               AS obs_pos_rate_bp
    FROM d GROUP BY decile
    """,
    tags=("eval", "calibration", "deciles", "global_rank", "exact_arithmetic"),
    description=(
        "calibration-by-decile: the score's global percentile (rank "
        "percentile in basis points over the TOTAL order score_q, "
        "vec_id) bucketed into deciles, vs the observed positive "
        "rate per bucket — a calibrated ranker shows a monotone "
        "observed-rate staircase.  The percentile comes from the "
        "two-phase bucketed global_rank (operators/scale.py), never "
        "a single-partition ORDER BY; the only whole-table scalar is "
        "the 1-row global count broadcast (allow-listed pattern).  "
        "Degenerate n<=1 inputs yield zero rows on both sides"
    ),
)
def eval_calibration_deciles(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.scale import global_rank

    b = _scored(spark, sf_dir)
    r = global_rank(b, ["score_q", "vec_id"], out_col="rnk")
    n = b.agg(F.count(F.lit(1)).alias("n"))
    p = (
        r.crossJoin(F.broadcast(n))
        .filter(F.col("n") > 1)
        .select(
            "pos",
            F.expr("((rnk - 1) * 10000) DIV (n - 1)").alias("p_bp"),
        )
    )
    d = p.withColumn(
        "decile",
        F.expr("CASE WHEN p_bp DIV 1000 > 9 THEN 9 ELSE p_bp DIV 1000 END"),
    )
    return d.groupBy(F.col("decile").cast("long").alias("decile")).agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.expr("CAST(sum(p_bp) DIV count(1) AS BIGINT)").alias("mean_p_bp"),
        F.expr(
            "CAST((10000 * sum(pos)) DIV count(1) AS BIGINT)"
        ).alias("obs_pos_rate_bp"),
    )


# component-2 stand-in classifier for the paired McNemar test (the
# binary-score stand-in uses component 1 / index 0)
_SCORE2_SPARK = (
    f"CAST(floor(CAST(element_at(embedding, 2) AS DOUBLE)"
    f" * {EVAL_SCALE}D + 0.5D) AS BIGINT)"
)
_SCORE2_DUCK = (
    f"CAST(floor(CAST(embedding[2] AS DOUBLE)"
    f" * {EVAL_SCALE} + 0.5) AS BIGINT)"
)


@register(
    "eval_mcnemar",
    f"""
    WITH d AS (
        SELECT CASE WHEN label >= {POS_MIN_LABEL} THEN 1 ELSE 0 END AS pos,
               CASE WHEN {_SCORE_DUCK} >= 0 THEN 1 ELSE 0 END AS pa,
               CASE WHEN {_SCORE2_DUCK} >= 0 THEN 1 ELSE 0 END AS pb
        FROM embeddings),
    c AS (
        SELECT count(*) AS n,
               count(*) FILTER (WHERE pa = pos AND pb <> pos) AS b,
               count(*) FILTER (WHERE pa <> pos AND pb = pos) AS c
        FROM d)
    SELECT CAST(n AS BIGINT) AS n_items,
           CAST(b AS BIGINT) AS n_a_only,
           CAST(c AS BIGINT) AS n_b_only,
           CAST(CASE WHEN b + c = 0 THEN 0
                ELSE (10000 * (b - c) * (b - c)) // (b + c) END AS BIGINT)
               AS chi2_x10000
    FROM c
    """,
    tags=("eval", "mcnemar", "paired_test", "exact_arithmetic"),
    description=(
        "McNemar's paired test between two classifiers scored on the "
        "SAME items (the statistically sound way to compare models — "
        "unpaired accuracy deltas ignore per-item correlation): "
        "discordant counts b (A right, B wrong) and c (A wrong, B "
        "right) and the test statistic (b-c)^2/(b+c) in exact x10000 "
        "fixed point (non-negative, so floor division is "
        "cross-engine stable; b+c=0 reads as 0).  The two models are "
        "deterministic stand-ins (sign of embedding components 1 and "
        "2 vs the binary label) — the machinery is one map + one "
        "3-counter aggregate, corpus-scale by construction"
    ),
)
def eval_mcnemar(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "embeddings")
    d = e.select(
        F.when(F.col("label") >= POS_MIN_LABEL, 1).otherwise(0).alias("pos"),
        F.when(F.expr(_SCORE_SPARK) >= 0, 1).otherwise(0).alias("pa"),
        F.when(F.expr(_SCORE2_SPARK) >= 0, 1).otherwise(0).alias("pb"),
    )
    c = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when((F.col("pa") == F.col("pos")) & (F.col("pb") != F.col("pos")), 1)).alias("b"),
        F.count(F.when((F.col("pa") != F.col("pos")) & (F.col("pb") == F.col("pos")), 1)).alias("c"),
    )
    return c.select(
        F.col("n").cast("long").alias("n_items"),
        F.col("b").cast("long").alias("n_a_only"),
        F.col("c").cast("long").alias("n_b_only"),
        F.expr(
            "CAST(CASE WHEN b + c = 0 THEN 0 "
            "ELSE (10000 * (b - c) * (b - c)) DIV (b + c) END AS BIGINT)"
        ).alias("chi2_x10000"),
    )


# the three heuristic "raters" for Fleiss' kappa: deterministic
# quality votes (token count / lexical diversity / repetition — the
# same rule family as quality_gopher_rules), identical in both
# engines because they are pure integer predicates on the token list.
_RATERS_DUCK = """
        SELECT len(toks) >= 30 AS r1,
               2 * len(list_distinct(toks)) >= len(toks) AS r2,
               5 * list_max(list_transform(list_distinct(toks),
                   x -> len(list_filter(toks, y -> y = x)))) <= len(toks) AS r3
        FROM (SELECT string_split(text, ' ') AS toks FROM documents)
"""
_RATERS_SPARK = (
    "size(toks) >= 30 AS r1",
    "2 * size(array_distinct(toks)) >= size(toks) AS r2",
    "5 * array_max(transform(array_distinct(toks), "
    "x -> size(filter(toks, y -> y = x)))) <= size(toks) AS r3",
)


@register(
    "eval_fleiss_kappa",
    f"""
    WITH r AS ({_RATERS_DUCK}),
    v AS (
        SELECT CAST(r1 AS BIGINT) + CAST(r2 AS BIGINT) + CAST(r3 AS BIGINT)
            AS n1
        FROM r),
    s AS (
        SELECT count(*) AS n,
               sum(n1 * n1 + (3 - n1) * (3 - n1)) AS ssq,
               sum(n1) AS t1
        FROM v)
    SELECT CAST(n AS BIGINT) AS n_items,
           CAST(ssq AS BIGINT) AS sum_sq,
           CAST(t1 AS BIGINT) AS n_yes_votes,
           CAST(3 * n * (ssq - 3 * n)
                - 2 * (t1 * t1 + (3 * n - t1) * (3 * n - t1)) AS BIGINT)
               AS kappa_num,
           CAST(2 * (9 * n * n - t1 * t1 - (3 * n - t1) * (3 * n - t1))
                AS BIGINT) AS kappa_den
    FROM s
    """,
    tags=("eval", "fleiss_kappa", "agreement", "annotation", "exact_arithmetic"),
    description=(
        "Fleiss' kappa across THREE raters per item (the multi-rater "
        "generalization of Cohen's kappa — the agreement statistic "
        "for annotation/labeling pipelines with more than two "
        "annotators): raters are deterministic quality heuristics "
        "(token count, lexical diversity, repetition) voting a "
        "binary label per document.  With n raters=3 and 2 "
        "categories, kappa = (P_bar - P_e)/(1 - P_e) reduces to the "
        "EXACT integer ratio [3N(S-3N) - 2(T1^2+T0^2)] / "
        "[2(9N^2 - T1^2 - T0^2)] where S = sum of per-item squared "
        "category counts and T1 = total yes votes — emitted as split "
        "numerator/denominator because kappa can be negative and "
        "negative floor/truncating division is not cross-engine "
        "stable (the Cohen's-kappa convention).  Everything reduces "
        "map-side to one 3-counter row; corpus-scale by construction"
    ),
)
def eval_fleiss_kappa(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("toks")
    )
    r = d.selectExpr(*_RATERS_SPARK)
    v = r.select(
        (
            F.col("r1").cast("long") + F.col("r2").cast("long") + F.col("r3").cast("long")
        ).alias("n1")
    )
    s = v.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("n1 * n1 + (3 - n1) * (3 - n1)")).alias("ssq"),
        F.sum("n1").alias("t1"),
    )
    return s.select(
        F.col("n").cast("long").alias("n_items"),
        F.col("ssq").cast("long").alias("sum_sq"),
        F.col("t1").cast("long").alias("n_yes_votes"),
        F.expr(
            "CAST(3 * n * (ssq - 3 * n) "
            "- 2 * (t1 * t1 + (3 * n - t1) * (3 * n - t1)) AS BIGINT)"
        ).alias("kappa_num"),
        F.expr(
            "CAST(2 * (9 * n * n - t1 * t1 - (3 * n - t1) * (3 * n - t1)) "
            "AS BIGINT)"
        ).alias("kappa_den"),
    )


@register(
    "eval_ab_test_chi2",
    """
    WITH u AS (
        SELECT user_id % 2 AS arm,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY user_id),
    c AS (
        SELECT CAST(count(*) FILTER (WHERE arm = 0 AND conv = 1) AS HUGEINT) AS a,
               CAST(count(*) FILTER (WHERE arm = 0 AND conv = 0) AS HUGEINT) AS b,
               CAST(count(*) FILTER (WHERE arm = 1 AND conv = 1) AS HUGEINT) AS c,
               CAST(count(*) FILTER (WHERE arm = 1 AND conv = 0) AS HUGEINT) AS d
        FROM u)
    SELECT CAST(a + b AS BIGINT) AS n_arm_a,
           CAST(c + d AS BIGINT) AS n_arm_b,
           CAST(a AS BIGINT) AS conv_a,
           CAST(c AS BIGINT) AS conv_b,
           CAST(CASE WHEN (a + b) * (c + d) * (a + c) * (b + d) = 0 THEN 0
                ELSE (10000 * (a + b + c + d) * (a * d - b * c) * (a * d - b * c))
                     // ((a + b) * (c + d) * (a + c) * (b + d)) END AS BIGINT)
               AS chi2_x10000
    FROM c
    """,
    tags=("eval", "ab_test", "chi2", "experiment", "exact_arithmetic"),
    description=(
        "two-proportion A/B experiment readout: users hash-split into "
        "two arms (user_id parity — the deterministic assignment an "
        "experimentation platform would persist), conversion = any "
        "'purchase' event, and the 2x2 chi-square statistic "
        "n(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)) in exact x10000 fixed "
        "point (numerator is a square, so the floor division is "
        "non-negative and cross-engine stable; degenerate margins "
        "read 0).  DECIMAL(38,0)/HUGEINT partials — the numerator "
        "reaches ~1e24 at fixture scale, far past int64.  One "
        "per-user rollup (map-side combine on user_id) then a "
        "4-counter reduction; corpus-scale by construction"
    ),
)
def eval_ab_test_chi2(spark: SparkSession, sf_dir: str):
    # per-user conversion first (a user with many purchases counts once)
    u = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv")
        )
        .select((F.col("user_id") % 2).alias("arm"), "conv")
    )
    c = u.agg(
        F.count(F.when((F.col("arm") == 0) & (F.col("conv") == 1), 1))
        .cast("decimal(38,0)")
        .alias("a"),
        F.count(F.when((F.col("arm") == 0) & (F.col("conv") == 0), 1))
        .cast("decimal(38,0)")
        .alias("b"),
        F.count(F.when((F.col("arm") == 1) & (F.col("conv") == 1), 1))
        .cast("decimal(38,0)")
        .alias("c"),
        F.count(F.when((F.col("arm") == 1) & (F.col("conv") == 0), 1))
        .cast("decimal(38,0)")
        .alias("d"),
    )
    return c.select(
        F.expr("CAST(a + b AS BIGINT)").alias("n_arm_a"),
        F.expr("CAST(c + d AS BIGINT)").alias("n_arm_b"),
        F.expr("CAST(a AS BIGINT)").alias("conv_a"),
        F.expr("CAST(c AS BIGINT)").alias("conv_b"),
        F.expr(
            "CAST(CASE WHEN (a + b) * (c + d) * (a + c) * (b + d) = 0 THEN 0 "
            "ELSE (10000 * (a + b + c + d) * (a * d - b * c) * (a * d - b * c)) "
            "div ((a + b) * (c + d) * (a + c) * (b + d)) END AS BIGINT)"
        ).alias("chi2_x10000"),
    )


@register(
    "eval_anova_eta_sq",
    """
    WITH x AS (
        SELECT o_orderpriority AS grp,
               CAST(floor(o_totalprice + 0.5) AS HUGEINT) AS units
        FROM orders),
    g AS (
        SELECT grp, CAST(count(*) AS HUGEINT) AS ng,
               CAST(sum(units) AS HUGEINT) AS sg
        FROM x GROUP BY grp),
    tot AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(units) AS HUGEINT) AS s,
               CAST(sum(units * units) AS HUGEINT) AS sx2
        FROM x),
    btw AS (
        SELECT sum(sg * sg // ng) AS w, count(*) AS k FROM g)
    SELECT CAST(n AS BIGINT) AS n_orders,
           CAST(k AS BIGINT) AS n_groups,
           CAST(CASE WHEN n * sx2 - s * s = 0 THEN 0
                ELSE greatest(10000 * (n * w - s * s), 0)
                     // (n * sx2 - s * s) END AS BIGINT) AS eta2_bp
    FROM btw, tot
    """,
    tags=("eval", "anova", "variance_decomposition", "exact_arithmetic"),
    description=(
        "one-way ANOVA effect size (eta squared = SS_between/SS_total) "
        "of order value across the five order priorities — the "
        "variance-decomposition readout that tells a data auditor how "
        "much of a metric a segmentation actually explains.  Exact "
        "integer form on the WHOLE-CURRENCY-UNIT grid: "
        "eta2_bp = 1e4*(n*sum_g floor(S_g^2/n_g) - S^2) "
        "// (n*sum(x^2) - S^2), HUGEINT/DECIMAL(38,0) partials.  "
        "r07 ADVICE headroom fix: the old cents-grid form multiplied "
        "1e4*n INSIDE the per-group partial (1e4*n*S_g^2 ~ 3e38 by "
        "sf10 — silent NULL under non-ANSI Spark, error in DuckDB); "
        "the per-group partial is now just S_g^2//n_g and the 1e4*n "
        "factors apply AFTER the 5-row rollup, so the largest "
        "intermediate is 1e4*(n*w - S^2) — safe to ~sf3e6 (~3 PB, "
        "n~5e12 orders) before approaching the 38-digit ceiling "
        "(scale bound documented per the graph_modularity_brand "
        "convention).  Per-group flooring makes it a defined "
        "deterministic integer variant, clamped at 0 because flooring "
        "can push an identical-means decomposition a hair negative "
        "(the mine_cramers_v convention).  Work reduces to one 5-row "
        "group rollup and a 3-counter total — corpus-scale by "
        "construction"
    ),
)
def eval_anova_eta_sq(spark: SparkSession, sf_dir: str):
    x = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.expr(
            "CAST(CAST(floor(o_totalprice + 0.5) AS BIGINT) "
            "AS DECIMAL(38,0))"
        ).alias("units"),
    )
    g = x.groupBy("grp").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("ng"),
        F.sum("units").cast("decimal(38,0)").alias("sg"),
    )
    tot = x.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("units").cast("decimal(38,0)").alias("s"),
        F.sum(F.expr("units * units")).cast("decimal(38,0)").alias("sx2"),
    )
    # Spark's `div` returns BIGINT, and these quotients overflow it —
    # floor-divide decimals exactly via (a - a % b) / b: the
    # subtraction makes the quotient an exact integer, which decimal
    # division then represents exactly (identical to DuckDB's
    # HUGEINT // for non-negative operands).
    btw = g.agg(
        F.sum(
            F.expr(
                "CAST(((sg * sg) - ((sg * sg) % ng)) / ng AS DECIMAL(38,0))"
            )
        ).alias("w"),
        F.count(F.lit(1)).alias("k"),
    )
    return btw.crossJoin(F.broadcast(tot)).select(
        F.col("n").cast("long").alias("n_orders"),
        F.col("k").cast("long").alias("n_groups"),
        F.expr(
            "CAST(CASE WHEN n * sx2 - s * s = 0 THEN 0 "
            "ELSE greatest(CAST(10000 AS DECIMAL(38,0)) * (n * w - s * s), "
            "CAST(0 AS DECIMAL(38,0))) div (n * sx2 - s * s) END AS BIGINT)"
        ).alias("eta2_bp"),
    )


#: bootstrap resamples for eval_bootstrap_ci — fixed so the CI rank
#: picks (5 and 196 of 200) are exact cross-engine constants
_BOOT_B = 200


@register(
    "eval_bootstrap_ci",
    f"""
    WITH q AS (
        SELECT CAST(vec_id AS BIGINT) AS vec_id,
               CAST(label AS BIGINT) AS label, {_H_DUCK} AS h
        FROM embeddings),
    p AS (
        SELECT vec_id,
               CASE WHEN label = {_PRED_DUCK} THEN 1 ELSE 0 END AS correct
        FROM q),
    pt AS (
        SELECT count(*) AS n_rows, sum(correct) AS n_correct FROM p),
    samp AS (
        SELECT bs.b AS b, p.correct AS correct
        FROM p CROSS JOIN (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS b) bs
        WHERE CAST(('0x' || substr(md5(CAST(p.vec_id AS VARCHAR) || ':'
                                       || CAST(bs.b AS VARCHAR)), 1, 15))
                   AS BIGINT) % 2 = 0),
    g AS (
        SELECT b, count(*) AS n, sum(correct) AS c FROM samp GROUP BY b),
    acc AS (
        SELECT b, CASE WHEN n = 0 THEN 0 ELSE (10000 * c) // n END AS acc_bp
        FROM g),
    rk AS (
        SELECT acc_bp, row_number() OVER (ORDER BY acc_bp, b) AS r FROM acc),
    agg AS (
        SELECT sum(acc_bp) AS s_acc,
               max(CASE WHEN r = 5 THEN acc_bp END)   AS lo,
               max(CASE WHEN r = 196 THEN acc_bp END) AS hi
        FROM rk)
    SELECT CAST(pt.n_rows AS BIGINT)                          AS n_rows,
           CAST((10000 * pt.n_correct) // pt.n_rows AS BIGINT) AS point_acc_bp,
           CAST({_BOOT_B} AS BIGINT)                          AS b_resamples,
           CAST(agg.lo AS BIGINT)                             AS ci_lo_bp,
           CAST(agg.hi AS BIGINT)                             AS ci_hi_bp,
           CAST(agg.s_acc // {_BOOT_B} AS BIGINT)             AS boot_mean_acc_bp
    FROM pt, agg
    """,
    tags=("eval", "bootstrap", "confidence_interval", "exact_arithmetic"),
    description=(
        "deterministic bootstrap confidence interval for classifier "
        "accuracy — the error bars every eval table should carry "
        "before anyone compares two checkpoints on it: 200 half-"
        "sample resamples (row i in resample b iff the low bit of "
        "md5(vec_id:b) is 0 — the subsampling/delete-d bootstrap, "
        "hash-deterministic so both engines draw IDENTICAL resamples; "
        "no rng state, replayable under retries), per-resample "
        "accuracy in floor basis points, CI endpoints picked at "
        "ascending ranks 5 and 196 of the 200 (the 2.5th/97.5th "
        "percentile picks as exact order statistics, tie-broken by "
        "resample id).  Work: the fact scan fans out x200 but "
        "collapses map-side to 200 (b, count, sum) partials — ONE "
        "shuffle of 200 rows per partition; the rank window runs "
        "over exactly 200 rows (bounded by construction).  At corpus "
        "scale the x200 scan cost is the honest price of a bootstrap "
        "— no resample materializes"
    ),
)
def eval_bootstrap_ci(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window as W

    p = _labeled_pred(spark, sf_dir).select(
        "vec_id",
        F.when(F.col("label") == F.col("pred"), 1).otherwise(0).alias("correct"),
    )
    pt = p.agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("correct").alias("n_correct")
    )
    samp = (
        p.withColumn(
            "b", F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1)))
        )
        .filter(
            F.expr(
                "CAST(conv(substr(md5(concat(CAST(vec_id AS STRING), ':', "
                "CAST(b AS STRING))), 1, 15), 16, 10) AS BIGINT) % 2 = 0"
            )
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("correct").alias("c"))
        .select(
            "b",
            F.expr(
                "CASE WHEN n = 0 THEN 0L ELSE (10000 * c) DIV n END"
            ).alias("acc_bp"),
        )
    )
    rk = samp.withColumn(
        "r", F.row_number().over(W.orderBy(F.asc("acc_bp"), F.asc("b")))
    )
    agg = rk.agg(
        F.sum("acc_bp").alias("s_acc"),
        F.max(F.when(F.col("r") == 5, F.col("acc_bp"))).alias("lo"),
        F.max(F.when(F.col("r") == 196, F.col("acc_bp"))).alias("hi"),
    )
    return pt.crossJoin(agg).select(
        F.col("n_rows").cast("long").alias("n_rows"),
        F.expr("CAST((10000 * n_correct) DIV n_rows AS BIGINT)").alias(
            "point_acc_bp"
        ),
        F.lit(_BOOT_B).cast("long").alias("b_resamples"),
        F.col("lo").cast("long").alias("ci_lo_bp"),
        F.col("hi").cast("long").alias("ci_hi_bp"),
        F.expr(f"CAST(s_acc DIV {_BOOT_B} AS BIGINT)").alias("boot_mean_acc_bp"),
    )
