"""Random projection + retrieval-evaluation plans (round-4 wave 3).

Two more corpus-scale primitives a training-data platform runs over
its embedding store (the reference has no vector surface at all —
SURVEY.md §2.12; these extend the similarity/eval families):

* **Johnson–Lindenstrauss random projection** — compress d=64
  vectors to k=8 sketch dimensions with a ±1 sign matrix derived
  from md5 (both engines compute the SAME signs bit-for-bit), then
  AUDIT the JL distance-preservation claim on a bounded pair slice:
  with ±1 entries, E[||Rx - Ry||²] = k·||x - y||², so the
  basis-point ratio (10000·d2_proj) / (k·d2_orig) concentrates at
  10000.  The projection itself runs over the FULL table (posexplode
  → broadcast-join the 512-row sign matrix → per-(vector, out-dim)
  partial sums — linear, shuffle-bounded, no Python); only the audit
  pair slice is bounded (validation-slice discipline, as in the
  LSH/matryoshka recall audits).
* **MRR of the first same-label neighbor** — the standard retrieval
  readout for an embedding space: for each probe vector, rank the
  corpus by EXACT integer dot product (quantized grid — floats never
  rank, ties impossible beyond identical grids, broken by vec_id)
  and find the best rank of a same-label document; report the
  truncating reciprocal 10000 DIV rank (the integer idiom
  retrieval_rrf_hybrid established) per probe and its corpus mean.
  The probe set is a bounded broadcast (the brute-force-baseline
  pattern of similarity_topk); ranking windows are PARTITIONED per
  probe, so every probe ranks in parallel.

Exact-integer arithmetic end to end (plans/core.py conventions).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from sfs3_kinesis_spark.plans.core import register, t

#: quantization grid for components (same as the retrieval probes)
PROJ_SCALE = 10_000
#: JL output dimensionality and input dimensionality
JL_K = 8
JL_D = 64
#: audit pair slice: all pairs among vec_id < JL_SLICE (bounded
#: absolute work at any sf: 496 pairs)
JL_SLICE = 32
#: MRR probe set size (bounded broadcast)
MRR_PROBES = 16

# cross-engine md5→BIGINT parity sign: 15 hex chars = 60 bits
_SIGN_SPARK = (
    "CASE WHEN CAST(conv(substr(md5(concat(CAST(i AS STRING), '_', "
    "CAST(j AS STRING))), 1, 15), 16, 10) AS BIGINT) % 2 = 0 "
    "THEN 1 ELSE -1 END"
)
_SIGN_DUCK = (
    "CASE WHEN CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || '_' || "
    "CAST(j AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END"
)

_QUANT_SPARK = (
    f"transform(CAST(embedding AS ARRAY<DOUBLE>), "
    f"x -> CAST(floor(x * {PROJ_SCALE}D + 0.5D) AS BIGINT))"
)
_QUANT_DUCK = (
    f"list_transform(CAST(embedding AS DOUBLE[]), "
    f"x -> CAST(floor(x * {PROJ_SCALE} + 0.5) AS BIGINT))"
)


@register(
    "feature_random_projection",
    f"""
    WITH q AS (
        SELECT vec_id, {_QUANT_DUCK} AS v FROM embeddings),
    signs AS (
        SELECT g1.i AS i, g2.j AS j, {_SIGN_DUCK} AS s
        FROM generate_series(0, {JL_D - 1}) g1(i),
             generate_series(0, {JL_K - 1}) g2(j)),
    comp AS (
        SELECT vec_id, gi.i AS i, v[gi.i + 1] AS qi
        FROM q, generate_series(0, {JL_D - 1}) gi(i)),
    y AS (
        SELECT vec_id, j, sum(s * qi) AS yj
        FROM comp JOIN signs USING (i) GROUP BY vec_id, j),
    qs AS (SELECT * FROM q WHERE vec_id < {JL_SLICE}),
    po AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               list_sum(list_transform(range(1, {JL_D} + 1),
                   k -> (a.v[k] - b.v[k]) * (a.v[k] - b.v[k]))) AS d2o
        FROM qs a JOIN qs b ON a.vec_id < b.vec_id),
    pp AS (
        SELECT ya.vec_id AS ia, yb.vec_id AS ib,
               sum((ya.yj - yb.yj) * (ya.yj - yb.yj)) AS d2p
        FROM y ya JOIN y yb ON ya.j = yb.j AND ya.vec_id < yb.vec_id
        WHERE ya.vec_id < {JL_SLICE} AND yb.vec_id < {JL_SLICE}
        GROUP BY ya.vec_id, yb.vec_id),
    r AS (
        SELECT (10000 * d2p) // ({JL_K} * d2o) AS ratio_bp
        FROM po JOIN pp ON po.ia = pp.ia AND po.ib = pp.ib
        WHERE d2o > 0)
    SELECT CAST(ratio_bp // 2000 AS BIGINT) AS ratio_bucket,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(min(ratio_bp) AS BIGINT) AS min_ratio_bp,
           CAST(max(ratio_bp) AS BIGINT) AS max_ratio_bp
    FROM r GROUP BY ratio_bucket
    """,
    tags=(
        "feature",
        "projection",
        "johnson_lindenstrauss",
        "similarity",
        "exact_arithmetic",
    ),
    description=(
        "Johnson-Lindenstrauss random projection 64→8 dims with "
        "md5-derived ±1 signs (bit-identical in both engines), plus "
        "the distance-preservation audit: basis-point ratio of "
        "projected to k-scaled original squared distance, "
        "histogrammed in 0.2 buckets over the bounded all-pairs "
        "slice vec_id < 32 (496 pairs at any sf).  The projection is "
        "full-table and linear: posexplode components, broadcast the "
        "512-row sign matrix, partial-sum per (vector, out-dim) — "
        "the sketch every ANN/clustering pipeline runs before "
        "distance work at 100 TB"
    ),
)
def feature_random_projection(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "embeddings")
    q = e.select("vec_id", F.expr(_QUANT_SPARK).alias("v"))
    dims = spark.range(JL_D).select(F.col("id").cast("int").alias("i"))
    outs = spark.range(JL_K).select(F.col("id").cast("int").alias("j"))
    signs = dims.crossJoin(outs).select("i", "j", F.expr(_SIGN_SPARK).alias("s"))
    comp = q.select("vec_id", F.posexplode("v").alias("i", "qi"))
    y = (
        comp.join(F.broadcast(signs), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("s") * F.col("qi")).alias("yj"))
    )
    qs = q.filter(F.col("vec_id") < JL_SLICE)
    a, b = qs.alias("a"), qs.alias("b")
    po = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            F.expr(
                "aggregate(zip_with(a.v, b.v, (x, y) -> (x - y) * (x - y)), "
                "0L, (acc, d) -> acc + d)"
            ).alias("d2o"),
        )
    )
    ys = y.filter(F.col("vec_id") < JL_SLICE)
    ya, yb = ys.alias("ya"), ys.alias("yb")
    pp = (
        ya.join(
            yb,
            (F.col("ya.j") == F.col("yb.j"))
            & (F.col("ya.vec_id") < F.col("yb.vec_id")),
        )
        .groupBy(
            F.col("ya.vec_id").alias("ia"), F.col("yb.vec_id").alias("ib")
        )
        .agg(
            F.sum(
                (F.col("ya.yj") - F.col("yb.yj"))
                * (F.col("ya.yj") - F.col("yb.yj"))
            ).alias("d2p")
        )
    )
    r = (
        po.join(pp, ["ia", "ib"])
        .filter(F.col("d2o") > 0)
        .select(F.expr(f"(10000 * d2p) DIV ({JL_K} * d2o)").alias("ratio_bp"))
    )
    return r.groupBy(
        F.expr("ratio_bp DIV 2000").cast("long").alias("ratio_bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.min("ratio_bp").cast("long").alias("min_ratio_bp"),
        F.max("ratio_bp").cast("long").alias("max_ratio_bp"),
    )


def _probe_dots(spark: SparkSession, sf_dir: str):
    """(probe_id, probe_label, cand_id, cand_label, dot): every
    probe × candidate exact integer dot product, probes broadcast."""
    e = t(spark, sf_dir, "embeddings")
    q = e.select("vec_id", "label", F.expr(_QUANT_SPARK).alias("v"))
    probes = q.filter(F.col("vec_id") < MRR_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("label").alias("probe_label"),
        F.col("v").alias("pv"),
    )
    return (
        q.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "probe_label",
            F.col("vec_id").alias("cand_id"),
            F.col("label").alias("cand_label"),
            F.expr(
                "aggregate(zip_with(pv, v, (x, y) -> x * y), "
                "0L, (acc, d) -> acc + d)"
            ).alias("dot"),
        )
    )


#: shared oracle CTE prefix: probe × candidate dot table
_DOTS_DUCK = f"""
    WITH q AS (
        SELECT vec_id, label, {_QUANT_DUCK} AS v FROM embeddings),
    probes AS (SELECT * FROM q WHERE vec_id < {MRR_PROBES}),
    dots AS (
        SELECT p.vec_id AS probe_id, p.label AS probe_label,
               c.vec_id AS cand_id, c.label AS cand_label,
               list_sum(list_transform(range(1, {JL_D} + 1),
                   k -> p.v[k] * c.v[k])) AS dot
        FROM probes p JOIN q c ON c.vec_id <> p.vec_id)"""


@register(
    "eval_mrr_first_relevant",
    f"""{_DOTS_DUCK},
    ranked AS (
        SELECT probe_id, probe_label, cand_label,
               row_number() OVER (PARTITION BY probe_id
                   ORDER BY dot DESC, cand_id) AS rnk
        FROM dots),
    firsts AS (
        SELECT probe_id, min(rnk) AS first_rel_rank
        FROM ranked WHERE cand_label = probe_label
        GROUP BY probe_id)
    SELECT CAST(probe_id AS BIGINT) AS probe_id,
           CAST(first_rel_rank AS BIGINT) AS first_rel_rank,
           CAST(10000 // first_rel_rank AS BIGINT) AS rr_bp
    FROM firsts
    """,
    tags=("eval", "retrieval", "mrr", "similarity", "exact_arithmetic"),
    description=(
        "retrieval evaluation of the embedding space itself: for "
        "each of 16 probe vectors (bounded broadcast, the "
        "brute-force-baseline pattern), rank the corpus by EXACT "
        "integer dot product (quantized grid, vec_id tiebreak — "
        "cross-engine ties impossible) and report the rank of the "
        "first same-label document with its truncating reciprocal "
        "10000 DIV rank (the rrf integer idiom).  NO corpus sort and "
        "no corpus-sized window partition: rank-of-first-relevant = "
        "1 + count of candidates lexicographically above the best "
        "same-label candidate, so the whole readout is two map-side-"
        "combined per-probe aggregates over the broadcast-joined dot "
        "table (the DuckDB oracle keeps the textbook window "
        "formulation — identical results).  Per-probe rows keep the "
        "readout auditable (the mean is one trivial agg away)"
    ),
)
def eval_mrr_first_relevant(spark: SparkSession, sf_dir: str):
    dots = _probe_dots(spark, sf_dir)
    # best same-label candidate per probe: lexicographic max on
    # (dot, -cand_id) via struct ordering — a 16-row aggregate
    best = (
        dots.filter(F.col("cand_label") == F.col("probe_label"))
        .groupBy("probe_id")
        .agg(
            F.max(
                F.struct(
                    F.col("dot").alias("dot"),
                    (-F.col("cand_id")).alias("neg_id"),
                )
            ).alias("best")
        )
        .select(
            "probe_id",
            F.col("best.dot").alias("best_dot"),
            (-F.col("best.neg_id")).alias("best_id"),
        )
    )
    # rank = 1 + #candidates strictly above the best relevant one in
    # the (dot DESC, cand_id ASC) total order — map-side combine,
    # never a corpus-sized sort
    firsts = (
        dots.join(F.broadcast(best), "probe_id")
        .groupBy("probe_id")
        .agg(
            (
                F.count(
                    F.when(
                        (F.col("dot") > F.col("best_dot"))
                        | (
                            (F.col("dot") == F.col("best_dot"))
                            & (F.col("cand_id") < F.col("best_id"))
                        ),
                        1,
                    )
                )
                + 1
            ).alias("first_rel_rank")
        )
    )
    return firsts.select(
        F.col("probe_id").cast("long").alias("probe_id"),
        F.col("first_rel_rank").cast("long").alias("first_rel_rank"),
        F.expr("10000 DIV first_rel_rank").cast("long").alias("rr_bp"),
    )


#: top-k cut for precision@k
PREC_K = 10


@register(
    "eval_precision_at_k",
    f"""{_DOTS_DUCK},
    ranked AS (
        SELECT probe_id, probe_label, cand_label,
               row_number() OVER (PARTITION BY probe_id
                   ORDER BY dot DESC, cand_id) AS rnk
        FROM dots)
    SELECT CAST(probe_id AS BIGINT) AS probe_id,
           CAST(count(*) FILTER (WHERE cand_label = probe_label)
               AS BIGINT) AS n_rel_topk,
           CAST((10000 * count(*) FILTER (WHERE cand_label = probe_label))
               // count(*) AS BIGINT) AS precision_bp
    FROM ranked WHERE rnk <= {PREC_K}
    GROUP BY probe_id
    """,
    tags=("eval", "retrieval", "precision_at_k", "topk", "similarity"),
    description=(
        "precision@10 of the embedding space per probe: the share of "
        "same-label documents among each probe's top-10 exact-integer "
        "dot-product neighbors ((dot DESC, cand_id) total order — "
        "cross-engine ties impossible).  The per-probe top-k runs "
        "through salted_window_topk (operators/scale.py): phase 1 "
        "ranks inside (probe, salt) so a probe's corpus-sized "
        "candidate list spreads over reducers, phase 2 ranks the "
        "<= salt*k survivors — never one reducer per probe holding "
        "the whole corpus (the oracle keeps the textbook single "
        "window; identical results).  Denominator is the actual "
        "top-k row count, so a corpus smaller than k still reads "
        "as a correct precision"
    ),
)
def eval_precision_at_k(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.scale import salted_window_topk

    dots = _probe_dots(spark, sf_dir)
    topk = salted_window_topk(
        dots,
        "probe_id",
        [F.desc("dot"), F.asc("cand_id")],
        k=PREC_K,
        salt_on="cand_id",
    )
    return topk.groupBy(F.col("probe_id").cast("long").alias("probe_id")).agg(
        F.count(
            F.when(F.col("cand_label") == F.col("probe_label"), 1)
        ).cast("long").alias("n_rel_topk"),
        F.expr(
            "CAST((10000 * count(CASE WHEN cand_label = probe_label"
            " THEN 1 END)) DIV count(1) AS BIGINT)"
        ).alias("precision_bp"),
    )


#: hard negatives kept per anchor
HN_K = 3


@register(
    "similarity_hard_negatives",
    f"""{_DOTS_DUCK},
    negs AS (
        SELECT probe_id, cand_id, cand_label, dot,
               row_number() OVER (PARTITION BY probe_id
                   ORDER BY dot DESC, cand_id) AS rnk
        FROM dots WHERE cand_label <> probe_label)
    SELECT CAST(probe_id AS BIGINT) AS anchor_id,
           CAST(rnk AS BIGINT) AS rnk,
           CAST(cand_id AS BIGINT) AS negative_id,
           CAST(cand_label AS BIGINT) AS negative_label,
           CAST(dot AS BIGINT) AS dot
    FROM negs WHERE rnk <= {HN_K}
    """,
    tags=("similarity", "hard_negatives", "contrastive", "topk",
          "training_data"),
    description=(
        "hard-negative mining for contrastive training: each "
        "anchor's top-3 highest-similarity DIFFERENT-label documents "
        "(exact integer dot, (dot DESC, cand_id) total order) — the "
        "negatives that actually teach a retriever/embedder, vs "
        "random negatives that are trivially far.  Same bounded-"
        "anchor broadcast as the MRR/precision probes; the per-anchor "
        "ranking runs through salted_window_topk so an anchor's "
        "corpus-sized candidate list never lands on one reducer.  At "
        "100 TB the anchor set is a partitioned loop over the corpus "
        "(each chunk broadcast in turn) or an ANN index probe "
        "(similarity_ivf_selective) — the mining plan per chunk is "
        "exactly this one"
    ),
)
def similarity_hard_negatives(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.scale import salted_window_topk

    dots = _probe_dots(spark, sf_dir)
    negs = dots.filter(F.col("cand_label") != F.col("probe_label"))
    topk = salted_window_topk(
        negs,
        "probe_id",
        [F.desc("dot"), F.asc("cand_id")],
        k=HN_K,
        salt_on="cand_id",
    )
    return topk.select(
        F.col("probe_id").cast("long").alias("anchor_id"),
        F.col("rnk").cast("long").alias("rnk"),
        F.col("cand_id").cast("long").alias("negative_id"),
        F.col("cand_label").cast("long").alias("negative_label"),
        F.col("dot").cast("long").alias("dot"),
    )


@register(
    "eval_recall_at_k",
    f"""{_DOTS_DUCK},
    ranked AS (
        SELECT probe_id, probe_label, cand_label, dot,
               row_number() OVER (PARTITION BY probe_id
                   ORDER BY dot DESC, cand_id) AS rnk
        FROM dots),
    rel AS (
        SELECT probe_id, count(*) AS n_rel_total
        FROM dots WHERE cand_label = probe_label GROUP BY probe_id),
    hits AS (
        SELECT probe_id,
               count(*) FILTER (WHERE cand_label = probe_label)
                   AS n_rel_topk
        FROM ranked WHERE rnk <= {PREC_K} GROUP BY probe_id)
    SELECT CAST(h.probe_id AS BIGINT) AS probe_id,
           CAST(h.n_rel_topk AS BIGINT) AS n_rel_topk,
           CAST(r.n_rel_total AS BIGINT) AS n_rel_total,
           CAST(CASE WHEN r.n_rel_total = 0 THEN 0
                ELSE (10000 * h.n_rel_topk) // r.n_rel_total
                END AS BIGINT) AS recall_bp
    FROM hits h JOIN rel r ON h.probe_id = r.probe_id
    """,
    tags=("eval", "retrieval", "recall_at_k", "topk", "similarity"),
    description=(
        "recall@10 of the embedding space per probe: the share of "
        "ALL same-label documents that land in the probe's top-10 "
        "exact-dot neighbors — precision@k's denominator counts the "
        "cut, recall@k's counts the relevant population, and a "
        "ranker can game either alone, so the pair ships together.  "
        "Same salted per-probe top-k as eval_precision_at_k; the "
        "relevant-population count is one map-side-combined "
        "aggregate over the same dot table, joined back on the "
        "16-row probe key"
    ),
)
def eval_recall_at_k(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.scale import salted_window_topk

    dots = _probe_dots(spark, sf_dir)
    rel = (
        dots.filter(F.col("cand_label") == F.col("probe_label"))
        .groupBy("probe_id")
        .agg(F.count(F.lit(1)).alias("n_rel_total"))
    )
    topk = salted_window_topk(
        dots,
        "probe_id",
        [F.desc("dot"), F.asc("cand_id")],
        k=PREC_K,
        salt_on="cand_id",
    )
    hits = topk.groupBy("probe_id").agg(
        F.count(
            F.when(F.col("cand_label") == F.col("probe_label"), 1)
        ).alias("n_rel_topk")
    )
    return hits.join(rel, "probe_id").select(
        F.col("probe_id").cast("long").alias("probe_id"),
        F.col("n_rel_topk").cast("long").alias("n_rel_topk"),
        F.col("n_rel_total").cast("long").alias("n_rel_total"),
        F.expr(
            "CAST(CASE WHEN n_rel_total = 0 THEN 0"
            " ELSE (10000 * n_rel_topk) DIV n_rel_total END AS BIGINT)"
        ).alias("recall_bp"),
    )
