"""Retrieval, privacy-audit, spatial, and data-ops query plans
(round-2 green-field families).

The reference stores opaque JSON documents and has no retrieval,
governance, or spatial surface at all (SURVEY.md §2.12) — these are
the operator families a training-data platform layers on top of the
same corpus tables:

* retrieval_*  — the search side of a data engine: inverted index
  construction, conjunctive keyword search, positional phrase match,
  and hybrid keyword+vector rank fusion (RRF).  All ranks and scores
  are exact integers so rankings are bit-identical across engines.
* privacy_*    — re-identification audits (k-anonymity, l-diversity)
  run before a corpus ships: pure group-size arithmetic.
* spatial_*    — the grid-bucketed neighbor join (cell size = radius
  so the 3x3 neighborhood is a coverage proof), the scalable shape
  for radius joins; the oracle brute-forces O(n^2) to prove the
  pruning lost nothing.
* quality_*    — corpus-ops telemetry: split-half schema/stat drift
  and per-key freshness SLA audits, in exact epoch integers.

Every op follows the corpus conventions of ``plans/core.py``:
aliased columns, BIGINT casts, integer (basis-point) ratios,
truncating division (`DIV` = DuckDB `//`), deterministic tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

from sfs3_kinesis_spark.operators.scale import global_cumsum, global_rank, pin_shared
from sfs3_kinesis_spark.plans.core import register, t, t_nonnull

# Conjunctive-query / phrase / fusion constants shared by the Spark
# callables and their oracles (single source of truth — they must
# never drift independently).
KW_TERMS = ("spark", "hash", "merge")
PHRASE = ("value", "table")
RRF_K = 60
RRF_SCALE = 1_000_000
PROBE_SCALE = 10_000


@register(
    "retrieval_inverted_index",
    """
    WITH tk AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tc AS (
        SELECT term, doc_id, count(*) AS tf FROM tk GROUP BY term, doc_id)
    SELECT term,
           CAST(count(*) AS BIGINT) AS doc_freq,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           CAST(max(tf) AS BIGINT) AS max_tf,
           (list(doc_id ORDER BY doc_id))[1:8] AS postings_head
    FROM tc GROUP BY term
    """,
    tags=("retrieval", "inverted_index", "text"),
    description=(
        "inverted-index construction: explode terms, one shuffle on "
        "the term key producing per-term document frequency, total/max "
        "term frequency, and the head of the sorted posting list — the "
        "index build every search system runs over a corpus; postings "
        "stay sorted arrays so downstream intersection is a merge, and "
        "at 100 TB the term key is the only data-sized shuffle "
        "(df/tf partials map-side combine)"
    ),
)
def retrieval_inverted_index(spark: SparkSession, sf_dir: str):
    tk = t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tc = tk.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    return tc.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("doc_freq"),
        F.sum("tf").cast("long").alias("total_tf"),
        F.max("tf").cast("long").alias("max_tf"),
        F.slice(F.sort_array(F.collect_list("doc_id")), 1, 8).alias("postings_head"),
    )


@register(
    "retrieval_keyword_and",
    f"""
    WITH tk AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    m AS (
        SELECT doc_id,
               count(*) FILTER (WHERE term = '{KW_TERMS[0]}') AS tf_a,
               count(*) FILTER (WHERE term = '{KW_TERMS[1]}') AS tf_b,
               count(*) FILTER (WHERE term = '{KW_TERMS[2]}') AS tf_c
        FROM tk WHERE term IN ('{KW_TERMS[0]}', '{KW_TERMS[1]}', '{KW_TERMS[2]}')
        GROUP BY doc_id)
    SELECT doc_id,
           CAST(tf_a AS BIGINT) AS tf_a,
           CAST(tf_b AS BIGINT) AS tf_b,
           CAST(tf_c AS BIGINT) AS tf_c,
           CAST(tf_a + tf_b + tf_c AS BIGINT) AS score
    FROM m WHERE tf_a > 0 AND tf_b > 0 AND tf_c > 0
    """,
    tags=("retrieval", "keyword", "conjunctive", "text"),
    description=(
        "conjunctive (AND) keyword search: filter the token stream to "
        "the query terms BEFORE the shuffle (the posting-intersection "
        "pushdown — only matching-term rows move), one groupBy doc "
        "with conditional counts, keep docs containing all terms, "
        "score = exact tf sum.  The selective-term filter is the "
        "reason this scales: shuffle volume is the posting size, not "
        "the corpus size"
    ),
)
def retrieval_keyword_and(spark: SparkSession, sf_dir: str):
    a, b, c = KW_TERMS
    tk = t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    m = (
        tk.filter(F.col("term").isin(*KW_TERMS))
        .groupBy("doc_id")
        .agg(
            F.count(F.when(F.col("term") == a, 1)).cast("long").alias("tf_a"),
            F.count(F.when(F.col("term") == b, 1)).cast("long").alias("tf_b"),
            F.count(F.when(F.col("term") == c, 1)).cast("long").alias("tf_c"),
        )
    )
    return m.filter((F.col("tf_a") > 0) & (F.col("tf_b") > 0) & (F.col("tf_c") > 0)).select(
        "doc_id",
        "tf_a",
        "tf_b",
        "tf_c",
        (F.col("tf_a") + F.col("tf_b") + F.col("tf_c")).cast("long").alias("score"),
    )


@register(
    "retrieval_phrase_match",
    f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        WHERE len(string_split(text, ' ')) >= 2)
    SELECT doc_id,
           CAST(len([i FOR i IN range(1, len(tk))
                     IF tk[i] = '{PHRASE[0]}' AND tk[i + 1] = '{PHRASE[1]}'])
                AS BIGINT) AS n_occurrences
    FROM d
    WHERE len([i FOR i IN range(1, len(tk))
               IF tk[i] = '{PHRASE[0]}' AND tk[i + 1] = '{PHRASE[1]}']) > 0
    """,
    tags=("retrieval", "phrase", "positional", "text"),
    description=(
        "positional phrase match ('%s %s' as ADJACENT tokens): the "
        "positional-index query, evaluated as a row-local lambda scan "
        "over the token array — zero shuffles, embarrassingly "
        "parallel, and the occurrence count is exact (a term-AND "
        "match is necessary but not sufficient; adjacency is what a "
        "positional index buys)" % PHRASE
    ),
)
def retrieval_phrase_match(spark: SparkSession, sf_dir: str):
    p1, p2 = PHRASE
    d = t(spark, sf_dir, "documents").withColumn("tk", F.split("text", " ")).filter(
        F.size("tk") >= 2
    )
    n_occ = F.expr(
        f"size(filter(sequence(1, size(tk) - 1), "
        f"i -> element_at(tk, i) = '{p1}' AND element_at(tk, i + 1) = '{p2}'))"
    ).cast("long")
    return (
        d.select("doc_id", n_occ.alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 0)
    )


def _rrf_oracle() -> str:
    a = KW_TERMS[0]
    return f"""
    WITH tk AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    kw AS (
        SELECT doc_id, count(*) AS tf FROM tk WHERE term = '{a}' GROUP BY doc_id),
    kr AS (
        SELECT doc_id, row_number() OVER (ORDER BY tf DESC, doc_id) AS r_kw FROM kw),
    q AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                   x -> CAST(floor(x * {PROBE_SCALE} + 0.5) AS BIGINT)) AS vi
        FROM embeddings),
    probe AS (SELECT vi AS pv FROM q ORDER BY vec_id LIMIT 1),
    dots AS (
        SELECT q.vec_id,
               list_sum(list_transform(range(1, len(q.vi) + 1),
                   i -> q.vi[i] * probe.pv[i])) AS dot
        FROM q, probe),
    vr AS (
        SELECT vec_id, row_number() OVER (ORDER BY dot DESC, vec_id) AS r_vec FROM dots)
    SELECT kr.doc_id,
           CAST(kr.r_kw AS BIGINT) AS r_kw,
           CAST(vr.r_vec AS BIGINT) AS r_vec,
           CAST({RRF_SCALE} // ({RRF_K} + kr.r_kw)
                + {RRF_SCALE} // ({RRF_K} + vr.r_vec) AS BIGINT) AS rrf_score
    FROM kr JOIN vr ON vr.vec_id = kr.doc_id
    """


@register(
    "retrieval_rrf_hybrid",
    _rrf_oracle(),
    tags=("retrieval", "hybrid", "rrf", "similarity", "rank_fusion"),
    description=(
        "hybrid search via reciprocal-rank fusion (Cormack et al. "
        "2009, public): keyword ranking (tf of the query term, doc_id "
        "tiebreak) fused with vector ranking (EXACT integer dot "
        "product against the quantized probe vector — floats never "
        "rank, so cross-engine ties are impossible); "
        "score = SCALE//(k+r_kw) + SCALE//(k+r_vec) in truncating "
        "integer division.  Both rank branches are top-k retrieval "
        "lists (bounded), so the global sort is the k-sized final "
        "ranking step every search engine runs, not a corpus sort"
    ),
)
def retrieval_rrf_hybrid(spark: SparkSession, sf_dir: str):
    a = KW_TERMS[0]
    docs = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")
    kw = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") == a)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # the keyword candidate list is corpus-sized for a common term —
    # rank it with the two-phase bucketed global_rank, never an
    # unpartitioned window (r02 verdict item #5)
    kr = global_rank(kw, ["-tf", "doc_id"], out_col="r_kw").select(
        "doc_id", "r_kw"
    )
    q = emb.select(
        "vec_id",
        F.expr(
            f"transform(cast(embedding as array<double>), "
            f"x -> cast(floor(x * {PROBE_SCALE}D + 0.5D) as bigint))"
        ).alias("vi"),
    )
    probe = q.orderBy("vec_id").limit(1).select(F.col("vi").alias("pv"))
    dots = q.join(F.broadcast(probe)).select(
        "vec_id",
        F.expr("aggregate(zip_with(vi, pv, (x, y) -> x * y), 0L, (s, x) -> s + x)").alias("dot"),
    )
    vr = global_rank(dots, ["-dot", "vec_id"], out_col="r_vec").select(
        "vec_id", "r_vec"
    )
    return kr.join(vr, kr["doc_id"] == vr["vec_id"]).select(
        "doc_id",
        "r_kw",
        "r_vec",
        F.expr(f"CAST({RRF_SCALE} DIV ({RRF_K} + r_kw) + {RRF_SCALE} DIV ({RRF_K} + r_vec) AS BIGINT)").alias(
            "rrf_score"
        ),
    )


# ---------------------------------------------------------------------------
# privacy audits


@register(
    "privacy_k_anonymity",
    """
    WITH qi AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band
        FROM customer),
    g AS (
        SELECT c_nationkey, c_mktsegment, bal_band, count(*) AS n
        FROM qi GROUP BY 1, 2, 3)
    SELECT CAST(n AS BIGINT) AS group_size,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(CASE WHEN n < 5 THEN 1 ELSE 0 END AS BIGINT) AS at_risk
    FROM g GROUP BY n
    """,
    tags=("privacy", "k_anonymity", "governance", "agg"),
    description=(
        "k-anonymity audit (Sweeney 2002, public): quasi-identifier = "
        "(nation, segment, $1000 account-balance band); the histogram "
        "of equivalence-class sizes with the k<5 re-identification "
        "flag — the release gate a governed corpus runs before "
        "shipping.  Two cheap aggregations on the QI key (map-side "
        "combined); floor(x/1000.0) is correctly-rounded IEEE so the "
        "banding is cross-engine identical"
    ),
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str):
    qi = t(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long").alias("bal_band"),
    )
    g = qi.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count(F.lit(1)).alias("n")
    )
    return g.groupBy("n").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("n").cast("long").alias("n_rows"),
    ).select(
        F.col("n").cast("long").alias("group_size"),
        "n_groups",
        "n_rows",
        F.when(F.col("n") < 5, 1).otherwise(0).cast("long").alias("at_risk"),
    )


@register(
    "privacy_l_diversity",
    """
    WITH g AS (
        SELECT c_nationkey,
               CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS bal_band,
               count(*) AS n,
               count(DISTINCT c_mktsegment) AS l
        FROM customer GROUP BY 1, 2)
    SELECT CAST(l AS BIGINT) AS l_diversity,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(min(n) AS BIGINT) AS min_group_size,
           CAST(max(n) AS BIGINT) AS max_group_size
    FROM g GROUP BY l
    """,
    tags=("privacy", "l_diversity", "governance", "agg"),
    description=(
        "l-diversity audit (Machanavajjhala et al. 2007, public): for "
        "each quasi-identifier class (nation x $2000 balance band), "
        "the number of DISTINCT sensitive values (market segment); "
        "the l-histogram shows how many classes a homogeneity attack "
        "cracks (l=1 = everyone in the class shares the sensitive "
        "value).  count(DISTINCT) over the QI key, then a tiny "
        "second-level histogram — one data shuffle"
    ),
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str):
    g = (
        t(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            F.floor(F.col("c_acctbal") / F.lit(2000.0)).cast("long").alias("bal_band"),
            "c_mktsegment",
        )
        .groupBy("c_nationkey", "bal_band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("c_mktsegment").alias("l"),
        )
    )
    return g.groupBy("l").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("n").cast("long").alias("n_rows"),
        F.min("n").cast("long").alias("min_group_size"),
        F.max("n").cast("long").alias("max_group_size"),
    ).select(
        F.col("l").cast("long").alias("l_diversity"),
        "n_groups",
        "n_rows",
        "min_group_size",
        "max_group_size",
    )


# ---------------------------------------------------------------------------
# spatial grid-neighbor join

SPATIAL_RADIUS = 25  # Chebyshev radius == grid cell size (coverage proof)


def _spatial_oracle() -> str:
    r = SPATIAL_RADIUS
    return f"""
    WITH p AS (
        SELECT event_id AS id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) % 1000 AS x,
               user_id % 1000 AS y
        FROM events WHERE event_type = 'click' AND value IS NOT NULL)
    SELECT b.x // {r} AS cell_x, b.y // {r} AS cell_y,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(greatest(abs(a.x - b.x), abs(a.y - b.y))) AS BIGINT) AS sum_cheb
    FROM p a JOIN p b
      ON a.id < b.id
     AND greatest(abs(a.x - b.x), abs(a.y - b.y)) <= {r}
    GROUP BY 1, 2
    """


@register(
    "spatial_grid_neighbors",
    _spatial_oracle(),
    tags=("spatial", "grid_join", "radius_join", "neardup"),
    description=(
        "radius (Chebyshev <= %d) self-join via grid bucketing: cell "
        "size = radius, so a point's neighbors provably live in its "
        "3x3 cell neighborhood — the left side explodes to 9 cells, "
        "equi-joins the right side's HOME cell (each candidate pair "
        "arises exactly once; no dedup pass), and the distance filter "
        "runs row-local.  This turns O(n^2) into sum-of-cell-products "
        "— the canonical scalable spatial join — while the oracle "
        "brute-forces the full cross product to prove the grid lost "
        "nothing; pairs are attributed to the higher-id point's cell"
        % SPATIAL_RADIUS
    ),
)
def spatial_grid_neighbors(spark: SparkSession, sf_dir: str):
    r = SPATIAL_RADIUS
    p = (
        t_nonnull(spark, sf_dir, "events", "value")
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("id"),
            (F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)") % 1000).alias("x"),
            (F.col("user_id") % 1000).alias("y"),
        )
        .withColumn("cx", F.expr(f"x DIV {r}"))
        .withColumn("cy", F.expr(f"y DIV {r}"))
    )
    left = p.select(
        F.col("id").alias("a_id"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        F.explode(
            F.expr("array(-1, 0, 1)")
        ).alias("dx"),
        "cx",
        "cy",
    ).select(
        "a_id",
        "ax",
        "ay",
        (F.col("cx") + F.col("dx")).alias("jx"),
        F.explode(F.expr("array(-1, 0, 1)")).alias("dy"),
        "cy",
    ).select(
        "a_id", "ax", "ay", "jx", (F.col("cy") + F.col("dy")).alias("jy")
    )
    right = p.select(
        F.col("id").alias("b_id"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    cheb = F.greatest(
        F.abs(F.col("ax") - F.col("bx")), F.abs(F.col("ay") - F.col("by"))
    )
    pairs = (
        left.join(right, ["jx", "jy"])
        .filter((F.col("a_id") < F.col("b_id")) & (cheb <= r))
        .select("jx", "jy", cheb.alias("d"))
    )
    return pairs.groupBy("jx", "jy").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("d").cast("long").alias("sum_cheb"),
    ).select(
        F.col("jx").alias("cell_x"), F.col("jy").alias("cell_y"), "n_pairs", "sum_cheb"
    )


# ---------------------------------------------------------------------------
# corpus-ops telemetry


@register(
    "quality_schema_drift",
    """
    WITH b AS (
        SELECT event_type, epoch_us(ts) AS us, user_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events),
    m AS (SELECT (min(us) + max(us)) // 2 AS mid FROM b),
    h AS (SELECT event_type, CASE WHEN us < mid THEN 0 ELSE 1 END AS half,
                 user_id, cents
          FROM b, m),
    s AS (SELECT event_type, half, count(*) AS n,
                 count(DISTINCT user_id) AS u, sum(cents) AS c
          FROM h GROUP BY 1, 2)
    SELECT e.event_type,
           CAST(e.n AS BIGINT) AS early_rows,
           CAST(l.n AS BIGINT) AS late_rows,
           CAST((10000 * (l.n - e.n)) // e.n AS BIGINT) AS rows_drift_bp,
           CAST(e.u AS BIGINT) AS early_users,
           CAST(l.u AS BIGINT) AS late_users,
           CAST((10000 * (l.c * e.n - e.c * l.n)) // (e.c * l.n) AS BIGINT)
               AS mean_drift_bp
    FROM (SELECT * FROM s WHERE half = 0) e
    JOIN (SELECT * FROM s WHERE half = 1) l USING (event_type)
    """,
    tags=("quality", "drift", "data_ops", "agg", "exact_arithmetic"),
    description=(
        "split-half distribution drift audit: the time range is cut "
        "at the exact integer epoch-microsecond midpoint, per-type "
        "row/user/mean statistics are compared early-vs-late, and "
        "drifts are exact basis points — the scheduled data-ops check "
        "that catches silent upstream changes.  The mean ratio is "
        "cross-multiplied ((l.c*e.n - e.c*l.n)/(e.c*l.n)) so the "
        "comparison stays in integer arithmetic (no doubles); bigint "
        "bound ~2^63 holds to ~1e9 cent-rows per type per half "
        "(DECIMAL(38,0) is the production swap past that)"
    ),
)
def quality_schema_drift(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    b = e.select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        "user_id",
        F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)").alias("cents"),
    )
    m = b.agg(F.expr("(min(us) + max(us)) DIV 2").alias("mid"))
    h = b.join(F.broadcast(m)).select(
        "event_type",
        F.when(F.col("us") < F.col("mid"), 0).otherwise(1).alias("half"),
        "user_id",
        "cents",
    )
    # ONE pass: pivoting the halves with conditional aggregates (a
    # half=0/half=1 self-join would recompute the scan + midpoint +
    # distinct-agg subtree twice — the plan audit flagged exactly
    # that); the HAVING keeps inner-join semantics for a type with an
    # empty half (and keeps the DIV denominators nonzero).
    s = h.groupBy("event_type").agg(
        F.count(F.when(F.col("half") == 0, 1)).alias("en"),
        F.countDistinct(F.when(F.col("half") == 0, F.col("user_id"))).alias("eu"),
        F.coalesce(F.sum(F.when(F.col("half") == 0, F.col("cents"))), F.lit(0)).alias("ec"),
        F.count(F.when(F.col("half") == 1, 1)).alias("ln_"),
        F.countDistinct(F.when(F.col("half") == 1, F.col("user_id"))).alias("lu"),
        F.coalesce(F.sum(F.when(F.col("half") == 1, F.col("cents"))), F.lit(0)).alias("lc"),
    )
    return s.filter((F.col("en") > 0) & (F.col("ln_") > 0)).select(
        "event_type",
        F.col("en").cast("long").alias("early_rows"),
        F.col("ln_").cast("long").alias("late_rows"),
        F.expr("CAST((10000 * (ln_ - en)) DIV en AS BIGINT)").alias("rows_drift_bp"),
        F.col("eu").cast("long").alias("early_users"),
        F.col("lu").cast("long").alias("late_users"),
        F.expr("CAST((10000 * (lc * en - ec * ln_)) DIV (ec * ln_) AS BIGINT)").alias(
            "mean_drift_bp"
        ),
    )


@register(
    "quality_freshness_sla",
    """
    WITH b AS (SELECT event_type, epoch_us(ts) AS us FROM events),
    g AS (SELECT max(us) AS gmax FROM b),
    s AS (SELECT event_type, max(us) AS tmax,
                 count(*) FILTER (WHERE us >= (SELECT gmax FROM g) - 86400000000)
                     AS n_last_day
          FROM b GROUP BY event_type)
    SELECT event_type,
           CAST(tmax AS BIGINT) AS max_epoch_us,
           CAST(((SELECT gmax FROM g) - tmax) // 60000000 AS BIGINT) AS lag_min,
           CAST(n_last_day AS BIGINT) AS n_last_day,
           CAST(CASE WHEN (SELECT gmax FROM g) - tmax <= 3600000000
                THEN 1 ELSE 0 END AS BIGINT) AS sla_ok
    FROM s
    """,
    tags=("quality", "freshness", "data_ops", "agg", "exact_arithmetic"),
    description=(
        "per-key freshness SLA audit: each event type's high-water "
        "mark vs the global high-water mark, lag in whole minutes "
        "(truncating integer division over epoch micros), trailing-"
        "24h arrival count, and the <=1h SLA flag — the staleness "
        "monitor every ingest pipeline runs.  Two aggregates over one "
        "scan; the global max is a 1-row broadcast"
    ),
)
def quality_freshness_sla(spark: SparkSession, sf_dir: str):
    b = t(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("us")
    )
    g = b.agg(F.max("us").alias("gmax"))
    j = b.join(F.broadcast(g))
    s = j.groupBy("event_type").agg(
        F.max("us").alias("tmax"),
        F.count(F.when(F.col("us") >= F.col("gmax") - F.lit(86400000000), 1)).alias(
            "n_last_day"
        ),
        F.max("gmax").alias("gmax"),
    )
    return s.select(
        "event_type",
        F.col("tmax").cast("long").alias("max_epoch_us"),
        F.expr("CAST((gmax - tmax) DIV 60000000 AS BIGINT)").alias("lag_min"),
        F.col("n_last_day").cast("long").alias("n_last_day"),
        F.when(F.col("gmax") - F.col("tmax") <= 3600000000, 1)
        .otherwise(0)
        .cast("long")
        .alias("sla_ok"),
    )


@register(
    "quality_label_balance",
    """
    WITH g AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
    tt AS (SELECT sum(n) AS total, count(*) AS k FROM g)
    SELECT CAST(label AS BIGINT) AS label,
           CAST(n AS BIGINT) AS n_vectors,
           CAST((10000 * n) // total AS BIGINT) AS share_bp,
           CAST(((k * n - total) * (k * n - total)) // total AS BIGINT)
               AS imbalance_x_k2
    FROM g, tt
    """,
    tags=("quality", "labels", "balance", "governance", "agg"),
    description=(
        "label-balance audit over the embedding corpus: per-class "
        "count, share in basis points, and the per-class chi-square "
        "numerator against the uniform expectation ((k*n - N)^2 / N, "
        "kept k^2-scaled so it stays integer-exact) — the class-skew "
        "check run before training on labeled data.  One tiny "
        "aggregate + a 1-row broadcast"
    ),
)
def quality_label_balance(spark: SparkSession, sf_dir: str):
    g = t(spark, sf_dir, "embeddings").groupBy("label").agg(
        F.count(F.lit(1)).alias("n")
    )
    tt = g.agg(F.sum("n").alias("total"), F.count(F.lit(1)).alias("k"))
    return g.join(F.broadcast(tt)).select(
        F.col("label").cast("long").alias("label"),
        F.col("n").cast("long").alias("n_vectors"),
        F.expr("CAST((10000 * n) DIV total AS BIGINT)").alias("share_bp"),
        F.expr(
            "CAST(((k * n - total) * (k * n - total)) DIV total AS BIGINT)"
        ).alias("imbalance_x_k2"),
    )


def _knn_oracle() -> str:
    r = SPATIAL_RADIUS
    return f"""
    WITH p AS (
        SELECT event_id AS id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) % 1000 AS x,
               user_id % 1000 AS y
        FROM events WHERE event_type = 'view' AND value IS NOT NULL),
    d AS (
        SELECT a.id AS a_id, b.id AS b_id,
               greatest(abs(a.x - b.x), abs(a.y - b.y)) AS d
        FROM p a JOIN p b
          ON a.id <> b.id
         AND greatest(abs(a.x - b.x), abs(a.y - b.y)) <= {r}),
    rk AS (
        SELECT a_id, b_id, d,
               row_number() OVER (PARTITION BY a_id ORDER BY d, b_id) AS rk
        FROM d)
    SELECT a_id, CAST(rk AS BIGINT) AS rk, b_id, CAST(d AS BIGINT) AS d
    FROM rk WHERE rk <= 3
    """


@register(
    "spatial_knn_bounded",
    _knn_oracle(),
    tags=("spatial", "knn", "grid_join", "similarity"),
    description=(
        "bounded k-nearest-neighbors (k=3 within Chebyshev radius "
        "%d): the same cell-size=radius grid coverage proof as "
        "spatial_grid_neighbors, but DIRECTED — every point scans its "
        "3x3 neighborhood for candidates (each candidate arises "
        "exactly once, no dedup) and keeps its 3 closest by "
        "(distance, id) over a per-point window.  The radius bound is "
        "what makes grid kNN exact (an unbounded kNN needs expanding "
        "rings); the oracle brute-forces all n^2 distances"
        % SPATIAL_RADIUS
    ),
)
def spatial_knn_bounded(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.spatial import grid_knn

    p = (
        t_nonnull(spark, sf_dir, "events", "value")
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("id"),
            (F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)") % 1000).alias("x"),
            (F.col("user_id") % 1000).alias("y"),
        )
    )
    return grid_knn(p, id_col="id", x="x", y="y", radius=SPATIAL_RADIUS, k=3)


DBSCAN_EPS = 25
DBSCAN_MINPTS = 4


#: min-label rounds in the DBSCAN oracle's components unroll.  Each
#: round takes min(own, neighbors', label's label); the jump step
#:  accelerates long chains but is NOT a strict doubling guarantee, so
#: the bound that matters is the plain propagation one: rounds >=
#: eccentricity of the min-id node <= hop-diameter of the core graph,
#: which the 1000x1000 grid caps at ~2*1000/eps = 80 for a straight
#: dense path and which measures ~26 on the sf0.1 fixture (19810
#: points collapse to ONE cluster).  48 = measured need + ~2x margin;
#: an unconverged oracle can only FAIL the gate loudly (Spark's
#: connected_components iterates to a checked fixpoint), never match
#: it silently.  The oracle's final SELECT additionally ASSERTS
#: convergence (l48 == l47) via DuckDB error() (ADVICE r06), so a
#: fixture with a longer core chain fails with a named
#: raise-DBSCAN_CC_ROUNDS message instead of a confusing spurious
#: hash mismatch.
DBSCAN_CC_ROUNDS = 48


def _dbscan_oracle(with_counts: bool = True) -> str:
    """Fixed-round iterative min-label components instead of the old
    RECURSIVE transitive closure (r05 verdict missing #3): the closure
    enumerated every (node, reachable-label) pair — O(n x |component|)
    rows, DNF at 35+ min on sf0.1's 19810 points — while this unroll
    keeps ONE label row per node per round and converges by label
    chaining (each round takes the min of the node's label, its
    neighbors' labels, and its label's label).  Every round CTE is
    MATERIALIZED (the k-core precedent: chained re-reads would expand
    the base scan exponentially).  Measured: sf0.01 22.8 s -> 0.4 s
    bit-identical; sf0.1 DNF -> ~15 s.

    ``with_counts=False`` emits (id, cluster_rep) only — the oracle
    twin of the contraction operator ``spatial_dbscan_clusters``,
    which deliberately omits exact per-point neighbor counts (their
    exact computation IS the quadratic pair enumeration the scalable
    operator avoids).  The convergence assert folds into cluster_rep
    instead of n_neighbors."""
    r, m = DBSCAN_EPS, DBSCAN_MINPTS
    parts = [
        f"""
    WITH p AS MATERIALIZED (
        SELECT event_id AS id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) % 1000 AS x,
               user_id % 1000 AS y
        FROM events WHERE event_type = 'error' AND value IS NOT NULL),
    nbr AS MATERIALIZED (
        SELECT a.id, count(*) AS n
        FROM p a JOIN p b
          ON a.id <> b.id
         AND greatest(abs(a.x - b.x), abs(a.y - b.y)) <= {r}
        GROUP BY a.id),
    core AS MATERIALIZED (SELECT id, n FROM nbr WHERE n >= {m}),
    ce AS MATERIALIZED (
        SELECT a.id AS u, b.id AS v
        FROM p a JOIN p b
          ON a.id < b.id
         AND greatest(abs(a.x - b.x), abs(a.y - b.y)) <= {r}
        WHERE a.id IN (SELECT id FROM core) AND b.id IN (SELECT id FROM core)),
    und AS MATERIALIZED (SELECT u, v FROM ce UNION SELECT v, u FROM ce),
    l0 AS MATERIALIZED (SELECT DISTINCT u, u AS lbl FROM und)"""
    ]
    for i in range(1, DBSCAN_CC_ROUNDS + 1):
        prev = f"l{i - 1}"
        parts.append(
            f""",
    n{i} AS (SELECT e.u, min(pl.lbl) AS lbl FROM und e
             JOIN {prev} pl ON e.v = pl.u GROUP BY e.u),
    j{i} AS (SELECT l1.u, min(l2.lbl) AS lbl FROM {prev} l1
             JOIN {prev} l2 ON l1.lbl = l2.u GROUP BY l1.u),
    l{i} AS MATERIALIZED (
        SELECT l.u, least(l.lbl, coalesce(n.lbl, l.lbl),
                          coalesce(j.lbl, l.lbl)) AS lbl
        FROM {prev} l LEFT JOIN n{i} n ON n.u = l.u
        LEFT JOIN j{i} j ON j.u = l.u)"""
        )
    if with_counts:
        parts.append(
            f""",
    comp AS (SELECT u AS id, lbl AS cluster_rep FROM l{DBSCAN_CC_ROUNDS}),
    conv AS (
        SELECT count(*) AS ndiff
        FROM l{DBSCAN_CC_ROUNDS} a JOIN l{DBSCAN_CC_ROUNDS - 1} b
          ON a.u = b.u AND a.lbl <> b.lbl),
    labeled AS (
        SELECT core.id, coalesce(comp.cluster_rep, core.id) AS cluster_rep,
               core.n
        FROM core LEFT JOIN comp ON comp.id = core.id)
    SELECT id, cluster_rep,
           CAST(CASE WHEN ndiff > 0
                     THEN error('DBSCAN oracle: min-label unroll NOT '
                                'converged after {DBSCAN_CC_ROUNDS} rounds '
                                '- raise DBSCAN_CC_ROUNDS')
                     ELSE n END AS BIGINT) AS n_neighbors
    FROM labeled, conv
    """
        )
    else:
        parts.append(
            f""",
    comp AS (SELECT u AS id, lbl AS cluster_rep FROM l{DBSCAN_CC_ROUNDS}),
    conv AS (
        SELECT count(*) AS ndiff
        FROM l{DBSCAN_CC_ROUNDS} a JOIN l{DBSCAN_CC_ROUNDS - 1} b
          ON a.u = b.u AND a.lbl <> b.lbl)
    SELECT core.id,
           CAST(CASE WHEN ndiff > 0
                     THEN error('DBSCAN oracle: min-label unroll NOT '
                                'converged after {DBSCAN_CC_ROUNDS} rounds '
                                '- raise DBSCAN_CC_ROUNDS')
                     ELSE coalesce(comp.cluster_rep, core.id)
                END AS BIGINT) AS cluster_rep
    FROM core LEFT JOIN comp ON comp.id = core.id, conv
    """
        )
    return "".join(parts)


def _dbscan_front(spark: SparkSession, sf_dir: str):
    """(pairs, core) — the LAZY front half of
    :func:`spatial_dbscan_core` (both pin_shared sites), stopping
    BEFORE the eager connected-components checkpoint.  Shared with
    the decade stress's pin-decision probe
    (scripts/sf10_stress_heavies.py), which must observe the size
    guard at corpus scales where EXECUTING the pair pipeline is
    semantically quadratic and infeasible."""
    from sfs3_kinesis_spark.operators.spatial import grid_radius_pairs

    p = (
        t_nonnull(spark, sf_dir, "events", "value")
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("id"),
            (F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)") % 1000).alias("x"),
            (F.col("user_id") % 1000).alias("y"),
        )
    )
    pairs = pin_shared(
        grid_radius_pairs(
            p, id_col="id", x="x", y="y", radius=DBSCAN_EPS, directed=True
        ),
        tag="dbscan_pairs",
    )
    core = (
        pairs.groupBy("a_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= DBSCAN_MINPTS)
        .select(F.col("a_id").alias("id"), "n")
    )
    return pairs, pin_shared(core, tag="dbscan_core")


@register(
    "spatial_dbscan_core",
    _dbscan_oracle(),
    tags=("spatial", "dbscan", "clustering", "iterative", "grid_join"),
    description=(
        "DBSCAN core-point clustering (eps=%d Chebyshev, minPts=%d): "
        "neighbor counts and core-core edges come from the grid "
        "radius join (operators/spatial.py — sum-of-cell-products, "
        "never n^2), clusters from the adaptive connected components "
        "(operators/dedup.py — driver union-find under the bounded "
        "edge threshold, distributed min-label loop above it); "
        "isolated core points cluster as themselves.  The composition every "
        "density-clustering pipeline needs at scale, value-verified "
        "against a DuckDB brute-force + RECURSIVE transitive-closure "
        "oracle.  Core points only: border assignment is visit-order-"
        "dependent in classic DBSCAN and has no deterministic oracle"
        % (DBSCAN_EPS, DBSCAN_MINPTS)
    ),
)
def spatial_dbscan_core(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.dedup import connected_components

    pairs, core = _dbscan_front(spark, sf_dir)
    core_ids = core.select("id")
    ce = (
        pairs.filter(F.col("a_id") < F.col("b_id"))
        .join(core_ids.withColumnRenamed("id", "a_id"), "a_id")
        .join(core_ids.withColumnRenamed("id", "b_id"), "b_id")
        .select(F.col("a_id").alias("doc_a"), F.col("b_id").alias("doc_b"))
    )
    comp = connected_components(ce, "doc_a", "doc_b")
    return core.join(comp, core.id == comp.vertex, "left").select(
        "id",
        F.coalesce("component", "id").alias("cluster_rep"),
        F.col("n").cast("long").alias("n_neighbors"),
    )


@register(
    "spatial_dbscan_clusters",
    _dbscan_oracle(with_counts=False),
    tags=("spatial", "dbscan", "clustering", "iterative", "grid_contraction", "scale"),
    description=(
        "DBSCAN core clustering via GRID CONTRACTION (Gunawan 2013 / "
        "Gan & Tao 2015, public) — the scale path that never "
        "enumerates eps-neighbor pairs: cell side (eps+1) DIV 2 makes "
        "the 3x3 cell block fully eps-contained, so core-ness "
        "resolves from cell-count sums (a cell-level aggregate, no "
        "point comparisons) for every point in a dense neighborhood; "
        "clustering contracts each core cell to its min-id hub, links "
        "distance-1 core cells unconditionally (guaranteed eps-edges) "
        "and point-checks distance-2 cell pairs ONLY when no "
        "intermediate cell holds a core (a core intermediate already "
        "connects them transitively).  Same clusters as "
        "spatial_dbscan_core — same eps/minPts, same min-core-id "
        "representative, verified by the same min-label-unroll oracle "
        "— but point-level work tracks sparse-boundary geometry "
        "instead of density^2: the fixed-torus decade stress measures "
        "pair exponent ~2.0 for the naive radius join vs ~0 examined "
        "pairs here (SF1_STRESS x100_heavies).  Omits exact "
        "n_neighbors (its computation IS the avoided pair "
        "enumeration); core membership itself is exact via the "
        "ring-cell fallback count for sparse points"
    ),
)
def spatial_dbscan_clusters(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.spatial import dbscan_core_clusters

    p = (
        t_nonnull(spark, sf_dir, "events", "value")
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("id"),
            (F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)") % 1000).alias("x"),
            (F.col("user_id") % 1000).alias("y"),
        )
    )
    return dbscan_core_clusters(
        p, id_col="id", x="x", y="y", eps=DBSCAN_EPS, min_pts=DBSCAN_MINPTS
    )


@register(
    "text_term_burstiness",
    """
    WITH tk AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    s AS (
        SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
        FROM tk GROUP BY term)
    SELECT term,
           CAST(tf AS BIGINT) AS tf,
           CAST(df AS BIGINT) AS df,
           CAST((100 * tf) // df AS BIGINT) AS burstiness_x100
    FROM s WHERE df >= 10
    ORDER BY burstiness_x100 DESC, term LIMIT 30
    """,
    tags=("text", "burstiness", "corpus_stats", "retrieval"),
    description=(
        "term burstiness (Church & Gale: mean occurrences per "
        "containing document, x100 integer): separates topical terms "
        "(bursty — many repeats once a doc mentions them) from "
        "function words (evenly spread), the signal behind tf "
        "saturation in ranking functions.  One term-key aggregate "
        "with a multi-distinct pass; top-30 under a total order"
    ),
)
def text_term_burstiness(spark: SparkSession, sf_dir: str):
    tk = t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    s = tk.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"), F.countDistinct("doc_id").alias("df")
    )
    return (
        s.filter(F.col("df") >= 10)
        .select(
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.expr("CAST((100 * tf) DIV df AS BIGINT)").alias("burstiness_x100"),
        )
        .orderBy(F.desc("burstiness_x100"), "term")
        .limit(30)
    )


NEG_RARE_DF = 25  # rare-token blocking bound for hard-negative mining


@register(
    "sample_hard_negatives",
    f"""
    WITH tk AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents),
    rare AS (
        SELECT term FROM tk GROUP BY term
        HAVING count(*) <= {NEG_RARE_DF}),
    rt AS (SELECT tk.doc_id, tk.term FROM tk JOIN rare USING (term)),
    q AS (SELECT doc_id, term FROM rt WHERE doc_id % 50 = 0),
    c AS (SELECT doc_id, term FROM rt WHERE doc_id % 50 <> 0),
    shared AS (
        SELECT q.doc_id AS query_id, c.doc_id AS neg_id, count(*) AS n_shared
        FROM q JOIN c USING (term)
        GROUP BY q.doc_id, c.doc_id),
    rk AS (
        SELECT query_id, neg_id, n_shared,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY n_shared DESC, neg_id) AS rk
        FROM shared)
    SELECT query_id, CAST(rk AS BIGINT) AS rk, neg_id,
           CAST(n_shared AS BIGINT) AS n_shared
    FROM rk WHERE rk <= 3
    """,
    tags=("sampling", "hard_negatives", "retrieval", "training_data"),
    description=(
        "hard-negative mining for retrieval training: each query "
        "document's top-3 most lexically confusable OTHER documents "
        "(shared RARE-token count, df <= %d blocking — the same "
        "rare-token pruning as the prefix-filter similarity join, "
        "which is what keeps the token join from exploding on "
        "stopword-frequency terms at corpus scale).  The negatives a "
        "contrastive dual-encoder is trained against; exact integer "
        "counts, (count DESC, id) total order"
        % NEG_RARE_DF
    ),
)
def sample_hard_negatives(spark: SparkSession, sf_dir: str):
    tk = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .distinct()
    )
    rare = tk.groupBy("term").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= NEG_RARE_DF
    ).select("term")
    rt = tk.join(F.broadcast(rare), "term")
    q = rt.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("query_id"), "term"
    )
    c = rt.filter(F.col("doc_id") % 50 != 0).select(
        F.col("doc_id").alias("neg_id"), "term"
    )
    shared = q.join(c, "term").groupBy("query_id", "neg_id").agg(
        F.count(F.lit(1)).alias("n_shared")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("n_shared"), "neg_id")
    return (
        shared.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("query_id", "rk", "neg_id", F.col("n_shared").cast("long").alias("n_shared"))
    )


@register(
    "text_tv_distance_sources",
    """
    WITH tk AS (
        SELECT source, unnest(string_split(text, ' ')) AS term
        FROM documents WHERE source IN ('src0', 'src1')),
    c AS (
        SELECT term,
               count(*) FILTER (WHERE source = 'src0') AS a,
               count(*) FILTER (WHERE source = 'src1') AS b
        FROM tk GROUP BY term),
    tot AS (SELECT sum(a) AS na, sum(b) AS nb FROM c)
    SELECT CAST(tot.na AS BIGINT) AS n_tokens_a,
           CAST(tot.nb AS BIGINT) AS n_tokens_b,
           CAST(count(*) AS BIGINT) AS n_terms,
           CAST((10000 * sum(abs(c.a * tot.nb - c.b * tot.na)))
                // (2 * tot.na * tot.nb) AS BIGINT) AS tv_distance_bp
    FROM c, tot GROUP BY tot.na, tot.nb
    """,
    tags=("text", "distribution_distance", "drift", "exact_arithmetic"),
    description=(
        "total-variation distance between two sources' term "
        "distributions (the exact-integer stand-in for JS/KL "
        "divergence, whose log() is not cross-engine bit-stable): "
        "TV = sum|p_i - q_i|/2 cross-multiplied to "
        "sum|a_i*Nb - b_i*Na| / (2*Na*Nb) in basis points — 0 = "
        "identical vocabularies, 10000 = disjoint.  The corpus-"
        "mixture similarity check run before weighting sources; one "
        "term-key aggregate plus a 1-row total broadcast"
    ),
)
def text_tv_distance_sources(spark: SparkSession, sf_dir: str):
    tk = (
        t(spark, sf_dir, "documents")
        .filter(F.col("source").isin("src0", "src1"))
        .select("source", F.explode(F.split("text", " ")).alias("term"))
    )
    c = tk.groupBy("term").agg(
        F.count(F.when(F.col("source") == "src0", 1)).alias("a"),
        F.count(F.when(F.col("source") == "src1", 1)).alias("b"),
    )
    tot = c.agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
    return (
        c.join(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum(F.abs(F.col("a") * F.col("nb") - F.col("b") * F.col("na"))).alias(
                "sabs"
            ),
        )
        .select(
            F.col("na").cast("long").alias("n_tokens_a"),
            F.col("nb").cast("long").alias("n_tokens_b"),
            F.col("n_terms").cast("long").alias("n_terms"),
            F.expr("CAST((10000 * sabs) DIV (2 * na * nb) AS BIGINT)").alias(
                "tv_distance_bp"
            ),
        )
    )


@register(
    "retrieval_query_expansion",
    f"""
    WITH tk AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    hits AS (
        SELECT doc_id, count(*) AS tf FROM tk
        WHERE term = '{KW_TERMS[0]}' GROUP BY doc_id
        ORDER BY tf DESC, doc_id LIMIT 10),
    fb AS (
        SELECT tk.term, count(*) AS fb_tf
        FROM tk JOIN hits USING (doc_id)
        WHERE tk.term <> '{KW_TERMS[0]}'
        GROUP BY tk.term),
    corpus AS (SELECT term, count(*) AS c_tf FROM tk GROUP BY term),
    tot AS (
        SELECT (SELECT sum(fb_tf) FROM fb) AS fb_n,
               (SELECT sum(c_tf) FROM corpus) AS c_n)
    SELECT fb.term,
           CAST(fb.fb_tf AS BIGINT) AS feedback_tf,
           CAST(corpus.c_tf AS BIGINT) AS corpus_tf,
           CAST((10000 * fb.fb_tf * tot.c_n) // (corpus.c_tf * tot.fb_n)
                AS BIGINT) AS lift_bp
    FROM fb JOIN corpus USING (term) CROSS JOIN tot
    WHERE (10000 * fb.fb_tf * tot.c_n) // (corpus.c_tf * tot.fb_n) > 10000
    ORDER BY lift_bp DESC, term LIMIT 15
    """,
    tags=("retrieval", "query_expansion", "prf", "exact_arithmetic"),
    description=(
        "pseudo-relevance-feedback query expansion (Rocchio-style, "
        "public): retrieve the top-10 documents for the seed term, "
        "then rank the terms OVER-REPRESENTED in that feedback set "
        "vs the corpus (lift cross-multiplied to exact basis points "
        "— share-in-feedback / share-in-corpus, no doubles), keeping "
        "terms with lift > 1 — the expansion terms a second-round "
        "query adds.  The feedback set is 10 docs (broadcast-sized "
        "by construction); the corpus term table is the only "
        "data-sized aggregate and it is shared with the index build"
    ),
)
def retrieval_query_expansion(spark: SparkSession, sf_dir: str):
    seed = KW_TERMS[0]
    tk = t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    hits = (
        tk.filter(F.col("term") == seed)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.desc("tf"), "doc_id")
        .limit(10)
        .select("doc_id")
    )
    fb = (
        tk.join(F.broadcast(hits), "doc_id")
        .filter(F.col("term") != seed)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("fb_tf"))
    )
    corpus = tk.groupBy("term").agg(F.count(F.lit(1)).alias("c_tf"))
    tot = fb.agg(F.sum("fb_tf").alias("fb_n")).crossJoin(
        corpus.agg(F.sum("c_tf").alias("c_n"))
    )
    lift = "CAST((10000 * fb_tf * c_n) DIV (c_tf * fb_n) AS BIGINT)"
    return (
        fb.join(corpus, "term")
        .join(F.broadcast(tot))
        .filter(F.expr(f"{lift} > 10000"))
        .select(
            "term",
            F.col("fb_tf").cast("long").alias("feedback_tf"),
            F.col("c_tf").cast("long").alias("corpus_tf"),
            F.expr(lift).alias("lift_bp"),
        )
        .orderBy(F.desc("lift_bp"), "term")
        .limit(15)
    )


@register(
    "text_vocab_growth",
    """
    WITH tk AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    fs AS (SELECT term, min(doc_id) AS first_doc FROM tk GROUP BY term),
    b AS (
        SELECT first_doc // 50 AS bucket, count(*) AS new_terms
        FROM fs GROUP BY first_doc // 50)
    SELECT CAST(bucket AS BIGINT) AS doc_bucket_50,
           CAST(new_terms AS BIGINT) AS new_terms,
           CAST(sum(new_terms) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cumulative_vocab
    FROM b
    """,
    tags=("text", "vocab_growth", "heaps_law", "corpus_stats"),
    description=(
        "vocabulary-growth curve (Heaps' law readout): new distinct "
        "terms introduced per 50-document slab of the corpus in "
        "doc_id order, plus the cumulative vocabulary size — the "
        "curve that calibrates tokenizer vocab sizes and dedup "
        "budgets as a corpus grows.  First-seen doc per term is one "
        "term-key aggregate (the same shuffle the novelty score "
        "uses); the growth curve is a prefix sum over |slabs| rows"
    ),
)
def text_vocab_growth(spark: SparkSession, sf_dir: str):
    tk = t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    fs = tk.groupBy("term").agg(F.min("doc_id").alias("first_doc"))
    b = fs.groupBy(F.expr("first_doc DIV 50").alias("bucket")).agg(
        F.count(F.lit(1)).alias("new_terms")
    )
    # |slabs| grows with the corpus (docs/50) — two-phase bucketed
    # prefix sum instead of a single-partition running total
    return global_cumsum(b, ["bucket"], {"new_terms": "cumulative_vocab"}).select(
        F.col("bucket").cast("long").alias("doc_bucket_50"),
        F.col("new_terms").cast("long").alias("new_terms"),
        F.col("cumulative_vocab").cast("long").alias("cumulative_vocab"),
    )


@register(
    "retrieval_bm25",
    f"""
    WITH tk AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    dl AS (SELECT doc_id, CAST(count(*) AS HUGEINT) AS dl FROM tk GROUP BY doc_id),
    tot AS (SELECT CAST(sum(dl) AS HUGEINT) AS tt, CAST(count(*) AS HUGEINT) AS nd
            FROM dl),
    tf AS (SELECT doc_id, CAST(count(*) AS HUGEINT) AS tf FROM tk
           WHERE term = '{KW_TERMS[1]}' GROUP BY doc_id),
    dfc AS (SELECT CAST(count(*) AS HUGEINT) AS df FROM tf)
    SELECT tf.doc_id,
           CAST(tf AS BIGINT) AS tf,
           CAST(dl AS BIGINT) AS dl,
           CAST((2 * nd - 2 * df + 1) * (2200 * tf * tt) * 1000000
                // ((2 * df + 1) * (1000 * tf * tt + 300 * tt + 900 * dl * nd))
                AS BIGINT) AS bm25_micro
    FROM tf JOIN dl USING (doc_id), tot, dfc
    ORDER BY bm25_micro DESC, tf.doc_id LIMIT 20
    """,
    tags=("retrieval", "bm25", "ranking", "exact_arithmetic", "topk"),
    description=(
        "BM25 top-20 ranking (Robertson-Sparck Jones, public) for one "
        "query term, in EXACT integer arithmetic so both engines "
        "agree bit-for-bit: with k1=1.2, b=0.75 the score "
        "idf * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)) becomes the "
        "single integer ratio (2N-2df+1)(2200*tf*T)*1e6 // "
        "((2df+1)(1000*tf*T + 300*T + 900*dl*N)) — the raw "
        "Robertson idf odds-ratio replaces the log (log is "
        "monotone, so top-k order is IDENTICAL for a single term, "
        "and libm ln() is not bit-stable across JVMs/engines).  "
        "Products run in DECIMAL(38,0)/HUGEINT so corpus-scale token "
        "totals cannot wrap; corpus stats (T, N, df) ride in as "
        "1-row broadcasts; final top-20 is TakeOrderedAndProject"
    ),
)
def retrieval_bm25(spark: SparkSession, sf_dir: str):
    term = KW_TERMS[1]
    docs = t(spark, sf_dir, "documents")
    tk = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    dl = tk.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("dl")
    )
    tot = dl.agg(
        F.sum("dl").cast("decimal(38,0)").alias("tt"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("nd"),
    )
    tf = (
        tk.filter(F.col("term") == term)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("tf"))
    )
    dfc = tf.agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("df"))
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(tot))
        .join(F.broadcast(dfc))
        .select(
            "doc_id",
            F.col("tf").cast("long").alias("tf"),
            F.col("dl").cast("long").alias("dl"),
            F.expr(
                "CAST((2 * nd - 2 * df + 1) * (2200 * tf * tt) * 1000000"
                " DIV ((2 * df + 1) * (1000 * tf * tt + 300 * tt + 900 * dl * nd))"
                " AS BIGINT)"
            ).alias("bm25_micro"),
        )
    )
    return scored.orderBy(F.desc("bm25_micro"), "doc_id").limit(20)


def _dp_geometric_case(u_expr: str) -> str:
    """Truncated two-sided geometric noise, sampled EXACTLY: weights
    w_k = 2^(8-|k|) for k in -8..8 (total 766) approximate the
    geometric mechanism's alpha=1/2 tail; the cumulative integer
    thresholds turn a uniform draw in [0, 766) into a noise value
    with zero floating point — so both engines sample the identical
    noise from the identical hash draw.  Same CASE text on both
    sides (only the md5 idiom differs)."""
    ks = list(range(-8, 9))
    cum = 0
    arms = []
    for k in ks[:-1]:
        cum += 2 ** (8 - abs(k))
        arms.append(f"WHEN {u_expr} < {cum} THEN ({k})")
    return "CASE " + " ".join(arms) + f" ELSE ({ks[-1]}) END"


#: total weight of the truncated geometric ladder (sum of 2^(8-|k|))
_DP_TOTAL = sum(2 ** (8 - abs(k)) for k in range(-8, 9))


def _dp_oracle() -> str:
    from sfs3_kinesis_spark.plans.feature_queries import _MD5_DUCK

    key = "concat('dp|', lang, '|', source)"
    u = f"({_MD5_DUCK.format(s=key)} % {_DP_TOTAL})"
    case = _dp_geometric_case(u)
    return f"""
    WITH g AS (
        SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY lang, source)
    SELECT lang, source, n_docs,
           CAST({case} AS BIGINT) AS noise,
           CAST(greatest(0, n_docs + {case}) AS BIGINT) AS released
    FROM g
    """


@register(
    "privacy_dp_noisy_counts",
    _dp_oracle(),
    tags=("privacy", "differential_privacy", "geometric_mechanism", "agg"),
    description=(
        "differentially-private count release (geometric mechanism, "
        "Ghosh-Roughgarden-Sundararajan 2009, public): per (lang, "
        "source) cell the count plus two-sided-geometric noise "
        "(alpha=1/2, truncated at +/-8, weights 2^(8-|k|)/766 — "
        "dyadic, so the inverse-CDF lookup is EXACT integer "
        "thresholds), clamped at 0 for release.  The noise draw is a "
        "keyed md5 hash, not an rng: retries, replays, and both "
        "engines sample identical noise — the determinism a "
        "distributed DP release needs for idempotent publication.  "
        "One groupBy + a codegen CASE ladder; the true count rides "
        "along as this is the mechanism-audit view, not the public "
        "artifact"
    ),
)
def privacy_dp_noisy_counts(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.plans.feature_queries import _MD5_SPARK

    key = "concat('dp|', lang, '|', source)"
    u = f"({_MD5_SPARK.format(s=key)} % {_DP_TOTAL})"
    case = _dp_geometric_case(u)
    g = t(spark, sf_dir, "documents").groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return g.select(
        "lang",
        "source",
        "n_docs",
        F.expr(case).cast("long").alias("noise"),
        F.expr(f"greatest(0L, n_docs + {case})").cast("long").alias("released"),
    )
