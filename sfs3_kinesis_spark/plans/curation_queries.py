"""Round-6 curation wave: dataset-engineering operators a training
pipeline reaches for between dedup and packing — deterministic
stratified k-fold assignment, corpus Zipf profiling, Mann-Kendall /
Theil-Sen trend tests for ingest monitoring, a count-min frequency
sketch with an in-query guarantee audit, Fano-factor burstiness,
Neyman-optimal sample allocation, and Gini decision-stump induction.

All of them follow the corpus conventions (plans/core.py): exact
integer arithmetic end to end, every computed column aliased
identically on both engines, pair joins only over calendar- or
domain-bounded rollups, windows partitioned on bounded keys.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

from sfs3_kinesis_spark.plans.core import register, t, t_nonnull

#: Knuth's multiplicative hash constant — the deterministic fold
#: assigner both engines compute identically on BIGINT (doc_id is
#: ~1e5 max, so the product stays far under 2^63).
_KFOLD_MULT = 2654435761
_KFOLD_K = 5


@register(
    "sample_stratified_kfold",
    f"""
    WITH assigned AS (
        SELECT lang,
               ((doc_id * {_KFOLD_MULT}) % 4294967296) % {_KFOLD_K} AS fold,
               n_chars
        FROM documents),
    cell AS (
        SELECT lang, fold,
               count(*) AS n_docs,
               sum(n_chars) AS sum_chars
        FROM assigned GROUP BY lang, fold)
    SELECT lang,
           CAST(fold AS BIGINT)       AS fold,
           CAST(n_docs AS BIGINT)     AS n_docs,
           CAST(sum_chars AS BIGINT)  AS sum_chars,
           CAST((1000 * n_docs) // sum(n_docs) OVER (PARTITION BY lang)
                AS BIGINT)            AS frac_x1000
    FROM cell
    """,
    tags=("sampling", "kfold", "stratified", "cross_validation", "exact_arithmetic"),
    description=(
        "stratified k-fold assignment (k=5) for cross-validation "
        "splits: fold = Knuth-multiplicative hash of doc_id, so "
        "membership is a pure projection (no shuffle, no stored split "
        "table, reproducible across runs and engines) and every doc "
        "lands in EXACTLY one fold by construction — the leakage-free "
        "property train/val splitters must prove.  Per (lang, fold) "
        "counts + char mass + within-language fold share (x1000 "
        "integer) audit the stratification balance; the share window "
        "partitions on the 5-language key, never globally"
    ),
)
def sample_stratified_kfold(spark: SparkSession, sf_dir: str):
    assigned = t(spark, sf_dir, "documents").select(
        "lang",
        ((F.col("doc_id") * F.lit(_KFOLD_MULT)) % F.lit(4294967296) % F.lit(_KFOLD_K)).alias(
            "fold"
        ),
        "n_chars",
    )
    cell = assigned.groupBy("lang", "fold").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("sum_chars")
    )
    return cell.withColumn(
        "_lang_total", F.sum("n_docs").over(W.partitionBy("lang"))
    ).select(
        "lang",
        F.col("fold").cast("long").alias("fold"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("sum_chars").cast("long").alias("sum_chars"),
        F.expr("CAST((1000 * n_docs) DIV _lang_total AS BIGINT)").alias("frac_x1000"),
    )


#: count-min sketch geometry: 4 independent rows x 64 counters.
#: Multiplicative-shift hashes on the BIGINT key with fixed odd
#: constants — both engines compute them bit-identically, unlike
#: xxhash64 (Spark-only).  p is a Mersenne prime (2^31 - 1).
_CMS_W = 64
_CMS_P = 2147483647
_CMS_AB = ((2654435761, 104729), (2246822519, 224737), (3266489917, 350377), (668265263, 479909))


def _cms_hash_sql(row: int, key: str) -> str:
    # reduce the key mod p BEFORE the multiply: the raw product
    # key * a overflows int64 for key >~ 2.8e9 (a_max ~ 3.3e9), where
    # non-ANSI Spark wraps silently while DuckDB raises — the claimed
    # bit-identical cross-engine hash would diverge beyond
    # fixture-scale ids (ADVICE r06).  (key % p) < 2^31 keeps the
    # product under ~7.0e18 < 2^63-1 for every a in _CMS_AB.
    a, b = _CMS_AB[row]
    return f"(((({key} % {_CMS_P}) * {a} + {b}) % {_CMS_P}) % {_CMS_W})"


@register(
    "agg_countmin_heavy_audit",
    f"""
    WITH hits AS (
        SELECT user_id, count(*) AS true_n FROM events GROUP BY user_id),
    cells AS (
        SELECT r.row_id,
               CASE r.row_id
                    WHEN 0 THEN {_cms_hash_sql(0, 'user_id')}
                    WHEN 1 THEN {_cms_hash_sql(1, 'user_id')}
                    WHEN 2 THEN {_cms_hash_sql(2, 'user_id')}
                    ELSE        {_cms_hash_sql(3, 'user_id')}
               END AS bucket,
               count(*) AS c
        FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS row_id) r
        GROUP BY 1, 2),
    est AS (
        SELECT h.user_id, h.true_n,
               min(c.c) AS est_n
        FROM hits h
        JOIN cells c
          ON c.bucket = CASE c.row_id
                             WHEN 0 THEN {_cms_hash_sql(0, 'h.user_id')}
                             WHEN 1 THEN {_cms_hash_sql(1, 'h.user_id')}
                             WHEN 2 THEN {_cms_hash_sql(2, 'h.user_id')}
                             ELSE        {_cms_hash_sql(3, 'h.user_id')}
                        END
        GROUP BY h.user_id, h.true_n)
    SELECT user_id,
           CAST(true_n AS BIGINT)            AS true_n,
           CAST(est_n AS BIGINT)             AS est_n,
           est_n >= true_n                   AS never_underestimates
    FROM est
    ORDER BY true_n DESC, user_id
    LIMIT 50
    """,
    tags=("agg", "sketch", "countmin", "mergeable", "audit", "exact_arithmetic"),
    description=(
        "count-min sketch heavy-hitter audit: a 4x64 counter grid "
        "(multiplicative-shift hashes with fixed odd constants — "
        "bit-identical across engines, unlike xxhash) built as ONE "
        "map-side-combined aggregate whose partial state is 256 int64 "
        "cells regardless of data size — the mergeable frequency "
        "sketch streaming rollups store when exact per-key counts "
        "don't fit.  The query estimates every key's frequency "
        "(min over the 4 rows) NEXT TO its exact count and pins the "
        "CMS guarantee est >= true in a column; top-50 keys under a "
        "total order.  At 100 TB the cells aggregate shuffles 256 "
        "rows and the probe joins against a 256-row broadcast"
    ),
)
def agg_countmin_heavy_audit(spark: SparkSession, sf_dir: str):
    ev = t(spark, sf_dir, "events").select("user_id")
    hits = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_n"))
    cells = (
        ev.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("row_id"),
                            F.expr(_cms_hash_sql(i, "user_id")).alias("bucket"),
                        )
                        for i in range(4)
                    ]
                )
            ).alias("h")
        )
        .groupBy(F.col("h.row_id").alias("row_id"), F.col("h.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probes = hits.select(
        "user_id",
        "true_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_id"),
                        F.expr(_cms_hash_sql(i, "user_id")).alias("bucket"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("h"),
    ).select("user_id", "true_n", F.col("h.row_id").alias("row_id"), F.col("h.bucket").alias("bucket"))
    est = (
        probes.join(F.broadcast(cells), ["row_id", "bucket"])
        .groupBy("user_id", "true_n")
        .agg(F.min("c").alias("est_n"))
    )
    return (
        est.select(
            "user_id",
            F.col("true_n").cast("long").alias("true_n"),
            F.col("est_n").cast("long").alias("est_n"),
            (F.col("est_n") >= F.col("true_n")).alias("never_underestimates"),
        )
        .orderBy(F.desc("true_n"), "user_id")
        .limit(50)
    )


@register(
    "text_zipf_spectrum",
    """
    WITH tk AS (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (
        SELECT term, count(*) AS f FROM tk GROUP BY term)
    SELECT CAST(length(bin(f)) AS BIGINT)  AS log2_bucket,
           CAST(count(*) AS BIGINT)        AS n_terms,
           CAST(sum(f) AS BIGINT)          AS n_tokens
    FROM tf GROUP BY 1
    """,
    tags=("text", "zipf", "corpus_stats", "frequency_spectrum", "exact_arithmetic"),
    description=(
        "corpus frequency spectrum (the Zipf profile): how many "
        "DISTINCT terms occur with frequency in each power-of-two "
        "band, and the token mass each band carries.  Zipfian text "
        "shows the hapax-heavy tail (n_terms halving-ish per band) "
        "every tokenizer-vocabulary and quality-filter decision reads "
        "off; a crawl whose spectrum flattens is template spam.  Two "
        "map-side-combined aggregates (term counts, then <=64 "
        "log2-band rollup via length(bin(f)) — pure integer/string "
        "ops identical in both engines); the spectrum is the SCALABLE "
        "form of a rank-frequency plot (no global rank needed)"
    ),
)
def text_zipf_spectrum(spark: SparkSession, sf_dir: str):
    tf = (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    return tf.groupBy(
        F.expr("CAST(length(bin(f)) AS BIGINT)").alias("log2_bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("f").cast("long").alias("n_tokens"),
    )


@register(
    "mine_mann_kendall_trend",
    """
    WITH d AS (
        SELECT o_orderpriority AS priority, o_orderdate AS day,
               count(*) AS c
        FROM orders
        WHERE year(o_orderdate) = 1995
        GROUP BY 1, 2)
    SELECT a.priority,
           CAST(count(DISTINCT a.day) + 1 AS BIGINT)      AS n_days,
           CAST(sum(sign(b.c - a.c)) AS BIGINT)           AS s_stat,
           CASE WHEN sum(sign(b.c - a.c)) > 0 THEN 'inc'
                WHEN sum(sign(b.c - a.c)) < 0 THEN 'dec'
                ELSE 'flat' END                           AS trend
    FROM d a JOIN d b
      ON a.priority = b.priority AND a.day < b.day
    GROUP BY a.priority
    """,
    tags=("timeseries", "trend", "mann_kendall", "nonparametric", "exact_arithmetic"),
    description=(
        "Mann-Kendall trend test statistic S = sum of sign(c_j - c_i) "
        "over all day pairs i<j, per priority over the 1995 daily "
        "order counts — the nonparametric monotonic-trend detector "
        "(no distribution assumption, robust to outliers) ingest "
        "monitoring runs on volume series.  The pair join is over the "
        "CALENDAR-BOUNDED daily rollup (<=365 rows/priority — the "
        "bounded-rollup precedent of mine_change_point), equi-keyed "
        "on priority so it plans as a broadcast hash join with the "
        "day inequality as a residual filter, never a nested loop "
        "over facts.  n_days = distinct left days + 1 (every day but "
        "the last appears as a left endpoint); integer sign sums are "
        "bit-stable everywhere.  CONTRACT: a priority observed on "
        "only ONE day has no pairs and is absent from the output (a "
        "single point has no trend) — both engines agree by "
        "construction"
    ),
)
def mine_mann_kendall_trend(spark: SparkSession, sf_dir: str):
    d = (
        t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1995)
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    a, b = d.alias("a"), d.alias("b")
    s = F.sum(F.signum(F.col("b.c") - F.col("a.c")).cast("long"))
    return (
        a.join(
            F.broadcast(b),
            (F.col("a.priority") == F.col("b.priority"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.priority").alias("priority"))
        .agg(
            (F.countDistinct(F.col("a.day")) + 1).cast("long").alias("n_days"),
            s.cast("long").alias("s_stat"),
            F.when(s > 0, F.lit("inc"))
            .when(s < 0, F.lit("dec"))
            .otherwise(F.lit("flat"))
            .alias("trend"),
        )
    )


@register(
    "mine_theil_sen_slope",
    """
    WITH d AS (
        SELECT o_orderpriority AS priority, o_orderdate AS day,
               count(*) AS c
        FROM orders
        WHERE year(o_orderdate) = 1995
        GROUP BY 1, 2),
    sl AS (
        SELECT a.priority,
               CAST(floor(1000.0 * (b.c - a.c)
                          / datediff('day', a.day, b.day)) AS BIGINT)
                   AS slope_x1000
        FROM d a JOIN d b
          ON a.priority = b.priority AND a.day < b.day),
    r AS (
        SELECT priority, slope_x1000,
               row_number() OVER (PARTITION BY priority
                                  ORDER BY slope_x1000) AS rn,
               count(*) OVER (PARTITION BY priority) AS n
        FROM sl)
    SELECT priority,
           CAST(n AS BIGINT)           AS n_pairs,
           CAST(slope_x1000 AS BIGINT) AS median_slope_x1000
    FROM r WHERE rn = (n + 1) // 2
    """,
    tags=("timeseries", "trend", "theil_sen", "robust", "nonparametric"),
    description=(
        "Theil-Sen slope estimator: the MEDIAN of all pairwise slopes "
        "(c_j - c_i)/(day_j - day_i) of the 1995 daily order counts, "
        "per priority — the robust trend MAGNITUDE companion to "
        "mine_mann_kendall_trend's direction test (up to ~29% "
        "contamination tolerated, vs OLS's zero).  Pair join over the "
        "calendar-bounded daily rollup (broadcast equi-join on "
        "priority, day inequality residual); slopes scaled x1000 and "
        "floored (IEEE division is correctly rounded, so the double "
        "and its floor agree bit-for-bit across engines); lower "
        "median by nearest rank over the priority-partitioned window "
        "— never a global sort"
    ),
)
def mine_theil_sen_slope(spark: SparkSession, sf_dir: str):
    d = (
        t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1995)
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    a, b = d.alias("a"), d.alias("b")
    sl = a.join(
        F.broadcast(b),
        (F.col("a.priority") == F.col("b.priority")) & (F.col("a.day") < F.col("b.day")),
    ).select(
        F.col("a.priority").alias("priority"),
        F.expr(
            "CAST(floor(1000.0 * (b.c - a.c) / datediff(b.day, a.day)) AS BIGINT)"
        ).alias("slope_x1000"),
    )
    w = W.partitionBy("priority").orderBy("slope_x1000")
    r = sl.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(W.partitionBy("priority"))
    )
    return r.filter(F.col("rn") == F.expr("(n + 1) DIV 2")).select(
        "priority",
        F.col("n").cast("long").alias("n_pairs"),
        F.col("slope_x1000").cast("long").alias("median_slope_x1000"),
    )


@register(
    "events_burstiness_fano",
    """
    WITH h AS (
        SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS c
        FROM events GROUP BY 1, 2),
    s AS (
        SELECT event_type,
               count(*) AS n, sum(c) AS sc, sum(c * c) AS sc2
        FROM h GROUP BY event_type)
    SELECT event_type,
           CAST(n AS BIGINT)  AS n_hours,
           CAST(sc AS BIGINT) AS n_events,
           CAST((1000 * sc2) // sc - (1000 * sc) // n AS BIGINT)
               AS fano_x1000
    FROM s
    """,
    tags=("events", "burstiness", "fano", "timeseries", "exact_arithmetic"),
    description=(
        "Fano factor (variance-to-mean ratio x1000) of hourly event "
        "counts per type: ~1000 for Poisson arrivals, >>1000 for "
        "bursty traffic, <1000 for rate-limited/regular — the "
        "dispersion diagnostic ingest monitoring pairs with the "
        "drift gate.  Exact integers end to end in the subtractive "
        "form E[c^2]/E[c] - E[c] (1000*sc2 DIV sc - 1000*sc DIV n, "
        "non-negative by Cauchy-Schwarz, error <2e-3) — the product "
        "form n*sc2 - sc^2 would square the corpus total and wrap "
        "int64 at planetary scale; beyond ~3e15 hourly-count mass "
        "use DECIMAL(38) partials (the agg_decimal_exact_products "
        "pattern); two "
        "map-side-combined aggregates (hourly rollup, then per-type "
        "moments), no window, no join"
    ),
)
def events_burstiness_fano(spark: SparkSession, sf_dir: str):
    h = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s = h.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("sc2"),
    )
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n_hours"),
        F.col("sc").cast("long").alias("n_events"),
        F.expr(
            "CAST((1000 * sc2) DIV sc - (1000 * sc) DIV n AS BIGINT)"
        ).alias("fano_x1000"),
    )


@register(
    "sample_allocation_neyman",
    """
    WITH s AS (
        SELECT lang, count(*) AS n,
               sum(n_chars) AS sx, sum(n_chars * n_chars) AS sx2
        FROM documents GROUP BY lang),
    w AS (
        SELECT lang, n,
               CAST(floor(sqrt(CAST(CAST(n AS DECIMAL(38, 0)) * sx2
                                     - CAST(sx AS DECIMAL(38, 0)) * sx
                                     AS DOUBLE))) AS BIGINT)
                   AS weight
        FROM s),
    tot AS (SELECT sum(weight) AS total, sum(n) AS total_n FROM w),
    q AS (
        SELECT lang, n, weight,
               (100000 * ew) // et AS fl,
               (100000 * ew) % et AS rem
        FROM (SELECT lang, n, weight,
                     CASE WHEN total = 0 THEN n ELSE weight END AS ew,
                     CASE WHEN total = 0 THEN total_n ELSE total END AS et
              FROM w, tot)),
    r AS (
        SELECT lang, n, weight, fl, rem,
               row_number() OVER (ORDER BY rem DESC, lang) AS rk,
               sum(fl) OVER () AS allocated
        FROM q)
    SELECT lang,
           CAST(n AS BIGINT)      AS n_docs,
           CAST(weight AS BIGINT) AS neyman_weight,
           CAST(fl + CASE WHEN rk <= 100000 - allocated THEN 1 ELSE 0 END
                AS BIGINT)        AS alloc
    FROM r
    """,
    tags=("sampling", "stratified", "neyman", "allocation", "exact_arithmetic"),
    description=(
        "Neyman-optimal stratified sample allocation: a 100k-unit "
        "labeling/eval budget split across language strata "
        "proportional to N_h * S_h (stratum size x std dev — the "
        "allocation that minimizes the estimator's variance; "
        "proportional allocation over-samples homogeneous strata).  "
        "N_h*S_h = sqrt(n*sum(x^2) - (sum x)^2) in ONE exact moment "
        "pass per stratum — the variance numerator runs in "
        "DECIMAL(38,0) (bigint n*sx2 wraps at ~1e19; decimal partials "
        "carry corpus scale) and the decimal->double->sqrt->floor "
        "chain is IEEE-deterministic in both engines; integer "
        "largest-remainder rounding makes the allocations sum to the "
        "budget EXACTLY (the alloc_largest_remainder idiom).  If "
        "every stratum is constant (all weights 0) the allocation "
        "falls back to proportional-to-n — the Neyman limit under "
        "equal variances — instead of an engine-divergent zero "
        "division.  The only windows run over the |languages| rollup"
    ),
)
def sample_allocation_neyman(spark: SparkSession, sf_dir: str):
    s = t(spark, sf_dir, "documents").groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("sx2"),
    )
    w = s.select(
        "lang",
        "n",
        F.expr(
            "CAST(floor(sqrt(CAST(CAST(n AS DECIMAL(38, 0)) * sx2"
            " - CAST(sx AS DECIMAL(38, 0)) * sx AS DOUBLE))) AS BIGINT)"
        ).alias("weight"),
    )
    tot = w.agg(F.sum("weight").alias("total"), F.sum("n").alias("total_n"))
    # degenerate-input guard (ADVICE r06): if EVERY stratum has
    # constant n_chars, all Neyman weights are 0 and the division by
    # the summed weight would be engine-divergent (Spark DIV -> NULL,
    # DuckDB // -> error).  Fall back to proportional-to-n allocation
    # — the textbook degenerate case of Neyman allocation (equal
    # variances => proportional) — identically in both engines.
    q = w.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n",
        "weight",
        F.expr("CASE WHEN total = 0 THEN n ELSE weight END").alias("ew"),
        F.expr("CASE WHEN total = 0 THEN total_n ELSE total END").alias("et"),
    ).select(
        "lang",
        "n",
        "weight",
        F.expr("(100000 * ew) DIV et").alias("fl"),
        F.expr("(100000 * ew) % et").alias("rem"),
    )
    r = q.withColumn(
        "rk", F.row_number().over(W.orderBy(F.desc("rem"), "lang"))
    ).withColumn("allocated", F.sum("fl").over(W.partitionBy()))
    return r.select(
        "lang",
        F.col("n").cast("long").alias("n_docs"),
        F.col("weight").cast("long").alias("neyman_weight"),
        F.expr(
            "CAST(fl + CASE WHEN rk <= 100000 - allocated THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("alloc"),
    )


#: fixed $500 bin width for the decision-stump split search — the
#: candidate-threshold domain is bounded by the PRICE RANGE (~1200
#: bins), never by row count.
_GINI_BIN_CENTS = 50000


@register(
    "mine_gini_best_split",
    f"""
    WITH o AS (
        SELECT o_orderpriority AS priority,
               CAST(floor(o_totalprice * 100) AS BIGINT) // {_GINI_BIN_CENTS}
                   AS bin,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
        WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
          AND o_orderstatus IS NOT NULL),
    b AS (
        SELECT priority, bin, count(*) AS n, sum(y) AS pos
        FROM o GROUP BY priority, bin),
    c AS (
        SELECT priority, bin,
               sum(n)   OVER (PARTITION BY priority ORDER BY bin) AS nl,
               sum(pos) OVER (PARTITION BY priority ORDER BY bin) AS pl,
               sum(n)   OVER (PARTITION BY priority) AS nt,
               sum(pos) OVER (PARTITION BY priority) AS pt
        FROM b),
    g AS (
        SELECT priority, bin, nl, nt,
               (nl * (1000000
                      - ((1000000 * pl // nl) * pl
                         + (1000000 * (nl - pl) // nl) * (nl - pl)) // nl)
                + (nt - nl) * (1000000
                      - ((1000000 * (pt - pl) // (nt - nl)) * (pt - pl)
                         + (1000000 * ((nt - nl) - (pt - pl)) // (nt - nl))
                           * ((nt - nl) - (pt - pl))) // (nt - nl)))
               // nt AS impurity_x1e6
        FROM c WHERE nl < nt),
    best AS (
        SELECT priority, bin, nl, nt, impurity_x1e6,
               row_number() OVER (PARTITION BY priority
                                  ORDER BY impurity_x1e6, bin) AS rk
        FROM g)
    SELECT priority,
           CAST(bin * {_GINI_BIN_CENTS} AS BIGINT) AS split_cents,
           CAST(nl AS BIGINT)                      AS n_left,
           CAST(nt - nl AS BIGINT)                 AS n_right,
           CAST(impurity_x1e6 AS BIGINT)           AS impurity_x1e6
    FROM best WHERE rk = 1
    """,
    tags=("mining", "gini", "decision_stump", "ml_primitive", "exact_arithmetic"),
    description=(
        "decision-stump induction by exact Gini impurity: per "
        "priority, the order-value threshold that best separates "
        "finished ('F') from open orders — weighted Gini of the "
        "left/right partitions (x1e6) minimized over every $500 bin "
        "boundary; the class shares are scaled BEFORE squaring "
        "((1e6*p DIV n)*p DIV n, error <2e-6, never p^2*1e6), so the "
        "bigint headroom holds to ~9e12 rows per stratum instead of "
        "~3e6 — all terms non-negative, both engines' floor division "
        "agrees.  "
        "One fact rollup to (priority, bin); cumulative counts, "
        "totals, impurity, and the argmin all run over the "
        "PRICE-RANGE-bounded bin table (~1.2k rows), windows "
        "partitioned on the 5-value priority — the split-search "
        "shape a distributed decision-tree layer runs per feature "
        "per node"
    ),
)
def mine_gini_best_split(spark: SparkSession, sf_dir: str):
    o = t_nonnull(
        spark, sf_dir, "orders", "o_orderpriority", "o_totalprice", "o_orderstatus"
    ).select(
        F.col("o_orderpriority").alias("priority"),
        F.expr(
            f"CAST(floor(o_totalprice * 100) AS BIGINT) DIV {_GINI_BIN_CENTS}"
        ).alias("bin"),
        F.when(F.col("o_orderstatus") == "F", F.lit(1)).otherwise(F.lit(0)).alias("y"),
    )
    b = o.groupBy("priority", "bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    wp = W.partitionBy("priority")
    wc = wp.orderBy("bin")
    c = b.select(
        "priority",
        "bin",
        F.sum("n").over(wc).alias("nl"),
        F.sum("pos").over(wc).alias("pl"),
        F.sum("n").over(wp).alias("nt"),
        F.sum("pos").over(wp).alias("pt"),
    )
    g = (
        c.filter(F.col("nl") < F.col("nt"))
        .withColumn("nr", F.col("nt") - F.col("nl"))
        .withColumn("pr", F.col("pt") - F.col("pl"))
        .withColumn(
            "gl",
            F.expr(
                "1000000 - ((1000000 * pl DIV nl) * pl"
                " + (1000000 * (nl - pl) DIV nl) * (nl - pl)) DIV nl"
            ),
        )
        .withColumn(
            "gr",
            F.expr(
                "1000000 - ((1000000 * pr DIV nr) * pr"
                " + (1000000 * (nr - pr) DIV nr) * (nr - pr)) DIV nr"
            ),
        )
        .select(
            "priority",
            "bin",
            "nl",
            "nt",
            F.expr("CAST((nl * gl + nr * gr) DIV nt AS BIGINT)").alias(
                "impurity_x1e6"
            ),
        )
    )
    best = g.withColumn(
        "rk",
        F.row_number().over(W.partitionBy("priority").orderBy("impurity_x1e6", "bin")),
    )
    return best.filter(F.col("rk") == 1).select(
        "priority",
        F.expr(f"CAST(bin * {_GINI_BIN_CENTS} AS BIGINT)").alias("split_cents"),
        F.col("nl").cast("long").alias("n_left"),
        (F.col("nt") - F.col("nl")).cast("long").alias("n_right"),
        F.col("impurity_x1e6").cast("long").alias("impurity_x1e6"),
    )


@register(
    "sample_dedup_weighted",
    """
    WITH g AS (
        SELECT md5(text) AS fp, count(*) AS n_copies
        FROM documents GROUP BY md5(text))
    SELECT d.doc_id,
           CAST(g.n_copies AS BIGINT)        AS n_copies,
           CAST(1000 // g.n_copies AS BIGINT) AS weight_x1000
    FROM documents d JOIN g ON md5(d.text) = g.fp
    """,
    tags=("sampling", "dedup", "reweighting", "exact_arithmetic"),
    description=(
        "duplicate-aware sampling weights: every document keeps "
        "weight 1/n_copies of its exact-duplicate group (md5 text "
        "fingerprint), so a corpus sampled by these weights counts "
        "each distinct text ONCE in expectation — the soft "
        "alternative to dropping duplicates outright (dedup_exact_*'s "
        "hard keep-one), which preserves provenance diversity while "
        "removing frequency bias.  One fingerprint rollup shuffled on "
        "the hash + one equi-join back on the same key (co-partitioned "
        "— the join reuses the rollup's partitioning); integer "
        "weights x1000"
    ),
)
def sample_dedup_weighted(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents").select("doc_id", F.md5("text").alias("fp"))
    g = d.groupBy("fp").agg(F.count(F.lit(1)).alias("n_copies"))
    return d.join(g, "fp").select(
        "doc_id",
        F.col("n_copies").cast("long").alias("n_copies"),
        F.expr("CAST(1000 DIV n_copies AS BIGINT)").alias("weight_x1000"),
    )
