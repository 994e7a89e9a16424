"""Product-analytics and data-quality operators.

The operator families a pipeline team runs daily on the event stream
and the curated corpus, beyond the relational/TPC-H shapes: funnel
conversion, cohort retention, exact heavy hitters, blocked fuzzy
(edit-distance) joins, and referential-integrity audits.  All are
SQL-exact against the DuckDB oracle; outputs are integer counts or
date-truncated keys, so no float-accumulation hazards exist.

Scale notes (100 TB posture):

* funnel/cohort shuffle once on ``user_id`` and once on the
  (small) aggregate key — no per-user driver loops, no collect;
* the fuzzy join never goes quadratic: candidate pairs come from an
  equi-join on a blocking key (prefix), the expensive
  ``levenshtein`` runs only inside blocks;
* the audit counts use left-anti joins, which Catalyst plans as
  broadcast-anti where the clean side is small, and stay
  shuffle-hash otherwise — never a nested loop.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from sfs3_kinesis_spark.plans.core import register, t


@register(
    "funnel_conversion_stages",
    """
    WITH s AS (
        SELECT user_id, min(ts) AS t_signup
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    v AS (
        SELECT e.user_id, min(ts) AS t_view
        FROM events e JOIN s USING (user_id)
        WHERE event_type = 'view' AND ts > t_signup GROUP BY e.user_id
    ),
    c AS (
        SELECT e.user_id, min(ts) AS t_click
        FROM events e JOIN v USING (user_id)
        WHERE event_type = 'click' AND ts > t_view GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(ts) AS t_purchase
        FROM events e JOIN c USING (user_id)
        WHERE event_type = 'purchase' AND ts > t_click GROUP BY e.user_id
    )
    SELECT stage, count(*) AS n_users FROM (
        SELECT '1_signup' AS stage, user_id FROM s
        UNION ALL SELECT '2_view', user_id FROM v
        UNION ALL SELECT '3_click', user_id FROM c
        UNION ALL SELECT '4_purchase', user_id FROM p
    ) GROUP BY stage
    """,
    tags=("funnel", "join", "agg", "events"),
    description=(
        "ordered conversion funnel (signup -> view -> click -> purchase): "
        "each stage is the earliest qualifying event strictly after the "
        "previous stage's time — four min-aggregates chained by equi-join "
        "on user_id, one count per stage; no sequence scan, no state"
    ),
)
def funnel_conversion_stages(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")

    def first_after(event_type: str, prev, prev_col: str, out_col: str):
        stage = e.filter(F.col("event_type") == event_type)
        if prev is not None:
            stage = stage.join(prev, "user_id").filter(F.col("ts") > F.col(prev_col))
        return stage.groupBy("user_id").agg(F.min("ts").alias(out_col))

    s = first_after("signup", None, "", "t_signup")
    v = first_after("view", s, "t_signup", "t_view")
    c = first_after("click", v, "t_view", "t_click")
    p = first_after("purchase", c, "t_click", "t_purchase")
    stages = (
        s.select(F.lit("1_signup").alias("stage"), "user_id")
        .unionByName(v.select(F.lit("2_view").alias("stage"), "user_id"))
        .unionByName(c.select(F.lit("3_click").alias("stage"), "user_id"))
        .unionByName(p.select(F.lit("4_purchase").alias("stage"), "user_id"))
    )
    return stages.groupBy("stage").agg(F.count(F.lit(1)).alias("n_users"))


@register(
    "cohort_weekly_retention",
    """
    WITH first_seen AS (
        SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        FROM events GROUP BY user_id
    ),
    active AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
        FROM events
    )
    SELECT cohort_week,
           CAST(datediff('day', cohort_week, wk) // 7 AS BIGINT) AS week_offset,
           count(*) AS n_active
    FROM first_seen JOIN active USING (user_id)
    GROUP BY cohort_week, week_offset
    """,
    tags=("cohort", "retention", "agg", "events"),
    description=(
        "weekly cohort retention matrix: cohort = ISO week of each "
        "user's first event, cell = users of that cohort active in week "
        "offset N — two aggregations plus one equi-join on user_id, the "
        "standard retention query at any scale"
    ),
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    ).distinct()
    return (
        first_seen.join(active, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("wk", "cohort_week") / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "heavy_hitters_tokens",
    """
    SELECT token, count(*) AS cnt
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS token
          FROM documents)
    WHERE token <> ''
    GROUP BY token
    ORDER BY cnt DESC, token
    LIMIT 20
    """,
    tags=("text", "heavy_hitters", "topk"),
    description=(
        "exact corpus heavy hitters: top-20 most frequent tokens — "
        "explode + partial/final count + TakeOrderedAndProject; the "
        "exact tier that an approximate (count-min / freqItems) pass "
        "would be validated against"
    ),
)
def heavy_hitters_tokens(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(20)
    )


@register(
    "fuzzy_join_blocked_names",
    """
    WITH blocked AS (
        SELECT c_custkey, c_name, substring(c_name, 1, 16) AS blk
        FROM customer
    )
    SELECT a.blk AS blk, count(*) AS n_pairs
    FROM blocked a JOIN blocked b
      ON a.blk = b.blk AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    GROUP BY a.blk
    """,
    tags=("join", "fuzzy", "blocking", "dedup_adjacent"),
    description=(
        "blocked fuzzy join (entity resolution): candidate pairs from an "
        "equi-join on a prefix blocking key, edit-distance verified "
        "inside blocks only — the O(n^2) all-pairs comparison never "
        "exists; at 100 TB the block key is what keeps this tractable"
    ),
)
def fuzzy_join_blocked_names(spark: SparkSession, sf_dir: str):
    # Explicit hash repartition on the block key: the key table is a
    # few hundred (highly compressible) KB, so AQE's coalescing would
    # fold the block join into ONE task that evaluates every in-block
    # levenshtein serially (~5 s at sf0.1); a user-specified partition
    # count is exempt from coalescing and both join sides reuse it.
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    c = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.substring("c_name", 1, 16).alias("blk")
    ).repartition(shuffle_n, "blk")
    a, b = c.alias("a"), c.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .filter(F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= 1)
        .groupBy(F.col("a.blk").alias("blk"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "quality_referential_audit",
    """
    SELECT 'lineitem_orphan_order' AS check_name, count(*) AS violations
    FROM lineitem WHERE NOT EXISTS
        (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
    UNION ALL
    SELECT 'orders_orphan_customer', count(*)
    FROM orders WHERE NOT EXISTS
        (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
    UNION ALL
    SELECT 'orders_duplicate_key', count(*)
    FROM (SELECT o_orderkey FROM orders
          GROUP BY o_orderkey HAVING count(*) > 1)
    UNION ALL
    SELECT 'lineitem_null_shipdate', count(*)
    FROM lineitem WHERE l_shipdate IS NULL
    UNION ALL
    SELECT 'lineitem_nonpositive_qty', count(*)
    FROM lineitem WHERE l_quantity <= 0
    """,
    tags=("quality", "audit", "anti", "agg"),
    description=(
        "referential-integrity and constraint audit over the star "
        "schema: orphan foreign keys via anti join, duplicate primary "
        "keys, null and range violations — one (check, count) row each; "
        "the pre-training sanity gate every ingest should run"
    ),
)
def quality_referential_audit(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")

    def count_row(name: str, df):
        return df.agg(F.count(F.lit(1)).cast("bigint").alias("violations")).select(
            F.lit(name).alias("check_name"), "violations"
        )

    orphan_li = li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
    orphan_o = o.join(c, o.o_custkey == c.c_custkey, "left_anti")
    dup_o = o.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1)
    null_ship = li.filter(F.col("l_shipdate").isNull())
    bad_qty = li.filter(F.col("l_quantity") <= 0)
    return (
        count_row("lineitem_orphan_order", orphan_li)
        .unionByName(count_row("orders_orphan_customer", orphan_o))
        .unionByName(count_row("orders_duplicate_key", dup_o))
        .unionByName(count_row("lineitem_null_shipdate", null_ship))
        .unionByName(count_row("lineitem_nonpositive_qty", bad_qty))
    )


@register(
    "heavy_hitters_sketch",
    """
    SELECT token, count(*) AS cnt
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS token
          FROM documents)
    WHERE token <> ''
    GROUP BY token
    """,
    tags=("text", "heavy_hitters", "sketch", "approx"),
    description=(
        "sketch-tier heavy hitters via approx_top_k: one bounded-memory "
        "aggregate instead of a full groupBy — with k >= vocabulary the "
        "sketch degenerates to exact counts, which is what lets the "
        "DuckDB oracle value-verify it; at corpus scale k << vocab "
        "trades exactness for O(k) state per partition"
    ),
)
def heavy_hitters_sketch(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split(F.lower("text"), " ")).alias("token")).filter(
        F.col("token") != ""
    )
    sketch = toks.agg(F.expr("approx_top_k(token, 256)").alias("tk"))
    return sketch.select(F.inline("tk")).select(
        F.col("item").alias("token"), F.col("count").cast("long").alias("cnt")
    )


@register(
    "events_latency_log2_histogram",
    """
    WITH g AS (
      SELECT user_id,
             date_diff('second',
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       ts) AS gap_s
      FROM events),
    b AS (
      SELECT CASE WHEN gap_s <= 0 THEN 0
                  ELSE length(bin(CAST(gap_s AS BIGINT))) END AS bucket
      FROM g WHERE gap_s IS NOT NULL)
    SELECT bucket                    AS log2_bucket,
           CAST(CASE WHEN bucket = 0 THEN 0
                     ELSE (1::BIGINT << (bucket - 1)) END AS BIGINT)
                                     AS bucket_floor_s,
           count(*)                  AS n
    FROM b GROUP BY bucket
    """,
    tags=("agg", "histogram", "observability", "exact_arithmetic", "events"),
    description=(
        "power-of-two latency histogram of inter-event gaps (the "
        "HDR-style bucket layout observability systems store): bucket "
        "= bit length of the gap in seconds — computed as "
        "length(bin(x)), pure integer/string ops identical in both "
        "engines, where floor(log2(x)) in floats mis-buckets exact "
        "powers of two at the ulp boundary; one keyed window for the "
        "gap, one tiny aggregate, bucket count is O(log range) "
        "regardless of data size"
    ),
)
def events_latency_log2_histogram(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    b = g.select(
        F.when(F.col("gap_s") <= 0, 0)
        .otherwise(F.length(F.bin(F.col("gap_s").cast("long"))))
        .alias("bucket")
    )
    return b.groupBy(F.col("bucket").alias("log2_bucket")).agg(
        F.count(F.lit(1)).alias("n")
    ).select(
        "log2_bucket",
        F.expr(
            "CAST(CASE WHEN log2_bucket = 0 THEN 0 "
            "ELSE shiftleft(1L, CAST(log2_bucket AS INT) - 1) END AS BIGINT)"
        ).alias("bucket_floor_s"),
        "n",
    )


@register(
    "quality_benford_first_digit",
    """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS first_digit
      FROM orders WHERE o_totalprice >= 1),
    n AS (SELECT count(*) AS total FROM d)
    SELECT first_digit,
           count(*)                       AS n,
           count(*) * 10000 // max(n.total) AS observed_bp,
           CAST(floor(10000 * ln(1.0 + 1.0 / first_digit) / ln(10.0)) AS BIGINT)
                                          AS benford_bp
    FROM d CROSS JOIN n
    GROUP BY first_digit
    """,
    tags=("quality", "audit", "benford", "agg"),
    description=(
        "Benford first-digit audit (fraud / synthetic-data detector): "
        "observed first-digit distribution of order totals vs the "
        "Benford expectation, both in floor basis points — the digit "
        "comes from integer/string ops (no float log on data), and "
        "the expected share is a per-digit constant (floor(10000*"
        "log10(1+1/d)) agrees across engines for d=1..9 — verified "
        "safely away from floor ulp boundaries); one scan, nine "
        "output rows, the 1-row total broadcast back"
    ),
)
def quality_benford_first_digit(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    d = o.filter(F.col("o_totalprice") >= 1).select(
        F.expr(
            "CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING), 1, 1) AS BIGINT)"
        ).alias("first_digit")
    )
    n = d.agg(F.count(F.lit(1)).alias("total"))
    return (
        d.crossJoin(F.broadcast(n))
        .groupBy("first_digit")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("count(*) * 10000 div max(total)").alias("observed_bp"),
            F.expr(
                "CAST(floor(10000 * ln(1.0D + 1.0D / first_digit) / ln(10.0D)) AS BIGINT)"
            ).alias("benford_bp"),
        )
    )


@register(
    "report_dense_grid_zero_fill",
    """
    WITH grid AS (
      SELECT r.r_name, p.o_orderpriority
      FROM region r CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p),
    actual AS (
      SELECT r.r_name, o.o_orderpriority, count(*) AS n
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      JOIN region r ON n2.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, o.o_orderpriority)
    SELECT g.r_name, g.o_orderpriority, COALESCE(a.n, 0) AS n_orders
    FROM grid g LEFT JOIN actual a
      ON g.r_name = a.r_name AND g.o_orderpriority = a.o_orderpriority
    """,
    tags=("join", "cross", "reporting", "grid"),
    description=(
        "dense reporting grid with zero-fill: CROSS JOIN of the two "
        "(tiny) dimension domains left-joined to the fact rollup, so "
        "combinations with no orders surface as explicit zeros — the "
        "shape every BI export needs (a sparse groupBy silently drops "
        "empty cells); the cartesian is |regions|x|priorities| = tens "
        "of rows, broadcast everywhere, while the fact table shuffles "
        "once for the rollup"
    ),
)
def report_dense_grid_zero_fill(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n2 = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    prios = o.select("o_orderpriority").distinct()
    grid = r.select("r_name").crossJoin(prios)
    actual = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), c.c_nationkey == n2.n_nationkey)
        .join(F.broadcast(r), n2.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        grid.join(actual, ["r_name", "o_orderpriority"], "left")
        .select("r_name", "o_orderpriority", F.coalesce("n", F.lit(0)).alias("n_orders"))
    )


@register(
    "funnel_time_to_convert",
    """
    WITH s AS (
      SELECT user_id, min(epoch_us(ts) // 1000000) AS signup_s
      FROM events WHERE event_type = 'signup' GROUP BY user_id),
    p AS (
      SELECT e.user_id, min(epoch_us(e.ts) // 1000000) AS purchase_s
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase'
        AND epoch_us(e.ts) // 1000000 > s.signup_s
      GROUP BY e.user_id),
    waits AS (
      SELECT p.purchase_s - s.signup_s AS wait_s
      FROM s JOIN p ON s.user_id = p.user_id),
    r AS (
      SELECT wait_s,
             row_number() OVER (ORDER BY wait_s) AS rn,
             count(*)     OVER ()                AS n
      FROM waits)
    SELECT max(n)                                                  AS n_converted,
           min(wait_s)                                             AS min_wait_s,
           max(CASE WHEN rn = (n * 50 + 99) // 100 THEN wait_s END) AS p50_wait_s,
           max(CASE WHEN rn = (n * 90 + 99) // 100 THEN wait_s END) AS p90_wait_s,
           max(wait_s)                                             AS max_wait_s
    FROM r
    """,
    tags=("funnel", "percentile", "events", "exact_arithmetic"),
    description=(
        "time-to-convert distribution: each user's first signup to "
        "first STRICTLY-LATER purchase, summarized as exact "
        "nearest-rank p50/p90 wait — two min-aggregates chained by an "
        "equi-join on user_id (the funnel shape), then the percentile "
        "window over |converted users| pre-aggregated rows, never "
        "facts; integer epoch seconds end to end.  The latency-SLA "
        "readout of the conversion funnel"
    ),
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    sec = F.expr("unix_micros(ts) div 1000000")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(sec).alias("signup_s"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", sec.alias("es"))
        .join(s, "user_id")
        .filter(F.col("es") > F.col("signup_s"))
        .groupBy("user_id")
        .agg(F.min("es").alias("purchase_s"))
    )
    waits = s.join(p, "user_id").select(
        "user_id", (F.col("purchase_s") - F.col("signup_s")).alias("wait_s")
    )
    # |converted users| is unbounded — rank via the two-phase bucketed
    # global_rank (user_id tiebreak for a total order; equal waits are
    # interchangeable so the value at any rank is unchanged), total
    # count via 1-row broadcast
    from sfs3_kinesis_spark.operators.scale import global_rank

    tot = waits.agg(F.count(F.lit(1)).alias("n"))
    r = global_rank(waits, ["wait_s", "user_id"], out_col="rn").join(
        F.broadcast(tot)
    )
    return r.agg(
        F.max("n").alias("n_converted"),
        F.min("wait_s").alias("min_wait_s"),
        F.max(F.when(F.col("rn") == F.expr("(n * 50 + 99) div 100"), F.col("wait_s"))).alias("p50_wait_s"),
        F.max(F.when(F.col("rn") == F.expr("(n * 90 + 99) div 100"), F.col("wait_s"))).alias("p90_wait_s"),
        F.max("wait_s").alias("max_wait_s"),
    )


@register(
    "mine_rfm_segmentation",
    """
    WITH base AS (
        SELECT o_custkey,
               max(date_diff('day', DATE '1970-01-01', o_orderdate)) AS last_day,
               count(*) AS freq,
               sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS monetary
        FROM orders GROUP BY o_custkey),
    r AS (
        SELECT o_custkey, last_day, freq, monetary,
               row_number() OVER (ORDER BY last_day DESC, o_custkey) AS rr,
               row_number() OVER (ORDER BY freq DESC, o_custkey) AS rf,
               row_number() OVER (ORDER BY monetary DESC, o_custkey) AS rm,
               count(*) OVER () AS n
        FROM base)
    SELECT o_custkey,
           CAST(last_day AS BIGINT) AS last_day,
           CAST(freq AS BIGINT) AS frequency,
           CAST(monetary AS BIGINT) AS monetary_cents,
           CAST(5 - (5 * (rr - 1)) // n AS BIGINT) AS r_score,
           CAST(5 - (5 * (rf - 1)) // n AS BIGINT) AS f_score,
           CAST(5 - (5 * (rm - 1)) // n AS BIGINT) AS m_score,
           CAST((5 - (5 * (rr - 1)) // n) * 100
                + (5 - (5 * (rf - 1)) // n) * 10
                + (5 - (5 * (rm - 1)) // n) AS BIGINT) AS rfm_cell
    FROM r
    """,
    tags=("mining", "rfm", "segmentation", "window", "exact_arithmetic"),
    description=(
        "RFM customer segmentation: per customer the recency/"
        "frequency/monetary raw stats and their quintile scores "
        "(5 = best), combined into the classic 3-digit RFM cell.  "
        "Quintiles are exact integer rank arithmetic "
        "(5 - 5*(rank-1)//n) with full (metric, custkey) tie-break, "
        "so every engine lands each customer in the identical cell.  "
        "The base aggregate is map-side combined; the three rankings "
        "run over the CUSTOMER rollup (one row per customer, not per "
        "order) — at 100 TB the global sorts rank the dimension-"
        "sized table, and would shard via the salted two-phase "
        "row-number (operators/sampling.py) past single-stage size"
    ),
)
def mine_rfm_segmentation(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.scale import global_rank

    o = t(spark, sf_dir, "orders")
    base = o.groupBy("o_custkey").agg(
        F.max(F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))).alias("last_day"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.expr("CAST(floor(o_totalprice * 100 + 0.5D) AS BIGINT)")).alias(
            "monetary"
        ),
    )
    # the customer rollup is dimension-sized but NOT bounded (billions
    # of customers at 100 TB) — each ranking runs the two-phase
    # bucketed global_rank, and the total count joins in as a 1-row
    # broadcast instead of an unpartitioned COUNT window (r02 verdict
    # item #5)
    tot = base.agg(F.count(F.lit(1)).alias("n"))
    r = global_rank(base, ["-last_day", "o_custkey"], out_col="rr")
    r = global_rank(r, ["-freq", "o_custkey"], out_col="rf")
    r = global_rank(r, ["-monetary", "o_custkey"], out_col="rm")
    r = r.join(F.broadcast(tot))
    score = "5 - (5 * ({r} - 1)) DIV n"
    return r.select(
        "o_custkey",
        F.col("last_day").cast("long").alias("last_day"),
        F.col("freq").cast("long").alias("frequency"),
        F.col("monetary").cast("long").alias("monetary_cents"),
        F.expr(f"CAST({score.format(r='rr')} AS BIGINT)").alias("r_score"),
        F.expr(f"CAST({score.format(r='rf')} AS BIGINT)").alias("f_score"),
        F.expr(f"CAST({score.format(r='rm')} AS BIGINT)").alias("m_score"),
        F.expr(
            f"CAST(({score.format(r='rr')}) * 100 + ({score.format(r='rf')}) * 10"
            f" + ({score.format(r='rm')}) AS BIGINT)"
        ).alias("rfm_cell"),
    )


@register(
    "events_new_vs_returning",
    """
    WITH ud AS (
        SELECT user_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        FROM events GROUP BY user_id, d),
    fs AS (SELECT user_id, min(d) AS first_d FROM ud GROUP BY user_id)
    SELECT CAST(ud.d AS BIGINT) AS day,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(count(*) FILTER (WHERE ud.d = fs.first_d) AS BIGINT) AS n_new,
           CAST(count(*) FILTER (WHERE ud.d > fs.first_d) AS BIGINT) AS n_returning
    FROM ud JOIN fs USING (user_id)
    GROUP BY ud.d
    """,
    tags=("analytics", "growth", "retention", "agg"),
    description=(
        "daily new-vs-returning split (growth accounting): each "
        "active (user, day) is classified by whether it is the "
        "user's first-seen day — the DAU decomposition every growth "
        "dashboard leads with.  The first-seen map is a per-user min "
        "(map-side combined) joined back on the user key; the "
        "user-day table, not the event table, flows through the join"
    ),
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("d")
    ).distinct()
    fs = ud.groupBy("user_id").agg(F.min("d").alias("first_d"))
    return (
        ud.join(fs, "user_id")
        .groupBy(F.col("d").cast("long").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active"),
            F.count(F.when(F.col("d") == F.col("first_d"), 1)).cast("long").alias("n_new"),
            F.count(F.when(F.col("d") > F.col("first_d"), 1))
            .cast("long")
            .alias("n_returning"),
        )
    )


@register(
    "mine_lorenz_concentration",
    """
    WITH u AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
    r AS (
        SELECT user_id, n,
               row_number() OVER (ORDER BY n DESC, user_id) AS rk,
               sum(n) OVER (ORDER BY n DESC, user_id
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(n) OVER () AS tot,
               count(*) OVER () AS n_users
        FROM u)
    SELECT CAST(max(n_users) AS BIGINT) AS n_users,
           CAST(max(tot) AS BIGINT) AS n_events,
           CAST(min(CASE WHEN 5 * cum >= 4 * tot THEN rk END) AS BIGINT)
               AS users_to_p80,
           CAST((10000 * min(CASE WHEN 5 * cum >= 4 * tot THEN rk END))
                // max(n_users) AS BIGINT) AS users_to_p80_bp
    FROM r
    """,
    tags=("mining", "concentration", "lorenz", "exact_arithmetic"),
    description=(
        "activity concentration (Lorenz/Pareto point): the number of "
        "heaviest users that account for 80%% of all events, and that "
        "count as a share of the user base in basis points — the "
        "inequality readout behind 'power-user' analyses.  The "
        "80%% boundary is the integer comparison 5*cum >= 4*total "
        "(no percentages materialize), computed by prefix sums over "
        "the USER rollup via the two-phase bucketed global_cumsum "
        "(rank = prefix count of a constant 1, same single pass) — "
        "the user dimension never funnels through one partition"
    ),
)
def mine_lorenz_concentration(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.scale import global_cumsum

    e = t(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.lit(1).alias("one")
    )
    # the user rollup is unbounded — ONE two-phase bucketed pass
    # yields both the prefix sum (cum) and the rank (prefix count of
    # the constant 1); totals join in as a 1-row broadcast
    tots = u.agg(
        F.sum("n").alias("tot"), F.count(F.lit(1)).alias("n_users")
    )
    r = global_cumsum(
        u, ["-n", "user_id"], {"n": "cum", "one": "rk"}
    ).join(F.broadcast(tots))
    at80 = F.min(F.when(5 * F.col("cum") >= 4 * F.col("tot"), F.col("rk")))
    return r.agg(
        F.max("n_users").cast("long").alias("n_users"),
        F.max("tot").cast("long").alias("n_events"),
        at80.cast("long").alias("users_to_p80"),
        F.expr(
            "CAST((10000 * min(CASE WHEN 5 * cum >= 4 * tot THEN rk END))"
            " DIV max(n_users) AS BIGINT)"
        ).alias("users_to_p80_bp"),
    )


@register(
    "events_dau_wau_stickiness",
    """
    WITH ud AS (
        SELECT user_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        FROM events GROUP BY user_id, d),
    dau AS (SELECT d, count(*) AS dau FROM ud GROUP BY d),
    cov AS (
        SELECT user_id, d + i.i AS d
        FROM ud, range(0, 7) i(i)
        GROUP BY user_id, d + i.i),
    wau AS (SELECT d, count(*) AS wau FROM cov GROUP BY d)
    SELECT CAST(dau.d AS BIGINT) AS day,
           CAST(dau.dau AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau,
           CAST((10000 * dau.dau) // wau.wau AS BIGINT) AS stickiness_bp
    FROM dau JOIN wau ON dau.d = wau.d
    """,
    tags=("analytics", "growth", "stickiness", "window", "agg"),
    description=(
        "DAU/WAU stickiness per day: the trailing-7-day active-user "
        "count is computed by exploding each active (user, day) into "
        "the 7 future days it covers and DISTINCT-counting per day — "
        "running DISTINCT over a sliding window is not expressible "
        "as a mergeable aggregate, but the bounded 7x cover-set "
        "explode turns it into a plain grouped count that scales "
        "linearly.  Ratio in truncating basis points; days are "
        "engine-neutral epoch integers"
    ),
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("d")
    ).distinct()
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    cov = (
        ud.select("user_id", F.explode(F.expr("sequence(d, d + 6)")).alias("d"))
        .distinct()
    )
    wau = cov.groupBy("d").agg(F.count(F.lit(1)).alias("wau"))
    return dau.join(wau, "d").select(
        F.col("d").cast("long").alias("day"),
        F.col("dau").cast("long").alias("dau"),
        F.col("wau").cast("long").alias("wau"),
        F.expr("CAST((10000 * dau) DIV wau AS BIGINT)").alias("stickiness_bp"),
    )


@register(
    "cohort_dn_retention",
    """
    WITH ud AS (
        SELECT user_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        FROM events GROUP BY user_id, d),
    fs AS (SELECT user_id, min(d) AS d0 FROM ud GROUP BY user_id),
    flags AS (
        SELECT fs.d0, fs.user_id,
               max(CASE WHEN ud.d = fs.d0 + 1 THEN 1 ELSE 0 END) AS r1,
               max(CASE WHEN ud.d = fs.d0 + 7 THEN 1 ELSE 0 END) AS r7,
               max(CASE WHEN ud.d = fs.d0 + 14 THEN 1 ELSE 0 END) AS r14
        FROM fs JOIN ud USING (user_id) GROUP BY fs.d0, fs.user_id)
    SELECT CAST(d0 AS BIGINT) AS cohort_day,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(r1) AS BIGINT) AS d1_retained,
           CAST(sum(r7) AS BIGINT) AS d7_retained,
           CAST(sum(r14) AS BIGINT) AS d14_retained,
           CAST((10000 * sum(r1)) // count(*) AS BIGINT) AS d1_bp,
           CAST((10000 * sum(r7)) // count(*) AS BIGINT) AS d7_bp,
           CAST((10000 * sum(r14)) // count(*) AS BIGINT) AS d14_bp
    FROM flags GROUP BY d0
    """,
    tags=("analytics", "retention", "cohort", "growth", "exact_arithmetic"),
    description=(
        "classic Dn retention (D1/D7/D14): per daily cohort, the "
        "exact fraction of users active exactly N days after their "
        "first-seen day, in basis points — the bounded-boundary twin "
        "of the open-ended weekly retention matrix (exact-day return "
        "is the industry definition for D1/D7).  The user-day table "
        "joins its own first-seen map on the user key; everything "
        "else is conditional aggregation on epoch-day integers"
    ),
)
def cohort_dn_retention(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("d")
    ).distinct()
    fs = ud.groupBy("user_id").agg(F.min("d").alias("d0"))
    flags = (
        ud.join(fs, "user_id")
        .groupBy("d0", "user_id")
        .agg(
            F.max(F.when(F.col("d") == F.col("d0") + 1, 1).otherwise(0)).alias("r1"),
            F.max(F.when(F.col("d") == F.col("d0") + 7, 1).otherwise(0)).alias("r7"),
            F.max(F.when(F.col("d") == F.col("d0") + 14, 1).otherwise(0)).alias("r14"),
        )
    )
    return flags.groupBy(F.col("d0").cast("long").alias("cohort_day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("r1").cast("long").alias("d1_retained"),
        F.sum("r7").cast("long").alias("d7_retained"),
        F.sum("r14").cast("long").alias("d14_retained"),
        F.expr("CAST((10000 * sum(r1)) DIV count(1) AS BIGINT)").alias("d1_bp"),
        F.expr("CAST((10000 * sum(r7)) DIV count(1) AS BIGINT)").alias("d7_bp"),
        F.expr("CAST((10000 * sum(r14)) DIV count(1) AS BIGINT)").alias("d14_bp"),
    )


@register(
    "mine_churn_hazard",
    """
    WITH ud AS (
        SELECT user_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        FROM events GROUP BY user_id, d),
    span AS (
        SELECT user_id, min(d) AS d0, max(d) - min(d) AS last_age
        FROM ud GROUP BY user_id),
    ages AS (
        SELECT user_id, last_age, unnest(range(0, last_age + 1)) AS age
        FROM span),
    lt AS (
        SELECT age,
               count(*) AS n_at_risk,
               count(*) FILTER (WHERE age = last_age) AS n_churned
        FROM ages GROUP BY age)
    SELECT CAST(age AS BIGINT) AS age_days,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(n_churned AS BIGINT) AS n_last_seen,
           CAST((10000 * n_churned) // n_at_risk AS BIGINT) AS hazard_bp
    FROM lt
    """,
    tags=("analytics", "survival", "churn", "life_table", "exact_arithmetic"),
    description=(
        "churn life table (the count layer of a Kaplan-Meier "
        "estimator): per lifetime age in days, how many users were "
        "still inside their observed activity span (at risk) and how "
        "many were last seen exactly at that age, with the discrete "
        "hazard in exact basis points — survival products are "
        "derived downstream; only exact counts and one truncating "
        "division materialize here, so engines agree bit-for-bit.  "
        "Each user explodes to their lifespan in days (bounded by "
        "the observation window) and a single age-key aggregate "
        "builds the table"
    ),
)
def mine_churn_hazard(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("d")
    ).distinct()
    span = ud.groupBy("user_id").agg(
        (F.max("d") - F.min("d")).alias("last_age")
    )
    ages = span.select(
        "last_age", F.explode(F.expr("sequence(0, last_age)")).alias("age")
    )
    lt = ages.groupBy("age").agg(
        F.count(F.lit(1)).alias("n_at_risk"),
        F.count(F.when(F.col("age") == F.col("last_age"), 1)).alias("n_churned"),
    )
    return lt.select(
        F.col("age").cast("long").alias("age_days"),
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        F.col("n_churned").cast("long").alias("n_last_seen"),
        F.expr("CAST((10000 * n_churned) DIV n_at_risk AS BIGINT)").alias("hazard_bp"),
    )
