"""Data-mining query corpus: co-occurrence (market basket),
gaps-and-islands streaks, exact grouped median, largest-remainder
integer allocation, and the point-in-time (feature-store) join.

None of these exist in the reference (it has no relational layer at
all — SURVEY.md §2.4/§2.12); they are engine-side additions a
training-data/analytics team runs daily.  Every entry is SQL-exact
against the DuckDB oracle: outputs are integers (counts, cents,
day-grid arithmetic) so no float-accumulation hazard exists.

Scale notes (100 TB posture):

* market basket self-joins on the order key AFTER a distinct that
  shrinks each basket to unique items; pair blowup is quadratic in
  basket size, so production adds a basket-size cap — the join
  itself is a plain equi-shuffle on the key, never a cross join;
* streaks shuffle once on (user, day) for the distinct and once on
  user for the window — both are map-side-combinable;
* the exact median uses one window pass (row_number + count over
  the group), not a per-group sort-collect to the driver;
* largest-remainder ranks |groups| rows — a single-partition window
  over an already-aggregated (tiny) table, never over fact rows;
* the point-in-time join is an equi-join on the entity key with the
  interval predicate as a post-join filter — Catalyst keeps the
  equi part in the shuffle key, so per-key interval lists stay
  local; this is the leakage-free feature-store lookup.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

from sfs3_kinesis_spark.plans.core import register, t, t_nonnull
from sfs3_kinesis_spark.operators.scale import pin_shared


@register(
    "mine_market_basket_pairs",
    """
    WITH items AS (
        SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk FROM lineitem),
    pairs AS (
        SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS n_orders
        FROM items a JOIN items b ON a.okey = b.okey AND a.pk < b.pk
        GROUP BY a.pk, b.pk)
    SELECT CAST(part_a AS BIGINT) AS part_a,
           CAST(part_b AS BIGINT) AS part_b,
           CAST(n_orders AS BIGINT) AS n_orders
    FROM pairs
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 20
    """,
    tags=("mining", "join", "topk", "cooccurrence"),
    description=(
        "market-basket pair mining: co-occurring part pairs within an "
        "order — distinct items first (dedupes multi-line parts AND bounds "
        "the quadratic pair blowup), then a self equi-join on the order "
        "key (shuffle on okey, pairs generated key-locally), one count "
        "aggregate, top-20 with a total (count, part_a, part_b) order so "
        "ties hash identically; production adds a basket-size cap before "
        "the join — the plan is TakeOrdered, never a global sort"
    ),
)
def mine_market_basket_pairs(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pk")
    ).distinct()
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(b, (F.col("a.okey") == F.col("b.okey")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("part_a"), F.col("b.pk").alias("part_b"))
        .agg(F.count("*").cast("long").alias("n_orders"))
        .select(
            F.col("part_a").cast("long").alias("part_a"),
            F.col("part_b").cast("long").alias("part_b"),
            "n_orders",
        )
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(20)
    )


@register(
    "mine_activity_streaks",
    """
    WITH days AS (
        SELECT DISTINCT user_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS di
        FROM events),
    r AS (
        SELECT user_id, di,
               di - row_number() OVER (PARTITION BY user_id ORDER BY di) AS anchor
        FROM days),
    s AS (SELECT user_id, anchor, count(*) AS len FROM r GROUP BY user_id, anchor)
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(sum(len) AS BIGINT) AS n_active_days,
           CAST(count(*) AS BIGINT) AS n_streaks
    FROM s GROUP BY user_id
    """,
    tags=("mining", "window", "gaps_islands", "events"),
    description=(
        "gaps-and-islands: longest run of consecutive active days per "
        "user via the day-index-minus-row_number anchor trick — one "
        "distinct on (user, day), one keyed window, two integer "
        "aggregates; no self-join, no sequence generation, and the "
        "day grid is integer epoch-days so both engines agree exactly"
    ),
)
def mine_activity_streaks(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("di")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("di")
    runs = days.withColumn("anchor", F.col("di") - F.row_number().over(w))
    streaks = runs.groupBy("user_id", "anchor").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak"),
        F.sum("len").cast("long").alias("n_active_days"),
        F.count("*").cast("long").alias("n_streaks"),
    ).select(F.col("user_id").cast("long").alias("user_id"), "longest_streak", "n_active_days", "n_streaks")


@register(
    "agg_median_exact",
    """
    WITH c AS (
        SELECT event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL),
    r AS (
        SELECT event_type, cents,
               row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM c)
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN cents END)
                + sum(CASE WHEN rn = (n + 2) // 2 THEN cents END)
                AS BIGINT) AS median_x2_cents
    FROM r GROUP BY event_type ORDER BY event_type
    """,
    tags=("agg", "median", "window", "exact_arithmetic"),
    description=(
        "exact grouped median without approx_percentile: one keyed window "
        "(row_number + group count in the same pass) then pick the one or "
        "two middle rows — reported as TWO independent middle-row sums "
        "added together (the middle row counts twice when n is odd), so "
        "the value is always exactly 2x the median and stays integer-exact; "
        "row_number ties on equal cents are harmless (interchangeable "
        "values).  The scalable exact-median shape: one shuffle on the "
        "group key, no per-group collect"
    ),
)
def agg_median_exact(spark: SparkSession, sf_dir: str):
    e = t_nonnull(spark, sf_dir, "events", "value")
    c = e.select(
        "event_type", F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)").alias("cents")
    )
    # collapse to the (group, value) rollup BEFORE any window: the
    # k-th order statistic is the smallest value whose cumulative
    # count reaches k, so the keyed window runs over |distinct
    # values| rows (value-domain-bounded) — never fact rows through
    # a handful of group reducers (the grouped cousin of the r02
    # global-window flag); group totals ride in as a broadcast
    g = c.groupBy("event_type", "cents").agg(F.count(F.lit(1)).alias("cnt"))
    tot = g.groupBy("event_type").agg(F.sum("cnt").alias("n"))
    wc = (
        W.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    r = g.withColumn("cum", F.sum("cnt").over(wc)).join(F.broadcast(tot), "event_type")
    lo = F.min(F.when(F.col("cum") >= F.expr("(n + 1) DIV 2"), F.col("cents")))
    hi = F.min(F.when(F.col("cum") >= F.expr("(n + 2) DIV 2"), F.col("cents")))
    return (
        r.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_rows"),
            (lo + hi).cast("long").alias("median_x2_cents"),
        )
        .orderBy("event_type")
    )


@register(
    "alloc_largest_remainder",
    """
    WITH rev AS (
        SELECT n_name,
               SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name),
    tot AS (SELECT SUM(cents) AS total FROM rev),
    q AS (
        SELECT n_name, cents,
               (1000000 * cents) // total AS fl,
               (1000000 * cents) % total AS rem
        FROM rev, tot),
    r AS (
        SELECT n_name, cents, fl, rem,
               row_number() OVER (ORDER BY rem DESC, n_name) AS rk,
               SUM(fl) OVER () AS allocated
        FROM q)
    SELECT n_name,
           CAST(cents AS BIGINT) AS revenue_cents,
           CAST(fl + CASE WHEN rk <= 1000000 - allocated THEN 1 ELSE 0 END
                AS BIGINT) AS units
    FROM r ORDER BY n_name
    """,
    tags=("alloc", "window", "exact_arithmetic", "join"),
    description=(
        "largest-remainder (Hamilton) apportionment: allocate 1,000,000 "
        "budget units across nations proportional to order revenue, in "
        "pure integer arithmetic — floor shares via bigint floor-div, the "
        "leftover units going to the largest remainders (total (rem, "
        "name) tie-break order).  The fact-table shuffle happens once "
        "(revenue rollup); the single-partition window runs over "
        "|nations| pre-aggregated rows, never over fact rows — the "
        "correct place for a global window at any scale"
    ),
)
def alloc_largest_remainder(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(F.expr("CAST(floor(o_totalprice * 100 + 0.5D) AS BIGINT)")).alias("cents"))
    )
    tot = rev.agg(F.sum("cents").alias("total"))
    q = rev.crossJoin(F.broadcast(tot)).select(
        "n_name",
        "cents",
        F.expr("(1000000 * cents) DIV total").alias("fl"),
        F.expr("(1000000 * cents) % total").alias("rem"),
    )
    w = W.orderBy(F.desc("rem"), "n_name")
    r = q.withColumn("rk", F.row_number().over(w)).withColumn(
        "allocated", F.sum("fl").over(W.partitionBy())
    )
    return r.select(
        "n_name",
        F.col("cents").cast("long").alias("revenue_cents"),
        (
            F.col("fl")
            + F.when(F.col("rk") <= F.lit(1000000) - F.col("allocated"), 1).otherwise(0)
        ).cast("long").alias("units"),
    ).orderBy("n_name")


@register(
    "join_point_in_time",
    """
    WITH st AS (
        SELECT user_id, event_type, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to
        FROM events WHERE event_type <> 'purchase'),
    p AS (
        SELECT user_id, ts,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase')
    SELECT st.event_type AS state_type,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(p.cents) AS BIGINT) AS purchase_cents
    FROM p JOIN st ON p.user_id = st.user_id
               AND p.ts >= st.valid_from
               AND (st.valid_to IS NULL OR p.ts < st.valid_to)
    GROUP BY st.event_type ORDER BY st.event_type
    """,
    tags=("join", "temporal", "feature_store", "scd2"),
    description=(
        "point-in-time (feature-store) join: each purchase looks up the "
        "user state valid AT its timestamp — SCD2-style [valid_from, "
        "valid_to) intervals built with one lead() window over non-"
        "purchase events, then an equi-join on user_id with the interval "
        "predicate as a post-join filter (the shuffle key stays the "
        "entity key; per-key interval lists are evaluated locally).  "
        "This is the leakage-free training-feature lookup: no future "
        "state ever attaches to a past label"
    ),
)
def join_point_in_time(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    st = (
        e.filter(F.col("event_type") != "purchase")
        .select(
            F.col("user_id").alias("st_user_id"),
            F.col("event_type").alias("state_type"),
            F.col("ts").alias("valid_from"),
            "event_id",
        )
        .withColumn(
            "valid_to",
            F.lead("valid_from").over(
                W.partitionBy("st_user_id").orderBy("valid_from", "event_id")
            ),
        )
        .drop("event_id")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)").alias("cents"),
    )
    joined = p.join(
        st,
        (F.col("user_id") == F.col("st_user_id"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
    )
    return (
        joined.groupBy("state_type")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.sum("cents").cast("long").alias("purchase_cents"),
        )
        .orderBy("state_type")
    )


@register(
    "mine_interval_coverage",
    """
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) // 1000000        AS s,
             epoch_us(ts) // 1000000 + 900  AS e
      FROM events),
    marked AS (
      SELECT user_id, s, e,
             CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       >= s
                  THEN 0 ELSE 1 END AS is_new
      FROM iv),
    islands AS (
      SELECT user_id, s, e,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY s, e
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island_id
      FROM marked),
    merged AS (
      SELECT user_id, island_id, max(e) - min(s) AS covered_s
      FROM islands GROUP BY user_id, island_id)
    SELECT user_id,
           count(*)       AS n_islands,
           sum(covered_s) AS covered_seconds
    FROM merged GROUP BY user_id
    """,
    tags=("mining", "intervals", "window", "gaps_islands", "events"),
    description=(
        "overlapping-interval merge (coverage analysis): each event "
        "claims a 15-minute activity window; per user the windows are "
        "merged into maximal islands via the running-max-of-ends trick "
        "(an interval starts a new island iff it begins after every "
        "prior interval has ended), then coverage = sum of island "
        "spans — one keyed window + one aggregate, no self-join, no "
        "grid materialization; integer epoch seconds end to end"
    ),
)
def mine_interval_coverage(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        "event_id",
        F.expr("unix_micros(ts) div 1000000").alias("s"),
        F.expr("unix_micros(ts) div 1000000 + 900").alias("e"),
    )
    w_prev = (
        W.partitionBy("user_id").orderBy("s", "event_id").rowsBetween(W.unboundedPreceding, -1)
    )
    marked = iv.select(
        "user_id",
        "s",
        "e",
        F.when(F.max("e").over(w_prev) >= F.col("s"), 0).otherwise(1).alias("is_new"),
    )
    w_run = W.partitionBy("user_id").orderBy("s", "e").rowsBetween(W.unboundedPreceding, 0)
    islands = marked.withColumn("island_id", F.sum("is_new").over(w_run))
    merged = islands.groupBy("user_id", "island_id").agg(
        (F.max("e") - F.min("s")).alias("covered_s")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("covered_s").alias("covered_seconds"),
    )


@register(
    "agg_mad_anomalies",
    """
    WITH c AS (
      SELECT event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL),
    r AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
             count(*)     OVER (PARTITION BY event_type)                AS n
      FROM c),
    med AS (
      SELECT event_type,
             sum(CASE WHEN rn = (n + 1) // 2 THEN cents END)
           + sum(CASE WHEN rn = (n + 2) // 2 THEN cents END) AS med2
      FROM r GROUP BY event_type),
    dev AS (
      SELECT c.event_type, c.cents, m.med2,
             abs(2 * c.cents - m.med2) AS dev2
      FROM c JOIN med m USING (event_type)),
    dr AS (
      SELECT event_type, med2, dev2,
             row_number() OVER (PARTITION BY event_type ORDER BY dev2) AS rn,
             count(*)     OVER (PARTITION BY event_type)               AS n
      FROM dev),
    mad AS (
      SELECT event_type,
             sum(CASE WHEN rn = (n + 1) // 2 THEN dev2 END)
           + sum(CASE WHEN rn = (n + 2) // 2 THEN dev2 END) AS mad4
      FROM dr GROUP BY event_type)
    SELECT d.event_type, d.med2, m.mad4,
           count(*)                                           AS n,
           sum(CASE WHEN 2 * d.dev2 > 3 * m.mad4 THEN 1 ELSE 0 END)
                                                              AS n_anomalies
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type, d.med2, m.mad4
    """,
    tags=("agg", "median", "mad", "anomaly", "quality", "exact_arithmetic"),
    description=(
        "median-absolute-deviation anomaly flags — the robust twin of "
        "the z-score detector (events_zscore_anomalies): per-type exact "
        "median (2x-scaled middle-pair sum), per-row deviation, exact "
        "median of deviations (4x-scaled), flag = 2*dev2 > 3*mad4 — "
        "pure integer arithmetic throughout, so the flag set is "
        "bit-identical across engines and partitionings where "
        "mean/stddev detectors drown in float summation order.  Both "
        "median passes partition on event_type, so the fact table "
        "shuffles ONCE and the tiny per-type tables broadcast back"
    ),
)
def agg_mad_anomalies(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window as W

    e = t_nonnull(spark, sf_dir, "events", "value")
    c = e.select(
        "event_type", F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)").alias("cents")
    )
    def middle_pair_sum(df, col, out):
        # distinct-value rollup form (see agg_median_exact): the
        # middle order statistics come from cumulative counts over
        # |distinct values| rows, never a fact-sized keyed rank
        g = df.groupBy("event_type", col).agg(F.count(F.lit(1)).alias("cnt"))
        tot = g.groupBy("event_type").agg(F.sum("cnt").alias("n"))
        wc = (
            W.partitionBy("event_type")
            .orderBy(col)
            .rowsBetween(W.unboundedPreceding, 0)
        )
        r = g.withColumn("cum", F.sum("cnt").over(wc)).join(
            F.broadcast(tot), "event_type"
        )
        lo = F.min(F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col(col)))
        hi = F.min(F.when(F.col("cum") >= F.expr("(n + 2) div 2"), F.col(col)))
        return r.groupBy("event_type").agg((lo + hi).alias(out))

    med = middle_pair_sum(c, "cents", "med2")
    dev = c.join(F.broadcast(med), "event_type").select(
        "event_type", "med2", F.abs(2 * F.col("cents") - F.col("med2")).alias("dev2")
    )
    mad = middle_pair_sum(dev, "dev2", "mad4")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med2", "mad4")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(2 * F.col("dev2") > 3 * F.col("mad4"), 1).otherwise(0)
            ).alias("n_anomalies"),
        )
    )


@register(
    "agg_bitmap_distinct",
    """
    WITH b AS (
      SELECT event_type,
             user_id // 62 AS bucket,
             bit_or(1::BIGINT << CAST(user_id % 62 AS INTEGER)) AS mask
      FROM events GROUP BY event_type, bucket)
    SELECT event_type,
           count(*)             AS n_buckets,
           sum(bit_count(mask)) AS exact_distinct_users
    FROM b GROUP BY event_type
    """,
    tags=("agg", "distinct", "bitmap", "exact_arithmetic"),
    description=(
        "bitmap-index exact distinct (the ClickHouse/Doris groupBitmap "
        "trick): dense integer keys packed 62-per-bucket via bit_or of "
        "shifted masks (bit 62+ would overflow a signed shift in the "
        "oracle), distinct count = popcount sum — two map-side-"
        "combinable aggregates whose partial state is ONE int64 per "
        "62 keys, vs a hash set per group for count(DISTINCT); the "
        "mergeable exact-distinct representation incremental rollups "
        "store at 100 TB, value-identical to count(DISTINCT) by "
        "construction"
    ),
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    b = (
        e.groupBy(
            "event_type", F.expr("user_id div 62").alias("bucket")
        ).agg(
            F.expr("bit_or(shiftleft(1L, CAST(user_id % 62 AS INT)))").alias("mask")
        )
    )
    return b.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.bit_count("mask")).alias("exact_distinct_users"),
    )


@register(
    "mine_association_lift",
    """
    WITH li AS (SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk FROM lineitem),
    n AS (SELECT count(DISTINCT okey) AS n_orders FROM li),
    item AS (SELECT pk, count(*) AS n_pk FROM li GROUP BY pk),
    pair AS (
      SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS n_ab
      FROM li a JOIN li b ON a.okey = b.okey AND a.pk < b.pk
      GROUP BY a.pk, b.pk HAVING count(*) >= 3)
    SELECT p.part_a, p.part_b, p.n_ab,
           p.n_ab * 10000 // ia.n_pk                            AS conf_a_to_b_bp,
           p.n_ab * n.n_orders * 10000 // (ia.n_pk * ib.n_pk)   AS lift_bp
    FROM pair p
    JOIN item ia ON ia.pk = p.part_a
    JOIN item ib ON ib.pk = p.part_b
    CROSS JOIN n
    ORDER BY lift_bp DESC, part_a, part_b LIMIT 50
    """,
    tags=("mining", "association_rules", "join", "topk", "exact_arithmetic"),
    description=(
        "association-rule mining over co-purchase pairs: support "
        "(pair count with a min-support HAVING prune — the Apriori "
        "step that keeps the pair table sparse at scale), confidence "
        "a→b and lift in floor basis points against the per-item "
        "counts (broadcast join-back: the item table is |parts| "
        "rows) and the 1-row order total; all-integer derived "
        "metrics, total (lift, a, b) order for the top-50"
    ),
)
def mine_association_lift(spark: SparkSession, sf_dir: str):
    li = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    li = pin_shared(li, tag="assoc_li")
    n = li.agg(F.countDistinct("okey").alias("n_orders"))
    item = li.groupBy("pk").agg(F.count(F.lit(1)).alias("n_pk"))
    pair = (
        li.alias("a")
        .join(li.alias("b"), (F.col("a.okey") == F.col("b.okey")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("part_a"), F.col("b.pk").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 3)
    )
    return (
        pair.join(F.broadcast(item.withColumnRenamed("pk", "part_a").withColumnRenamed("n_pk", "n_a")), "part_a")
        .join(F.broadcast(item.withColumnRenamed("pk", "part_b").withColumnRenamed("n_pk", "n_b")), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            F.expr("n_ab * 10000 div n_a").alias("conf_a_to_b_bp"),
            F.expr("n_ab * n_orders * 10000 div (n_a * n_b)").alias("lift_bp"),
        )
        .orderBy(F.desc("lift_bp"), "part_a", "part_b")
        .limit(50)
    )


@register(
    "agg_percentile_bands_exact",
    """
    WITH c AS (
      SELECT event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL),
    r AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
             count(*)     OVER (PARTITION BY event_type)                AS n
      FROM c)
    SELECT event_type,
           max(n)                                                    AS n,
           max(CASE WHEN rn = (n * 25 + 99) // 100 THEN cents END)   AS p25_cents,
           max(CASE WHEN rn = (n * 50 + 99) // 100 THEN cents END)   AS p50_cents,
           max(CASE WHEN rn = (n * 75 + 99) // 100 THEN cents END)   AS p75_cents,
           max(CASE WHEN rn = (n * 90 + 99) // 100 THEN cents END)   AS p90_cents
    FROM r GROUP BY event_type
    """,
    tags=("agg", "percentile", "window", "exact_arithmetic"),
    description=(
        "exact nearest-rank percentile bands (p25/p50/p75/p90) per "
        "group without approx_percentile: ONE keyed window pass "
        "tagging each row's rank, then conditional picks at rank "
        "ceil(p*n/100) — all four percentiles share the single "
        "event_type shuffle (the generalization of the exact-median "
        "shape to a percentile vector; a sketch would trade exactness "
        "for mergeability here)"
    ),
)
def agg_percentile_bands_exact(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window as W

    e = t_nonnull(spark, sf_dir, "events", "value")
    c = e.select(
        "event_type", F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)").alias("cents")
    )
    # distinct-value rollup first (see agg_median_exact): the window
    # input is value-domain-bounded, not fact-sized
    g = c.groupBy("event_type", "cents").agg(F.count(F.lit(1)).alias("cnt"))
    tot = g.groupBy("event_type").agg(F.sum("cnt").alias("n"))
    wc = (
        W.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    r = g.withColumn("cum", F.sum("cnt").over(wc)).join(F.broadcast(tot), "event_type")
    picks = [
        F.min(
            F.when(F.col("cum") >= F.expr(f"(n * {p} + 99) div 100"), F.col("cents"))
        ).alias(f"p{p}_cents")
        for p in (25, 50, 75, 90)
    ]
    return r.groupBy("event_type").agg(F.max("n").alias("n"), *picks)


@register(
    "agg_weighted_median",
    """
    WITH c AS (
        SELECT l_returnflag AS flag,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
               CAST(l_quantity AS BIGINT) AS qty,
               l_orderkey, l_linenumber
        FROM lineitem
        WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
          AND l_quantity IS NOT NULL),
    r AS (
        SELECT flag, cents, qty,
               sum(qty) OVER (PARTITION BY flag
                              ORDER BY cents, l_orderkey, l_linenumber
                              ROWS UNBOUNDED PRECEDING) AS cum,
               sum(qty) OVER (PARTITION BY flag) AS tot
        FROM c)
    SELECT flag,
           CAST(max(tot) AS BIGINT) AS total_qty,
           CAST(min(CASE WHEN 2 * cum >= tot THEN cents END) AS BIGINT)
               AS wmedian_cents
    FROM r GROUP BY flag ORDER BY flag
    """,
    tags=("agg", "median", "weighted", "window", "exact_arithmetic"),
    description=(
        "exact weighted median (lower weighted median: the smallest "
        "price whose cumulative quantity reaches half the total) per "
        "return flag — the inventory-weighted center a plain median "
        "misses when line quantities vary.  One keyed window pass "
        "(running weight + group total share a single flag shuffle), "
        "then a conditional min; the 2*cum >= tot comparison stays in "
        "integers so no half-weight rounding can diverge.  Value is "
        "permutation-stable within equal-price ties by construction "
        "(the threshold crossing lands inside the same price block)"
    ),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str):
    li = t_nonnull(
        spark, sf_dir, "lineitem", "l_returnflag", "l_extendedprice", "l_quantity"
    )
    c = li.select(
        F.col("l_returnflag").alias("flag"),
        F.expr("CAST(floor(l_extendedprice * 100 + 0.5D) AS BIGINT)").alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    # per-(flag, price) weight rollup first: the threshold crossing
    # 2*cum >= tot always lands inside one price block (the oracle's
    # per-row tie-break order cannot change WHICH price crosses), so
    # the windowed input is value-domain-bounded, not fact-sized —
    # same rework as agg_median_exact
    g = c.groupBy("flag", "cents").agg(F.sum("qty").alias("q"))
    tot = g.groupBy("flag").agg(F.sum("q").alias("tot"))
    wc = W.partitionBy("flag").orderBy("cents").rowsBetween(W.unboundedPreceding, 0)
    r = g.withColumn("cum", F.sum("q").over(wc)).join(F.broadcast(tot), "flag")
    return (
        r.groupBy("flag")
        .agg(
            F.max("tot").cast("long").alias("total_qty"),
            F.min(F.when(2 * F.col("cum") >= F.col("tot"), F.col("cents")))
            .cast("long")
            .alias("wmedian_cents"),
        )
        .orderBy("flag")
    )


@register(
    "mine_sequential_pairs",
    """
    WITH cp AS (
        SELECT DISTINCT o_custkey AS cust, l_partkey AS part, o_orderdate AS d
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    sp AS (
        SELECT DISTINCT a.cust, a.part AS part_a, b.part AS part_b
        FROM cp a JOIN cp b
          ON a.cust = b.cust AND a.d < b.d AND a.part <> b.part)
    SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS n_customers
    FROM sp GROUP BY part_a, part_b
    ORDER BY n_customers DESC, part_a, part_b LIMIT 20
    """,
    tags=("mining", "sequential_pattern", "join", "topk", "cooccurrence"),
    description=(
        "sequential pattern pairs (A then strictly-later B): "
        "customers who bought part A on an earlier order date and "
        "part B on a later one, counted once per customer — the "
        "temporal-order signal behind next-purchase recommendation, "
        "which the unordered market-basket pair query cannot see.  "
        "Purchases roll up to one (customer, part, min_date, "
        "max_date) span row FIRST — a pair (A then B) exists for a "
        "customer iff min_date(A) < max_date(B), so the self-join "
        "emits each qualifying (customer, A, B) exactly once and the "
        "13M-row post-join DISTINCT of the naive form disappears; "
        "one shuffle on the customer key, pairs generated "
        "customer-locally; TakeOrdered top-20 with a total "
        "(count, a, b) order.  The oracle keeps the naive "
        "dedup-the-pairs form, proving the span rewrite equivalent "
        "cross-engine"
    ),
)
def mine_sequential_pairs(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), F.col("o_custkey").alias("cust"), F.col("o_orderdate").alias("d")
    )
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part")
    )
    # One span row per (customer, part): ∃ dates dA < dB between two
    # parts ⟺ min_date(A) < max_date(B), so pair generation needs no
    # post-join DISTINCT.  The span table feeds both self-join sides —
    # persist it once instead of running scan+join+agg twice.
    g = (
        o.join(li, "okey")
        .groupBy("cust", "part")
        .agg(F.min("d").alias("mind"), F.max("d").alias("maxd"))
    )
    g = pin_shared(g, tag="seq_span")
    sp = (
        g.alias("a")
        .join(
            g.alias("b"),
            (F.col("a.cust") == F.col("b.cust"))
            & (F.col("a.mind") < F.col("b.maxd"))
            & (F.col("a.part") != F.col("b.part")),
        )
        .select(F.col("a.part").alias("part_a"), F.col("b.part").alias("part_b"))
    )
    return (
        sp.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .orderBy(F.desc("n_customers"), "part_a", "part_b")
        .limit(20)
    )


@register(
    "mine_change_point",
    """
    WITH d AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS di,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'),
    g AS (SELECT di, count(*) AS n, sum(cents) AS s FROM d GROUP BY di),
    p AS (
        SELECT di, n, s,
               sum(n) OVER (ORDER BY di) AS cn,
               sum(s) OVER (ORDER BY di) AS cs,
               sum(n) OVER () AS tn,
               sum(s) OVER () AS ts_
        FROM g),
    sc AS (
        SELECT di, cn, cs, tn, ts_,
               abs((10000 * ((ts_ - cs) * cn - cs * (tn - cn)))
                   // (cn * (tn - cn))) AS score
        FROM p WHERE cn > 0 AND tn - cn > 0)
    SELECT CAST(di AS BIGINT) AS split_day,
           CAST(score AS BIGINT) AS shift_x10000,
           CAST(cn AS BIGINT) AS n_before,
           CAST(tn - cn AS BIGINT) AS n_after,
           CAST((10000 * cs) // cn AS BIGINT) AS mean_before_x10000,
           CAST((10000 * (ts_ - cs)) // (tn - cn) AS BIGINT) AS mean_after_x10000
    FROM sc ORDER BY score DESC, di LIMIT 1
    """,
    tags=("mining", "change_point", "timeseries", "exact_arithmetic"),
    description=(
        "offline change-point detection (binary-segmentation step 1): "
        "the day boundary maximizing |mean_after - mean_before| of "
        "purchase values.  The corpus aggregates to the DAY table "
        "first (map-side combined; the only data-sized operation), "
        "then prefix sums + the split scan run over |days| rows — the "
        "two-level rollup that makes scanning every split point free "
        "at any corpus size.  The mean gap is cross-multiplied into "
        "one truncating integer score (x1e4) so the argmax is "
        "bit-stable across engines (day tiebreak); bigint bound holds "
        "to ~1e14 cents total (DECIMAL(38,0) is the swap past that)"
    ),
)
def mine_change_point(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    d = e.select(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("di"),
        F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)").alias("cents"),
    )
    g = d.groupBy("di").agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
    # |days| rows from here down: the global windows run on the tiny
    # day table, never the fact table
    wo = W.orderBy("di").rowsBetween(W.unboundedPreceding, 0)
    wa = W.partitionBy()
    p = (
        g.withColumn("cn", F.sum("n").over(wo))
        .withColumn("cs", F.sum("s").over(wo))
        .withColumn("tn", F.sum("n").over(wa))
        .withColumn("ts_", F.sum("s").over(wa))
    )
    sc = p.filter((F.col("cn") > 0) & (F.col("tn") - F.col("cn") > 0)).withColumn(
        "score",
        F.abs(
            F.expr("(10000 * ((ts_ - cs) * cn - cs * (tn - cn))) DIV (cn * (tn - cn))")
        ),
    )
    return sc.orderBy(F.desc("score"), "di").limit(1).select(
        F.col("di").cast("long").alias("split_day"),
        F.col("score").cast("long").alias("shift_x10000"),
        F.col("cn").cast("long").alias("n_before"),
        (F.col("tn") - F.col("cn")).cast("long").alias("n_after"),
        F.expr("CAST((10000 * cs) DIV cn AS BIGINT)").alias("mean_before_x10000"),
        F.expr("CAST((10000 * (ts_ - cs)) DIV (tn - cn) AS BIGINT)").alias(
            "mean_after_x10000"
        ),
    )


@register(
    "mine_seasonal_dow_profile",
    """
    WITH d AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7 AS dow,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events),
    g AS (SELECT event_type, dow, count(*) AS n, sum(cents) AS s
          FROM d GROUP BY 1, 2),
    tt AS (SELECT event_type, sum(n) AS tn, sum(s) AS ts_ FROM g GROUP BY 1)
    SELECT g.event_type,
           CAST(g.dow AS BIGINT) AS dow,
           CAST(g.n AS BIGINT) AS n_events,
           CAST((100 * g.s) // g.n AS BIGINT) AS mean_x100,
           CAST((10000 * (g.s * tt.tn - tt.ts_ * g.n)) // (tt.ts_ * g.n) AS BIGINT)
               AS seasonal_dev_bp
    FROM g JOIN tt USING (event_type)
    """,
    tags=("mining", "seasonality", "timeseries", "agg", "exact_arithmetic"),
    description=(
        "day-of-week seasonality profile: per (type, weekday) the "
        "exact mean (x100) and its deviation from the type's overall "
        "mean in basis points — the weekly-pattern fingerprint an "
        "anomaly detector baselines against.  Weekday = epoch-day "
        "mod 7 (engine-neutral integer; dayofweek() numbering "
        "differs between engines), deviation cross-multiplied "
        "(s*tn - ts*n)/(ts*n) so no doubles enter; one map-side-"
        "combined aggregate plus a |types|-row broadcast join-back"
    ),
)
def mine_seasonal_dow_profile(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    d = e.select(
        "event_type",
        (F.datediff(F.to_date("ts"), F.lit("1970-01-01")) % 7).alias("dow"),
        F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)").alias("cents"),
    )
    g = d.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    tt = g.groupBy("event_type").agg(
        F.sum("n").alias("tn"), F.sum("s").alias("ts_")
    )
    return g.join(F.broadcast(tt), "event_type").select(
        "event_type",
        F.col("dow").cast("long").alias("dow"),
        F.col("n").cast("long").alias("n_events"),
        F.expr("CAST((100 * s) DIV n AS BIGINT)").alias("mean_x100"),
        F.expr(
            "CAST((10000 * (s * tn - ts_ * n)) DIV (ts_ * n) AS BIGINT)"
        ).alias("seasonal_dev_bp"),
    )


@register(
    "mine_gini_diversity",
    """
    WITH c AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type),
    u AS (
        SELECT user_id, sum(n) AS tot, sum(n * n) AS sq, count(*) AS n_types
        FROM c GROUP BY user_id)
    SELECT user_id,
           CAST(tot AS BIGINT) AS n_events,
           CAST(n_types AS BIGINT) AS n_types,
           CAST((10000 * (tot * tot - sq)) // (tot * tot) AS BIGINT) AS gini_bp
    FROM u
    """,
    tags=("mining", "diversity", "gini", "agg", "exact_arithmetic"),
    description=(
        "behavioral diversity via Gini impurity (the exact-integer "
        "stand-in for Shannon entropy, whose log() is not cross-"
        "engine bit-stable): per user, 1 - sum(p_i^2) over event-type "
        "shares, cross-multiplied to (tot^2 - sum(n_i^2)) / tot^2 in "
        "basis points — 0 = single-behavior user, ->10000 = uniform "
        "spread.  Two nested map-side-combined aggregates on one "
        "scan; no doubles anywhere"
    ),
)
def mine_gini_diversity(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    u = c.groupBy("user_id").agg(
        F.sum("n").alias("tot"),
        F.sum(F.col("n") * F.col("n")).alias("sq"),
        F.count(F.lit(1)).alias("n_types"),
    )
    return u.select(
        "user_id",
        F.col("tot").cast("long").alias("n_events"),
        F.col("n_types").cast("long").alias("n_types"),
        F.expr("CAST((10000 * (tot * tot - sq)) DIV (tot * tot) AS BIGINT)").alias(
            "gini_bp"
        ),
    )


@register(
    "mine_burstiness",
    """
    WITH h AS (
        SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS n
        FROM events GROUP BY 1, 2),
    s AS (
        SELECT event_type, max(n) AS peak, sum(n) AS tot, count(*) AS n_hours
        FROM h GROUP BY event_type)
    SELECT event_type,
           CAST(peak AS BIGINT) AS peak_hour_events,
           CAST(tot AS BIGINT) AS total_events,
           CAST(n_hours AS BIGINT) AS n_active_hours,
           CAST((10000 * peak * n_hours) // tot AS BIGINT) AS burstiness_bp
    FROM s
    """,
    tags=("mining", "burstiness", "timeseries", "agg", "exact_arithmetic"),
    description=(
        "traffic burstiness: per event type the peak-hour load as a "
        "multiple of the mean hourly load (basis points; 10000 = "
        "perfectly flat) — the capacity-planning and anomaly signal "
        "behind autoscaling thresholds.  peak/mean is cross-"
        "multiplied (peak * n_hours / total) so it stays integer-"
        "exact; two nested map-side-combined aggregates, hour grid "
        "built by date_trunc on the scan"
    ),
)
def mine_burstiness(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    h = e.groupBy("event_type", F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count(F.lit(1)).alias("n")
    )
    s = h.groupBy("event_type").agg(
        F.max("n").alias("peak"),
        F.sum("n").alias("tot"),
        F.count(F.lit(1)).alias("n_hours"),
    )
    return s.select(
        "event_type",
        F.col("peak").cast("long").alias("peak_hour_events"),
        F.col("tot").cast("long").alias("total_events"),
        F.col("n_hours").cast("long").alias("n_active_hours"),
        F.expr("CAST((10000 * peak * n_hours) DIV tot AS BIGINT)").alias(
            "burstiness_bp"
        ),
    )


@register(
    "mine_sequence_pattern",
    """
    WITH s AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
                   AS seq
        FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(len(seq) AS BIGINT) AS seq_len,
           CAST(len(regexp_extract_all(seq, 'vcp')) AS BIGINT) AS n_vcp,
           CAST(len(regexp_extract_all(seq, 'vp')) AS BIGINT) AS n_vp
    FROM s
    WHERE len(regexp_extract_all(seq, 'vcp')) > 0
       OR len(regexp_extract_all(seq, 'vp')) > 0
    """,
    tags=("mining", "sequence", "pattern_match", "regex", "events"),
    description=(
        "sequence pattern mining (the MATCH_RECOGNIZE shape): each "
        "user's event history collapses to a compact symbol string "
        "(first letter per event, (ts, event_id) total order), then "
        "regex counting finds non-overlapping view->click->purchase "
        "and view->purchase runs — detecting ORDERED behavioral "
        "motifs that pure funnels (EXISTS-based, order-blind within "
        "step) cannot.  One groupBy(user) shuffle; the regex runs "
        "row-local on strings of avg-events-per-user length; both "
        "engines count non-overlapping left-to-right matches "
        "identically (verified: regexp_count == len(regexp_extract_all))"
    ),
)
def mine_sequence_pattern(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    s = e.groupBy("user_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(ts, event_id, "
            "substring(event_type, 1, 1) AS c))), x -> x.c), '')"
        ).alias("seq")
    )
    out = s.select(
        "user_id",
        F.length("seq").cast("long").alias("seq_len"),
        F.expr("CAST(regexp_count(seq, 'vcp') AS BIGINT)").alias("n_vcp"),
        F.expr("CAST(regexp_count(seq, 'vp') AS BIGINT)").alias("n_vp"),
    )
    return out.filter((F.col("n_vcp") > 0) | (F.col("n_vp") > 0))


@register(
    "mine_cohort_ltv_triangle",
    """
    WITH w AS (
        SELECT user_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk,
               event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events),
    cohort AS (SELECT user_id, min(wk) AS cw FROM w GROUP BY user_id)
    SELECT CAST(cohort.cw AS BIGINT) AS cohort_week,
           CAST(w.wk - cohort.cw AS BIGINT) AS age_weeks,
           CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_buyers,
           CAST(sum(w.cents) AS BIGINT) AS revenue_cents
    FROM w JOIN cohort USING (user_id)
    WHERE w.event_type = 'purchase'
    GROUP BY cohort.cw, w.wk - cohort.cw
    """,
    tags=("mining", "cohort", "ltv", "revenue", "exact_arithmetic"),
    description=(
        "cohort LTV triangle: users bucketed by first-seen week "
        "(epoch-day DIV 7 — engine-neutral), purchase revenue "
        "accumulated per (cohort, age) cell in exact cents with the "
        "distinct-buyer count — the lifetime-value table every "
        "growth model is fit on, and the revenue twin of the "
        "retention triangle.  The cohort map is a per-user min "
        "(map-side combined) joined back on the user key; one "
        "data-sized shuffle"
    ),
)
def mine_cohort_ltv_triangle(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    w = e.select(
        "user_id",
        F.expr("CAST(datediff(to_date(ts), DATE '1970-01-01') AS BIGINT) DIV 7").alias("wk"),
        "event_type",
        F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)").alias("cents"),
    )
    cohort = w.groupBy("user_id").agg(F.min("wk").alias("cw"))
    return (
        w.join(cohort, "user_id")
        .filter(F.col("event_type") == "purchase")
        .groupBy(
            F.col("cw").cast("long").alias("cohort_week"),
            (F.col("wk") - F.col("cw")).cast("long").alias("age_weeks"),
        )
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_buyers"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )


@register(
    "recsys_item_cosine",
    """
    WITH ui AS (
        SELECT DISTINCT o_custkey AS u, l_partkey AS i
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    deg AS (SELECT i, count(*) AS n FROM ui GROUP BY i),
    co AS (
        SELECT a.i AS i_a, b.i AS i_b, count(*) AS co
        FROM ui a JOIN ui b ON a.u = b.u AND a.i < b.i
        GROUP BY a.i, b.i HAVING count(*) >= 3)
    SELECT co.i_a, co.i_b,
           CAST(co.co AS BIGINT) AS n_co,
           CAST(da.n AS BIGINT) AS n_a,
           CAST(db.n AS BIGINT) AS n_b,
           CAST((10000 * co.co * co.co) // (da.n * db.n) AS BIGINT) AS cosine2_bp
    FROM co JOIN deg da ON da.i = co.i_a JOIN deg db ON db.i = co.i_b
    ORDER BY cosine2_bp DESC, i_a, i_b LIMIT 50
    """,
    tags=("recsys", "similarity", "cooccurrence", "exact_arithmetic"),
    description=(
        "item-item collaborative-filtering similarity: cosine over "
        "binary user-item vectors, reported as SQUARED cosine in "
        "basis points (co^2 / (n_a * n_b)) so the ranking is exact "
        "integer arithmetic — sqrt never enters, and the top-50 "
        "order is bit-stable across engines.  The min-support HAVING "
        "prunes the co-occurrence pair table before the degree "
        "join-back (Apriori-style), and the user-key self-join is "
        "the only data-sized shuffle — the classic scalable "
        "item-item recommender precompute"
    ),
)
def recsys_item_cosine(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), F.col("o_custkey").alias("u")
    )
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("i")
    )
    # ui feeds BOTH self-join sides and the degree table: without the
    # persist Spark recomputes scan+join+distinct three times (~9 of
    # the query's 12.7 s at sf0.1).  At cluster scale this is the
    # user-item table you materialize once and reuse.
    ui = pin_shared(o.join(li, "okey").select("u", "i").distinct(), tag="recsys_ui")
    deg = ui.groupBy("i").agg(F.count(F.lit(1)).alias("n"))
    co = (
        ui.alias("a")
        .join(ui.alias("b"), (F.col("a.u") == F.col("b.u")) & (F.col("a.i") < F.col("b.i")))
        .groupBy(F.col("a.i").alias("i_a"), F.col("b.i").alias("i_b"))
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= 3)
    )
    da = deg.select(F.col("i").alias("i_a"), F.col("n").alias("n_a"))
    db = deg.select(F.col("i").alias("i_b"), F.col("n").alias("n_b"))
    return (
        co.join(da, "i_a")
        .join(db, "i_b")
        .select(
            "i_a",
            "i_b",
            F.col("co").cast("long").alias("n_co"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.expr("CAST((10000 * co * co) DIV (n_a * n_b) AS BIGINT)").alias(
                "cosine2_bp"
            ),
        )
        .orderBy(F.desc("cosine2_bp"), "i_a", "i_b")
        .limit(50)
    )


@register(
    "mine_abc_classification",
    """
    WITH pr AS (
        SELECT l_partkey,
               sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS cents
        FROM lineitem GROUP BY l_partkey),
    r AS (
        SELECT l_partkey, cents,
               sum(cents) OVER (ORDER BY cents DESC, l_partkey
                                ROWS UNBOUNDED PRECEDING) AS cum,
               sum(cents) OVER () AS tot
        FROM pr),
    cls AS (
        SELECT l_partkey, cents,
               CASE WHEN 5 * cum <= 4 * tot THEN 'A'
                    WHEN 20 * cum <= 19 * tot THEN 'B'
                    ELSE 'C' END AS abc
        FROM r)
    SELECT abc,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           CAST((10000 * sum(cents)) // (SELECT sum(cents) FROM pr) AS BIGINT)
               AS revenue_share_bp
    FROM cls GROUP BY abc
    """,
    tags=("mining", "abc", "concentration", "exact_arithmetic"),
    description=(
        "ABC revenue classification (the inventory-management 80/15/5 "
        "split): parts ranked by exact-cent revenue, class boundaries "
        "as pure integer comparisons (5*cum <= 4*tot for A, "
        "20*cum <= 19*tot for A+B) over prefix sums — no percentage "
        "doubles, so class membership is bit-stable under ties "
        "(part-key tiebreak).  The ranking runs over the PART rollup "
        "(dimension-sized), never line items; the class summary is a "
        "3-row aggregate"
    ),
)
def mine_abc_classification(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.sum(F.expr("CAST(floor(l_extendedprice * 100 + 0.5D) AS BIGINT)")).alias(
            "cents"
        )
    )
    # the part rollup is dimension-sized but unbounded (hundreds of
    # millions of SKUs at 100 TB) — two-phase bucketed prefix sum,
    # grand total as a 1-row broadcast
    from sfs3_kinesis_spark.operators.scale import global_cumsum

    r = global_cumsum(
        pr, ["-cents", "l_partkey"], {"cents": "cum"}
    ).join(F.broadcast(pr.agg(F.sum("cents").alias("tot"))))
    cls = r.withColumn(
        "abc",
        F.when(5 * F.col("cum") <= 4 * F.col("tot"), "A")
        .when(20 * F.col("cum") <= 19 * F.col("tot"), "B")
        .otherwise("C"),
    )
    tot = pr.agg(F.sum("cents").alias("gt"))
    return (
        cls.groupBy("abc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .join(F.broadcast(tot))
        .select(
            "abc",
            "n_parts",
            "revenue_cents",
            F.expr("CAST((10000 * revenue_cents) DIV gt AS BIGINT)").alias(
                "revenue_share_bp"
            ),
        )
    )


@register(
    "agg_bitmap_audience_overlap",
    """
    WITH b AS (
      SELECT event_type,
             user_id // 62 AS bucket,
             bit_or(1::BIGINT << CAST(user_id % 62 AS INTEGER)) AS mask
      FROM events GROUP BY event_type, bucket),
    pair AS (
      SELECT a.event_type AS type_a, b2.event_type AS type_b,
             a.mask & b2.mask AS both_mask,
             a.mask AS a_mask
      FROM b a JOIN b b2
        ON a.bucket = b2.bucket AND a.event_type < b2.event_type)
    SELECT type_a, type_b,
           CAST(sum(bit_count(both_mask)) AS BIGINT) AS n_both,
           CAST((10000 * sum(bit_count(both_mask)))
                // sum(bit_count(a_mask)) AS BIGINT) AS overlap_of_a_bp
    FROM pair GROUP BY type_a, type_b
    """,
    tags=("agg", "bitmap", "audience_overlap", "set_intersection", "exact_arithmetic"),
    description=(
        "audience-overlap cardinality via bitmap intersection (the "
        "segment-overlap query every audience platform runs): per "
        "behavior pair, |users doing BOTH| computed as popcount of "
        "ANDed 62-key bucket masks — the intersection of two "
        "multi-million-member sets costs one equi-join on the bucket "
        "key over ONE int64 per 62 users per side, never a user-"
        "level join; exact by construction, with the overlap share "
        "of the first audience in basis points.  The mergeable-"
        "bitmap representation that makes set algebra (AND/OR/"
        "ANDNOT) on precomputed segments cheap at 100 TB"
    ),
)
def agg_bitmap_audience_overlap(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    b = e.groupBy("event_type", F.expr("user_id div 62").alias("bucket")).agg(
        F.expr("bit_or(shiftleft(1L, CAST(user_id % 62 AS INT)))").alias("mask")
    )
    a = b.select(
        F.col("event_type").alias("type_a"), "bucket", F.col("mask").alias("a_mask")
    )
    b2 = b.select(
        F.col("event_type").alias("type_b"), "bucket", F.col("mask").alias("b_mask")
    )
    pair = a.join(b2, "bucket").filter(F.col("type_a") < F.col("type_b"))
    return pair.groupBy("type_a", "type_b").agg(
        F.sum(F.expr("bit_count(a_mask & b_mask)")).cast("long").alias("n_both"),
        F.expr(
            "CAST((10000 * sum(bit_count(a_mask & b_mask)))"
            " DIV sum(bit_count(a_mask)) AS BIGINT)"
        ).alias("overlap_of_a_bp"),
    )


@register(
    "mine_trend_mann_kendall",
    """
    WITH d AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS di,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
        FROM events GROUP BY event_type, di),
    pairs AS (
        SELECT a.event_type,
               CASE WHEN b.cents > a.cents THEN 1
                    WHEN b.cents < a.cents THEN -1 ELSE 0 END AS sgn
        FROM d a JOIN d b
          ON a.event_type = b.event_type AND a.di < b.di)
    SELECT event_type,
           CAST(sum(sgn) AS BIGINT) AS s_statistic,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CASE WHEN sum(sgn) > 0 THEN 'up'
                WHEN sum(sgn) < 0 THEN 'down'
                ELSE 'flat' END AS trend
    FROM pairs GROUP BY event_type
    """,
    tags=("mining", "trend", "mann_kendall", "timeseries", "exact_arithmetic"),
    description=(
        "Mann-Kendall trend test, S statistic (the nonparametric "
        "monotone-trend detector — rank-based, so it needs NO "
        "distributional assumptions and stays integer-exact): sum of "
        "sign(x_j - x_i) over all ordered day pairs of the daily "
        "revenue series.  The pair join runs over the DAY rollup "
        "(|days|^2 per type, bounded by the observation window — 435 "
        "pairs for a month), never events; the significance z "
        "derives downstream from S and n"
    ),
)
def mine_trend_mann_kendall(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("di"),
    ).agg(F.sum(F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)")).alias("cents"))
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.di") < F.col("b.di")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.when(F.col("b.cents") > F.col("a.cents"), 1)
        .when(F.col("b.cents") < F.col("a.cents"), -1)
        .otherwise(0)
        .alias("sgn"),
    )
    return pairs.groupBy("event_type").agg(
        F.sum("sgn").cast("long").alias("s_statistic"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    ).select(
        "event_type",
        "s_statistic",
        "n_pairs",
        F.when(F.col("s_statistic") > 0, "up")
        .when(F.col("s_statistic") < 0, "down")
        .otherwise("flat")
        .alias("trend"),
    )


@register(
    "agg_hodges_lehmann",
    """
    WITH d AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS di,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
        FROM events GROUP BY event_type, di),
    walsh AS (
        SELECT a.event_type, a.cents + b.cents AS w
        FROM d a JOIN d b
          ON a.event_type = b.event_type AND a.di <= b.di),
    r AS (
        SELECT event_type, w,
               row_number() OVER (PARTITION BY event_type ORDER BY w) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM walsh)
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_walsh,
           CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN w END)
                + sum(CASE WHEN rn = (n + 2) // 2 THEN w END)
                AS BIGINT) AS hl_x4_cents
    FROM r GROUP BY event_type ORDER BY event_type
    """,
    tags=("agg", "robust_stats", "hodges_lehmann", "exact_arithmetic"),
    description=(
        "Hodges-Lehmann robust location estimator over the daily "
        "revenue series: the median of all pairwise Walsh averages "
        "(xi+xj)/2 — kept integer-exact by reporting 4x the "
        "estimator (the two middle-row picks of the PAIR-SUM "
        "multiset summed, each sum already 2x an average).  ~30% "
        "efficiency gain over the median against outliers without "
        "assuming symmetry-free contamination; the Walsh pair join "
        "runs over the |days|-per-type rollup (bounded by the "
        "window), and the median picks reuse the exact-median "
        "keyed-window shape"
    ),
)
def agg_hodges_lehmann(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("di"),
    ).agg(F.sum(F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)")).alias("cents"))
    a, b = d.alias("a"), d.alias("b")
    walsh = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.di") <= F.col("b.di")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (F.col("a.cents") + F.col("b.cents")).alias("w"),
    )
    wk = W.partitionBy("event_type").orderBy("w")
    wn = W.partitionBy("event_type")
    r = walsh.withColumn("rn", F.row_number().over(wk)).withColumn(
        "n", F.count("*").over(wn)
    )
    lo = F.col("rn") == F.expr("(n + 1) DIV 2")
    hi = F.col("rn") == F.expr("(n + 2) DIV 2")
    return (
        r.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_walsh"),
            (F.sum(F.when(lo, F.col("w"))) + F.sum(F.when(hi, F.col("w"))))
            .cast("long")
            .alias("hl_x4_cents"),
        )
        .orderBy("event_type")
    )


@register(
    "mine_wilcoxon_rank_sum",
    """
    WITH c AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
        WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL),
    r AS (
        SELECT is_a, cents,
               rank() OVER (ORDER BY cents) AS min_rank,
               count(*) OVER (PARTITION BY cents) AS ties
        FROM c)
    SELECT CAST(sum(is_a) AS BIGINT) AS n_a,
           CAST(count(*) - sum(is_a) AS BIGINT) AS n_b,
           CAST(sum(CASE WHEN is_a = 1 THEN 2 * min_rank + ties - 1 END)
                AS BIGINT) AS w2_a,
           CAST(sum(CASE WHEN is_a = 1 THEN 2 * min_rank + ties - 1 END)
                - sum(is_a) * (sum(is_a) + 1) AS BIGINT) AS u2_a
    FROM r
    """,
    tags=("mining", "nonparametric", "wilcoxon", "rank_test", "exact_arithmetic"),
    description=(
        "Wilcoxon rank-sum / Mann-Whitney U between the purchase and "
        "view value distributions, kept integer-exact by working in "
        "DOUBLED ranks: a tie group's doubled average rank is "
        "2*min_rank + ties - 1 (always an integer), so W and "
        "U = W - n(n+1)/2 carry no fractions and both engines agree "
        "bit-for-bit.  Observations collapse to the distinct-value "
        "rollup first (min_rank = cumulative ties - own ties + 1), "
        "then the two-phase bucketed global_cumsum — no fact-sized "
        "row ever crosses one window partition; the z significance "
        "derives downstream"
    ),
)
def mine_wilcoxon_rank_sum(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.scale import global_cumsum

    e = t_nonnull(spark, sf_dir, "events", "value")
    c = e.filter(F.col("event_type").isin("purchase", "view")).select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_a"),
        F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)").alias("cents"),
    )
    # ranking fact-sized observations through one window partition was
    # the r02 red flag — collapse to the distinct-value rollup first
    # (min_rank of value v = cumulative tie count through v minus its
    # own tie group plus 1), then a two-phase bucketed prefix sum;
    # each value contributes a_cnt copies of its doubled average rank
    g = c.groupBy("cents").agg(
        F.sum("is_a").alias("a_cnt"), F.count(F.lit(1)).alias("ties")
    )
    cum = global_cumsum(g, ["cents"], {"ties": "cum_ties"})
    r = cum.withColumn("min_rank", F.col("cum_ties") - F.col("ties") + 1)
    w2 = F.sum(F.col("a_cnt") * (2 * F.col("min_rank") + F.col("ties") - 1))
    na = F.sum("a_cnt")
    return r.agg(
        na.cast("long").alias("n_a"),
        (F.sum("ties") - F.sum("a_cnt")).cast("long").alias("n_b"),
        w2.cast("long").alias("w2_a"),
        (w2 - na * (na + 1)).cast("long").alias("u2_a"),
    )


@register(
    "mine_ks_two_sample",
    """
    WITH c AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
        WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL),
    g AS (
        SELECT cents, sum(is_a) AS a_cnt, count(*) - sum(is_a) AS b_cnt
        FROM c GROUP BY cents),
    cum AS (
        SELECT cents,
               sum(a_cnt) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS ca,
               sum(b_cnt) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cb,
               sum(a_cnt) OVER () AS na,
               sum(b_cnt) OVER () AS nb
        FROM g)
    SELECT CAST(max(na) AS BIGINT) AS n_a,
           CAST(max(nb) AS BIGINT) AS n_b,
           CAST(max(abs(ca * nb - cb * na)) AS BIGINT) AS d_numerator,
           CAST((10000 * max(abs(ca * nb - cb * na))) // (max(na) * max(nb))
                AS BIGINT) AS ks_d_bp
    FROM cum
    """,
    tags=("mining", "ks_test", "distribution_distance", "drift", "exact_arithmetic"),
    description=(
        "two-sample Kolmogorov-Smirnov D between the purchase and "
        "view value distributions: max ECDF gap cross-multiplied to "
        "the integer |cumA*nB - cumB*nA| (max over the distinct-value "
        "cut points, where the sup is always attained), reported with "
        "its exact numerator and in basis points — the classic "
        "distribution-drift test with zero doubles.  One value-key "
        "aggregate then prefix sums over |distinct values| rows; "
        "bigint bound holds to ~sqrt(2^63) rows per side "
        "(DECIMAL(38,0) is the swap past ~3e9 x 3e9)"
    ),
)
def mine_ks_two_sample(spark: SparkSession, sf_dir: str):
    e = t_nonnull(spark, sf_dir, "events", "value")
    c = e.filter(F.col("event_type").isin("purchase", "view")).select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_a"),
        F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)").alias("cents"),
    )
    g = c.groupBy("cents").agg(
        F.sum("is_a").alias("a_cnt"),
        (F.count(F.lit(1)) - F.sum("is_a")).alias("b_cnt"),
    )
    # |distinct cents| is value-domain-sized (unbounded) — two-phase
    # bucketed prefix sums for both ECDFs, totals as 1-row broadcast
    from sfs3_kinesis_spark.operators.scale import global_cumsum

    tots = g.agg(F.sum("a_cnt").alias("na"), F.sum("b_cnt").alias("nb"))
    cum = global_cumsum(g, ["cents"], {"a_cnt": "ca", "b_cnt": "cb"}).join(
        F.broadcast(tots)
    )
    gap = F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))
    return cum.agg(
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
        F.max(gap).cast("long").alias("d_numerator"),
        F.expr(
            "CAST((10000 * max(abs(ca * nb - cb * na))) DIV (max(na) * max(nb))"
            " AS BIGINT)"
        ).alias("ks_d_bp"),
    )


@register(
    "mine_spearman_daily_rho",
    """
    WITH d AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS di,
               sum(CASE WHEN event_type = 'purchase'
                        THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END) AS a,
               sum(CASE WHEN event_type = 'click'
                        THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END) AS b
        FROM events GROUP BY di
        HAVING a IS NOT NULL AND b IS NOT NULL),
    r AS (
        SELECT di,
               2 * rank() OVER (ORDER BY a)
                 + count(*) OVER (PARTITION BY a) - 1 AS ra2,
               2 * rank() OVER (ORDER BY b)
                 + count(*) OVER (PARTITION BY b) - 1 AS rb2
        FROM d)
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum((ra2 - rb2) * (ra2 - rb2)) AS BIGINT) AS sum_d2_x4,
           CAST(10000 - (15000 * sum((ra2 - rb2) * (ra2 - rb2)))
                // (count(*) * (count(*) * count(*) - 1)) AS BIGINT)
               AS spearman_rho_bp
    FROM r
    """,
    tags=("mining", "correlation", "spearman", "nonparametric", "exact_arithmetic"),
    description=(
        "Spearman rank correlation between daily purchase and click "
        "revenue, integer-exact end to end: tie-aware DOUBLED average "
        "ranks (2*min_rank + ties - 1), squared rank gaps carry the "
        "4x factor, and rho = 1 - 6*sum(d^2)/(n(n^2-1)) becomes "
        "10000 - (15000 * sum_d2_x4) // (n(n^2-1)) in truncating "
        "basis points — the monotone-association readout with no "
        "doubles.  Day-rollup sized; completes the nonparametric "
        "family (Mann-Kendall, Wilcoxon, Hodges-Lehmann, KS)"
    ),
)
def mine_spearman_daily_rho(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    d = (
        e.groupBy(F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("di"))
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)"),
                )
            ).alias("a"),
            F.sum(
                F.when(
                    F.col("event_type") == "click",
                    F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)"),
                )
            ).alias("b"),
        )
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    )
    r = d.select(
        (2 * F.rank().over(W.orderBy("a")) + F.count("*").over(W.partitionBy("a")) - 1).alias("ra2"),
        (2 * F.rank().over(W.orderBy("b")) + F.count("*").over(W.partitionBy("b")) - 1).alias("rb2"),
    )
    d2 = (F.col("ra2") - F.col("rb2")) * (F.col("ra2") - F.col("rb2"))
    return r.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(d2).cast("long").alias("sum_d2_x4"),
        F.expr(
            "CAST(10000 - (15000 * sum((ra2 - rb2) * (ra2 - rb2)))"
            " DIV (count(1) * (count(1) * count(1) - 1)) AS BIGINT)"
        ).alias("spearman_rho_bp"),
    )


@register(
    "quality_join_fanout_audit",
    """
    WITH l AS (SELECT o_orderkey AS k, count(*) AS n FROM orders GROUP BY k),
    r AS (SELECT l_orderkey AS k, count(*) AS n FROM lineitem GROUP BY k),
    j AS (
        SELECT coalesce(l.k, r.k) AS k,
               coalesce(l.n, 0) AS ln_, coalesce(r.n, 0) AS rn_
        FROM l FULL OUTER JOIN r ON l.k = r.k)
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(ln_) AS BIGINT) AS max_left_per_key,
           CAST(max(rn_) AS BIGINT) AS max_right_per_key,
           CAST(max(ln_ * rn_) AS BIGINT) AS max_pairs_per_key,
           CAST(sum(ln_ * rn_) AS BIGINT) AS join_output_rows,
           CAST(count(*) FILTER (WHERE ln_ > 1 AND rn_ > 1) AS BIGINT)
               AS n_many_to_many_keys,
           CAST(count(*) FILTER (WHERE ln_ = 0 OR rn_ = 0) AS BIGINT)
               AS n_unmatched_keys
    FROM j
    """,
    tags=("quality", "join_audit", "cardinality", "data_ops", "exact_arithmetic"),
    description=(
        "join fan-out audit (the pre-join safety check that catches "
        "accidental many-to-many explosions BEFORE a 100 TB join "
        "runs): per-key multiplicities on both sides of the "
        "orders-lineitem key, the exact join output size "
        "(sum of per-key products — computable from two key-rollups "
        "without performing the join), the worst single-key fan-out, "
        "many-to-many key count, and unmatched keys.  Two map-side-"
        "combined rollups + a key-aligned full-outer merge; this is "
        "also how a planner would detect skew before choosing a "
        "salted strategy"
    ),
)
def quality_join_fanout_audit(spark: SparkSession, sf_dir: str):
    l = t(spark, sf_dir, "orders").groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("ln_")
    )
    r = t(spark, sf_dir, "lineitem").groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("rn_")
    )
    j = l.join(r, "k", "full_outer").select(
        F.coalesce("ln_", F.lit(0)).alias("ln_"),
        F.coalesce("rn_", F.lit(0)).alias("rn_"),
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("ln_").cast("long").alias("max_left_per_key"),
        F.max("rn_").cast("long").alias("max_right_per_key"),
        F.max(F.col("ln_") * F.col("rn_")).cast("long").alias("max_pairs_per_key"),
        F.sum(F.col("ln_") * F.col("rn_")).cast("long").alias("join_output_rows"),
        F.count(F.when((F.col("ln_") > 1) & (F.col("rn_") > 1), 1))
        .cast("long")
        .alias("n_many_to_many_keys"),
        F.count(F.when((F.col("ln_") == 0) | (F.col("rn_") == 0), 1))
        .cast("long")
        .alias("n_unmatched_keys"),
    )


@register(
    "mine_cusum_drift",
    """
    WITH d AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS di,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
        FROM events GROUP BY event_type, di),
    m AS (
        SELECT event_type, count(*) AS nd, sum(cents) AS total
        FROM d GROUP BY event_type),
    dev AS (
        SELECT d.event_type, d.di,
               m.nd * d.cents - m.total AS dev_scaled, m.total
        FROM d JOIN m USING (event_type)),
    pre AS (
        SELECT event_type, di, total,
               sum(dev_scaled) OVER (PARTITION BY event_type ORDER BY di
                                     ROWS UNBOUNDED PRECEDING) AS p
        FROM dev),
    cus AS (
        SELECT event_type, di, total, p,
               least(0, min(p) OVER (PARTITION BY event_type ORDER BY di
                                     ROWS UNBOUNDED PRECEDING)) AS mn
        FROM pre)
    SELECT event_type, CAST(di AS BIGINT) AS day,
           CAST(p - mn AS BIGINT) AS cusum_scaled,
           CAST(CASE WHEN p - mn > abs(total) THEN 1 ELSE 0 END AS BIGINT)
               AS alarm
    FROM cus
    """,
    tags=("mining", "cusum", "drift", "change_detection", "window", "exact_arithmetic"),
    description=(
        "one-sided CUSUM drift detector over daily revenue: the "
        "sequential recurrence S_i = max(0, S_{i-1} + dev_i) has the "
        "closed form prefix_i - min(0, running-min of prefixes), so "
        "the 'unparallelizable' control chart becomes two keyed "
        "window passes sharing one partitioning — fully distributed "
        "and exact.  Deviations are mean-centered without division "
        "(nd*x - total, the cross-multiplied form); the alarm fires "
        "when the scaled CUSUM exceeds |total| (= nd * the mean "
        "daily value, one full average day of accumulated drift)"
    ),
)
def mine_cusum_drift(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("di"),
    ).agg(F.sum(F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)")).alias("cents"))
    m = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nd"), F.sum("cents").alias("total")
    )
    dev = d.join(F.broadcast(m), "event_type").select(
        "event_type",
        "di",
        (F.col("nd") * F.col("cents") - F.col("total")).alias("dev_scaled"),
        "total",
    )
    wo = W.partitionBy("event_type").orderBy("di").rowsBetween(W.unboundedPreceding, 0)
    pre = dev.withColumn("p", F.sum("dev_scaled").over(wo))
    cus = pre.withColumn("mn", F.least(F.lit(0), F.min("p").over(wo)))
    return cus.select(
        "event_type",
        F.col("di").cast("long").alias("day"),
        (F.col("p") - F.col("mn")).cast("long").alias("cusum_scaled"),
        F.when(F.col("p") - F.col("mn") > F.abs(F.col("total")), 1)
        .otherwise(0)
        .cast("long")
        .alias("alarm"),
    )


@register(
    "agg_quantile_sketch_audit",
    None,  # self-auditing: sketch vs exact inside one plan, rows-only
    tags=("agg", "approx", "sketch", "percentile", "audit"),
    description=(
        "quantile-sketch accuracy self-audit (the third member of the "
        "audit family, with similarity_ivf_recall_audit and "
        "dedup_lsh_recall_audit): per order priority, "
        "approx_percentile's p50/p90/p99 against the EXACT "
        "nearest-rank percentiles from one keyed window pass, error "
        "reported in basis points of the exact value — the number an "
        "operator checks before trusting a sketch tier at 100 TB, "
        "where only the sketch is affordable but a validation slice "
        "can still run the exact tier.  Both tiers share the same "
        "scan; the exact side shuffles once on the group key"
    ),
)
def agg_quantile_sketch_audit(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5D) AS BIGINT)").alias("cents"),
    )
    # exact tier on the distinct-value rollup (see agg_median_exact):
    # value-domain-bounded window input
    g = o.groupBy("o_orderpriority", "cents").agg(F.count(F.lit(1)).alias("cnt"))
    tot = g.groupBy("o_orderpriority").agg(F.sum("cnt").alias("n"))
    wc = (
        W.partitionBy("o_orderpriority")
        .orderBy("cents")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    r = g.withColumn("cum", F.sum("cnt").over(wc)).join(
        F.broadcast(tot), "o_orderpriority"
    )
    exact = r.groupBy("o_orderpriority").agg(
        *[
            F.min(
                F.when(F.col("cum") >= F.expr(f"(n * {p} + 99) div 100"), F.col("cents"))
            ).alias(f"exact_p{p}")
            for p in (50, 90, 99)
        ]
    )
    approx = o.groupBy("o_orderpriority").agg(
        *[
            F.approx_percentile("cents", F.lit(p / 100)).alias(f"approx_p{p}")
            for p in (50, 90, 99)
        ]
    )
    out = exact.join(approx, "o_orderpriority")
    for p in (50, 90, 99):
        out = out.withColumn(
            f"err_p{p}_bp",
            F.expr(
                f"CAST(abs(approx_p{p} - exact_p{p}) * 10000 DIV exact_p{p} AS BIGINT)"
            ),
        )
    return out.orderBy("o_orderpriority")


@register(
    "agg_kmv_distinct_audit",
    """
    WITH h AS (
        SELECT DISTINCT event_type,
               ((user_id % 2147483648) * 1103515245 + 12345)
                 % 2147483648 AS h
        FROM events),
    r AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM h),
    s AS (
        SELECT event_type, max(h) AS mk, count(*) AS n_kept
        FROM r WHERE rn <= 256 GROUP BY event_type),
    x AS (
        SELECT event_type, count(DISTINCT user_id) AS exact_distinct
        FROM events GROUP BY event_type),
    est AS (
        SELECT s.event_type,
               CAST(CASE WHEN s.n_kept < 256 THEN s.n_kept
                    ELSE (255 * 2147483648) // GREATEST(s.mk, 1) END
                    AS BIGINT) AS kmv_estimate,
               CAST(x.exact_distinct AS BIGINT) AS exact_distinct
        FROM s JOIN x ON s.event_type = x.event_type)
    SELECT event_type, kmv_estimate, exact_distinct,
           CAST(10000 * ABS(kmv_estimate - exact_distinct)
                // exact_distinct AS BIGINT) AS err_bp
    FROM est
    """,
    tags=("agg", "sketch", "kmv", "distinct", "audit", "exact_arithmetic"),
    description=(
        "KMV (k-minimum-values) distinct-count sketch with an exact "
        "audit: hash every user to a 31-bit value with an integer LCG "
        "both engines compute bit-identically, keep the 256 smallest "
        "distinct hashes per event_type (two-phase salted top-k — no "
        "per-key global sort), and estimate D = (k-1)*2^31 / h_(k).  "
        "Unlike HLL the KMV synopsis supports set INTERSECTION "
        "estimation (see agg_kmv_intersection_audit), and unlike the "
        "exact bitmap family its size is O(k) regardless of the ID "
        "domain — the sketch a 100 TB pipeline ships between stages "
        "when IDs are sparse 64-bit values.  Deterministic end to "
        "end, so the audit (error in basis points vs the exact "
        "distinct count) is oracle-exact"
    ),
)
def agg_kmv_distinct_audit(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.scale import salted_window_topk

    K, M = 256, 2147483648
    e = t(spark, sf_dir, "events")
    h = e.select(
        "event_type",
        (((F.col("user_id") % M) * F.lit(1103515245) + F.lit(12345)) % M).alias("h"),
    ).distinct()
    topk = salted_window_topk(h, "event_type", [F.col("h").asc()], k=K)
    sketch = topk.groupBy("event_type").agg(
        F.max("h").alias("mk"), F.count("*").alias("n_kept")
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    est = sketch.join(exact, "event_type").select(
        "event_type",
        F.expr(
            f"CAST(CASE WHEN n_kept < {K} THEN n_kept"
            f" ELSE ({K - 1}L * {M}L) DIV GREATEST(mk, 1L) END AS BIGINT)"
        ).alias("kmv_estimate"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
    )
    return est.withColumn(
        "err_bp",
        F.expr(
            "CAST(10000 * ABS(kmv_estimate - exact_distinct)"
            " DIV exact_distinct AS BIGINT)"
        ),
    )


@register(
    "agg_kmv_intersection_audit",
    """
    WITH h AS (
        SELECT DISTINCT event_type,
               ((user_id % 2147483648) * 1103515245 + 12345)
                 % 2147483648 AS h
        FROM events),
    r AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM h),
    sk AS (SELECT event_type, h FROM r WHERE rn <= 256),
    pairrows AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b, u.h,
               max(CASE WHEN u.event_type = a.event_type THEN 1 ELSE 0 END) AS in_a,
               max(CASE WHEN u.event_type = b.event_type THEN 1 ELSE 0 END) AS in_b
        FROM (SELECT DISTINCT event_type FROM sk) a
        JOIN (SELECT DISTINCT event_type FROM sk) b ON a.event_type < b.event_type
        JOIN sk u ON u.event_type IN (a.event_type, b.event_type)
        GROUP BY a.event_type, b.event_type, u.h),
    ranked AS (
        SELECT type_a, type_b, h, in_a * in_b AS in_both,
               row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
        FROM pairrows),
    u AS (
        SELECT type_a, type_b, max(h) AS mk, count(*) AS n_kept,
               sum(in_both) AS k_cap
        FROM ranked WHERE rn <= 256 GROUP BY type_a, type_b),
    est AS (
        SELECT type_a, type_b,
               CAST(CASE WHEN n_kept < 256 THEN k_cap
                    ELSE (k_cap * ((255 * 2147483648) // GREATEST(mk, 1)))
                         // 256 END AS BIGINT) AS kmv_intersection
        FROM u),
    ex AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS exact_intersection
        FROM (SELECT DISTINCT event_type, user_id FROM events) a
        JOIN (SELECT DISTINCT event_type, user_id FROM events) b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type)
    SELECT ex.type_a, ex.type_b, est.kmv_intersection,
           CAST(ex.exact_intersection AS BIGINT) AS exact_intersection,
           CAST(10000 * ABS(est.kmv_intersection - ex.exact_intersection)
                // ex.exact_intersection AS BIGINT) AS err_bp
    FROM ex JOIN est
      ON ex.type_a = est.type_a AND ex.type_b = est.type_b
    """,
    tags=("agg", "sketch", "kmv", "set_intersection", "audit", "exact_arithmetic"),
    description=(
        "KMV set-INTERSECTION estimate per event-type pair, audited "
        "against the exact user-level intersection: combine the two "
        "256-hash synopses, rank the union's 256 smallest, count how "
        "many live in BOTH sketches (k_cap) and scale the union "
        "estimate by k_cap/k.  This is the estimator HLL cannot "
        "provide (HLL unions losslessly but intersects only via "
        "error-amplifying inclusion-exclusion) and the exact bitmap "
        "family cannot afford on sparse 64-bit ID domains.  The pair "
        "algebra runs over k-row synopses — bounded driver-free "
        "state — while the exact audit tier is an equi-join on "
        "user_id; deterministic LCG hashing keeps it oracle-exact"
    ),
)
def agg_kmv_intersection_audit(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.scale import salted_window_topk

    K, M = 256, 2147483648
    e = t(spark, sf_dir, "events")
    h = e.select(
        "event_type",
        (((F.col("user_id") % M) * F.lit(1103515245) + F.lit(12345)) % M).alias("h"),
    ).distinct()
    sk = salted_window_topk(h, "event_type", [F.col("h").asc()], k=K).select(
        "event_type", "h"
    )
    types = sk.select("event_type").distinct()
    pairs = (
        types.alias("a")
        .join(
            types.alias("b"),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
    )
    # each synopsis is <= K rows; replicating per pair stays bounded
    # (|types|^2 * K rows).  Two broadcast EQUI-joins (one per pair
    # side) instead of one OR-condition nested-loop join — same rows,
    # but the probe stays a hash lookup however many types exist
    side_a = F.broadcast(pairs).join(
        sk.select(F.col("event_type").alias("type_a"), "h"), "type_a"
    ).select("type_a", "type_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    side_b = F.broadcast(pairs).join(
        sk.select(F.col("event_type").alias("type_b"), "h"), "type_b"
    ).select("type_a", "type_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    pairrows = side_a.unionByName(side_b).groupBy("type_a", "type_b", "h").agg(
        F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")
    )
    wr = W.partitionBy("type_a", "type_b").orderBy("h")
    ranked = pairrows.withColumn("rn", F.row_number().over(wr)).filter(
        F.col("rn") <= K
    )
    u = ranked.groupBy("type_a", "type_b").agg(
        F.max("h").alias("mk"),
        F.count("*").alias("n_kept"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("k_cap"),
    )
    est = u.select(
        "type_a",
        "type_b",
        F.expr(
            f"CAST(CASE WHEN n_kept < {K} THEN k_cap"
            f" ELSE (k_cap * (({K - 1}L * {M}L) DIV GREATEST(mk, 1L)))"
            f" DIV {K} END AS BIGINT)"
        ).alias("kmv_intersection"),
    )
    du = e.select("event_type", "user_id").distinct()
    ex = (
        du.alias("a")
        .join(
            du.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").cast("long").alias("exact_intersection"))
    )
    return ex.join(est, ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        "kmv_intersection",
        "exact_intersection",
        F.expr(
            "CAST(10000 * ABS(kmv_intersection - exact_intersection)"
            " DIV exact_intersection AS BIGINT)"
        ).alias("err_bp"),
    )


@register(
    "recsys_item_item_topk",
    """
    WITH ui AS (
        SELECT DISTINCT o_custkey AS u, l_partkey AS i
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    deg AS (SELECT i, count(*) AS n FROM ui GROUP BY i),
    co AS (
        SELECT a.i AS i_a, b.i AS i_b, count(*) AS co
        FROM ui a JOIN ui b ON a.u = b.u AND a.i < b.i
        GROUP BY a.i, b.i HAVING count(*) >= 3),
    bi AS (
        SELECT i_a AS item, i_b AS partner, co FROM co
        UNION ALL
        SELECT i_b AS item, i_a AS partner, co FROM co),
    scored AS (
        SELECT bi.item AS item, bi.partner AS partner, bi.co AS co,
               (10000 * bi.co * bi.co) // (di.n * dp.n) AS cosine2_bp
        FROM bi JOIN deg di ON di.i = bi.item
                JOIN deg dp ON dp.i = bi.partner),
    ranked AS (
        SELECT item, partner, co, cosine2_bp,
               row_number() OVER (PARTITION BY item
                   ORDER BY cosine2_bp DESC, partner) AS rnk
        FROM scored)
    SELECT CAST(item AS BIGINT) AS item_id,
           CAST(rnk AS BIGINT) AS rnk,
           CAST(partner AS BIGINT) AS partner_id,
           CAST(co AS BIGINT) AS n_co,
           CAST(cosine2_bp AS BIGINT) AS cosine2_bp
    FROM ranked WHERE rnk <= 5
    """,
    tags=("recsys", "topk", "window", "cooccurrence", "exact_arithmetic"),
    description=(
        "item-item recommender SERVING table: each item's top-5 "
        "co-purchase neighbors by exact squared-cosine basis points "
        "((cosine2_bp DESC, partner) total order — ties bit-stable), "
        "the precomputed lookup an online recommender reads at "
        "request time.  Builds on recsys_item_cosine's pair table "
        "(min-support 3), doubled to both directions so every item "
        "owns its list; the per-item ranking runs through "
        "salted_window_topk (operators/scale.py) — a viral item with "
        "millions of neighbors spreads over (item, salt) reducers in "
        "phase 1, never one reducer holding a hot item's whole "
        "candidate list (the oracle keeps the textbook single "
        "window; identical results)"
    ),
)
def recsys_item_item_topk(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.scale import salted_window_topk

    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), F.col("o_custkey").alias("u")
    )
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("i")
    )
    # ui is read three times (both self-join sides + degrees) and co
    # twice (the bidirectional union) — persist both or the whole
    # pair pipeline runs twice end-to-end.
    ui = pin_shared(o.join(li, "okey").select("u", "i").distinct(), tag="recsys_ui")
    deg = ui.groupBy("i").agg(F.count(F.lit(1)).alias("n"))
    a, b = ui.alias("a"), ui.alias("b")
    co = (
        a.join(b, (F.col("a.u") == F.col("b.u")) & (F.col("a.i") < F.col("b.i")))
        .groupBy(F.col("a.i").alias("i_a"), F.col("b.i").alias("i_b"))
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= 3)
    )
    co = pin_shared(co, tag="recsys_co")
    bi = co.select(
        F.col("i_a").alias("item"), F.col("i_b").alias("partner"), "co"
    ).unionAll(
        co.select(
            F.col("i_b").alias("item"), F.col("i_a").alias("partner"), "co"
        )
    )
    di = deg.select(F.col("i").alias("item"), F.col("n").alias("ni"))
    dp = deg.select(F.col("i").alias("partner"), F.col("n").alias("np"))
    scored = (
        bi.join(di, "item")
        .join(dp, "partner")
        .select(
            "item",
            "partner",
            "co",
            F.expr("(10000 * co * co) DIV (ni * np)").alias("cosine2_bp"),
        )
    )
    topk = salted_window_topk(
        scored,
        "item",
        [F.desc("cosine2_bp"), F.asc("partner")],
        k=5,
        salt_on="partner",
    )
    return topk.select(
        F.col("item").cast("long").alias("item_id"),
        F.col("rnk").cast("long").alias("rnk"),
        F.col("partner").cast("long").alias("partner_id"),
        F.col("co").cast("long").alias("n_co"),
        F.col("cosine2_bp").cast("long").alias("cosine2_bp"),
    )


@register(
    "mine_cramers_v",
    """
    WITH cell AS (
        SELECT lang, source, CAST(count(*) AS HUGEINT) AS o
        FROM documents GROUP BY lang, source),
    rm AS (SELECT lang, CAST(sum(o) AS HUGEINT) AS r FROM cell GROUP BY lang),
    cm AS (SELECT source, CAST(sum(o) AS HUGEINT) AS c FROM cell GROUP BY source),
    tot AS (SELECT CAST(sum(o) AS HUGEINT) AS n,
                   count(DISTINCT lang) AS nl,
                   count(DISTINCT source) AS ns
            FROM cell),
    terms AS (
        SELECT (10000 * n * o * o) // (r * c) AS term
        FROM cell JOIN rm USING (lang) JOIN cm USING (source), tot),
    chi AS (
        SELECT CAST(greatest(sum(term) - 10000 * (SELECT n FROM tot), 0)
                    AS BIGINT) AS chi2_bp
        FROM terms)
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(nl AS BIGINT) AS n_langs,
           CAST(ns AS BIGINT) AS n_sources,
           chi2_bp,
           CAST(CASE WHEN least(nl - 1, ns - 1) <= 0 THEN 0
                ELSE chi2_bp // (n * least(nl - 1, ns - 1)) END AS BIGINT)
               AS v2_bp
    FROM chi, tot
    """,
    tags=("mining", "association", "chi2", "cramers_v", "exact_arithmetic"),
    description=(
        "Cramér's V (squared, basis points) between the lang and "
        "source dimensions — the bounded [0,1] association strength "
        "data auditors use to detect leaky correlations between "
        "corpus dimensions (a language that only comes from one "
        "crawl source is a sampling hazard).  chi2 uses the "
        "n*(sum o^2/(r*c) - 1) form so only NON-EMPTY cells "
        "contribute (no dense cell enumeration at scale); each cell "
        "term floors in x10000 fixed point with DECIMAL(38,0)/"
        "HUGEINT partials (10000*n*o^2 wraps int64 beyond ~100k "
        "docs), making the statistic a defined deterministic integer "
        "variant both engines compute bit-identically; per-cell "
        "flooring can push an independence-level chi2 a hair below "
        "zero, so it clamps at 0 before the non-negative V^2 "
        "division.  Work reduces to the (lang x source) contingency "
        "rollup immediately — map-side combine, then cell-count-"
        "sized joins"
    ),
)
def mine_cramers_v(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    cell = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("o")
    )
    rm = cell.groupBy("lang").agg(F.sum("o").cast("decimal(38,0)").alias("r"))
    cm = cell.groupBy("source").agg(F.sum("o").cast("decimal(38,0)").alias("c"))
    tot = cell.agg(
        F.sum("o").cast("decimal(38,0)").alias("n"),
        F.countDistinct("lang").alias("nl"),
        F.countDistinct("source").alias("ns"),
    )
    terms = (
        cell.join(rm, "lang")
        .join(cm, "source")
        .crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                "CAST(10000 AS DECIMAL(38,0)) * n * o * o div (r * c)"
            ).alias("term"),
            "n",
            "nl",
            "ns",
        )
    )
    chi = terms.groupBy("n", "nl", "ns").agg(
        F.expr(
            "CAST(greatest(sum(term) - CAST(10000 AS DECIMAL(38,0)) * n, 0) "
            "AS BIGINT)"
        ).alias("chi2_bp")
    )
    return chi.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("nl").cast("long").alias("n_langs"),
        F.col("ns").cast("long").alias("n_sources"),
        "chi2_bp",
        F.expr(
            "CAST(CASE WHEN least(nl - 1, ns - 1) <= 0 THEN 0 "
            "ELSE chi2_bp DIV (CAST(n AS BIGINT) * least(nl - 1, ns - 1)) "
            "END AS BIGINT)"
        ).alias("v2_bp"),
    )
