"""Temporal-join query corpus: as-of join, big-big interval (range)
join, and multi-resolution (hypertable-style) rollup.

The reference has no join family at all (SURVEY.md §2.4); these are
the engine's green-field temporal operators
(:mod:`sfs3_kinesis_spark.operators.temporal`), each validated
value-exactly against DuckDB (which ships native ASOF JOIN — a
strong independent oracle for our union+window implementation).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from sfs3_kinesis_spark.operators.temporal import asof_join, interval_join_bucketed
from sfs3_kinesis_spark.plans.core import register, t, t_nonnull


@register(
    "join_asof_purchase_click",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts, round(max(value), 4) AS click_value
               FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
    SELECT p.event_id, p.user_id,
           c.ts       AS click_ts,
           c.click_value
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("join", "asof"),
    description=(
        "backward as-of join: each purchase gets the user's latest prior "
        "click (union+window impl vs DuckDB native ASOF JOIN oracle)"
    ),
)
def join_asof_purchase_click(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    # right side deduped per (user, ts) so <=-ties are deterministic
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 4).alias("click_value"))
        .select("user_id", "ts", F.col("ts").alias("click_ts"), "click_value")
    )
    return asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        payload_cols=["click_ts", "click_value"],
    ).select("event_id", "user_id", "click_ts", "click_value")


@register(
    "join_asof_tolerance",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts, round(max(value), 4) AS click_value
               FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
    SELECT p.event_id, p.user_id,
           CASE WHEN c.ts >= p.ts - INTERVAL 30 MINUTE THEN c.ts END AS click_ts,
           CASE WHEN c.ts >= p.ts - INTERVAL 30 MINUTE THEN c.click_value END
               AS click_value
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("join", "asof", "tolerance"),
    description=(
        "bounded-staleness as-of join (pandas merge_asof(tolerance) "
        "parity): each purchase gets the user's latest prior click "
        "ONLY if it is at most 30 minutes old — the guard that stops "
        "a point-in-time feature join from silently attaching stale "
        "state.  The bound is a row-local integer-microsecond check "
        "on the carried match timestamp AFTER the one keyed "
        "union+window shuffle (plan shape unchanged); DuckDB native "
        "ASOF JOIN + CASE is the independent oracle"
    ),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 4).alias("click_value"))
        .select("user_id", "ts", F.col("ts").alias("click_ts"), "click_value")
    )
    return asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        payload_cols=["click_ts", "click_value"],
        tolerance_s=1800,
    ).select("event_id", "user_id", "click_ts", "click_value")


@register(
    "join_asof_forward_op",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts, round(max(value), 4) AS ship_value
               FROM events WHERE event_type = 'signup' GROUP BY user_id, ts)
    SELECT p.event_id, p.user_id,
           c.ts AS next_ts,
           c.ship_value
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts
    """,
    tags=("join", "asof", "forward"),
    description=(
        "forward as-of join as a reusable OPERATOR "
        "(operators/temporal.py:asof_join_forward — union + one keyed "
        "window with a following frame, pandas merge_asof(forward) "
        "parity property-tested): each purchase gets the user's "
        "earliest signup-event at-or-after it; DuckDB native forward "
        "ASOF JOIN (l.ts <= r.ts) is the independent oracle"
    ),
)
def join_asof_forward_op(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.temporal import asof_join_forward

    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    signups = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 4).alias("ship_value"))
        .select("user_id", "ts", F.col("ts").alias("next_ts"), "ship_value")
    )
    return asof_join_forward(
        purchases,
        signups,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        payload_cols=["next_ts", "ship_value"],
    ).select("event_id", "user_id", "next_ts", "ship_value")


@register(
    "join_range_hot_hours",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS sv_cents
      FROM events GROUP BY 1),
    ranked AS (
      SELECT h, row_number() OVER (ORDER BY sv_cents DESC, h) AS rnk,
             count(*) OVER () AS n_hours
      FROM hourly),
    hot AS (
      SELECT h AS h_start, h + INTERVAL 1 HOUR AS h_end
      FROM ranked WHERE rnk <= (n_hours + 9) // 10)
    SELECT e.event_id, h_start
    FROM events e JOIN hot ON e.ts >= h_start AND e.ts < h_end
    """,
    tags=("join", "range"),
    description=(
        "big-big point-in-interval join (events in the busiest 10% of "
        "hours), bucketed equi-join impl — hot set is rank-relative "
        "(exact-cents load, total (load, hour) tie order) so the "
        "selectivity is identical at every scale factor; the ranking "
        "window runs over |hours| pre-aggregated rows, never facts"
    ),
)
def join_range_hot_hours(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    # exact integer load per hour (float sums rank-tie differently
    # across engines); hot = busiest 10% of hours — rank-relative, so
    # the selectivity survives any scale factor (a fixed multiple of
    # the mean selects nothing once per-hour load flattens out)
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.expr("sum(CAST(floor(value * 100 + 0.5D) AS BIGINT))").alias("sv_cents")
    )
    ranked = hourly.select(
        "h",
        F.row_number().over(W.orderBy(F.desc("sv_cents"), "h")).alias("rnk"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n_hours"),
    )
    hot = ranked.filter(F.col("rnk") <= F.expr("(n_hours + 9) div 10")).select(
        F.col("h").alias("h_start"),
        (F.col("h") + F.expr("INTERVAL 1 HOUR")).alias("h_end"),
    )
    joined = interval_join_bucketed(
        e.select("event_id", "ts"),
        hot,
        point_ts="ts",
        start_ts="h_start",
        end_ts="h_end",
        bucket="1 hour",
    )
    return joined.select("event_id", "h_start")


@register(
    "events_multires_rollup",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP)  AS day_start,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
           count(*)                                  AS n,
           round(sum(value), 2)                      AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((day_start), (day_start, hour_start))
    """,
    tags=("agg", "rollup", "hypertable"),
    description=(
        "hypertable-style multi-resolution rollup: hourly + daily "
        "aggregates in ONE scan via grouping sets (continuous-aggregate "
        "pattern; at scale this materializes the downsample hierarchy "
        "without re-reading the raw table per resolution)"
    ),
)
def events_multires_rollup(spark: SparkSession, sf_dir: str):
    t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return t(spark, sf_dir, "events").sparkSession.sql(
        """
        SELECT date_trunc('day', ts)  AS day_start,
               date_trunc('hour', ts) AS hour_start,
               count(*)               AS n,
               round(sum(value), 2)   AS sum_value
        FROM events
        GROUP BY GROUPING SETS ((date_trunc('day', ts)),
                                (date_trunc('day', ts), date_trunc('hour', ts)))
        """
    )


@register(
    "events_ohlc_bars",
    """
    WITH c AS (
      SELECT event_type,
             (epoch_us(ts) // 3600000000) * 3600 AS hour_s,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '#' ||
                 lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord_key
      FROM events WHERE value IS NOT NULL)
    SELECT event_type, hour_s,
           arg_min(cents, ord_key) AS open_cents,
           max(cents)              AS high_cents,
           min(cents)              AS low_cents,
           arg_max(cents, ord_key) AS close_cents,
           count(*)                AS n_trades
    FROM c
    GROUP BY event_type, hour_s
    """,
    tags=("agg", "ohlc", "hypertable", "argmax", "events"),
    description=(
        "hourly OHLC candlestick bars per event type (the hypertable "
        "downsample every metrics store materializes): open/close via "
        "min_by/max_by over a fixed-width (epoch_us, event_id) key so "
        "intra-hour ties have a total order, high/low as plain min/max "
        "— ONE partial+final aggregate pass, values in exact cents"
    ),
)
def events_ohlc_bars(spark: SparkSession, sf_dir: str):
    e = t_nonnull(spark, sf_dir, "events", "value")
    c = e.select(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000 * 3600").alias("hour_s"),
        F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)").alias("cents"),
        F.concat(
            F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
            F.lit("#"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ).alias("ord_key"),
    )
    return c.groupBy("event_type", "hour_s").agg(
        F.min_by("cents", "ord_key").alias("open_cents"),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.max_by("cents", "ord_key").alias("close_cents"),
        F.count(F.lit(1)).alias("n_trades"),
    )


@register(
    "join_asof_forward",
    """
    WITH u AS (
      SELECT user_id, event_id,
             epoch_us(ts) // 1000000 AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
      FROM events WHERE event_type IN ('click', 'purchase')),
    nxt AS (
      SELECT *,
             min(CASE WHEN is_p = 1
                      THEN s * 100000000 + event_id END)
               OVER (PARTITION BY user_id ORDER BY s
                     RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS p_key
      FROM u)
    SELECT user_id, event_id AS click_id,
           p_key // 100000000       AS purchase_s,
           p_key % 100000000        AS purchase_id,
           p_key // 100000000 - s   AS wait_s
    FROM nxt WHERE is_p = 0
    """,
    tags=("join", "asof", "forward", "window"),
    description=(
        "forward as-of join: each click matched to the user's NEXT "
        "purchase strictly after it (earliest by (ts, event_id), "
        "encoded into one bigint key so the argmin is a plain window "
        "min) — implemented as a union + RANGE-frame window over the "
        "merged stream, ONE shuffle on the user key, cost independent "
        "of the time gap; unmatched clicks survive with NULLs.  The "
        "time-reversed twin of the backward as-of operator "
        "(operators/temporal.py:asof_join)"
    ),
)
def join_asof_forward(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    u = e.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "event_id",
        F.expr("unix_micros(ts) div 1000000").alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_p"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("s")
        .rangeBetween(1, W.unboundedFollowing)
    )
    p_key = F.min(
        F.when(F.col("is_p") == 1, F.col("s") * 100000000 + F.col("event_id"))
    ).over(w)
    return (
        u.withColumn("p_key", p_key)
        .filter(F.col("is_p") == 0)
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            # integer floor-div: the key is ~1e17, past double's 2^53
            # exact range, so a float division here would corrupt ids
            F.expr("p_key div 100000000").alias("purchase_s"),
            (F.col("p_key") % 100000000).alias("purchase_id"),
            F.expr("p_key div 100000000 - s").alias("wait_s"),
        )
    )


@register(
    "join_asof_nearest",
    """
    WITH p AS (
        SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us
        FROM events WHERE event_type = 'purchase'),
    c AS (
        SELECT user_id, event_id AS c_id, epoch_us(ts) AS c_us
        FROM events WHERE event_type = 'click'),
    cand AS (
        SELECT p.user_id, p.p_id, p.p_us, c.c_id, c.c_us,
               abs(c.c_us - p.p_us) AS agap,
               CASE WHEN c.c_us <= p.p_us THEN 0 ELSE 1 END AS is_next,
               row_number() OVER (
                   PARTITION BY p.p_id
                   ORDER BY abs(c.c_us - p.p_us),
                            CASE WHEN c.c_us <= p.p_us THEN 0 ELSE 1 END,
                            CASE WHEN c.c_us <= p.p_us THEN -c.c_id ELSE c.c_id END
               ) AS rn
        FROM p JOIN c ON p.user_id = c.user_id)
    SELECT p.user_id, p.p_id AS purchase_id,
           CAST(p.p_us AS BIGINT) AS purchase_us,
           cand.c_id AS click_id,
           CAST(cand.c_us - p.p_us AS BIGINT) AS gap_us,
           CASE WHEN cand.c_id IS NULL THEN 'none'
                WHEN cand.is_next = 1 THEN 'next' ELSE 'prior' END AS direction
    FROM p LEFT JOIN (SELECT * FROM cand WHERE rn = 1) cand ON p.p_id = cand.p_id
    """,
    tags=("join", "asof", "nearest", "window", "streaming_semantics"),
    description=(
        "nearest as-of join (the two-sided completion of the "
        "backward/forward family): each purchase matched to the "
        "user's click with the SMALLEST absolute time gap, prior "
        "winning exact-gap ties; unmatched purchases survive with "
        "NULLs.  ONE shuffle on the user key: the merged stream "
        "carries both a trailing last() and a leading first() window "
        "over the same partitioning, then a row-local argmin picks "
        "the closer side — cost independent of the gap width, where "
        "the oracle's per-user join blows up as |purchases| x "
        "|clicks|.  Tie policy pinned: equal-timestamp clicks are "
        "visible to the backward side only (<= vs strict >)"
    ),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events").filter(F.col("event_type").isin("purchase", "click"))
    m = e.select(
        "user_id",
        F.expr("unix_micros(ts)").alias("us"),
        "event_id",
        # clicks (side 0) order before purchases (side 1) at equal ts:
        # the trailing frame sees same-instant clicks, the leading
        # frame (strictly after the current ROW) does not
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("side"),
        F.when(
            F.col("event_type") == "click", F.struct("us", "event_id")
        ).alias("c"),
    )
    w = W.partitionBy("user_id").orderBy("us", "side", "event_id")
    prior = F.last("c", ignorenulls=True).over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    nxt = F.first("c", ignorenulls=True).over(w.rowsBetween(1, W.unboundedFollowing))
    tagged = m.withColumn("prior", prior).withColumn("nxt", nxt)
    p = tagged.filter(F.col("side") == 1)
    pick = F.expr(
        "CASE WHEN prior IS NULL AND nxt IS NULL THEN NULL "
        "WHEN nxt IS NULL THEN named_struct('s', prior, 'd', 'prior') "
        "WHEN prior IS NULL THEN named_struct('s', nxt, 'd', 'next') "
        "WHEN us - prior.us <= nxt.us - us THEN named_struct('s', prior, 'd', 'prior') "
        "ELSE named_struct('s', nxt, 'd', 'next') END"
    )
    return p.withColumn("m", pick).select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("us").cast("long").alias("purchase_us"),
        F.col("m.s.event_id").alias("click_id"),
        (F.col("m.s.us") - F.col("us")).cast("long").alias("gap_us"),
        F.coalesce(F.col("m.d"), F.lit("none")).alias("direction"),
    )


@register(
    "join_interval_overlap",
    """
    WITH s AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                     OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
    g AS (
        SELECT user_id, us,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM s),
    sess AS (
        SELECT user_id, sid, min(us) AS a_start,
               max(us) + 1800000000 AS a_end
        FROM g GROUP BY user_id, sid),
    hrs AS (
        SELECT (epoch_us(ts) // 3600000000) AS hour, count(*) AS n
        FROM events GROUP BY hour),
    hot AS (
        SELECT hour, hour * 3600000000 AS b_start,
               (hour + 1) * 3600000000 AS b_end
        FROM hrs ORDER BY n DESC, hour LIMIT 20)
    SELECT hot.hour AS hour,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(least(a_end, b_end) - greatest(a_start, b_start)) AS BIGINT)
               AS overlap_us
    FROM sess JOIN hot ON a_start < b_end AND b_start < a_end
    GROUP BY hot.hour ORDER BY hot.hour
    """,
    tags=("join", "interval", "overlap", "range", "session", "events"),
    description=(
        "interval-overlap join (interval x interval, completing the "
        "point-in-interval range family): user sessions [first event, "
        "last event + 30 min) overlapped against the 20 busiest "
        "hours, reporting per-hour overlapping-session count and "
        "exact overlapped microseconds.  Spark explodes each session "
        "to the hour buckets it covers (sequence + explode — bounded "
        "by session length) and equi-joins on the bucket against the "
        "broadcast hot set, so the theta join Catalyst would plan as "
        "a nested loop never exists; the oracle runs the textbook "
        "a.start < b.end AND b.start < a.end join, which must agree"
    ),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    s = e.select("user_id", F.expr("unix_micros(ts)").alias("us"), "event_id").withColumn(
        "is_new",
        F.when(
            F.lag("us").over(w).isNull() | ((F.col("us") - F.lag("us").over(w)) >= 1_800_000_000),
            1,
        ).otherwise(0),
    )
    g = s.withColumn("sid", F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, 0)))
    sess = g.groupBy("user_id", "sid").agg(
        F.min("us").alias("a_start"), (F.max("us") + 1_800_000_000).alias("a_end")
    )
    hrs = e.groupBy(F.expr("unix_micros(ts) div 3600000000").alias("hour")).agg(
        F.count(F.lit(1)).alias("n")
    )
    hot = (
        hrs.orderBy(F.desc("n"), "hour")
        .limit(20)
        .select(
            "hour",
            (F.col("hour") * 3_600_000_000).alias("b_start"),
            ((F.col("hour") + 1) * 3_600_000_000).alias("b_end"),
        )
    )
    # explode sessions to covered hour buckets; equi-join kills the theta
    covered = sess.select(
        "a_start",
        "a_end",
        F.explode(
            F.expr("sequence(a_start div 3600000000, (a_end - 1) div 3600000000)")
        ).alias("hour"),
    )
    return (
        covered.join(F.broadcast(hot), "hour")
        .groupBy("hour")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum(
                F.least("a_end", "b_end") - F.greatest("a_start", "b_start")
            ).cast("long").alias("overlap_us"),
        )
        .orderBy("hour")
    )


#: the query pattern for subsequence similarity search: a 7-day
#: up-trend (scaled units are irrelevant — Pearson correlation is
#: shift/scale invariant, which is the point of z-normalization)
_TSS_Q = [1, 2, 3, 4, 5, 6, 7]
_TSS_M = len(_TSS_Q)
_TSS_SY = sum(_TSS_Q)
_TSS_SYY = sum(v * v for v in _TSS_Q)
_TSS_DB = _TSS_M * _TSS_SYY - _TSS_SY * _TSS_SY  # query variance term


def _tss_oracle() -> str:
    m = _TSS_M
    xs = ", ".join(
        f"lead(cents, {i}) OVER (PARTITION BY user_id ORDER BY d) AS x{i}"
        for i in range(m)
    )
    dd = f"lead(d, {m - 1}) OVER (PARTITION BY user_id ORDER BY d)"
    sx = " + ".join(f"x{i}" for i in range(m))
    sxx = " + ".join(f"x{i} * x{i}" for i in range(m))
    sxy = " + ".join(f"{_TSS_Q[i]} * x{i}" for i in range(m))
    return f"""
    WITH daily AS (
        SELECT user_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS HUGEINT)
                   AS cents
        FROM events GROUP BY user_id, d),
    w AS (
        SELECT user_id, d AS start_day, {xs}, {dd} AS d_end
        FROM daily),
    f AS (
        SELECT user_id, start_day,
               CAST({sx} AS HUGEINT) AS sx,
               CAST({sxx} AS HUGEINT) AS sxx,
               CAST({sxy} AS HUGEINT) AS sxy
        FROM w WHERE x{m - 1} IS NOT NULL AND d_end = start_day + {m - 1}),
    s AS (
        SELECT user_id, start_day,
               {m} * sxy - sx * {_TSS_SY} AS nd,
               {m} * sxx - sx * sx AS da
        FROM f)
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(start_day AS BIGINT) AS start_day,
           CAST(CASE WHEN da = 0 THEN 0
                     WHEN nd >= 0 THEN (10000 * nd * nd) // (da * {_TSS_DB})
                     ELSE -((10000 * nd * nd) // (da * {_TSS_DB})) END
                AS BIGINT) AS corr2_bp
    FROM s
    ORDER BY corr2_bp DESC, user_id, start_day LIMIT 20
    """


@register(
    "ts_similarity_znorm_topk",
    _tss_oracle(),
    tags=("timeseries", "similarity", "znorm", "window", "exact_arithmetic", "topk"),
    description=(
        "z-normalized time-series subsequence search (the distributed "
        "form of the streaming similarity-search workload in the "
        "retrieved EDBT'19 paper): find the 20 per-user 7-day daily-"
        "revenue windows most correlated with a query pattern.  "
        "Z-normalized Euclidean distance is a monotone transform of "
        "Pearson correlation (d^2 = 2m(1 - r)), and SIGNED r^2 in "
        "basis points — sign(nd) * 10000*nd^2 // (da*db) with "
        "nd = m*Sxy - Sx*Sy, da = m*Sxx - Sx^2 — ranks windows "
        "identically to r while staying pure integer (HUGEINT / "
        "DECIMAL(38,0) internally; nd^2 reaches ~1e27), so both "
        "engines produce the identical top-k with zero float ops.  "
        "Plan: daily rollup (one shuffle), m-1 LEADs over one keyed "
        "window (consecutive-day windows only — the d_end guard "
        "rejects gapped windows), row-local scoring, "
        "TakeOrderedAndProject top-20.  No self-join, no explode: "
        "cost is O(series length), the scalable sliding-window shape"
    ),
)
def ts_similarity_znorm_topk(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window as W

    m = _TSS_M
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("d")
    ).agg(
        F.sum(F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)"))
        .cast("decimal(38,0)")
        .alias("cents")
    )
    wk = W.partitionBy("user_id").orderBy("d")
    w = daily.select(
        "user_id",
        F.col("d").alias("start_day"),
        *[F.lead("cents", i).over(wk).alias(f"x{i}") for i in range(m)],
        F.lead("d", m - 1).over(wk).alias("d_end"),
    )
    sx = " + ".join(f"x{i}" for i in range(m))
    sxx = " + ".join(f"x{i} * x{i}" for i in range(m))
    sxy = " + ".join(f"{_TSS_Q[i]} * x{i}" for i in range(m))
    f = w.filter(
        F.col(f"x{m - 1}").isNotNull()
        & (F.col("d_end") == F.col("start_day") + (m - 1))
    ).select(
        "user_id",
        "start_day",
        F.expr(f"CAST({sx} AS DECIMAL(38,0))").alias("sx"),
        F.expr(f"CAST({sxx} AS DECIMAL(38,0))").alias("sxx"),
        F.expr(f"CAST({sxy} AS DECIMAL(38,0))").alias("sxy"),
    )
    s = f.select(
        "user_id",
        "start_day",
        F.expr(f"CAST({m} * sxy - sx * {_TSS_SY} AS DECIMAL(38,0))").alias("nd"),
        F.expr(f"CAST({m} * sxx - sx * sx AS DECIMAL(38,0))").alias("da"),
    )
    scored = s.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("start_day").cast("long").alias("start_day"),
        F.expr(
            f"CAST(CASE WHEN da = 0 THEN 0 "
            f"WHEN nd >= 0 THEN (10000 * nd * nd) DIV (da * {_TSS_DB}) "
            f"ELSE -((10000 * nd * nd) DIV (da * {_TSS_DB})) END AS BIGINT)"
        ).alias("corr2_bp"),
    )
    return scored.orderBy(F.desc("corr2_bp"), "user_id", "start_day").limit(20)


#: truncated EWMA kernel: alpha = 1/4, weights (3/4)^k for lags
#: k = 0..7, scaled to integers as 3^k * 4^(7-k) (all sum magnitudes
#: stay far inside BIGINT)
EWMA_LAGS = 8


def _ewma_terms() -> tuple[str, str]:
    """Kernel terms weighted by CALENDAR day distance, not row lag:
    the weight of a contribution is (3/4)^gap where gap = day -
    lag(day, k) — a day with no events must decay the history by the
    days that actually passed, not by rollup-row count (the row-lag
    form over-weighted stale history for sparse event types).  Gaps
    are strictly increasing in k over the (type, day) rollup, so
    k = 0..7 row-lags cover every row within the 7-day kernel; a
    NULL lag or a gap > 7 falls to the CASE's ELSE 0.  One text,
    both engines."""
    weights = [3**g * 4 ** (EWMA_LAGS - 1 - g) for g in range(EWMA_LAGS)]
    arms = " ".join(f"WHEN {g} THEN {w}" for g, w in enumerate(weights))
    num, den = [], []
    for k in range(EWMA_LAGS):
        over = "OVER (PARTITION BY event_type ORDER BY day)"
        wexpr = f"CASE day - lag(day, {k}) {over} {arms} ELSE 0 END"
        num.append(f"coalesce(lag(cents, {k}) {over}, 0) * ({wexpr})")
        den.append(f"({wexpr})")
    return " + ".join(num), " + ".join(den)


def _ewma_oracle() -> str:
    num, den = _ewma_terms()
    return f"""
    WITH d AS (
        SELECT event_type,
               (epoch_us(ts) // 1000000) // 86400 AS day,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
        FROM events GROUP BY event_type, day),
    s AS (
        SELECT event_type, day, cents,
               {num} AS num,
               {den} AS den
        FROM d)
    SELECT event_type, CAST(day AS BIGINT) AS day,
           CAST(cents AS BIGINT) AS cents,
           CAST(num // den AS BIGINT) AS ewma_cents
    FROM s
    """


@register(
    "events_ewma_smoothed",
    _ewma_oracle(),
    tags=("events", "timeseries", "ewma", "smoothing", "exact_arithmetic"),
    description=(
        "exponentially-weighted moving average of daily revenue per "
        "event type (alpha=1/4), EXACT: the geometric kernel weights "
        "each contribution by (3/4)^gap on the CALENDAR day axis "
        "(gap = day difference, integer weights 3^g * 4^(7-g), CASE "
        "lookup — a missing day decays history by the days that "
        "actually passed, not by rollup-row count), truncated at %d "
        "days; the smoothed value is a pure integer dot product over "
        "one keyed window — no recursive state, no float drift, "
        "series boundaries and gaps renormalize by the weight mass "
        "actually present.  The recurrence s_t = a*x_t + (1-a)*s_(t-1) "
        "is inherently sequential; truncation converts it to a "
        "fixed-depth window over the |types| x |days| ROLLUP — the "
        "smoothing shape that scales, with tail error (3/4)^8 < 11 "
        "percent of weight mass, stated not hidden"
        % EWMA_LAGS
    ),
)
def events_ewma_smoothed(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type",
        F.expr("(unix_micros(ts) div 1000000) div 86400").alias("day"),
    ).agg(F.expr("sum(CAST(floor(value * 100 + 0.5D) AS BIGINT))").alias("cents"))
    num, den = _ewma_terms()
    s = d.select(
        "event_type",
        "day",
        "cents",
        F.expr(num).alias("num"),
        F.expr(den).alias("den"),
    )
    return s.select(
        "event_type",
        F.col("day").cast("long").alias("day"),
        F.col("cents").cast("long").alias("cents"),
        F.expr("CAST(num div den AS BIGINT)").alias("ewma_cents"),
    )
