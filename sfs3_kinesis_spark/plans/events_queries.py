"""Event-stream query corpus — batch-expressible forms of the
engine's streaming semantics (SURVEY.md §2.10), validated against
the DuckDB oracle over the ``events`` fixture.

Each of these has a true streaming twin in
``sfs3_kinesis_spark.streaming`` (tumbling/sliding windows,
sessionization, the request<->event correlation state machine); the
batch forms pin down the *semantics* so the streaming versions can
be tested against them.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sfs3_kinesis_spark.plans.core import register, t, t_nonnull

SESSION_GAP_S = 6 * 3600  # 6 h gap closes a session (fixture cadence)


@register(
    "scalar_json_events",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
    tags=("scalar", "json"),
    description="JSON extraction (reference T11 serde, aprocess.js:24,36)",
)
def scalar_json_events(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id", F.get_json_object("props", "$.k").cast("long").alias("k_val")
    )


@register(
    "scalar_map_props",
    """
    SELECT event_id,
           CAST(len(json_keys(props)) AS INTEGER)         AS n_keys,
           CAST(props->>'$.k' AS BIGINT)                  AS k_val,
           CASE WHEN json_extract(props, '$.k') IS NOT NULL THEN TRUE ELSE FALSE END AS has_k,
           CASE WHEN json_extract(props, '$.missing') IS NOT NULL THEN TRUE ELSE FALSE END AS has_missing
    FROM events
    """,
    tags=("scalar", "map"),
    description="map function family over JSON props (from_json to MAP, keys/lookup/contains)",
)
def scalar_map_props(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return e.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        m.getItem("k").alias("k_val"),
        F.map_contains_key(m, "k").alias("has_k"),
        F.map_contains_key(m, "missing").alias("has_missing"),
    )


@register(
    "events_tumbling_hourly",
    """
    SELECT date_trunc('hour', ts)     AS window_start,
           event_type,
           count(*)                   AS n,
           round(sum(value), 2)       AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("window_agg", "streaming_semantics"),
    description="tumbling 1h window count/sum by event_type (reference A1, dashboard.yml:26)",
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


@register(
    "events_sliding_2h",
    """
    SELECT window_start, count(*) AS n,
           CAST(floor(round(sum(value), 2) / count(*) * 10000) AS BIGINT) AS avg_value_e4
    FROM (
      SELECT unnest([date_trunc('hour', ts),
                     date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS window_start,
             value
      FROM events)
    GROUP BY window_start
    """,
    tags=("window_agg", "streaming_semantics"),
    description="sliding window (2h length, 1h slide): each event lands in 2 windows (reference A2)",
)
def events_sliding_2h(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        # fixed-point avg from the pre-rounded sum: a rounded average
        # lands on decimal-tie boundaries (sum/n makes .xxx5 values
        # common), and tie behavior differs between engines — floor on
        # an identical double is deterministic
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.floor(F.round(F.sum("value"), 2) / F.count(F.lit(1)) * 10000)
            .cast("long")
            .alias("avg_value_e4"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "avg_value_e4")
    )


@register(
    "events_lag_lead",
    """
    SELECT user_id, event_id,
           round(value, 4) AS value,
           round(value - lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS delta_prev,
           round(lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) - value, 4) AS delta_next
    FROM events
    """,
    tags=("window", "streaming_semantics"),
    description="lag/lead per key in event-time order (per-key ordering, reference W7)",
)
def events_lag_lead(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.round("value", 4).alias("value"),
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta_prev"),
        F.round(F.lead("value").over(w) - F.col("value"), 4).alias("delta_next"),
    )


@register(
    "events_sessionization",
    f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR date_diff('second',
                                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                                 ts) > {SESSION_GAP_S}
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    sessions AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events, min(ts) AS session_start, max(ts) AS session_end
    FROM sessions GROUP BY user_id, session_id
    """,
    tags=("window", "session", "streaming_semantics"),
    description="gap-based sessionization (batch twin of session_window, reference W4)",
)
def events_sessionization(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = e.withColumn(
        "is_new", F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0)
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, 0)).cast("long")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "events_user_gap_stats",
    """
    WITH g AS (
      SELECT user_id,
             date_diff('microsecond',
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       ts) AS gap
      FROM events)
    SELECT user_id,
           count(gap)                 AS n_gaps,
           CAST(sum(gap) AS BIGINT)   AS sum_gap_us,
           CAST(max(gap) AS BIGINT)   AS max_gap_us
    FROM g WHERE gap IS NOT NULL
    GROUP BY user_id
    """,
    tags=("pandas_udf", "grouped", "streaming_semantics"),
    description=(
        "applyInPandas grouped custom logic (per-user inter-event gaps in "
        "microseconds) — the Arrow grouped-map tier, value-verified exactly"
    ),
)
def events_user_gap_stats(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.grouped import user_gap_stats

    return user_gap_stats(t(spark, sf_dir, "events"))


@register(
    "agg_approx_quantiles",
    None,  # t-digest style sketch — engine-specific values, rows-only
    tags=("agg", "approx", "sketch"),
    description="approx_percentile sketch (p50/p90/p99 per priority)",
)
def agg_approx_quantiles(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_percentile("o_totalprice", F.lit(0.5)).alias("p50"),
        F.approx_percentile("o_totalprice", F.lit(0.9)).alias("p90"),
        F.approx_percentile("o_totalprice", F.lit(0.99)).alias("p99"),
    )


@register(
    "correlate_join_form",
    """
    WITH req AS (
      SELECT CAST(user_id AS VARCHAR) AS txn_id, min(ts) AS submitted_at
      FROM events WHERE event_type = 'signup' GROUP BY user_id),
    ev AS (
      SELECT CAST(user_id AS VARCHAR) AS txn_id,
             CASE WHEN event_type = 'purchase' THEN 'SUCCEEDED' ELSE 'FAILED' END AS status,
             ts AS event_time
      FROM events WHERE event_type IN ('purchase', 'error'))
    SELECT r.txn_id, e.status,
           CASE WHEN e.status = 'SUCCEEDED' THEN 200 ELSE 400 END AS http_code,
           CAST(date_diff('millisecond', r.submitted_at, e.event_time) AS BIGINT) AS latency_ms
    FROM req r JOIN ev e
      ON r.txn_id = e.txn_id
     AND e.event_time >= r.submitted_at
     AND e.event_time <= r.submitted_at + INTERVAL 72 HOUR
    """,
    tags=("join", "correlation", "streaming_semantics"),
    description=(
        "join-form correlation (streaming/join.py:correlate_join — the "
        "declarative stream-stream twin of the T12 state machine; batch "
        "mode runs the identical plan)"
    ),
)
def correlate_join_form(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.streaming.join import correlate_join

    e = t(spark, sf_dir, "events")
    req = (
        e.filter(F.col("event_type") == "signup")
        .groupBy(F.col("user_id").cast("string").alias("txn_id"))
        .agg(F.min("ts").alias("submitted_at"))
    )
    ev = e.filter(F.col("event_type").isin("purchase", "error")).select(
        F.col("user_id").cast("string").alias("txn_id"),
        F.when(F.col("event_type") == "purchase", "SUCCEEDED").otherwise("FAILED").alias("status"),
        F.col("ts").alias("event_time"),
    )
    return correlate_join(req, ev, within="72 hours")


@register(
    "correlate_requests_events",
    """
    WITH req AS (
      SELECT user_id, min(ts) AS submitted_at
      FROM events WHERE event_type = 'signup' GROUP BY user_id),
    m AS (
      SELECT r.user_id, r.submitted_at, min(e.ts) AS completed_at
      FROM req r
      LEFT JOIN events e
        ON e.user_id = r.user_id
       AND e.event_type = 'purchase'
       AND e.ts >= r.submitted_at
       AND e.ts <= r.submitted_at + INTERVAL 72 HOUR
      GROUP BY r.user_id, r.submitted_at)
    SELECT user_id,
           CASE WHEN completed_at IS NULL THEN 'timeout' ELSE 'matched' END AS outcome,
           CAST(CASE WHEN completed_at IS NULL THEN NULL
                     ELSE date_diff('second', submitted_at, completed_at) END AS BIGINT) AS latency_s
    FROM m
    """,
    tags=("join", "correlation", "streaming_semantics"),
    description=(
        "batch twin of the request<->event correlation state machine "
        "(reference T12/J1, svckinesis.js:173-185): request row + first "
        "completion within the timeout window => matched, else timeout"
    ),
)
def correlate_requests_events(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    req = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("submitted_at"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", F.col("ts").alias("pts"))
    joined = req.join(
        purchases,
        (req.user_id == purchases.user_id)
        & (purchases.pts >= req.submitted_at)
        & (purchases.pts <= req.submitted_at + F.expr("INTERVAL 72 HOURS")),
        "left",
    ).groupBy(req.user_id.alias("user_id"), "submitted_at").agg(F.min("pts").alias("completed_at"))
    return joined.select(
        "user_id",
        F.when(F.col("completed_at").isNull(), "timeout").otherwise("matched").alias("outcome"),
        F.when(
            F.col("completed_at").isNotNull(),
            F.unix_timestamp("completed_at") - F.unix_timestamp("submitted_at"),
        )
        .cast("long")
        .alias("latency_s"),
    )


@register(
    "agg_modal_event_type",
    """
    WITH c AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY user_id, event_type),
    r AS (
      SELECT user_id, event_type, n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type) AS rn
      FROM c)
    SELECT user_id,
           event_type       AS modal_event_type,
           CAST(n AS BIGINT) AS n_events
    FROM r WHERE rn = 1
    """,
    tags=("agg", "mode", "window"),
    description=(
        "deterministic mode: most frequent event_type per user — "
        "count + windowed argmax with a total tie-break (the built-in "
        "mode() is tie-nondeterministic in both engines, so this is "
        "the portable form)"
    ),
)
def agg_modal_event_type(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("modal_event_type"),
            F.col("n").cast("long").alias("n_events"),
        )
    )


@register(
    "events_gapfill_locf",
    """
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             count(*) AS n, round(sum(value), 2) AS v
      FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, min(hr) AS lo, max(hr) AS hi FROM h GROUP BY 1),
    grid AS (
      SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
      FROM b)
    SELECT g.event_type,
           g.hr                            AS hour_start,
           CAST(coalesce(h.n, 0) AS BIGINT) AS n_events,
           last_value(h.v IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.hr
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_value_locf
    FROM grid g LEFT JOIN h ON h.event_type = g.event_type AND h.hr = g.hr
    """,
    tags=("window_agg", "hypertable", "gapfill"),
    description=(
        "time-series gap fill: dense per-type hourly grid (sequence + "
        "explode — generated, never materialized as input) left-joined "
        "to the rollup, missing counts filled with 0 and values carried "
        "forward (LOCF) — the continuous-aggregate read path of a "
        "hypertable"
    ),
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    h = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
    )
    grid = (
        h.groupBy("event_type")
        .agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
        .select(
            "event_type",
            F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hr"),
        )
    )
    w = (
        W.partitionBy(grid.event_type)
        .orderBy(grid.hr)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        grid.join(h, ["event_type", "hr"], "left")
        .select(
            "event_type",
            F.col("hr").alias("hour_start"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
            F.last("v", ignorenulls=True).over(w).alias("sum_value_locf"),
        )
    )


@register(
    "window_running_distinct",
    """
    WITH f AS (
      SELECT user_id, event_id, ts,
             CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS is_first
      FROM events)
    SELECT user_id, event_id,
           CAST(sum(is_first) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS distinct_types_so_far
    FROM f
    """,
    tags=("window", "distinct", "streaming_semantics"),
    description=(
        "running COUNT DISTINCT per key without set state: first-seen "
        "flag (row_number = 1 over key+value) summed over the event-time "
        "window — O(1) state per row where collect_set would hold the "
        "whole distinct set in every window frame"
    ),
)
def window_running_distinct(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    w_first = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        e.withColumn(
            "is_first", F.when(F.row_number().over(w_first) == 1, 1).otherwise(0)
        )
        .select(
            "user_id",
            "event_id",
            F.sum("is_first").over(w_run).cast("long").alias("distinct_types_so_far"),
        )
    )


@register(
    "scalar_variant_props",
    """
    SELECT event_type,
           sum(CAST(json_extract(props, '$.k') AS BIGINT))  AS sum_k,
           count(*) FILTER (WHERE CAST(json_extract(props, '$.k') AS BIGINT) > 50)
               AS n_big
    FROM events
    GROUP BY event_type
    """,
    tags=("scalar", "json", "variant"),
    description=(
        "semi-structured access via Spark 4 VariantType: parse_json "
        "once into the binary Variant encoding, then typed variant_get "
        "paths — at scale this replaces per-access string re-parsing "
        "(get_json_object) with a single decode; the oracle reads the "
        "same paths with DuckDB json_extract"
    ),
)
def scalar_variant_props(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events").withColumn("pv", F.parse_json("props"))
    k = F.variant_get("pv", "$.k", "bigint")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.sum(F.when(k > 50, 1).otherwise(0)).alias("n_big"),
    )


@register(
    "window_range_interval_frame",
    """
    SELECT CAST(user_id AS BIGINT) AS user_id, ts,
           CAST(count(*) OVER w AS BIGINT) AS n_24h,
           round(sum(value) OVER w, 2)     AS v_24h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "frame", "range_interval", "streaming_semantics"),
    description=(
        "time-range window frame (RANGE BETWEEN INTERVAL 24 HOURS "
        "PRECEDING): trailing per-user rolling count/sum — the batch "
        "twin of a sliding stream aggregation, evaluated as one "
        "partition-by-user window with a time-bounded frame, no "
        "self-join against time buckets; both engines accumulate the "
        "frame in ts order so the rounded sums agree"
    ),
)
def window_range_interval_frame(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    e.createOrReplaceTempView("_ev_range_frame")
    return spark.sql(
        """
        SELECT CAST(user_id AS BIGINT) AS user_id, ts,
               CAST(count(*) OVER w AS BIGINT) AS n_24h,
               round(sum(value) OVER w, 2)     AS v_24h
        FROM _ev_range_frame
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)
        """
    )


@register(
    "agg_winsorized_values",
    """
    WITH q AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS lo,
               quantile_cont(value, 0.95) AS hi
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           count(*) FILTER (WHERE value < lo OR value > hi) AS n_clipped,
           round(avg(CASE WHEN value < lo THEN lo
                          WHEN value > hi THEN hi ELSE value END), 4)
               AS winsorized_mean,
           round(avg(value), 4) AS raw_mean
    FROM events e JOIN q USING (event_type)
    GROUP BY e.event_type
    """,
    tags=("agg", "percentile", "quality", "outliers"),
    description=(
        "winsorized mean per group (outlier-robust statistics for "
        "feature/quality columns): exact interpolated p05/p95 per "
        "event_type, values clipped to the band, clipped-count + "
        "robust vs raw mean — the percentile table is tiny and joins "
        "back broadcast; both engines use the same (n-1)*p linear "
        "interpolation so the clip thresholds are bit-identical"
    ),
)
def agg_winsorized_values(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    q = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05D)").alias("lo"),
        F.expr("percentile(value, 0.95D)").alias("hi"),
    )
    clipped = F.when(F.col("value") < F.col("lo"), F.col("lo")).when(
        F.col("value") > F.col("hi"), F.col("hi")
    ).otherwise(F.col("value"))
    return (
        e.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")), 1).otherwise(0)
            ).alias("n_clipped"),
            F.round(F.avg(clipped), 4).alias("winsorized_mean"),
            F.round(F.avg("value"), 4).alias("raw_mean"),
        )
    )


@register(
    "events_transition_matrix",
    """
    SELECT prev_type, event_type AS next_type, count(*) AS n
    FROM (
        SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    )
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
    tags=("window", "path_analysis", "agg", "events"),
    description=(
        "behavioral transition matrix (path analysis): counts of "
        "adjacent event-type pairs per user in event-time order — one "
        "keyed window for lag, one aggregate; the Markov-chain input "
        "that funnels and next-action models start from, with "
        "(ts, event_id) as the total tie-break order"
    ),
)
def events_transition_matrix(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select("event_type", F.lag("event_type").over(w).alias("prev_type"))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "events_daily_active_users",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           count(*) AS n_events,
           count(DISTINCT user_id) AS dau,
           count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END)
               AS purchasers,
           count(DISTINCT CASE WHEN event_type = 'error' THEN user_id END)
               AS error_users
    FROM events
    GROUP BY day
    """,
    tags=("agg", "distinct", "dashboard", "events"),
    description=(
        "daily-active-users dashboard rollup: several conditional "
        "COUNT DISTINCTs in ONE pass — Spark plans the multi-distinct "
        "via the Expand operator (one row replicated per distinct "
        "group) so the scan happens once, not once per metric; NULLs "
        "from the CASE filters fall out of the distinct count in both "
        "engines"
    ),
)
def events_daily_active_users(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("dau"),
            F.countDistinct(
                F.when(F.col("event_type") == "purchase", F.col("user_id"))
            ).alias("purchasers"),
            F.countDistinct(
                F.when(F.col("event_type") == "error", F.col("user_id"))
            ).alias("error_users"),
        )
    )


@register(
    "window_ratio_to_report",
    """
    WITH day_type AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
               sum(CAST(round(value * 100, 0) AS BIGINT)) AS v_cents
        FROM events GROUP BY day, event_type
    )
    SELECT day, event_type, v_cents,
           CAST(floor(10000.0 * v_cents / sum(v_cents) OVER (PARTITION BY day))
                AS BIGINT) AS share_bp
    FROM day_type
    """,
    tags=("window", "ratio_to_report", "agg", "events"),
    description=(
        "ratio-to-report: each event type's share of its day's total "
        "value — an un-ordered window aggregate (whole-partition "
        "frame) over a pre-aggregated table; sums kept in exact cents "
        "and shares in floor basis points so both engines agree "
        "bit-for-bit"
    ),
)
def window_ratio_to_report(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    day_type = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("v_cents"))
    w = Window.partitionBy("day")
    return day_type.select(
        "day",
        "event_type",
        "v_cents",
        F.floor(10000.0 * F.col("v_cents") / F.sum("v_cents").over(w))
        .cast("bigint")
        .alias("share_bp"),
    )


@register(
    "events_time_bucket_15min",
    """
    SELECT CAST(to_timestamp((CAST(floor(epoch(ts) / 900) AS BIGINT) * 900))
                AS TIMESTAMP) AS bucket_start,
           count(*) AS n,
           sum(CAST(round(value * 100, 0) AS BIGINT)) AS v_cents
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY bucket_start
    """,
    tags=("window_agg", "hypertable", "time_bucket"),
    description=(
        "custom-width time bucketing (15 min via epoch floor-division) "
        "— the arbitrary-width form of the tumbling window when the "
        "width isn't one of window()'s calendar units; pure arithmetic "
        "on the epoch, so the bucket key is engine-independent and the "
        "aggregate is one partial+final pass"
    ),
)
def events_time_bucket_15min(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    bucket = F.timestamp_seconds(
        (F.floor(F.unix_timestamp("ts") / 900)).cast("bigint") * 900
    ).alias("bucket_start")
    return e.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("v_cents"),
    )


@register(
    "events_scd2_user_state",
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events),
    changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM ordered WHERE prev_type IS NULL OR event_type <> prev_type),
    versioned AS (
      SELECT user_id, event_type, ts,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
      FROM changes)
    SELECT user_id, version, event_type,
           epoch_ms(ts) AS valid_from_ms,
           epoch_ms(next_ts) AS valid_to_ms,
           CAST(CASE WHEN next_ts IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
    FROM versioned
    """,
    tags=("scd2", "cdc", "dimension", "window", "streaming_semantics"),
    description=(
        "SCD type-2 dimension history built from a change stream: collapse "
        "consecutive same-state rows per key, then [valid_from, valid_to) "
        "intervals + version + is_current via lead — all three windows share "
        "one user_id partitioning so Catalyst plans a SINGLE shuffle; the "
        "batch twin of a CDC MERGE pipeline (epoch_ms on both sides: "
        "identical floor semantics)"
    ),
)
def events_scd2_user_state(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select("user_id", "event_type", "ts", "event_id")
    )
    return (
        changes.withColumn("version", F.row_number().over(w).cast("long"))
        .withColumn("next_ts", F.lead("ts").over(w))
        .select(
            "user_id",
            "version",
            "event_type",
            F.unix_millis("ts").alias("valid_from_ms"),
            F.unix_millis("next_ts").alias("valid_to_ms"),
            F.when(F.col("next_ts").isNull(), 1).otherwise(0).cast("long").alias("is_current"),
        )
    )


@register(
    "events_zscore_anomalies",
    """
    WITH c AS (
      SELECT event_type, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events),
    s AS (
      SELECT event_type, count(*) AS n, sum(cents) AS s1,
             sum(CAST(cents AS DECIMAL(19,0)) * CAST(cents AS DECIMAL(19,0))) AS s2
      FROM c GROUP BY event_type),
    d AS (
      SELECT c.event_type, c.event_id,
             CAST(s.n AS DECIMAL(19,0)) * CAST(c.cents AS DECIMAL(19,0))
               - CAST(s.s1 AS DECIMAL(19,0)) AS dev,
             CAST(9 AS DECIMAL(2,0)) *
               (CAST(s.n AS DECIMAL(19,0)) * s.s2
                - CAST(s.s1 AS DECIMAL(19,0)) * CAST(s.s1 AS DECIMAL(19,0))) AS nine_var,
             s.n
      FROM c JOIN s USING (event_type))
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_events,
           CAST(count(*) FILTER (WHERE dev * dev > nine_var) AS BIGINT) AS n_anomalies,
           CAST(coalesce(sum(event_id) FILTER (WHERE dev * dev > nine_var), 0)
                AS BIGINT) AS anomaly_id_sum
    FROM d GROUP BY event_type ORDER BY event_type
    """,
    tags=("quality", "anomaly", "agg", "exact_arithmetic"),
    description=(
        "per-type z-score anomaly flags (|z| > 3) computed WITHOUT floats: "
        "|z|>3 is algebraically rewritten to the integer comparison "
        "(n*x - s1)^2 > 9*(n*s2 - s1^2) over exact cent sums, so the flag "
        "set is bit-identical across engines and partitionings (sqrt/stddev "
        "never enter); stats table is |event_type| rows broadcast back — "
        "one fact shuffle for the stats, row-local flagging.  All products "
        "run in DECIMAL(19,0)-operand arithmetic (DECIMAL(38,0) results) "
        "on BOTH engines, so the comparison stays exact far past the "
        "bigint bound instead of wrapping (Spark) or erroring (DuckDB) "
        "at ~1e6 rows/group"
    ),
)
def events_zscore_anomalies(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    c = e.select(
        "event_type",
        "event_id",
        F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)").alias("cents"),
    )
    cD = F.col("cents").cast("decimal(19,0)")
    s = c.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s1"),
        F.sum(cD * cD).alias("s2"),
    )
    j = c.join(F.broadcast(s), "event_type")
    nD = F.col("n").cast("decimal(19,0)")
    s1D = F.col("s1").cast("decimal(19,0)")
    dev = nD * cD - s1D
    is_anom = (dev * dev) > F.lit(9).cast("decimal(2,0)") * (nD * F.col("s2") - s1D * s1D)
    return (
        j.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            F.count(F.when(is_anom, 1)).cast("long").alias("n_anomalies"),
            F.coalesce(F.sum(F.when(is_anom, F.col("event_id"))), F.lit(0)).cast("long").alias("anomaly_id_sum"),
        )
        .orderBy("event_type")
    )


@register(
    "events_cdc_latest_state",
    """
    WITH ranked AS (
      SELECT user_id, event_type, ts, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id,
           event_type AS last_type,
           cents      AS last_value_cents,
           epoch_ms(ts) AS updated_at_ms,
           CAST(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS BIGINT) AS is_deleted
    FROM ranked WHERE rn = 1
    """,
    tags=("cdc", "merge", "upsert", "window", "streaming_semantics"),
    description=(
        "CDC apply / latest-wins MERGE: collapse a keyed changelog to final "
        "table state (newest row per key via one partition-by-key top-1 "
        "window — no self-join max-ts probe), with tombstone semantics "
        "(terminal 'error' = delete marker).  The batch twin of the "
        "KeyedUpsertSink foreachBatch MERGE; at scale this is the standard "
        "compaction query over a Delta/Iceberg change feed"
    ),
)
def events_cdc_latest_state(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_type"),
            F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)").alias("last_value_cents"),
            F.unix_millis("ts").alias("updated_at_ms"),
            F.when(F.col("event_type") == "error", 1).otherwise(0).cast("long").alias("is_deleted"),
        )
    )


@register(
    "window_topk_types_per_hour",
    """
    WITH h AS (
      SELECT epoch_us(ts) // 3600000000 AS hour_idx, event_type,
             count(*) AS n
      FROM events GROUP BY hour_idx, event_type),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY hour_idx
                                   ORDER BY n DESC, event_type) AS rnk
      FROM h)
    SELECT hour_idx, event_type, n, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 3
    """,
    tags=("window", "topk", "agg", "events", "streaming_semantics"),
    description=(
        "windowed top-k (trending items per hour): aggregate FIRST, "
        "rank the tiny per-window rollup SECOND — the window function "
        "runs over |hours|x|types| pre-aggregated rows, never the fact "
        "table, so the only data-sized operation is one map-side-"
        "combined count; (n DESC, event_type) gives rank ties a total "
        "order.  The batch twin of a per-window streaming leaderboard"
    ),
)
def window_topk_types_per_hour(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    h = e.groupBy(
        F.expr("unix_micros(ts) div 3600000000").alias("hour_idx"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("hour_idx").orderBy(F.desc("n"), "event_type")
    return (
        h.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
    )


@register(
    "events_session_conversion",
    f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR date_diff('second',
                                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                                 ts) > {{gap}} THEN 1 ELSE 0 END AS is_new
      FROM events),
    sessions AS (
      SELECT user_id, event_type,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged),
    per_session AS (
      SELECT user_id, session_id,
             count(*) AS n_events,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      FROM sessions GROUP BY user_id, session_id)
    SELECT CASE WHEN n_events >= 3 THEN 'multi'
                WHEN n_events = 2  THEN 'pair'
                ELSE 'single' END           AS session_len_band,
           count(*)                         AS n_sessions,
           sum(converted)                   AS n_converted,
           sum(converted) * 10000 // count(*) AS conversion_bp
    FROM per_session GROUP BY session_len_band
    """.replace("{gap}", "1800"),
    tags=("session", "funnel", "window", "agg", "events", "streaming_semantics"),
    description=(
        "session-level conversion: gap-sessionize (30 min), collapse "
        "each session to (length band, converted?) — one keyed window "
        "+ two aggregates — then conversion rate per band in floor "
        "basis points; the e-commerce KPI that joins the "
        "sessionization operator to a business metric, sharing the "
        "single user_id shuffle with events_sessionization"
    ),
)
def events_session_conversion(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = e.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("converted"),
    )
    return (
        per_session.withColumn(
            "session_len_band",
            F.when(F.col("n_events") >= 3, "multi")
            .when(F.col("n_events") == 2, "pair")
            .otherwise("single"),
        )
        .groupBy("session_len_band")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("converted").alias("n_converted"),
            F.expr("sum(converted) * 10000 div count(*)").alias("conversion_bp"),
        )
    )


@register(
    "events_time_weighted_avg",
    """
    WITH c AS (
        SELECT event_type, event_id,
               epoch_us(ts) // 1000000 AS sec,
               (epoch_us(ts) // 1000000) // 86400 AS day,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events),
    d AS (
        SELECT event_type, day, cents, sec,
               coalesce(lead(sec) OVER (PARTITION BY event_type, day
                                        ORDER BY sec, event_id),
                        (day + 1) * 86400) - sec AS dur_s
        FROM c)
    SELECT event_type, CAST(day AS BIGINT) AS day,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(dur_s) AS BIGINT) AS covered_s,
           CAST(sum(cents * dur_s) // sum(dur_s) AS BIGINT) AS twa_cents
    FROM d GROUP BY event_type, day
    """,
    tags=("window_agg", "hypertable", "time_weight", "exact_arithmetic"),
    description=(
        "time-weighted average (the hypertable time_weight('LOCF') "
        "aggregate): each observation holds its value until the next "
        "one in the same (type, day), the day's last until midnight — "
        "weight = held seconds from one lead() over the (type, day) "
        "key, so irregular sampling can't bias the mean the way a "
        "plain avg does; all-integer cents x seconds arithmetic "
        "(fits bigint to ~1e9 rows/group-day; production widens the "
        "product sum to DECIMAL(38,0)), truncating div identical in "
        "both engines.  ONE shuffle on the (type, day) key shared by "
        "the window and the aggregate"
    ),
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    c = e.select(
        "event_type",
        "event_id",
        F.expr("unix_micros(ts) div 1000000").alias("sec"),
        F.expr("(unix_micros(ts) div 1000000) div 86400").alias("day"),
        F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)").alias("cents"),
    )
    w = W.partitionBy("event_type", "day").orderBy("sec", "event_id")
    d = c.withColumn(
        "dur_s",
        F.coalesce(F.lead("sec").over(w), (F.col("day") + 1) * 86400) - F.col("sec"),
    )
    return d.groupBy("event_type", F.col("day").cast("long").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("dur_s").cast("long").alias("covered_s"),
        F.expr("CAST(sum(cents * dur_s) div sum(dur_s) AS BIGINT)").alias("twa_cents"),
    )


@register(
    "events_day_over_day",
    """
    WITH d AS (
        SELECT event_type,
               (epoch_us(ts) // 1000000) // 86400 AS day,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
        FROM events GROUP BY event_type, day),
    l AS (
        SELECT event_type, day, cents,
               lag(day)   OVER (PARTITION BY event_type ORDER BY day) AS prev_day,
               lag(cents) OVER (PARTITION BY event_type ORDER BY day) AS prev_cents
        FROM d)
    SELECT event_type, CAST(day AS BIGINT) AS day,
           CAST(cents AS BIGINT) AS cents,
           CAST(day - prev_day AS BIGINT) AS gap_days,
           CAST(cents - prev_cents AS BIGINT) AS delta_cents,
           CAST((10000 * (cents - prev_cents)) // prev_cents AS BIGINT) AS change_bp
    FROM l WHERE prev_cents IS NOT NULL
    """,
    tags=("window", "period_over_period", "agg", "events", "exact_arithmetic"),
    description=(
        "period-over-period change: daily revenue per event type "
        "compared to the previous OBSERVED day (gap_days says how far "
        "back that was — silently treating a gap as yesterday is the "
        "classic dashboard bug), delta and percent change in "
        "truncated basis points (Spark DIV and DuckDB // both "
        "truncate toward zero, so negative deltas agree).  The lag "
        "window runs over the pre-aggregated |types|x|days| table, "
        "never fact rows — the fact table shuffles once for the "
        "rollup"
    ),
)
def events_day_over_day(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type",
        F.expr("(unix_micros(ts) div 1000000) div 86400").alias("day"),
    ).agg(F.expr("sum(CAST(floor(value * 100 + 0.5D) AS BIGINT))").alias("cents"))
    w = W.partitionBy("event_type").orderBy("day")
    l = d.withColumn("prev_day", F.lag("day").over(w)).withColumn(
        "prev_cents", F.lag("cents").over(w)
    )
    return l.filter(F.col("prev_cents").isNotNull()).select(
        "event_type",
        F.col("day").cast("long").alias("day"),
        F.col("cents").cast("long").alias("cents"),
        (F.col("day") - F.col("prev_day")).cast("long").alias("gap_days"),
        (F.col("cents") - F.col("prev_cents")).cast("long").alias("delta_cents"),
        F.expr("CAST((10000 * (cents - prev_cents)) div prev_cents AS BIGINT)").alias(
            "change_bp"
        ),
    )


@register(
    "events_session_paths",
    """
    WITH s AS (
        SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                     OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
    g AS (
        SELECT user_id, event_type, us, event_id,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM s),
    p AS (
        SELECT user_id, session_id,
               string_agg(event_type, '>' ORDER BY us, event_id) AS path
        FROM g GROUP BY user_id, session_id)
    SELECT path,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(CASE WHEN path LIKE '%view%click%purchase%' THEN 1 ELSE 0 END
                AS BIGINT) AS is_conversion_path
    FROM p GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 20
    """,
    tags=("mining", "session", "path_analysis", "window", "events"),
    description=(
        "session path mining: gap-sessionize (30 min), render each "
        "session's event-type sequence in (ts, event_id) total order "
        "as a path string, count sessions per distinct path and flag "
        "view->click->purchase conversion shapes — the funnel-"
        "discovery query run BEFORE you know which funnel to build.  "
        "Spark renders the path with array_sort(collect_list(struct))"
        " -> transform -> array_join (collect order is partition-"
        "dependent; the struct sort makes it total), sharing ONE "
        "user_id shuffle across sessionize + path build; top-20 with "
        "a total (n, path) order"
    ),
)
def events_session_paths(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    s = e.withColumn("us", F.expr("unix_micros(ts)")).withColumn(
        "is_new",
        F.when(
            F.lag("us").over(w).isNull()
            | ((F.col("us") - F.lag("us").over(w)) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    g = s.withColumn(
        "session_id", F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    p = g.groupBy("user_id", "session_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(us, event_id, "
            "event_type))), x -> x.event_type), '>')"
        ).alias("path")
    )
    return (
        p.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .withColumn(
            "is_conversion_path",
            F.when(F.col("path").like("%view%click%purchase%"), 1)
            .otherwise(0)
            .cast("long"),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )


@register(
    "events_session_window_builtin",
    """
    WITH s AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                     OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
    g AS (
        SELECT user_id, us, cents,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM s)
    SELECT user_id,
           CAST(min(us) AS BIGINT) AS start_us,
           CAST(max(us) + 1800000000 AS BIGINT) AS end_us,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(cents) AS BIGINT) AS cents
    FROM g GROUP BY user_id, sid
    """,
    tags=("session", "window_agg", "streaming_semantics", "events"),
    description=(
        "built-in session_window aggregation (the native form of the "
        "engine's streaming session windows run in batch): Spark's "
        "session_window(ts, '30 minutes') merges events whose gap is "
        "STRICTLY under 30 min and ends each session exactly 30 min "
        "after its last event — semantics the oracle reproduces from "
        "first principles with a gap >= 30min session-break window, "
        "pinning the boundary rule (an exactly-30-min gap starts a "
        "NEW session) that a hand-rolled sessionizer most often gets "
        "wrong.  Plans as ONE shuffle on user_id + a local session "
        "merge — same shape as the streaming twin's state update"
    ),
)
def events_session_window_builtin(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.expr("CAST(sum(CAST(floor(value * 100 + 0.5D) AS BIGINT)) AS BIGINT)").alias(
                "cents"
            ),
        )
        .select(
            "user_id",
            F.expr("unix_micros(session_window.start)").alias("start_us"),
            F.expr("unix_micros(session_window.end)").alias("end_us"),
            "n_events",
            "cents",
        )
    )


@register(
    "agg_partial_merge_rollup",
    """
    SELECT event_type,
           (epoch_us(ts) // 1000000) // 86400 AS day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
           CAST(min(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS min_cents,
           CAST(max(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS max_cents,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) // count(*) AS BIGINT)
               AS mean_cents
    FROM events GROUP BY event_type, day
    """,
    tags=("agg", "incremental", "partial_merge", "hypertable", "exact_arithmetic"),
    description=(
        "incremental rollup via partial-aggregate MERGE: the fixture "
        "is split into a 'history' slice and a 'late-arriving' slice, "
        "each rolled up independently, and the two partial tables are "
        "merged by RE-AGGREGATING the mergeable state (sum of sums, "
        "sum of counts, min of mins, max of maxes — mean derived "
        "AFTER the merge, never averaged-of-averages: the algebra "
        "that makes a metric mergeable).  Value-identical to the "
        "one-shot rollup (the oracle) by associativity of the integer "
        "state; at 100 TB this is how a materialized rollup absorbs a "
        "new partition without re-scanning history"
    ),
)
def agg_partial_merge_rollup(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("(unix_micros(ts) div 1000000) div 86400").alias("day"),
        F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)").alias("cents"),
    )
    split_day = 14 + 19723  # fixture midpoint (2024-01-15 as epoch day)

    def rollup(df):
        return df.groupBy("event_type", "day").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )

    history = rollup(e.filter(F.col("day") < split_day))
    late = rollup(e.filter(F.col("day") >= split_day))
    merged = (
        history.unionAll(late)
        .groupBy("event_type", "day")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
            F.min("min_cents").cast("long").alias("min_cents"),
            F.max("max_cents").cast("long").alias("max_cents"),
        )
    )
    return merged.select(
        "event_type",
        "day",
        "n",
        "cents",
        "min_cents",
        "max_cents",
        F.expr("CAST(cents div n AS BIGINT)").alias("mean_cents"),
    )


@register(
    "events_decayed_leaderboard",
    """
    WITH c AS (
        SELECT user_id,
               (epoch_us(ts) // 1000000) // 86400 AS day,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events),
    mx AS (SELECT max(day) AS max_day FROM c),
    s AS (
        SELECT user_id,
               sum(cents * (CASE WHEN max_day - day <= 29
                            THEN CAST(1 AS BIGINT) << CAST(29 - (max_day - day) AS INT)
                            ELSE 0 END)) AS score,
               sum(cents) AS raw_cents,
               count(*) AS n_events
        FROM c, mx GROUP BY user_id)
    SELECT user_id,
           CAST(score AS BIGINT) AS decayed_score,
           CAST(raw_cents AS BIGINT) AS raw_cents,
           CAST(n_events AS BIGINT) AS n_events
    FROM s ORDER BY decayed_score DESC, user_id LIMIT 20
    """,
    tags=("agg", "decay", "leaderboard", "topk", "exact_arithmetic", "events"),
    description=(
        "exponentially decayed leaderboard: per-user activity score "
        "halving with each day of age (weight = 2^(29 - age_days), "
        "zero past the 30-day horizon) — the freshness-weighted "
        "ranking a trending feed uses, kept EXACT by doing the decay "
        "as integer bit shifts against the corpus max day (a 1-row "
        "broadcast) instead of float exp(), so partial aggregation "
        "order cannot wiggle the ranking.  One map-side-combinable "
        "aggregate + TakeOrdered top-20 with a total (score, user) "
        "order; the float-free trick caps the horizon at 62 "
        "doublings, ample for any decay window worth ranking on"
    ),
)
def events_decayed_leaderboard(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    c = e.select(
        "user_id",
        F.expr("(unix_micros(ts) div 1000000) div 86400").alias("day"),
        F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)").alias("cents"),
    )
    mx = c.agg(F.max("day").alias("max_day"))
    s = (
        c.crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            "cents",
            F.expr(
                "CASE WHEN max_day - day <= 29 "
                "THEN shiftleft(1L, CAST(29 - (max_day - day) AS INT)) "
                "ELSE 0L END"
            ).alias("w"),
        )
        .groupBy("user_id")
        .agg(
            F.sum(F.expr("cents * w")).cast("long").alias("decayed_score"),
            F.sum("cents").cast("long").alias("raw_cents"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )
    return s.orderBy(F.desc("decayed_score"), "user_id").limit(20)


@register(
    "events_gapfill_interpolate",
    """
    WITH c AS (
        SELECT event_type,
               epoch_us(ts) // 3600000000 AS h,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents,
               count(*) AS n
        FROM events GROUP BY event_type, h),
    b AS (SELECT event_type, min(h) AS lo, max(h) AS hi FROM c GROUP BY event_type),
    grid AS (
        SELECT event_type, unnest(range(lo, hi + 1)) AS h FROM b),
    j AS (
        SELECT g.event_type, g.h, c.cents, coalesce(c.n, 0) AS n,
               last_value(CASE WHEN c.cents IS NOT NULL THEN g.h END IGNORE NULLS)
                   OVER wp AS ph,
               last_value(c.cents IGNORE NULLS) OVER wp AS pc,
               first_value(CASE WHEN c.cents IS NOT NULL THEN g.h END IGNORE NULLS)
                   OVER wf AS nh,
               first_value(c.cents IGNORE NULLS) OVER wf AS nc
        FROM grid g LEFT JOIN c ON c.event_type = g.event_type AND c.h = g.h
        WINDOW wp AS (PARTITION BY g.event_type ORDER BY g.h
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY g.event_type ORDER BY g.h
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT event_type, CAST(h AS BIGINT) AS hour,
           CAST(n AS BIGINT) AS n_events,
           CAST(CASE WHEN cents IS NOT NULL THEN cents
                     WHEN ph IS NULL OR nh IS NULL THEN NULL
                     ELSE pc + ((nc - pc) * (h - ph)) // (nh - ph) END
                AS BIGINT) AS cents_interp
    FROM j
    """,
    tags=("window_agg", "hypertable", "gapfill", "interpolate", "exact_arithmetic"),
    description=(
        "time-series gap fill by LINEAR INTERPOLATION (the "
        "hypertable interpolate() twin of the LOCF query): dense "
        "per-type hourly grid, missing hours valued on the straight "
        "line between the nearest observed neighbors via integer "
        "cents arithmetic (truncating division agrees across engines "
        "for either delta sign), edges left NULL where no neighbor "
        "exists.  Both neighbor scans are IGNORE NULLS window passes "
        "over the SAME event_type shuffle — no self-join against the "
        "observation table, cost linear in grid size"
    ),
)
def events_gapfill_interpolate(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    c = e.groupBy(
        "event_type", F.expr("unix_micros(ts) div 3600000000").alias("h")
    ).agg(
        F.expr("sum(CAST(floor(value * 100 + 0.5D) AS BIGINT))").alias("cents"),
        F.count(F.lit(1)).alias("n"),
    )
    grid = (
        c.groupBy("event_type")
        .agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select("event_type", F.explode(F.expr("sequence(lo, hi)")).alias("h"))
    )
    j = grid.join(c, ["event_type", "h"], "left")
    wp = W.partitionBy("event_type").orderBy("h").rowsBetween(W.unboundedPreceding, 0)
    wf = W.partitionBy("event_type").orderBy("h").rowsBetween(0, W.unboundedFollowing)
    obs_h = F.when(F.col("cents").isNotNull(), F.col("h"))
    j = (
        j.withColumn("ph", F.last(obs_h, ignorenulls=True).over(wp))
        .withColumn("pc", F.last("cents", ignorenulls=True).over(wp))
        .withColumn("nh", F.first(obs_h, ignorenulls=True).over(wf))
        .withColumn("nc", F.first("cents", ignorenulls=True).over(wf))
    )
    return j.select(
        "event_type",
        F.col("h").cast("long").alias("hour"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        F.expr(
            "CAST(CASE WHEN cents IS NOT NULL THEN cents "
            "WHEN ph IS NULL OR nh IS NULL THEN NULL "
            "ELSE pc + ((nc - pc) * (h - ph)) DIV (nh - ph) END AS BIGINT)"
        ).alias("cents_interp"),
    )


@register(
    "agg_mergeable_histogram_p99",
    """
    WITH c AS (
        SELECT event_type,
               length(bin(CAST(floor(value * 100 + 0.5) AS BIGINT))) AS bucket
        FROM events WHERE value IS NOT NULL),
    m AS (SELECT event_type, bucket, count(*) AS n FROM c GROUP BY event_type, bucket),
    r AS (
        SELECT event_type, bucket, n,
               sum(n) OVER (PARTITION BY event_type ORDER BY bucket
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(n) OVER (PARTITION BY event_type) AS tot
        FROM m)
    SELECT event_type,
           CAST(max(tot) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(min(CASE WHEN 100 * cum >= 50 * tot THEN bucket END) AS BIGINT)
               AS p50_bucket,
           CAST(min(CASE WHEN 100 * cum >= 99 * tot THEN bucket END) AS BIGINT)
               AS p99_bucket
    FROM r GROUP BY event_type ORDER BY event_type
    """,
    tags=("agg", "histogram", "percentile", "mergeable", "incremental", "exact_arithmetic"),
    description=(
        "mergeable-histogram percentiles (the production answer to "
        "exact percentiles at 100 TB): per-day power-of-two bucket "
        "counts (bucket = bit length of cents — integer/string ops, "
        "identical across engines) MERGED across days by summing "
        "counts, then p50/p99 read off the merged cumulative "
        "distribution at bucket resolution.  The Spark side really "
        "builds daily partials and re-aggregates them — proving the "
        "merge algebra — while the oracle computes the single-pass "
        "equivalent; the nearest-rank scan runs over <=64 buckets "
        "per group, never rows.  This is what incremental rollups "
        "store where exact-median windows would re-sort history"
    ),
)
def agg_mergeable_histogram_p99(spark: SparkSession, sf_dir: str):
    e = t_nonnull(spark, sf_dir, "events", "value")
    daily = e.groupBy(
        "event_type",
        F.expr("(unix_micros(ts) div 1000000) div 86400").alias("day"),
        F.expr("length(bin(CAST(floor(value * 100 + 0.5D) AS BIGINT)))").alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))
    merged = daily.groupBy("event_type", "bucket").agg(F.sum("n").alias("n"))
    wc = W.partitionBy("event_type").orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
    wt = W.partitionBy("event_type")
    r = merged.withColumn("cum", F.sum("n").over(wc)).withColumn("tot", F.sum("n").over(wt))
    return (
        r.groupBy("event_type")
        .agg(
            F.max("tot").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.min(F.when(100 * F.col("cum") >= 50 * F.col("tot"), F.col("bucket")))
            .cast("long")
            .alias("p50_bucket"),
            F.min(F.when(100 * F.col("cum") >= 99 * F.col("tot"), F.col("bucket")))
            .cast("long")
            .alias("p99_bucket"),
        )
        .orderBy("event_type")
    )


@register(
    "events_disorder_audit",
    """
    WITH a AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS runmax
        FROM events)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN us < runmax THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(max(CASE WHEN us < runmax THEN runmax - us END) AS BIGINT)
               AS max_lateness_us,
           CAST(sum(CASE WHEN us < runmax THEN runmax - us ELSE 0 END) AS BIGINT)
               AS sum_lateness_us
    FROM a GROUP BY user_id
    """,
    tags=("streaming_semantics", "watermark", "audit", "window", "events"),
    description=(
        "out-of-orderness audit (how late a watermark must reach): "
        "per user, events whose event time precedes the running "
        "maximum of earlier-ARRIVED events (arrival order = event_id, "
        "the ingest sequence in the fixtures), with max and total "
        "lateness — the empirical distribution that justifies a "
        "withWatermark() bound instead of guessing it.  One keyed "
        "window over a strictly-preceding frame + one aggregate on "
        "the same user shuffle; at 100 TB this runs per ingest "
        "partition before any windowed aggregation is deployed"
    ),
)
def events_disorder_audit(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id").rowsBetween(W.unboundedPreceding, -1)
    a = e.select("user_id", "event_id", F.expr("unix_micros(ts)").alias("us")).withColumn(
        "runmax", F.max("us").over(w)
    )
    late = F.col("us") < F.col("runmax")
    return a.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(late, 1).otherwise(0)).cast("long").alias("n_late"),
        F.max(F.when(late, F.col("runmax") - F.col("us"))).cast("long").alias("max_lateness_us"),
        F.sum(F.when(late, F.col("runmax") - F.col("us")).otherwise(0)).cast("long").alias("sum_lateness_us"),
    )


@register(
    "events_slo_burn_rate",
    """
    WITH h AS (
        SELECT date_diff('hour', TIMESTAMP '1970-01-01 00:00:00',
                         date_trunc('hour', ts)) AS hr,
               count(*) AS n,
               count(*) FILTER (WHERE event_type = 'error') AS errs
        FROM events GROUP BY 1),
    c AS (
        SELECT hr, n, errs,
               sum(n) OVER (ORDER BY hr ROWS UNBOUNDED PRECEDING) AS cn,
               sum(errs) OVER (ORDER BY hr ROWS UNBOUNDED PRECEDING) AS cerrs
        FROM h)
    SELECT CAST(hr AS BIGINT) AS hour_idx,
           CAST(n AS BIGINT) AS n_events,
           CAST(errs AS BIGINT) AS n_errors,
           CAST((1000000 * errs) // n AS BIGINT) AS error_ppm,
           CAST((1000000 * cerrs) // cn AS BIGINT) AS cum_error_ppm,
           CAST(CASE WHEN 5 * errs * 100 > n THEN 1 ELSE 0 END AS BIGINT)
               AS burn_alert
    FROM c
    """,
    tags=("events", "slo", "data_ops", "window", "exact_arithmetic"),
    description=(
        "SLO error-budget burn-rate audit: per hour the error rate in "
        "ppm, the cumulative rate since epoch start, and a burn alert "
        "when the hourly rate exceeds 5x a 0.2%% budget — the integer "
        "comparison 5*errs*100 > n, no float thresholds.  The hourly "
        "rollup is the only data-sized aggregate (map-side combined); "
        "the prefix sums run over |hours| rows.  The SRE-side twin of "
        "the freshness SLA audit"
    ),
)
def events_slo_burn_rate(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    h = e.groupBy(
        F.expr(
            "CAST((unix_micros(date_trunc('hour', ts))) DIV 3600000000 AS BIGINT)"
        ).alias("hr")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("errs"),
    )
    wo = W.orderBy("hr").rowsBetween(W.unboundedPreceding, 0)
    c = h.withColumn("cn", F.sum("n").over(wo)).withColumn(
        "cerrs", F.sum("errs").over(wo)
    )
    return c.select(
        F.col("hr").cast("long").alias("hour_idx"),
        F.col("n").cast("long").alias("n_events"),
        F.col("errs").cast("long").alias("n_errors"),
        F.expr("CAST((1000000 * errs) DIV n AS BIGINT)").alias("error_ppm"),
        F.expr("CAST((1000000 * cerrs) DIV cn AS BIGINT)").alias("cum_error_ppm"),
        F.when(5 * F.col("errs") * 100 > F.col("n"), 1)
        .otherwise(0)
        .cast("long")
        .alias("burn_alert"),
    )


@register(
    "scalar_collation_groupby",
    """
    WITH s AS (
        SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                    ELSE event_type END AS et,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events)
    SELECT lower(et) AS event_type_ci,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(cents) AS BIGINT) AS cents_sum
    FROM s GROUP BY lower(et)
    """,
    tags=("scalar", "collation", "string", "agg"),
    description=(
        "collation-aware aggregation (Spark 4 collations): the fact "
        "table carries mixed-case keys (half upper-cased here to "
        "force the collision) and groups under UTF8_LCASE collation — "
        "the engine-level case-insensitive grouping that replaces "
        "scattering lower() into every query; the emitted key is "
        "case-folded so both engines agree bit-for-bit.  The collated "
        "group-by shuffles on the collation-aware key exactly like a "
        "binary key (no pre-normalization projection needed)"
    ),
)
def scalar_collation_groupby(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    s = e.select(
        F.expr(
            "CASE WHEN event_id % 2 = 0 THEN upper(event_type) ELSE event_type END"
        ).alias("et"),
        F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)").alias("cents"),
    )
    return (
        s.groupBy(F.expr("collate(et, 'UTF8_LCASE')").alias("etc"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("cents_sum"),
        )
        .select(
            F.lower(F.col("etc")).cast("string").alias("event_type_ci"),
            "n_events",
            "cents_sum",
        )
    )


@register(
    "events_peak_concurrency",
    """
    WITH s AS (
        SELECT user_id, epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us
        FROM events GROUP BY user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))),
    pts AS (
        SELECT start_us AS us, 1 AS delta FROM s
        UNION ALL SELECT end_us + 1 AS us, -1 AS delta FROM s),
    sweep AS (
        SELECT us,
               sum(sum(delta)) OVER (ORDER BY us ROWS UNBOUNDED PRECEDING)
                   AS concurrency
        FROM pts GROUP BY us)
    SELECT CAST(max(concurrency) AS BIGINT) AS peak_concurrency,
           CAST(min(CASE WHEN concurrency = (SELECT max(concurrency) FROM sweep)
                         THEN us END) AS BIGINT) AS first_peak_us,
           CAST(count(*) AS BIGINT) AS n_change_points
    FROM sweep
    """,
    tags=("events", "sweep_line", "concurrency", "window", "exact_arithmetic"),
    description=(
        "peak concurrency via the sweep line: each user-day activity "
        "interval emits +1 at start and -1 just after end, the "
        "running sum over event-ordered change points is the exact "
        "concurrent-interval count, and its max is the capacity-"
        "planning number (first time it is reached reported in epoch "
        "micros).  Change points collapse by timestamp BEFORE the "
        "running sum (one aggregate), so the window runs over "
        "|distinct endpoints| rows; the +1/-1 trick is the standard "
        "O(n log n) replacement for interval self-joins"
    ),
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.scale import global_cumsum

    e = t(spark, sf_dir, "events")
    s = e.groupBy(
        "user_id", F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("d")
    ).agg(
        F.unix_micros(F.min("ts")).alias("start_us"),
        F.unix_micros(F.max("ts")).alias("end_us"),
    )
    pts = s.select(F.col("start_us").alias("us"), F.lit(1).alias("delta")).unionByName(
        s.select((F.col("end_us") + 1).alias("us"), F.lit(-1).alias("delta"))
    )
    grouped = pts.groupBy("us").agg(F.sum("delta").alias("dsum"))
    # the endpoint rollup is |sessions|-sized (unbounded) — the sweep
    # runs the two-phase bucketed prefix sum, and peak/first-peak fold
    # in the final aggregate via a max_by pair instead of a global MAX
    # window (r02 verdict item #5)
    sweep = global_cumsum(grouped, ["us"], {"dsum": "concurrency"})
    return sweep.agg(
        F.max("concurrency").cast("long").alias("peak_concurrency"),
        (
            -F.max(
                F.struct(F.col("concurrency").alias("c"), (-F.col("us")).alias("nus"))
            ).getField("nus")
        )
        .cast("long")
        .alias("first_peak_us"),
        F.count(F.lit(1)).cast("long").alias("n_change_points"),
    )


@register(
    "events_debounce_throttle",
    """
    WITH RECURSIVE ev AS (
      SELECT user_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_type) AS rn
      FROM events),
    walk AS (
      SELECT user_id, ts, event_type, rn, epoch_ms(ts) AS last_emit_ms,
             true AS emitted
      FROM ev WHERE rn = 1
      UNION ALL
      SELECT e.user_id, e.ts, e.event_type, e.rn,
             CASE WHEN epoch_ms(e.ts) >= w.last_emit_ms + 300000
                  THEN epoch_ms(e.ts) ELSE w.last_emit_ms END,
             epoch_ms(e.ts) >= w.last_emit_ms + 300000
      FROM ev e JOIN walk w ON e.user_id = w.user_id AND e.rn = w.rn + 1)
    SELECT user_id, ts, event_type FROM walk WHERE emitted
    """,
    tags=("events", "streaming_twin", "stateful", "debounce"),
    description=(
        "per-key debounce/throttle (alert dedup): emit only if the event "
        "is >= 5 min after the LAST EMITTED event for the key — the "
        "anchor is the previous emission, not the previous event, so no "
        "window function expresses it; batch twin of the keyed-state "
        "streaming operator, oracle = recursive CTE over the same "
        "recurrence"
    ),
)
def events_debounce_throttle(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.streaming.debounce import debounce_batch

    return debounce_batch(t(spark, sf_dir, "events"), cooldown_ms=300_000)
