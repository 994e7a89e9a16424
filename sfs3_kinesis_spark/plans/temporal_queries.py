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
from sfs3_kinesis_spark.plans.core import register, t


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
    "join_range_hot_hours",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, sum(value) AS sv
      FROM events GROUP BY 1),
    hot AS (
      SELECT h AS h_start, h + INTERVAL 1 HOUR AS h_end
      FROM hourly WHERE sv > 1.5 * (SELECT avg(sv) FROM hourly))
    SELECT e.event_id, h_start
    FROM events e JOIN hot ON e.ts >= h_start AND e.ts < h_end
    """,
    tags=("join", "range"),
    description=(
        "big-big point-in-interval join (events in hot hours), bucketed "
        "equi-join impl — threshold is relative (1.5x mean hourly load) "
        "so the query is scale-invariant"
    ),
)
def join_range_hot_hours(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(F.sum("value").alias("sv"))
    mean_sv = hourly.agg(F.avg("sv").alias("mean_sv"))
    hot = (
        hourly.crossJoin(F.broadcast(mean_sv))
        .filter(F.col("sv") > 1.5 * F.col("mean_sv"))
        .select(
            F.col("h").alias("h_start"),
            (F.col("h") + F.expr("INTERVAL 1 HOUR")).alias("h_end"),
        )
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
