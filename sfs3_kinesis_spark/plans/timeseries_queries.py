"""Time-series analytics plans (round-4 wave 4).

The reference's only temporal behavior is a 1.5 s polling cadence
(svcsample/pollingsvc.js:139-141 — SURVEY.md §2.12); these are the
standard monitoring/forecast-adjacent readouts a data platform runs
over its event stream, all exact-integer and oracle-backed:

* **MAD anomaly flags** — per-series robust center (lower median)
  and spread (median absolute deviation), flagging days beyond
  3×MAD.  Both medians are exact rank picks over the |types|×|days|
  rollup — windows partition by series key, never the fact table,
  so the only data-sized operation is the map-side-combined daily
  aggregate.
* **lag-1 autocorrelation** — the persistence readout that says
  whether yesterday predicts today.  The lag pairs come from a
  calendar self-join (day+1 — a missing day contributes no pair,
  rather than silently pairing across the gap as a row-offset
  ``lag()`` would); the correlation is emitted as EXACT integer
  numerators (cov_num, varx_num, vary_num — the kappa precedent:
  squaring them for r² would overflow BIGINT long before the
  numerators themselves do, and a negative quotient is not
  cross-engine truncation-stable).
* **seasonal-naive forecast error** — forecast(day) = actual(day-7),
  the baseline every real forecaster must beat; MAE and WAPE in
  exact cents / basis points.

Scale notes: every query aggregates the fact table to the
|types|×|days| daily rollup FIRST (one map-side-combined shuffle);
all window/join work happens on that bounded rollup, partitioned by
series key.  At 100 TB the rollup is |series|×|days| rows — the
thing that grows is the pre-aggregation, which is the shape Spark
scales best.  Integer headroom: autocorrelation works in whole
dollars (n·Σxy stays under 2^63 through ~sf100 for this fixture's
30-day series; cents would overflow ~sf10 — stated, not hidden).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

from sfs3_kinesis_spark.plans.core import register, t

#: anomaly fence: |x - median| > MAD_K * MAD
MAD_K = 3
#: seasonal-naive lag in days
SEASON_LAG = 7

# daily revenue rollup, cents on the exact integer grid
_ROLLUP_DUCK = """
    SELECT event_type,
           (epoch_us(ts) // 1000000) // 86400 AS day,
           sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS x
    FROM events GROUP BY event_type, day
"""


def _rollup(spark: SparkSession, sf_dir: str):
    """events → (event_type, day, x=daily revenue cents)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr("(unix_micros(ts) div 1000000) div 86400").alias("day"),
        )
        .agg(
            F.sum(
                F.expr("CAST(floor(value * 100D + 0.5D) AS BIGINT)")
            ).alias("x")
        )
    )


def _median_pick(df, value_col: str, out_col: str):
    """Exact lower-median per event_type: the value at ascending rank
    ``(n+1) div 2`` under the total order (value, day) — deterministic
    because the value AT a rank of a sorted multiset is, regardless of
    how ties order.  One window pass over the bounded rollup."""
    w = W.partitionBy("event_type").orderBy(value_col, "day")
    wc = W.partitionBy("event_type")
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wc))
        .filter(F.expr("_rn = (_n + 1) div 2"))
        .select("event_type", F.col(value_col).alias(out_col))
    )


@register(
    "ts_anomaly_mad",
    f"""
    WITH r AS ({_ROLLUP_DUCK}),
    m AS (
        SELECT event_type, day, x,
               row_number() OVER (PARTITION BY event_type
                   ORDER BY x, day) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM r),
    med AS (SELECT event_type, x AS med FROM m WHERE rn = (n + 1) // 2),
    d AS (
        SELECT r.event_type AS event_type, r.day AS day, r.x AS x,
               med.med AS med, abs(r.x - med.med) AS dev
        FROM r JOIN med ON r.event_type = med.event_type),
    dm AS (
        SELECT event_type, dev,
               row_number() OVER (PARTITION BY event_type
                   ORDER BY dev, day) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM d),
    mad AS (SELECT event_type, dev AS mad FROM dm WHERE rn = (n + 1) // 2)
    SELECT d.event_type AS event_type,
           CAST(d.day AS BIGINT) AS day,
           CAST(d.x AS BIGINT) AS revenue_cents,
           CAST(d.med AS BIGINT) AS med_cents,
           CAST(mad.mad AS BIGINT) AS mad_cents,
           CAST(d.dev AS BIGINT) AS dev_cents
    FROM d JOIN mad ON d.event_type = mad.event_type
    WHERE d.dev > {MAD_K} * mad.mad
    """,
    tags=("ts", "anomaly", "mad", "median", "exact_arithmetic"),
    description=(
        "MAD anomaly detection per event-type daily-revenue series: "
        "exact lower-median center and median-absolute-deviation "
        "spread (both rank picks — the value at rank (n+1) div 2 of "
        "the sorted multiset, deterministic under ties), flagging "
        "days with |x - med| > 3*MAD.  The robust fence a revenue "
        "monitor uses (a mean/stddev fence is dragged by the very "
        "outliers it hunts).  All medians run over the bounded "
        "|types|x|days| rollup partitioned by series; MAD = 0 "
        "degenerates to flagging any deviating day — the correct "
        "readout for a constant series"
    ),
)
def ts_anomaly_mad(spark: SparkSession, sf_dir: str):
    r = _rollup(spark, sf_dir)
    med = _median_pick(r, "x", "med")
    d = r.join(med, "event_type").select(
        "event_type",
        "day",
        "x",
        "med",
        F.abs(F.col("x") - F.col("med")).alias("dev"),
    )
    mad = _median_pick(d.select("event_type", F.col("day"), F.col("dev").alias("x")), "x", "mad")
    return (
        d.join(mad, "event_type")
        .filter(F.col("dev") > MAD_K * F.col("mad"))
        .select(
            "event_type",
            F.col("day").cast("long").alias("day"),
            F.col("x").cast("long").alias("revenue_cents"),
            F.col("med").cast("long").alias("med_cents"),
            F.col("mad").cast("long").alias("mad_cents"),
            F.col("dev").cast("long").alias("dev_cents"),
        )
    )


@register(
    "ts_autocorr_lag1",
    f"""
    WITH r AS ({_ROLLUP_DUCK}),
    rd AS (SELECT event_type, day, x // 100 AS x FROM r),
    p AS (
        SELECT a.event_type AS event_type, a.x AS xt, b.x AS xp
        FROM rd a JOIN rd b
            ON a.event_type = b.event_type AND a.day = b.day + 1)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(*) * sum(xt * xp) - sum(xt) * sum(xp) AS BIGINT)
               AS cov_num,
           CAST(count(*) * sum(xt * xt) - sum(xt) * sum(xt) AS BIGINT)
               AS varx_num,
           CAST(count(*) * sum(xp * xp) - sum(xp) * sum(xp) AS BIGINT)
               AS vary_num
    FROM p GROUP BY event_type
    """,
    tags=("ts", "autocorrelation", "persistence", "exact_arithmetic"),
    description=(
        "lag-1 autocorrelation of per-type daily revenue (whole "
        "dollars), emitted as EXACT integer numerators: cov_num = "
        "n*Sxy - Sx*Sy and the two variance numerators (r = cov / "
        "sqrt(varx*vary) is one driver-side division away; squaring "
        "inside the engine would overflow BIGINT and a negative "
        "quotient is not cross-engine truncation-stable — the kappa "
        "split-readout precedent).  Lag pairs come from a CALENDAR "
        "self-join (day = day+1), so a missing day contributes no "
        "pair instead of silently pairing across the gap the way a "
        "row-offset lag() would.  Everything runs on the bounded "
        "daily rollup; the self-join is co-keyed on event_type"
    ),
)
def ts_autocorr_lag1(spark: SparkSession, sf_dir: str):
    rd = _rollup(spark, sf_dir).select(
        "event_type", "day", F.expr("x div 100").alias("x")
    )
    a, b = rd.alias("a"), rd.alias("b")
    p = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.day") == F.col("b.day") + 1),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.x").alias("xt"),
        F.col("b.x").alias("xp"),
    )
    return p.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        (
            F.count(F.lit(1)) * F.sum(F.col("xt") * F.col("xp"))
            - F.sum("xt") * F.sum("xp")
        ).cast("long").alias("cov_num"),
        (
            F.count(F.lit(1)) * F.sum(F.col("xt") * F.col("xt"))
            - F.sum("xt") * F.sum("xt")
        ).cast("long").alias("varx_num"),
        (
            F.count(F.lit(1)) * F.sum(F.col("xp") * F.col("xp"))
            - F.sum("xp") * F.sum("xp")
        ).cast("long").alias("vary_num"),
    )


@register(
    "ts_seasonal_naive_mae",
    f"""
    WITH r AS ({_ROLLUP_DUCK}),
    p AS (
        SELECT a.event_type AS event_type, a.x AS actual, b.x AS forecast
        FROM r a JOIN r b
            ON a.event_type = b.event_type
           AND a.day = b.day + {SEASON_LAG})
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_forecasts,
           CAST(sum(abs(actual - forecast)) AS BIGINT)
               AS total_abs_err_cents,
           CAST(sum(abs(actual - forecast)) // count(*) AS BIGINT)
               AS mae_cents,
           CAST(CASE WHEN sum(actual) = 0 THEN 0
                ELSE (10000 * sum(abs(actual - forecast))) // sum(actual)
                END AS BIGINT) AS wape_bp
    FROM p GROUP BY event_type
    """,
    tags=("ts", "forecast", "seasonal_naive", "exact_arithmetic"),
    description=(
        "seasonal-naive forecast error per event type: "
        "forecast(day) = actual(day - 7), the baseline any real "
        "forecasting model must beat before it earns cluster time.  "
        "MAE in exact cents and WAPE in truncating basis points "
        "(both numerators non-negative, so Spark DIV == DuckDB //); "
        "the forecast pairs come from a calendar self-join on the "
        "bounded daily rollup, co-keyed on event_type — days without "
        "a 7-day-ago observation produce no forecast row rather than "
        "a silent zero"
    ),
)
def ts_seasonal_naive_mae(spark: SparkSession, sf_dir: str):
    r = _rollup(spark, sf_dir)
    a, b = r.alias("a"), r.alias("b")
    p = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.day") == F.col("b.day") + SEASON_LAG),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.x").alias("actual"),
        F.col("b.x").alias("forecast"),
    )
    return p.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_forecasts"),
        F.sum(F.abs(F.col("actual") - F.col("forecast")))
        .cast("long")
        .alias("total_abs_err_cents"),
        F.expr(
            "CAST(sum(abs(actual - forecast)) DIV count(1) AS BIGINT)"
        ).alias("mae_cents"),
        F.expr(
            "CAST(CASE WHEN sum(actual) = 0 THEN 0"
            " ELSE (10000 * sum(abs(actual - forecast))) DIV sum(actual)"
            " END AS BIGINT)"
        ).alias("wape_bp"),
    )


@register(
    "events_decayed_scores_per_user",
    """
    WITH r AS (
        SELECT user_id,
               (epoch_us(ts) // 1000000) // 86400 AS day,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
        FROM events GROUP BY user_id, day),
    m AS (
        SELECT user_id, day, cents,
               max(day) OVER (PARTITION BY user_id) AS as_of_day
        FROM r)
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(as_of_day AS BIGINT) AS as_of_day,
           CAST(sum(cents >> CAST(as_of_day - day AS INT)) AS BIGINT)
               AS score,
           CAST(count(*) AS BIGINT) AS n_days_live
    FROM m WHERE as_of_day - day < 62
    GROUP BY user_id, as_of_day
    """,
    tags=("events", "decay", "leaderboard", "streaming_twin",
          "exact_arithmetic"),
    description=(
        "per-user decayed activity score anchored on EACH USER'S own "
        "newest day (vs events_decayed_leaderboard's global anchor + "
        "top-20): per-(user, day) cents halve once per day of age via "
        "truncating bit shifts — float exp() never enters, so the "
        "score is bit-stable under any partitioning.  This is the "
        "DuckDB-verified batch twin of the streaming "
        "decayed-score tracker (streaming/leaderboard.py), whose "
        "per-day histogram state emits exactly these rows at any "
        "micro-batch boundary — the oracle closes the loop: "
        "streaming state machine == batch DataFrame == ANSI SQL.  "
        "One map-side-combined rollup + one per-user window over it"
    ),
)
def events_decayed_scores_per_user(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.streaming.leaderboard import decayed_scores_batch

    return decayed_scores_batch(t(spark, sf_dir, "events"))


@register(
    "events_latency_quantiles_per_user",
    """
    WITH g AS (
        SELECT user_id,
               date_diff('second',
                         lag(ts) OVER (PARTITION BY user_id
                             ORDER BY ts),
                         ts) AS gap_s
        FROM events),
    b AS (
        SELECT user_id,
               CASE WHEN gap_s <= 0 THEN 0
                    ELSE length(bin(CAST(gap_s AS BIGINT))) END AS bucket
        FROM g WHERE gap_s IS NOT NULL),
    r AS (SELECT user_id, bucket, count(*) AS c FROM b
          GROUP BY user_id, bucket),
    cum AS (
        SELECT user_id, bucket, c,
               sum(c) OVER (PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
               sum(c) OVER (PARTITION BY user_id) AS n
        FROM r),
    pick AS (
        SELECT user_id, max(n) AS n_gaps,
               min(CASE WHEN 100 * cum >= 50 * n THEN bucket END) AS b50,
               min(CASE WHEN 100 * cum >= 95 * n THEN bucket END) AS b95,
               min(CASE WHEN 100 * cum >= 99 * n THEN bucket END) AS b99
        FROM cum GROUP BY user_id)
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(n_gaps AS BIGINT) AS n_gaps,
           CAST(CASE WHEN b50 = 0 THEN 0 ELSE (1::BIGINT << (b50 - 1))
                END AS BIGINT) AS p50_floor_s,
           CAST(CASE WHEN b95 = 0 THEN 0 ELSE (1::BIGINT << (b95 - 1))
                END AS BIGINT) AS p95_floor_s,
           CAST(CASE WHEN b99 = 0 THEN 0 ELSE (1::BIGINT << (b99 - 1))
                END AS BIGINT) AS p99_floor_s
    FROM pick
    """,
    tags=("events", "quantile", "observability", "streaming_twin",
          "exact_arithmetic"),
    description=(
        "per-user log2-bucket latency quantiles: inter-event gaps "
        "bucketed by bit length (the HDR layout of "
        "events_latency_log2_histogram, here PER KEY) with exact "
        "integer quantile picks — the smallest bucket where "
        "100*cum >= q*n, i.e. the ceiling-rank value of the sorted "
        "gap multiset; no floats, bit-stable everywhere.  This is "
        "the DuckDB-verified batch twin of the streaming quantile "
        "tracker (streaming/quantiles.py), whose 64-count mergeable "
        "state emits exactly these rows under per-key-ordered "
        "arrival.  One keyed window for the gap, one keyed rollup "
        "(<= 64 rows/user), quantiles off the rollup — never a "
        "per-user sort of raw gaps"
    ),
)
def events_latency_quantiles_per_user(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.streaming.quantiles import latency_quantiles_batch

    return latency_quantiles_batch(t(spark, sf_dir, "events"))


@register(
    "ts_cusum_changepoint",
    f"""
    WITH r AS ({_ROLLUP_DUCK}),
    st AS (
        SELECT event_type,
               count(*)     AS n_days,
               sum(x)       AS s
        FROM r GROUP BY event_type),
    dev AS (
        -- n*x_t - S == n * (x_t - mean): the mean-deviation on an
        -- exact integer grid (scaled by n_days, no division)
        SELECT r.event_type AS event_type, r.day AS day,
               st.n_days AS n_days,
               CAST(st.n_days AS BIGINT) * r.x - st.s AS d
        FROM r JOIN st ON r.event_type = st.event_type),
    pre AS (
        SELECT event_type, day, n_days,
               sum(d) OVER (PARTITION BY event_type ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS p
        FROM dev),
    cu AS (
        SELECT event_type, day, n_days, p,
               p - least(CAST(0 AS BIGINT),
                         min(p) OVER (PARTITION BY event_type ORDER BY day
                                      ROWS UNBOUNDED PRECEDING)) AS c_pos,
               greatest(CAST(0 AS BIGINT),
                        max(p) OVER (PARTITION BY event_type ORDER BY day
                                     ROWS UNBOUNDED PRECEDING)) - p AS c_neg
        FROM pre),
    rk AS (
        SELECT event_type, day, n_days, c_pos, c_neg,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY c_pos DESC, day) AS rp,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY c_neg DESC, day) AS rn
        FROM cu),
    up AS (SELECT event_type, n_days, c_pos AS cusum_pos_max,
                  day AS pos_shift_day FROM rk WHERE rp = 1),
    dn AS (SELECT event_type, c_neg AS cusum_neg_max,
                  day AS neg_shift_day FROM rk WHERE rn = 1)
    SELECT up.event_type AS event_type,
           CAST(up.n_days AS BIGINT)        AS n_days,
           CAST(up.cusum_pos_max AS BIGINT) AS cusum_pos_max,
           CAST(up.pos_shift_day AS BIGINT) AS pos_shift_day,
           CAST(dn.cusum_neg_max AS BIGINT) AS cusum_neg_max,
           CAST(dn.neg_shift_day AS BIGINT) AS neg_shift_day
    FROM up JOIN dn ON up.event_type = dn.event_type
    """,
    tags=("ts", "cusum", "changepoint", "window", "exact_arithmetic"),
    description=(
        "CUSUM change-point detection per event-type daily-revenue "
        "series (Page 1954, public): the recursive one-sided CUSUM "
        "C+_t = max(0, C+_(t-1) + (x_t - mean)) unrolls to "
        "P_t - min(0, min_k<=t P_k) over the deviation prefix sum — "
        "so the sequential statistic becomes TWO stock window "
        "functions (running sum + running min), no recursion, no "
        "Python.  Deviations are scaled by n_days (n*x - S) so the "
        "mean never needs division: everything stays on the exact "
        "integer grid and cusum units are n_days*cents.  Reports, "
        "per series, the max positive/negative excursion and its "
        "argmax day (ties -> earliest) — the day a sustained "
        "level-shift most likely began, the monitor that catches "
        "slow drifts a MAD point-anomaly fence misses.  All windows "
        "run over the bounded |types|x|days| rollup PARTITIONED by "
        "series — no global window, corpus-scale by construction"
    ),
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str):
    r = _rollup(spark, sf_dir)
    st = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("x").alias("s")
    )
    dev = r.join(st, "event_type").select(
        "event_type",
        "day",
        "n_days",
        (F.col("n_days").cast("long") * F.col("x") - F.col("s")).alias("d"),
    )
    wseq = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cu = (
        dev.withColumn("p", F.sum("d").over(wseq))
        .withColumn(
            "c_pos",
            F.col("p") - F.least(F.lit(0).cast("long"), F.min("p").over(wseq)),
        )
        .withColumn(
            "c_neg",
            F.greatest(F.lit(0).cast("long"), F.max("p").over(wseq)) - F.col("p"),
        )
    )
    rk = cu.withColumn(
        "rp",
        F.row_number().over(
            W.partitionBy("event_type").orderBy(F.desc("c_pos"), F.asc("day"))
        ),
    ).withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("event_type").orderBy(F.desc("c_neg"), F.asc("day"))
        ),
    )
    up = rk.filter(F.col("rp") == 1).select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.col("c_pos").cast("long").alias("cusum_pos_max"),
        F.col("day").cast("long").alias("pos_shift_day"),
    )
    dn = rk.filter(F.col("rn") == 1).select(
        "event_type",
        F.col("c_neg").cast("long").alias("cusum_neg_max"),
        F.col("day").cast("long").alias("neg_shift_day"),
    )
    return up.join(dn, "event_type").select(
        "event_type",
        "n_days",
        "cusum_pos_max",
        "pos_shift_day",
        "cusum_neg_max",
        "neg_shift_day",
    )
