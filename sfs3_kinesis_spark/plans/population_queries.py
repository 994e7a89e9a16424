"""Population-statistics plans (round-4 wave 5): preference ranking,
survival analysis, distribution reweighting.

Three more platform-grade readouts over the standard fixtures, all
exact-integer and oracle-backed (`plans/core.py` conventions):

* **Bradley–Terry strength fit** — rank players from pairwise win
  counts (the arena-style model-comparison readout: "model A beat
  model B in k of n head-to-heads; what are the latent strengths?").
  The fixture's players are the top-24 co-purchased parts, a game =
  two players in one order, winner = larger quantized quantity (ties
  dropped).  Three fixed minorization–maximization iterations in
  scaled-integer arithmetic (the `graph_pagerank_parts` discipline:
  every division truncates non-negative quantities, so the trajectory
  is bit-identical across engines, partitionings and retries —
  the oracle unrolls the SAME three updates in chained CTEs).  The
  un-normalized MM update is scale-stable from a 1e6 init (p' =
  2e6·W/n at the symmetric point), so NO per-round normalization —
  and therefore no 1-row global-sum broadcast per round.
* **Kaplan–Meier churn table** — the survival estimator's exact
  sufficient statistics over user lifetimes: per churn day the
  at-risk count, churn events, right-censored count (users still
  active near the corpus horizon), and the discrete hazard in basis
  points.  The survival CURVE is a running product of rationals (not
  integer-exact); the emitted table is the estimator — S(t) is one
  driver-side fold away, the kappa/autocorr split-readout precedent.
  At-risk counts come from ONE prefix sum over the bounded |days|
  rollup (two-phase `global_cumsum`), never a per-user scan.
* **Importance reweighting** — per-language weights that rebalance
  the corpus to a uniform target mixture (weight ∝ target/actual in
  fixed-point 1e4), with the post-reweight share audit showing the
  landing distribution.  The weight table is |languages| rows — the
  broadcast a sampler applies at read time; reweighting 100 TB costs
  one map-side join.

Scale notes: BT's game matrix is bounded by the player set (≤24·23
directed pairs) — the only data-sized work is the order-local pair
build (equi-join on the order key, same as graph_pagerank_parts);
KM reduces events to per-user last-seen (one map-side-combined agg)
then to the |days| rollup; reweighting reduces to the |languages|
rollup immediately.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from sfs3_kinesis_spark.operators.scale import lineage_pin
from sfs3_kinesis_spark.plans.core import register, t

#: Bradley–Terry: player-set size, strength scale, MM iterations
BT_PLAYERS = 24
BT_SCALE = 1_000_000
BT_ITERS = 3

#: Kaplan–Meier: users whose last event is within this many days of
#: the corpus horizon are right-censored (still active), not churned
KM_CENSOR_DAYS = 3

#: importance reweighting: fixed-point scale for weights
RW_SCALE = 10_000


def _bt_oracle() -> str:
    """Chained-CTE unroll of BT_ITERS MM updates — the same fixed
    iteration the Spark loop runs (pagerank discipline), MATERIALIZED
    because each round references its predecessor twice."""
    head = f"""
    WITH lq AS MATERIALIZED (
        SELECT l_orderkey AS o, l_partkey AS p,
               sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS q
        FROM lineitem GROUP BY o, p),
    players AS MATERIALIZED (
        SELECT p FROM (
            SELECT p, count(*) AS n FROM lq GROUP BY p
            ORDER BY n DESC, p LIMIT {BT_PLAYERS})),
    member AS MATERIALIZED (
        SELECT lq.o, lq.p, lq.q FROM lq JOIN players USING (p)),
    dec AS (
        SELECT CASE WHEN a.q > b.q THEN a.p ELSE b.p END AS win,
               CASE WHEN a.q > b.q THEN b.p ELSE a.p END AS lose
        FROM member a JOIN member b ON a.o = b.o AND a.p < b.p
        WHERE a.q <> b.q),
    gd AS MATERIALIZED (
        SELECT win AS i, lose AS j, count(*) AS w
        FROM dec GROUP BY win, lose),
    g AS MATERIALIZED (
        SELECT coalesce(a.i, b.j) AS i, coalesce(a.j, b.i) AS j,
               coalesce(a.w, 0) AS w,
               coalesce(a.w, 0) + coalesce(b.w, 0) AS n
        FROM gd a FULL OUTER JOIN gd b ON a.i = b.j AND a.j = b.i),
    wins AS MATERIALIZED (
        SELECT i, sum(w) AS wi, sum(n) AS ni FROM g GROUP BY i),
    p0 AS MATERIALIZED (
        SELECT p AS i, CAST({BT_SCALE} AS BIGINT) AS s FROM players)"""
    steps = []
    for r in range(1, BT_ITERS + 1):
        prev = f"p{r - 1}"
        steps.append(f"""
    d{r} AS MATERIALIZED (
        SELECT g.i AS i,
               sum(CASE WHEN pi.s + pj.s = 0 THEN 0
                   ELSE (g.n * {BT_SCALE}) // (pi.s + pj.s) END) AS den
        FROM g JOIN {prev} pi ON g.i = pi.i
               JOIN {prev} pj ON g.j = pj.i
        GROUP BY g.i),
    p{r} AS MATERIALIZED (
        SELECT p0.i AS i,
               CAST(CASE WHEN coalesce(d{r}.den, 0) = 0 THEN 0
                    ELSE (coalesce(w.wi, 0) * {BT_SCALE}) // d{r}.den
                    END AS BIGINT) AS s
        FROM p0 LEFT JOIN d{r} ON p0.i = d{r}.i
                LEFT JOIN wins w ON p0.i = w.i)""")
    tail = f"""
    SELECT CAST(p0.i AS BIGINT) AS part_id,
           CAST(coalesce(w.wi, 0) AS BIGINT) AS n_wins,
           CAST(coalesce(w.ni, 0) AS BIGINT) AS n_games,
           CAST(p{BT_ITERS}.s AS BIGINT) AS bt_strength_scaled
    FROM p0 JOIN p{BT_ITERS} ON p0.i = p{BT_ITERS}.i
            LEFT JOIN wins w ON p0.i = w.i"""
    return head + "," + ",".join(steps) + tail


@register(
    "eval_bradley_terry",
    _bt_oracle(),
    tags=("eval", "preference", "bradley_terry", "iterative",
          "exact_arithmetic"),
    description=(
        "Bradley-Terry strength fit from pairwise wins — the "
        "arena-style preference-ranking readout (rank models from "
        "head-to-head human votes).  Players = top-24 co-purchased "
        "parts; a game = two players in one order, winner = larger "
        "quantized quantity, ties dropped.  Three fixed MM updates "
        "p' = W * 1e6 DIV sum(n_ij * 1e6 DIV (p_i + p_j)) in "
        "scaled-integer arithmetic (every division truncates "
        "non-negative quantities — bit-identical across engines and "
        "partitionings; the oracle unrolls the same three updates).  "
        "The un-normalized update is scale-stable from the 1e6 init, "
        "so no per-round global-sum broadcast; the game matrix is "
        "bounded by the player set and every iteration is two "
        "broadcast equi-joins + one map-side-combined aggregate over "
        "<= 552 rows.  The only data-sized work is the order-local "
        "pair build"
    ),
)
def eval_bradley_terry(spark: SparkSession, sf_dir: str):
    lq = (
        t(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .agg(
            F.sum(
                F.expr("CAST(floor(l_quantity * 100D + 0.5D) AS BIGINT)")
            ).alias("q")
        )
    )
    players = (
        lq.groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("p"))
        .limit(BT_PLAYERS)
        .select("p")
        # feeds the member build, the init vector and every
        # iteration's frame — pin so the top-N agg runs once
        # (reliable checkpoint under the session-default checkpoint dir)
        .transform(lambda d: lineage_pin(d, eager=False))
    )
    member = lq.join(F.broadcast(players), "p").select("o", "p", "q")
    a, b = member.alias("a"), member.alias("b")
    dec = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .filter(F.col("a.q") != F.col("b.q"))
        .select(
            F.when(F.col("a.q") > F.col("b.q"), F.col("a.p"))
            .otherwise(F.col("b.p"))
            .alias("win"),
            F.when(F.col("a.q") > F.col("b.q"), F.col("b.p"))
            .otherwise(F.col("a.p"))
            .alias("lose"),
        )
    )
    gd = (
        dec.groupBy(F.col("win").alias("i"), F.col("lose").alias("j"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    rev = gd.select(
        F.col("j").alias("i"), F.col("i").alias("j"), F.col("w").alias("wr")
    )
    g = (
        gd.join(rev, ["i", "j"], "full_outer")
        .select(
            "i",
            "j",
            F.coalesce("w", F.lit(0)).alias("w"),
            (F.coalesce("w", F.lit(0)) + F.coalesce("wr", F.lit(0))).alias("n"),
        )
        # referenced by every iteration — pin the bounded game matrix
        # (reliable checkpoint under the session-default checkpoint dir)
        .transform(lambda d: lineage_pin(d, eager=False))
    )
    wins = g.groupBy("i").agg(
        F.sum("w").alias("wi"), F.sum("n").alias("ni")
    )
    p = players.select(
        F.col("p").alias("i"), F.lit(BT_SCALE).cast("long").alias("s")
    )
    for _ in range(BT_ITERS):
        pi = p.select(F.col("i").alias("_i"), F.col("s").alias("si"))
        pj = p.select(F.col("i").alias("_j"), F.col("s").alias("sj"))
        den = (
            g.join(F.broadcast(pi), g.i == pi._i)
            .join(F.broadcast(pj), g.j == pj._j)
            .groupBy("i")
            .agg(
                F.sum(
                    F.expr(
                        f"CASE WHEN si + sj = 0 THEN 0"
                        f" ELSE (n * {BT_SCALE}) DIV (si + sj) END"
                    )
                ).alias("den")
            )
        )
        p = (
            players.select(F.col("p").alias("i"))
            .join(den, "i", "left")
            .join(wins, "i", "left")
            .select(
                "i",
                F.expr(
                    f"CAST(CASE WHEN coalesce(den, 0) = 0 THEN 0"
                    f" ELSE (coalesce(wi, 0) * {BT_SCALE}) DIV den"
                    f" END AS BIGINT)"
                ).alias("s"),
            )
        )
    return (
        p.join(wins, "i", "left")
        .select(
            F.col("i").cast("long").alias("part_id"),
            F.coalesce("wi", F.lit(0)).cast("long").alias("n_wins"),
            F.coalesce("ni", F.lit(0)).cast("long").alias("n_games"),
            F.col("s").cast("long").alias("bt_strength_scaled"),
        )
    )


@register(
    "mine_kaplan_meier_churn",
    f"""
    WITH ue AS (
        SELECT user_id,
               (epoch_us(ts) // 1000000) // 86400 AS day
        FROM events),
    last AS (SELECT user_id, max(day) AS last_day FROM ue GROUP BY user_id),
    mx AS (SELECT max(last_day) AS maxd, count(*) AS n_total FROM last),
    subj AS (
        SELECT last_day,
               CASE WHEN last_day >= maxd - {KM_CENSOR_DAYS} THEN 1
                    ELSE 0 END AS censored,
               n_total
        FROM last, mx),
    ev AS (
        SELECT last_day AS day, max(n_total) AS n_total,
               sum(1 - censored) AS d_churn,
               sum(censored) AS c_censor
        FROM subj GROUP BY last_day),
    cum AS (
        SELECT day, n_total, d_churn, c_censor,
               sum(d_churn + c_censor) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_out
        FROM ev)
    SELECT CAST(day AS BIGINT) AS day,
           CAST(n_total - (cum_out - (d_churn + c_censor)) AS BIGINT)
               AS n_risk,
           CAST(d_churn AS BIGINT) AS d_churn,
           CAST(c_censor AS BIGINT) AS c_censor,
           CAST((10000 * d_churn)
                // (n_total - (cum_out - (d_churn + c_censor)))
               AS BIGINT) AS hazard_bp
    FROM cum
    """,
    tags=("mine", "survival", "kaplan_meier", "churn", "global_cumsum",
          "exact_arithmetic"),
    description=(
        "Kaplan-Meier churn table: per day the at-risk user count, "
        "churn events (users last seen that day), right-censored "
        "count (last seen within 3 days of the corpus horizon — "
        "still active, not churned) and the discrete hazard in "
        "truncating basis points.  These are the survival "
        "estimator's exact sufficient statistics; S(t) itself is a "
        "running product of rationals (not integer-exact), one "
        "driver-side fold away — the kappa split-readout precedent.  "
        "Events reduce to per-user last-seen (one map-side-combined "
        "aggregate), then to the bounded |days| rollup; the at-risk "
        "prefix runs through the two-phase global_cumsum, and the "
        "only whole-table scalars are the 1-row (horizon, total) "
        "broadcast — n_risk is always >= d_churn + c_censor > 0 on "
        "emitted rows, so the hazard division is safe"
    ),
)
def mine_kaplan_meier_churn(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.scale import global_cumsum

    ue = t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("(unix_micros(ts) div 1000000) div 86400").alias("day"),
    )
    last = ue.groupBy("user_id").agg(F.max("day").alias("last_day"))
    mx = last.agg(
        F.max("last_day").alias("maxd"),
        F.count(F.lit(1)).alias("n_total"),
    )
    subj = last.crossJoin(F.broadcast(mx)).select(
        "last_day",
        F.when(
            F.col("last_day") >= F.col("maxd") - KM_CENSOR_DAYS, 1
        )
        .otherwise(0)
        .alias("censored"),
        "n_total",
    )
    ev = subj.groupBy(F.col("last_day").alias("day")).agg(
        F.max("n_total").alias("n_total"),
        F.sum(F.lit(1) - F.col("censored")).alias("d_churn"),
        F.sum("censored").alias("c_censor"),
    )
    cum = global_cumsum(
        ev.withColumn("out", F.col("d_churn") + F.col("c_censor")),
        ["day"],
        {"out": "cum_out"},
    )
    return cum.select(
        F.col("day").cast("long").alias("day"),
        (
            F.col("n_total") - (F.col("cum_out") - (F.col("d_churn") + F.col("c_censor")))
        )
        .cast("long")
        .alias("n_risk"),
        F.col("d_churn").cast("long").alias("d_churn"),
        F.col("c_censor").cast("long").alias("c_censor"),
        F.expr(
            "CAST((10000 * d_churn)"
            " DIV (n_total - (cum_out - (d_churn + c_censor)))"
            " AS BIGINT)"
        ).alias("hazard_bp"),
    )


@register(
    "sample_importance_reweight",
    f"""
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    tot AS (SELECT sum(n) AS nt, count(*) AS k FROM c),
    wt AS (
        SELECT lang, n, nt, k,
               ({RW_SCALE} * nt) // (k * n) AS w
        FROM c, tot),
    tw AS (SELECT sum(n * w) AS snw FROM wt)
    SELECT lang,
           CAST(n AS BIGINT) AS n_docs,
           CAST((10000 * n) // nt AS BIGINT) AS corpus_share_bp,
           CAST(w AS BIGINT) AS weight_x1e4,
           CAST((10000 * n * w) // snw AS BIGINT) AS post_share_bp
    FROM wt, tw
    """,
    tags=("sample", "importance", "reweight", "mixture",
          "exact_arithmetic"),
    description=(
        "importance reweighting to a uniform language target: "
        "per-language weight = target/actual share in fixed-point "
        "1e4 (truncating — non-negative on both engines), plus the "
        "post-reweight share audit showing where the truncated "
        "weights actually land (exactly uniform only in the limit; "
        "the audit makes the fixed-point error visible instead of "
        "assumed away).  The corpus reduces to the |languages| "
        "rollup immediately; the weight table is the broadcast a "
        "sampler applies at read time — reweighting 100 TB costs one "
        "map-side join.  Two 1-row broadcasts (corpus totals, then "
        "the reweighted mass) — the second depends on the first, so "
        "they cannot fuse"
    ),
)
def sample_importance_reweight(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "documents").groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = c.agg(F.sum("n").alias("nt"), F.count(F.lit(1)).alias("k"))
    wt = c.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n",
        "nt",
        F.expr(f"({RW_SCALE} * nt) DIV (k * n)").alias("w"),
    )
    tw = wt.agg(F.sum(F.col("n") * F.col("w")).alias("snw"))
    return wt.crossJoin(F.broadcast(tw)).select(
        "lang",
        F.col("n").cast("long").alias("n_docs"),
        F.expr("CAST((10000 * n) DIV nt AS BIGINT)").alias("corpus_share_bp"),
        F.col("w").cast("long").alias("weight_x1e4"),
        F.expr("CAST((10000 * n * w) DIV snw AS BIGINT)").alias(
            "post_share_bp"
        ),
    )
