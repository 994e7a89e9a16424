"""Remaining TPC-H query *shapes*, adapted to the fixture schema.

The fixtures (FIXTURES.md §B) have no ``partsupp`` table and lineitem
carries only ``l_shipdate`` (no commit/receipt dates, no ship mode), so
the queries below keep each TPC-H plan shape — correlated min subquery,
two-level aggregation, nested HAVING semi join, unique-offender
anti-join decomposition — while re-expressing the predicates over the
columns that exist.  Together with q01/q03/q04/q05/q07/q10/q14/q18/
q19/q22 in ``relational.py`` this completes all 22 TPC-H shapes.

Determinism conventions (see ``plans/core.py``): integer outputs cast
to BIGINT, double sums round(2), ratios as floor basis points, and any
LIMIT under a total ORDER BY.  Thresshold comparisons only ever compare
doubles computed from identical operands on both engines (min/exact
integer-valued sums), never differently-ordered float accumulations.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from sfs3_kinesis_spark.plans.core import register, t


@register(
    "q02_min_cost_supplier",
    """
    WITH ps AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               min(l_extendedprice) AS min_price
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (
        SELECT partkey, min(min_price) AS best_price FROM ps GROUP BY partkey
    )
    SELECT p_partkey, p_brand, s_name, round(ps.min_price, 2) AS unit_price
    FROM part
    JOIN ps   ON p_partkey = ps.partkey
    JOIN best ON ps.partkey = best.partkey AND ps.min_price = best.best_price
    JOIN supplier ON s_suppkey = ps.suppkey
    WHERE p_size <= 10
    ORDER BY p_partkey, s_name
    LIMIT 100
    """,
    tags=("join", "subquery", "topk"),
    description=(
        "TPC-H Q2 shape: cheapest supplier per part — correlated-min "
        "subquery planned as aggregate + equi-join back on (part, min); "
        "ties kept, total order (lineitem stands in for partsupp)"
    ),
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    s = t(spark, sf_dir, "supplier")
    ps = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min("l_extendedprice").alias("min_price"))
    # min of raw input values: order-independent, identical across engines
    best = ps.groupBy("partkey").agg(F.min("min_price").alias("best_price"))
    return (
        ps.join(best, (ps.partkey == best.partkey) & (ps.min_price == best.best_price))
        .drop(best.partkey)
        .join(F.broadcast(p), F.col("partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("suppkey") == s.s_suppkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.round("min_price", 2).alias("unit_price"),
        )
        .orderBy("p_partkey", "s_name")
        .limit(100)
    )


@register(
    "q06_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "filter_pushdown"),
    description=(
        "TPC-H Q6 shape: pure filter + single aggregate — every predicate "
        "pushes to the parquet scan; the canonical scan-efficiency probe"
    ),
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@register(
    "q08_market_share",
    """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(floor(10000 * sum(CASE WHEN n2.n_name = 'NATION_7'
                                       THEN l_extendedprice * (1 - l_discount)
                                       ELSE 0 END)
                      / sum(l_extendedprice * (1 - l_discount))) AS BIGINT)
               AS mkt_share_bp
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = c_nationkey
    JOIN region   ON r_regionkey = n1.n_regionkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n2 ON n2.n_nationkey = s_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY o_year
    """,
    tags=("join", "agg", "conditional"),
    description=(
        "TPC-H Q8 shape: national market share — double role of nation "
        "(customer side vs supplier side), conditional-sum ratio per year "
        "in floor basis points (cross-engine round ties avoided)"
    ),
)
def q08_market_share(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").alias("n1")
    n2 = t(spark, sf_dir, "nation").alias("n2")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2.n_nationkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.floor(
                10000
                * F.sum(F.when(F.col("n2.n_name") == "NATION_7", rev).otherwise(F.lit(0.0)))
                / F.sum(rev)
            )
            .cast("bigint")
            .alias("mkt_share_bp")
        )
    )


@register(
    "q09_product_profit",
    """
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           sum(CAST(round(10000 * (l_extendedprice * (1 - l_discount)
                                   - 0.5 * p_retailprice * l_quantity), 0)
                    AS BIGINT)) AS profit_e4
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, year(o_orderdate)
    """,
    tags=("join", "agg"),
    description=(
        "TPC-H Q9 shape: profit by supplier nation and year — 5-way join "
        "with a LIKE part filter; profit expression uses p_retailprice as "
        "the cost stand-in (no partsupp.ps_supplycost in the fixtures)"
    ),
)
def q09_product_profit(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    # every term has <=4 decimal digits, so 1e4 fixed-point per-row
    # rounding is exact and the BIGINT sum is order-independent —
    # round(sum(double), 2) ties at the half-cent differently per
    # engine because partial-aggregate combine order differs
    profit_e4 = F.round(
        10000
        * (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
        ),
        0,
    ).cast("bigint")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(profit_e4).alias("profit_e4"))
    )


@register(
    "q11_important_stock",
    """
    WITH pv AS (
        SELECT l_partkey, sum(l_extendedprice * l_quantity) AS part_value
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, round(part_value, 2) AS part_value
    FROM pv
    WHERE part_value > (SELECT 1.2 * sum(l_extendedprice * l_quantity)
                              / count(DISTINCT l_partkey)
                        FROM lineitem)
    ORDER BY part_value DESC, p_partkey
    LIMIT 100
    """,
    tags=("agg", "subquery", "having"),
    description=(
        "TPC-H Q11 shape: parts holding an outsized share of total value — "
        "HAVING against a scalar-subquery global threshold (1-row "
        "broadcast); per-part value from lineitem (no partsupp)"
    ),
)
def q11_important_stock(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    val = F.col("l_extendedprice") * F.col("l_quantity")
    pv = li.groupBy("l_partkey").agg(F.sum(val).alias("part_value"))
    # relative threshold (1.2x the average part value) keeps the
    # query non-degenerate at every scale factor — a fixed fraction
    # of the total value selects nothing once the part count grows
    thr = li.agg((1.2 * F.sum(val) / F.countDistinct("l_partkey")).alias("thr"))
    return (
        pv.join(F.broadcast(thr))
        .filter(F.col("part_value") > F.col("thr"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("part_value", 2).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
        .limit(100)
    )


@register(
    "q12_ship_latency_priority",
    """
    SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30
                THEN 'FAST' ELSE 'SLOW' END AS ship_bucket,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY ship_bucket
    """,
    tags=("join", "agg", "conditional"),
    description=(
        "TPC-H Q12 shape: priority counts by shipping bucket — fact-fact "
        "join with conditional aggregation; ship latency (shipdate minus "
        "orderdate) stands in for the missing ship-mode column"
    ),
)
def q12_ship_latency_priority(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy(
            F.when(F.datediff("l_shipdate", "o_orderdate") <= 30, "FAST")
            .otherwise("SLOW")
            .alias("ship_bucket")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_order_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    ) AS per_cust
    GROUP BY c_count
    """,
    tags=("join", "outer", "agg"),
    description=(
        "TPC-H Q13 shape: customer order-count distribution — left outer "
        "join with an ON-clause filter (kept pre-join so zero-order "
        "customers survive), then a second aggregation over the first"
    ),
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    """
    WITH rev AS (
        SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(total_rev, 2) AS total_rev
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    """,
    tags=("join", "subquery", "argmax"),
    description=(
        "TPC-H Q15 shape: top supplier by quarterly revenue — aggregate "
        "view + scalar-max subquery join-back (the view is computed once, "
        "argmax resolved within-engine so float accumulation order cannot "
        "flip the winner across engines unless revenues tie within ulps)"
    ),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.round("total_rev", 2).alias("total_rev"))
    )


@register(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_name LIKE '%00009%')
    GROUP BY p_brand, p_size
    """,
    tags=("join", "anti", "distinct", "agg"),
    description=(
        "TPC-H Q16 shape: supplier diversity per part attribute — NOT IN "
        "exclusion list planned as a broadcast anti join, then distinct "
        "aggregation (lineitem stands in for partsupp)"
    ),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    excluded = t(spark, sf_dir, "supplier").filter(F.col("s_name").like("%00009%"))
    return (
        li.join(F.broadcast(excluded), li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT round(sum(l_extendedprice) / CAST(7.0 AS DOUBLE), 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand IN ('Brand#11', 'Brand#12')
      AND l_quantity < (SELECT CAST(0.3 AS DOUBLE) * avg(l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = part.p_partkey)
    """,
    tags=("join", "subquery", "correlated"),
    description=(
        "TPC-H Q17 shape: small-quantity order revenue — correlated AVG "
        "subquery per part, de-correlated by Catalyst into an aggregate + "
        "equi-join (quantities are integer-valued doubles, so the avg "
        "threshold is bit-identical across engines)"
    ),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand").isin("Brand#11", "Brand#12"))
    avg_qty = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        (F.lit(0.3) * F.avg("l_quantity")).alias("qty_thr")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ak"))
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg((F.round(F.sum("l_extendedprice") / 7.0, 2)).alias("avg_yearly"))
    )


@register(
    "q20_dominant_part_suppliers",
    """
    WITH shipped AS (
        SELECT l_suppkey, l_partkey, sum(l_quantity) AS supp_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey, l_partkey
    ),
    totals AS (
        SELECT l_partkey AS tp, sum(supp_qty) AS part_qty
        FROM shipped GROUP BY l_partkey
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_regionkey = 0
      AND s_suppkey IN (
          SELECT l_suppkey FROM shipped JOIN totals ON l_partkey = tp
          WHERE supp_qty > 0.3 * part_qty
      )
    """,
    tags=("join", "semi", "subquery", "agg"),
    description=(
        "TPC-H Q20 shape: suppliers dominating some part's shipments — "
        "nested aggregate subquery (per-supplier share vs per-part total) "
        "feeding an IN, planned as a semi join; region-restricted "
        "dimension side broadcast"
    ),
)
def q20_dominant_part_suppliers(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    shipped = li.groupBy("l_suppkey", "l_partkey").agg(F.sum("l_quantity").alias("supp_qty"))
    totals = shipped.groupBy(F.col("l_partkey").alias("tp")).agg(
        F.sum("supp_qty").alias("part_qty")
    )
    dominant = (
        shipped.join(totals, shipped.l_partkey == totals.tp)
        # quantities are integer-valued doubles: both sums are exact,
        # so the 30%-share threshold cannot flip across engines
        .filter(F.col("supp_qty") > 0.3 * F.col("part_qty"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "n_name")
    )


@register(
    "q21_waiting_suppliers",
    """
    WITH lines AS (
        SELECT l_orderkey, l_suppkey,
               max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                        THEN 1 ELSE 0 END) AS is_late
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY l_orderkey, l_suppkey
    ),
    marked AS (
        SELECT l_orderkey, l_suppkey, is_late,
               count(*)     OVER (PARTITION BY l_orderkey) AS n_supp,
               sum(is_late) OVER (PARTITION BY l_orderkey) AS n_late
        FROM lines
    )
    SELECT s_name, count(*) AS numwait
    FROM marked JOIN supplier ON s_suppkey = l_suppkey
    WHERE is_late = 1 AND n_supp >= 2 AND n_late = 1
    GROUP BY s_name
    """,
    tags=("join", "semi", "anti", "window"),
    description=(
        "TPC-H Q21 shape: suppliers who alone kept finished orders "
        "waiting — EXISTS(other supplier) + NOT EXISTS(other late "
        "supplier) decomposed into one per-order aggregation instead of "
        "two correlated self-join probes (one shuffle of the fact, no "
        "O(n^2) per-order scans; lateness = shipped >60 days after order)"
    ),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = t(spark, sf_dir, "supplier")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"), 1
    ).otherwise(0)
    lines = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    w = Window.partitionBy("l_orderkey")
    marked = lines.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("is_late").over(w).alias("n_late"),
    )
    return (
        marked.filter((F.col("is_late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
