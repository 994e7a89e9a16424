"""Relational operator corpus — joins, aggregations, window
functions, sorts, set ops, scalar functions.

The reference has no relational layer (SURVEY.md §2.12 — every
classical family is ABSENT); these queries are the engine's
green-field coverage of each family, exercised over the TPC-H-ish
fixtures and validated against the DuckDB oracle.

Scale notes (100 TB posture):
* fact-side tables (lineitem/orders) are never broadcast; dimension
  tables (region/nation/supplier/part/customer) are small by
  construction and Catalyst broadcasts them under the configured
  threshold — `F.broadcast` hints mark the intent explicitly where
  the dimension is guaranteed tiny.
* aggregations rely on partial (map-side) aggregation — Spark plans
  HashAggregate(partial) → shuffle → HashAggregate(final)
  automatically; nothing here forces a row explosion before the agg.
* top-k uses orderBy+limit which Spark executes as
  TakeOrderedAndProject (per-partition heap + driver merge of k
  rows), not a global sort.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sfs3_kinesis_spark.plans.core import register, t, t_nonnull

# ----------------------------------------------------------------- #
# aggregations (SURVEY §2.5)                                        #
# ----------------------------------------------------------------- #


@register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                          AS sum_qty,
           round(sum(l_extendedprice), 2)                                     AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
           round(avg(l_quantity), 4)                                          AS avg_qty,
           round(avg(l_extendedprice), 4)                                     AS avg_price,
           round(avg(l_discount), 4)                                          AS avg_disc,
           count(*)                                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "groupby"),
    description="TPC-H Q1 shape: multi-aggregate groupBy with filter pushdown",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_distinct_suppliers",
    """
    SELECT l_returnflag,
           count(DISTINCT l_suppkey)  AS n_supp,
           count(DISTINCT l_partkey)  AS n_part,
           count(*)                   AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "distinct"),
    description="distinct aggregation (expand + two-phase agg in Spark)",
)
def agg_distinct_suppliers(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_stats_orders",
    """
    SELECT o_orderpriority,
           count(*)                                  AS n,
           round(avg(o_totalprice), 4)               AS avg_price,
           round(min(o_totalprice), 2)               AS min_price,
           round(max(o_totalprice), 2)               AS max_price,
           round(stddev_samp(o_totalprice), 4)       AS sd_price,
           round(quantile_cont(o_totalprice, 0.5), 4) AS median_price
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "stats"),
    description="statistical aggregates incl. exact interpolated median",
)
def agg_stats_orders(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
    )


@register(
    "agg_cube_lineitem",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*)                  AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
    description="CUBE: all grouping-set combinations incl. grand total",
)
def agg_cube_lineitem(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n")
    )


@register(
    "agg_rollup_orders",
    """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year, o_orderpriority,
           round(sum(o_totalprice), 2) AS sum_price,
           count(*)                    AS n
    FROM orders GROUP BY ROLLUP (order_year, o_orderpriority)
    """,
    tags=("agg", "rollup"),
    description="ROLLUP over derived year + priority",
)
def agg_rollup_orders(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders").withColumn("order_year", F.year("o_orderdate").cast("long"))
    return o.rollup("order_year", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"), F.count(F.lit(1)).alias("n")
    )


@register(
    "agg_grouping_sets_geo",
    """
    SELECT r_name, n_name, count(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name), (r_name, n_name), ())
    """,
    tags=("agg", "grouping_sets", "join"),
    description="explicit GROUPING SETS over a snowflake join",
)
def agg_grouping_sets_geo(spark: SparkSession, sf_dir: str):
    for name in ("customer", "nation", "region"):
        t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(
        """
        SELECT r_name, n_name, count(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (r_name, n_name), ())
        """
    )


# ----------------------------------------------------------------- #
# joins (SURVEY §2.4)                                               #
# ----------------------------------------------------------------- #


@register(
    "q03_shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
    description="TPC-H Q3 shape: 3-way join + agg + deterministic top-k",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q05_regional_volume",
    """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY n_name
    """,
    tags=("join",),
    description="TPC-H Q5 shape: 6-way snowflake join, dims broadcast",
)
def q05_regional_volume(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "join_semi_big_spenders",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
    tags=("join", "semi"),
    description="left-semi join (EXISTS)",
)
def join_semi_big_spenders(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti_nations_without_suppliers",
    """
    SELECT n_nationkey, n_name
    FROM nation
    WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
    """,
    tags=("join", "anti"),
    description="left-anti join (NOT EXISTS)",
)
def join_anti_nations_without_suppliers(spark: SparkSession, sf_dir: str):
    n = t(spark, sf_dir, "nation")
    s = t(spark, sf_dir, "supplier")
    return n.join(s, n.n_nationkey == s.s_nationkey, "left_anti").select("n_nationkey", "n_name")


@register(
    "join_left_nation_supplier_counts",
    """
    SELECT n_nationkey, n_name,
           count(s_suppkey)                          AS n_suppliers,
           round(coalesce(sum(s_acctbal), 0.0), 2)   AS total_acctbal
    FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
    GROUP BY n_nationkey, n_name
    """,
    tags=("join", "outer"),
    description="left outer join preserving unmatched dimension rows",
)
def join_left_nation_supplier_counts(spark: SparkSession, sf_dir: str):
    n = t(spark, sf_dir, "nation")
    s = t(spark, sf_dir, "supplier")
    return (
        n.join(s, n.n_nationkey == s.s_nationkey, "left")
        .groupBy("n_nationkey", "n_name")
        .agg(
            F.count("s_suppkey").alias("n_suppliers"),
            F.round(F.coalesce(F.sum("s_acctbal"), F.lit(0.0)), 2).alias("total_acctbal"),
        )
    )


@register(
    "join_full_nation_activity",
    """
    WITH c AS (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT coalesce(c.k, s.k)        AS nationkey,
           coalesce(n_cust, 0)       AS n_cust,
           coalesce(n_supp, 0)       AS n_supp
    FROM c FULL OUTER JOIN s ON c.k = s.k
    """,
    tags=("join", "outer"),
    description="full outer join of two pre-aggregated sides",
)
def join_full_nation_activity(spark: SparkSession, sf_dir: str):
    c = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, "k", "full_outer").select(
        F.col("k").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@register(
    "q04_late_shipments",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    tags=("join", "semi", "agg"),
    description="TPC-H Q4 shape: correlated EXISTS with a cross-table date condition -> semi join",
)
def q04_late_shipments(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    matched = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q07_nation_volume",
    """
    SELECT supp_nation, cust_nation, order_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(o_orderdate) AS BIGINT) AS order_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, order_year
    """,
    tags=("join", "agg"),
    description="TPC-H Q7 shape: bidirectional nation-pair volume by year (OR-pair join filter)",
)
def q07_nation_volume(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .withColumn("order_year", F.year("o_orderdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "order_year")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q10_returned_revenue",
    """
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk"),
    description=(
        "TPC-H Q10 shape: returned-item revenue by customer — fact-fact "
        "join with pushed-down flag/date filters, broadcast dim, top-20"
    ),
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_revenue",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-05-01'
    """,
    tags=("join", "agg", "conditional"),
    description=(
        "TPC-H Q14 shape: promo revenue share — conditional aggregation "
        "over a fact-dim join; the date filter prunes the fact scan"
    ),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-05-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0)))
                / F.sum(vol),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q18_large_volume_customers",
    """
    SELECT c_custkey, c_name, o_orderkey,
           round(o_totalprice, 2)          AS total_price,
           CAST(sum(l_quantity) AS BIGINT) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("join", "semi", "agg", "topk"),
    description=(
        "TPC-H Q18 shape: large-volume orders — aggregate-HAVING subquery "
        "planned as a semi join on the grouped fact, then re-join + top-k"
    ),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(c, o.o_custkey == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            "total_qty",
        )
    )


@register(
    "q19_bracketed_predicates",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#18' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "disjunctive"),
    description=(
        "TPC-H Q19 shape: disjunction of cross-table predicate brackets — "
        "Catalyst extracts the common equi-key so the OR does not force a "
        "nested-loop join"
    ),
)
def q19_bracketed_predicates(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    bracket = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#18") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(bracket)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q22_dormant_rich_customers",
    """
    SELECT c_nationkey,
           count(*)                  AS n_cust,
           round(sum(c_acctbal), 2)  AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey
    """,
    tags=("subquery", "anti", "agg"),
    description=(
        "TPC-H Q22 shape: above-average balances with no recent orders — "
        "scalar-subquery threshold (1-row broadcast) + anti join"
    ),
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    thr = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("thr"))
    return (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@register(
    "subquery_above_global_avg",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS total_price
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
    """,
    tags=("subquery", "scalar"),
    description="scalar subquery in a filter (planned as a 1-row broadcast)",
)
def subquery_above_global_avg(spark: SparkSession, sf_dir: str):
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS total_price
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
        """
    )


@register(
    "subquery_correlated_cust_max",
    """
    SELECT o.o_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS total_price
    FROM orders o
    WHERE o.o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
                            WHERE o2.o_custkey = o.o_custkey)
    """,
    tags=("subquery", "correlated"),
    description=(
        "correlated subquery (each customer's max-price order) — Catalyst "
        "de-correlates it into an aggregate + equi-join, not a per-row probe"
    ),
)
def subquery_correlated_cust_max(spark: SparkSession, sf_dir: str):
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o.o_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS total_price
        FROM orders o
        WHERE o.o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
                                WHERE o2.o_custkey = o.o_custkey)
        """
    )


# ----------------------------------------------------------------- #
# window functions (SURVEY §2.6)                                    #
# ----------------------------------------------------------------- #


@register(
    "window_topk_orders_per_customer",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total_price,
             CAST(row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
    tags=("window", "topk"),
    description="top-k per group via row_number (no global sort)",
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("total_price"), "rn")
    )


@register(
    "window_rank_dense",
    """
    SELECT o_orderpriority, o_orderkey,
           CAST(rank()       OVER (PARTITION BY o_orderpriority ORDER BY round(o_totalprice, 2) DESC, o_orderkey) AS BIGINT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY round(o_totalprice, 2) DESC, o_orderkey) AS BIGINT) AS drnk
    FROM orders WHERE o_totalprice > 450000
    """,
    tags=("window", "rank"),
    description="rank / dense_rank over a filtered partition",
)
def window_rank_dense(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    w = W.partitionBy("o_orderpriority").orderBy(F.desc(F.round("o_totalprice", 2)), F.asc("o_orderkey"))
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@register(
    "window_running_total",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS UNBOUNDED PRECEDING), 2) AS running_total,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
    FROM orders
    """,
    tags=("window", "frame"),
    description="running sum + sliding 3-row moving average",
)
def window_running_total(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2).alias(
            "running_total"
        ),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias("moving_avg3"),
    )


@register(
    "window_distribution_funcs",
    """
    SELECT o_orderkey, o_orderpriority,
           CAST(ntile(4) OVER w AS BIGINT)                         AS quartile,
           CAST(floor((percent_rank() OVER w) * 10000) AS BIGINT)  AS pr_bp,
           CAST(floor((cume_dist() OVER w) * 10000) AS BIGINT)     AS cd_bp,
           first_value(o_totalprice) OVER w                        AS part_min_price,
           last_value(o_totalprice) OVER (
             PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS part_max_price
    FROM orders
    WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("window", "distribution"),
    description=(
        "distribution window functions — ntile quartiles, percent_rank / "
        "cume_dist in basis points (floor, not round: floor is identical "
        "across engines, round ties are not), first/last_value frames"
    ),
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str):
    o = t_nonnull(spark, sf_dir, "orders", "o_orderpriority", "o_totalprice")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.floor(F.percent_rank().over(w) * 10000).alias("pr_bp"),
        F.floor(F.cume_dist().over(w) * 10000).alias("cd_bp"),
        F.first("o_totalprice").over(w).alias("part_min_price"),
        F.last("o_totalprice").over(wf).alias("part_max_price"),
    )


# ----------------------------------------------------------------- #
# sorts / limits / top-k (SURVEY §2.7)                              #
# ----------------------------------------------------------------- #


@register(
    "sort_topk_orders",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS total_price, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("sort", "topk"),
    description="global top-k (TakeOrderedAndProject, not a full sort)",
)
def sort_topk_orders(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total_price"), "o_orderdate")
    )


@register(
    "sort_nulls_ordering",
    """
    SELECT event_id, CAST(props->>'$.missing' AS BIGINT) AS maybe_null
    FROM events
    ORDER BY maybe_null DESC NULLS LAST, event_id
    LIMIT 100
    """,
    tags=("sort", "nulls"),
    description=(
        "explicit NULLS LAST ordering — Spark defaults nulls-first on ASC, "
        "DuckDB nulls-last; explicit placement is the only portable form"
    ),
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    return (
        e.select(
            "event_id",
            F.get_json_object("props", "$.missing").cast("long").alias("maybe_null"),
        )
        .orderBy(F.col("maybe_null").desc_nulls_last(), F.col("event_id").asc())
        .limit(100)
    )


# ----------------------------------------------------------------- #
# set operations (SURVEY §2.8)                                      #
# ----------------------------------------------------------------- #


@register(
    "set_union_nations",
    """
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
    UNION
    SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
    """,
    tags=("setop",),
    description="UNION (distinct) of two key sets",
)
def set_union_nations(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("long").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("long").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "set_intersect_nations",
    """
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
    INTERSECT
    SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
    """,
    tags=("setop",),
    description="INTERSECT (distinct)",
)
def set_intersect_nations(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("long").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("long").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except_nations",
    """
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
    EXCEPT
    SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
    """,
    tags=("setop",),
    description="EXCEPT (distinct)",
)
def set_except_nations(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("long").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("long").alias("nationkey"))
    return c.subtract(s)  # EXCEPT DISTINCT (exceptAll would be multiset semantics)


@register(
    "set_union_all_keys",
    """
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
    UNION ALL
    SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
    """,
    tags=("setop", "multiset"),
    description="UNION ALL (multiset append, no dedup shuffle)",
)
def set_union_all_keys(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("long").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("long").alias("nationkey"))
    return c.union(s)


@register(
    "set_intersect_all_keys",
    """
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
    INTERSECT ALL
    SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
    """,
    tags=("setop", "multiset"),
    description="INTERSECT ALL (multiset: min of per-side multiplicities)",
)
def set_intersect_all_keys(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("long").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("long").alias("nationkey"))
    return c.intersectAll(s)


@register(
    "set_except_all_keys",
    """
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
    EXCEPT ALL
    SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
    """,
    tags=("setop", "multiset"),
    description="EXCEPT ALL (multiset difference: multiplicity-aware)",
)
def set_except_all_keys(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").cast("long").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").cast("long").alias("nationkey"))
    return c.exceptAll(s)


# ----------------------------------------------------------------- #
# scalar functions (SURVEY §2.9)                                    #
# ----------------------------------------------------------------- #


@register(
    "scalar_string_customer",
    """
    SELECT c_custkey,
           upper(c_name)                             AS name_upper,
           lower(c_mktsegment)                       AS seg_lower,
           CAST(length(c_name) AS BIGINT)            AS name_len,
           substr(c_name, 1, 8)                      AS name_prefix,
           concat(c_name, ':', c_mktsegment)         AS name_seg,
           replace(c_name, '#', '')                  AS name_nohash,
           reverse(c_mktsegment)                     AS seg_rev,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded
    FROM customer
    """,
    tags=("scalar", "string"),
    description="string function family (reference §2.9: hex format, concat)",
)
def scalar_string_customer(spark: SparkSession, sf_dir: str):
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "c_name", "c_mktsegment").alias("name_seg"),
        F.regexp_replace("c_name", "#", "").alias("name_nohash"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
    )


@register(
    "scalar_regexp_documents",
    r"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           regexp_extract(text, '^(\w+)', 1)                       AS first_word,
           CAST(len(regexp_extract_all(text, '[aeiou][aeiou]')) AS BIGINT)
                                                                   AS n_double_vowel,
           regexp_replace(substr(text, 1, 40), '[aeiou]', '_', 'g') AS masked_prefix,
           CAST(regexp_matches(text, 'spark') AS INT)               AS mentions_spark
    FROM documents
    """,
    tags=("scalar", "regexp", "text"),
    description=(
        "regexp scalar family: extract / count / global replace / match "
        "(DuckDB regexp_replace needs the 'g' flag to match Spark's "
        "replace-all semantics)"
    ),
)
def scalar_regexp_documents(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"^(\w+)", 1).alias("first_word"),
        F.regexp_count("text", F.lit("[aeiou][aeiou]")).cast("long").alias("n_double_vowel"),
        F.regexp_replace(F.substring("text", 1, 40), "[aeiou]", "_").alias("masked_prefix"),
        F.col("text").rlike("spark").cast("int").alias("mentions_spark"),
    )


@register(
    "scalar_date_orders",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)                      AS order_year,
           CAST(month(o_orderdate) AS BIGINT)                     AS order_month,
           CAST(day(o_orderdate) AS BIGINT)                       AS order_day,
           CAST(quarter(o_orderdate) AS BIGINT)                   AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)    AS month_start,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch_start
    FROM orders
    """,
    tags=("scalar", "date"),
    description="date/time function family",
)
def scalar_date_orders(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("long")
        .alias("days_since_epoch_start"),
    )


@register(
    "scalar_math_lineitem",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT) AS charge_cents,
           round(abs(l_discount - 0.05), 4)                           AS disc_dev,
           CAST(ceil(l_extendedprice) AS BIGINT)                      AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT)                     AS price_floor,
           round(sqrt(l_quantity), 6)                                 AS qty_sqrt,
           round(ln(l_extendedprice), 6)                              AS price_ln,
           CAST(l_orderkey % 7 AS BIGINT)                             AS key_mod
    FROM lineitem
    """,
    tags=("scalar", "math"),
    description="arithmetic / math function family",
)
def scalar_math_lineitem(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # floor-to-cents, not round(x, 2): both engines compute the same
        # IEEE double product, but their decimal-rounding tie behavior
        # differs (BigDecimal HALF_UP vs scaled-double) — floor is
        # deterministic on identical doubles
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")) * 100)
        .cast("long")
        .alias("charge_cents"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod"),
    )


@register(
    "case_when_order_status",
    """
    SELECT CASE WHEN o_orderstatus = 'F' THEN 200
                WHEN o_orderstatus = 'P' THEN 102
                ELSE 400 END          AS http_code,
           count(*)                   AS n
    FROM orders GROUP BY 1
    """,
    tags=("scalar", "case"),
    description="3-way CASE WHEN branch (reference P5 status routing, pollingsvc.js:77-93)",
)
def case_when_order_status(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    return (
        o.withColumn(
            "http_code",
            F.when(F.col("o_orderstatus") == "F", 200)
            .when(F.col("o_orderstatus") == "P", 102)
            .otherwise(400),
        )
        .groupBy("http_code")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "pivot_priority_status",
    """
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS status_O,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS status_F,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS status_P
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "pivot"),
    description="pivot (conditional aggregation) by order status",
)
def pivot_priority_status(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    piv = o.groupBy("o_orderpriority").pivot("o_orderstatus", ["O", "F", "P"]).count()
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("status_O"),
        F.coalesce(F.col("F"), F.lit(0)).alias("status_F"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_P"),
    )


@register(
    "agg_histogram_prices",
    """
    SELECT CAST(floor(o_totalprice / 30000) AS BIGINT) AS bin_id,
           CAST(floor(o_totalprice / 30000) AS BIGINT) * 30000 AS bin_lo,
           count(*)                                    AS n_orders,
           round(min(o_totalprice), 2)                 AS bin_min,
           round(max(o_totalprice), 2)                 AS bin_max
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("agg", "histogram"),
    description=(
        "equi-width histogram via floor-division binning — one partial+ "
        "final aggregate, the building block for distribution profiling "
        "at scale (floor, not width_bucket: identical across engines)"
    ),
)
def agg_histogram_prices(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    bin_id = F.floor(F.col("o_totalprice") / 30000).cast("long")
    return (
        o.groupBy(
            bin_id.alias("bin_id"),
            (bin_id * 30000).alias("bin_lo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("bin_min"),
            F.round(F.max("o_totalprice"), 2).alias("bin_max"),
        )
    )


@register(
    "reshape_unpivot_lineitem",
    """
    SELECT l_orderkey, l_linenumber, measure, round(value, 2) AS value
    FROM (
      SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value
      FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem)
    WHERE l_orderkey <= 1000
    """,
    tags=("reshape", "unpivot"),
    description=(
        "unpivot/melt: wide measure columns to (measure, value) rows via "
        "the native unpivot operator (an Expand node — one scan, no "
        "self-union re-reads; the SQL twin spells it as UNION ALL)"
    ),
)
def reshape_unpivot_lineitem(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "value",
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.expr("substring(measure, 3)").alias("measure"),  # l_quantity -> quantity
        F.round("value", 2).alias("value"),
    )


@register(
    "scalar_null_handling",
    """
    SELECT event_id,
           coalesce(CAST(json_extract_string(props, '$.missing') AS BIGINT), -1)
                                                            AS k_or_default,
           CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT DISTINCT FROM 1
                                                            AS k_is_one_nullsafe,
           nullif(event_type, 'click')                       AS type_no_click,
           CAST(CASE WHEN value IS NULL THEN 1 ELSE 0 END AS INT) AS value_missing
    FROM events
    """,
    tags=("scalar", "nulls"),
    description=(
        "null-handling family: coalesce defaults, null-safe equality "
        "(<=> / IS NOT DISTINCT FROM), nullif, explicit missingness flag"
    ),
)
def scalar_null_handling(spark: SparkSession, sf_dir: str):
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.select(
        "event_id",
        F.coalesce(F.get_json_object("props", "$.missing").cast("long"), F.lit(-1)).alias(
            "k_or_default"
        ),
        k.eqNullSafe(F.lit(1)).alias("k_is_one_nullsafe"),
        F.nullif("event_type", F.lit("click")).alias("type_no_click"),
        F.when(F.col("value").isNull(), 1).otherwise(0).cast("int").alias("value_missing"),
    )


@register(
    "join_lateral_topn_per_customer",
    """
    SELECT c_custkey, o_orderkey, o_totalprice
    FROM customer JOIN LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) AS o ON true
    WHERE c_custkey < 200
    """,
    tags=("join", "lateral", "topk"),
    description=(
        "correlated LATERAL join (top-2 orders per customer): the "
        "correlated-subquery spelling of per-group top-k — Catalyst "
        "de-correlates the lateral limit instead of probing orders "
        "once per customer row; the window row_number form "
        "(window_topk_orders_per_customer) is its plan-shape twin"
    ),
)
def join_lateral_topn_per_customer(spark: SparkSession, sf_dir: str):
    t(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("_lat_orders")
    return spark.sql(
        """
        SELECT c_custkey, o_orderkey, o_totalprice
        FROM _lat_customer JOIN LATERAL (
            SELECT o_orderkey, o_totalprice FROM _lat_orders
            WHERE o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) AS o
        WHERE c_custkey < 200
        """
    )


@register(
    "join_null_aware_anti",
    """
    SELECT
      (SELECT count(*) FROM orders
       WHERE o_custkey NOT IN (SELECT nullif(c_custkey, 7) FROM customer
                               WHERE c_custkey < 20))       AS n_with_null_set,
      (SELECT count(*) FROM orders
       WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                               WHERE c_custkey < 20 AND c_custkey <> 7))
                                                            AS n_null_free_set
    """,
    tags=("join", "anti", "null_semantics", "subquery"),
    description=(
        "null-aware anti join (the NOT IN trap): a single NULL in the "
        "subquery set makes NOT IN unsatisfiable (0 rows), while the "
        "null-free set anti-joins normally — Spark plans the former as "
        "a null-aware anti join, and both engines must agree on the "
        "three-valued logic"
    ),
)
def join_null_aware_anti(spark: SparkSession, sf_dir: str):
    t(spark, sf_dir, "customer").createOrReplaceTempView("_naa_customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("_naa_orders")
    return spark.sql(
        """
        SELECT
          (SELECT count(*) FROM _naa_orders
           WHERE o_custkey NOT IN (SELECT nullif(c_custkey, 7) FROM _naa_customer
                                   WHERE c_custkey < 20))   AS n_with_null_set,
          (SELECT count(*) FROM _naa_orders
           WHERE o_custkey NOT IN (SELECT c_custkey FROM _naa_customer
                                   WHERE c_custkey < 20 AND c_custkey <> 7))
                                                            AS n_null_free_set
        """
    )


_RECURSIVE_WALK_SQL = """
WITH RECURSIVE ptr AS (
  SELECT o_custkey, o_orderkey,
         lead(o_orderkey) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS nxt,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM {orders} WHERE o_custkey < 50
),
walk AS (
  SELECT o_custkey, o_orderkey, nxt, CAST(1 AS BIGINT) AS hop
  FROM ptr WHERE rn = 1
  UNION ALL
  SELECT p.o_custkey, p.o_orderkey, p.nxt, w.hop + 1
  FROM walk w JOIN ptr p ON p.o_orderkey = w.nxt
)
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       count(*) AS n_orders, max(hop) AS chain_len
FROM walk GROUP BY o_custkey
"""


@register(
    "recursive_cte_order_chains",
    _RECURSIVE_WALK_SQL.format(orders="orders"),
    tags=("recursion", "cte", "iterative"),
    description=(
        "WITH RECURSIVE linked-list traversal: each customer's orders "
        "chained by next-pointer (lead), walked from the head to "
        "variable depth — the fixed-point iteration only recursion "
        "expresses declaratively; each recursion step is one equi-join "
        "of the frontier against the pointer table, so depth = longest "
        "chain, not row count (Spark 4 recursive CTE vs DuckDB's)"
    ),
)
def recursive_cte_order_chains(spark: SparkSession, sf_dir: str):
    t(spark, sf_dir, "orders").createOrReplaceTempView("_rec_orders")
    return spark.sql(_RECURSIVE_WALK_SQL.format(orders="_rec_orders"))


@register(
    "agg_argmax_bool",
    """
    SELECT o_orderpriority,
           arg_max(o_orderkey, lpad(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR), 10, '0')
                               || lpad(CAST(o_orderkey AS VARCHAR), 10, '0')) AS top_order,
           arg_min(o_orderkey, lpad(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR), 10, '0')
                               || lpad(CAST(o_orderkey AS VARCHAR), 10, '0')) AS bottom_order,
           bool_or(o_totalprice > 400000) AS has_big,
           bool_and(o_totalprice > 1000)  AS all_over_1k,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "argmax", "boolean"),
    description=(
        "argmax/argmin and boolean aggregates: the order with the "
        "highest/lowest price per priority (max_by/min_by over a "
        "fixed-width cents||key string so ties have a total order — "
        "price alone is tie-nondeterministic in both engines), plus "
        "bool_or/bool_and existence flags; all single-pass "
        "partial+final aggregates, no window, no join"
    ),
)
def agg_argmax_bool(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    key = F.concat(
        F.lpad(F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"), 10, "0"),
        F.lpad(F.col("o_orderkey").cast("string"), 10, "0"),
    )
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", key).alias("top_order"),
        F.min_by("o_orderkey", key).alias("bottom_order"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("has_big"),
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_collect_sorted_list",
    """
    SELECT n_nationkey,
           array_to_string(list_sort(array_agg(s_name)), ',') AS suppliers,
           count(*) AS n_supp
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
    tags=("agg", "collect", "nested"),
    description=(
        "nested-result aggregation: per-nation supplier roster via "
        "collect_list — Spark's collect order is partition-dependent, "
        "so the list is sorted before serialization (the only "
        "deterministic form); rendered as a joined string so both "
        "engines hash identically. The payload-heavy aggregate shape "
        "that motivates the salted two-phase variant at scale"
    ),
)
def agg_collect_sorted_list(spark: SparkSession, sf_dir: str):
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_nationkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("s_name")), ",").alias("suppliers"),
            F.count(F.lit(1)).alias("n_supp"),
        )
    )


@register(
    "set_union_schema_evolution",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM (
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL BY NAME
        SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey % 2 = 1
    )
    """,
    tags=("setop", "schema_evolution", "union"),
    description=(
        "schema-evolution union (unionByName + allowMissingColumns): "
        "two table versions with different column sets appended by "
        "NAME, absent columns null-filled — the ingest-time staple "
        "when upstream schemas drift; positional UNION ALL would "
        "silently misalign the columns (DuckDB spells it UNION ALL "
        "BY NAME)"
    ),
)
def set_union_schema_evolution(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_totalprice")
    v2 = o.filter(F.col("o_orderkey") % 2 == 1).select("o_orderkey", "o_orderpriority")
    return v1.unionByName(v2, allowMissingColumns=True).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )


@register(
    "agg_grouping_id_cube",
    """
    SELECT o_orderstatus,
           o_orderpriority,
           CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           CAST(grouping(o_orderstatus) AS BIGINT)   AS g_status,
           CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
           count(*) AS n,
           CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS total_cents
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube", "grouping_id"),
    description=(
        "GROUPING/GROUPING_ID diagnostics on a CUBE: the bitmask that "
        "lets a consumer tell a real NULL group key from a rollup "
        "subtotal row — without it, cube output is ambiguous the "
        "moment a grouping column is nullable; both engines assign "
        "the first grouping column the most-significant bit"
    ),
)
def agg_grouping_id_cube(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gid")
    return o.sparkSession.sql(
        """
        SELECT o_orderstatus,
               o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               CAST(grouping(o_orderstatus) AS BIGINT)   AS g_status,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
               count(*) AS n,
               CAST(floor(sum(o_totalprice) * 100 + 0.5D) AS BIGINT) AS total_cents
        FROM orders_gid
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """
    )


@register(
    "agg_decimal_exact_products",
    """
    WITH c AS (
      SELECT o_orderpriority,
             CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS DECIMAL(38, 0))
                 AS cents
      FROM orders)
    SELECT o_orderpriority,
           count(*)                                AS n,
           CAST(sum(cents) AS VARCHAR)             AS sum_cents,
           CAST(sum(cents * cents) AS VARCHAR)     AS sum_sq_cents
    FROM c GROUP BY o_orderpriority
    """,
    tags=("agg", "decimal", "exact_arithmetic", "overflow_safe"),
    description=(
        "DECIMAL(38,0) overflow-safe exact aggregation: per-priority "
        "sum of cents and of squared cents — the second moment that "
        "powers variance/z-score detectors.  cents^2 is ~1e13 per "
        "row, so a BIGINT sum wraps silently (non-ANSI) or errors "
        "(ANSI/DuckDB) around 1e6 rows/group; DECIMAL(38,0) partials "
        "carry the same map-side-combine plan shape with 4x the "
        "headroom digits — the production arithmetic the z-score "
        "query's docstring promises (round-1 ADVICE), shipped as a "
        "first-class operator.  The OUTPUT schema is canonical STRING "
        "digits, not DECIMAL: the round-2 driver hashed DECIMAL(38,0) "
        "cells differently from the builder's str(Decimal) canon "
        "(CORRECTNESS_r02's one red row), and a digit string is the "
        "one rendering every harness agrees on — the overflow-safe "
        "DECIMAL partials stay internal to the aggregate"
    ),
)
def agg_decimal_exact_products(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    c = o.select(
        "o_orderpriority",
        F.expr("CAST(CAST(floor(o_totalprice * 100 + 0.5D) AS BIGINT) AS DECIMAL(38, 0))").alias("cents"),
    )
    return c.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("string").alias("sum_cents"),
        F.sum(F.col("cents") * F.col("cents")).cast("string").alias("sum_sq_cents"),
    )


@register(
    "scalar_bitwise_family",
    """
    SELECT o_orderkey,
           o_orderkey & 255                      AS and_mask,
           o_orderkey | 4096                     AS or_flag,
           xor(o_orderkey, 1431655765)           AS xor_scramble,
           ~o_orderkey                           AS not_bits,
           o_orderkey << 3                       AS shl3,
           o_orderkey >> 2                       AS shr2,
           CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
    FROM orders WHERE o_orderkey % 37 = 0
    """,
    tags=("scalar", "bitwise"),
    description=(
        "bitwise scalar family (&, |, xor, ~, shifts, popcount) — the "
        "primitives behind the engine's bitmap-distinct, Z-order, and "
        "SimHash operators, pinned as a row-local function-family "
        "query; note the dialect trap: DuckDB's ^ is POWER, so the "
        "oracle spells xor() while Spark uses the ^ operator"
    ),
)
def scalar_bitwise_family(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 37 == 0).select(
        "o_orderkey",
        F.expr("o_orderkey & 255").alias("and_mask"),
        F.expr("o_orderkey | 4096").alias("or_flag"),
        F.expr("o_orderkey ^ 1431655765").alias("xor_scramble"),
        F.expr("~o_orderkey").alias("not_bits"),
        F.expr("shiftleft(o_orderkey, 3)").alias("shl3"),
        F.expr("shiftright(o_orderkey, 2)").alias("shr2"),
        F.bit_count("o_orderkey").cast("long").alias("popcount"),
    )


@register(
    "join_null_safe_eq",
    """
    WITH a AS (
      SELECT nullif(lang, 'en') AS lang_key, count(*) AS n_docs
      FROM documents GROUP BY 1),
    b AS (
      SELECT nullif(lang, 'en') AS lang_key, sum(n_chars) AS sum_chars
      FROM documents GROUP BY 1)
    SELECT a.lang_key, a.n_docs, CAST(b.sum_chars AS BIGINT) AS sum_chars
    FROM a JOIN b ON a.lang_key IS NOT DISTINCT FROM b.lang_key
    """,
    tags=("join", "null_semantics"),
    description=(
        "null-safe equi-join (<=> / IS NOT DISTINCT FROM): the NULL-keyed "
        "group joins to itself where plain = would drop it — Spark still "
        "plans a hash equi-join on the null-safe key, no nested loop"
    ),
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str):
    d = t(spark, sf_dir, "documents")
    key = F.nullif(F.col("lang"), F.lit("en")).alias("lang_key")
    a = d.groupBy(key).agg(F.count(F.lit(1)).alias("n_docs"))
    b = d.groupBy(key).agg(F.sum("n_chars").alias("sum_chars"))
    return a.join(b, a["lang_key"].eqNullSafe(b["lang_key"])).select(
        a["lang_key"].alias("lang_key"),
        "n_docs",
        F.col("sum_chars").cast("long").alias("sum_chars"),
    )
