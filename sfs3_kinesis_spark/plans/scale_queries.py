"""Skew-mitigation operators as corpus queries.

``operators/scale.py`` implements explicit salting (the declarative
counterpart of AQE's runtime skew-join splitting, for plans AQE
can't rebalance).  These entries pin the *correctness* contract: a
salted plan must be value-identical to the plain plan — the oracle
is the unsalted SQL.  The plan-shape contract (hot key spread over
``salt`` reducers, small side replicated) is asserted in
``tests/test_scale_ops.py``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from sfs3_kinesis_spark.operators.scale import salted_groupby_count, salted_join
from sfs3_kinesis_spark.plans.core import register, t


@register(
    "join_salted_revenue_by_nation",
    """
    SELECT c_nationkey, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
    tags=("join", "skew", "salting", "agg"),
    description=(
        "salted equi-join (hot-key mitigation): big side salted "
        "round-robin, small side replicated salt-x, join on (key, salt) "
        "— value-identical to the plain join (the oracle), but each hot "
        "key's rows land on `salt` reducers instead of one; the "
        "declarative fallback when AQE skew splitting can't apply"
    ),
)
def join_salted_revenue_by_nation(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    joined = salted_join(
        o.withColumnRenamed("o_custkey", "c_custkey"), c, "c_custkey", salt=8
    )
    return joined.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@register(
    "agg_salted_heavy_key",
    """
    SELECT l_returnflag, count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "skew", "salting"),
    description=(
        "two-phase salted aggregation over a 3-value (pathologically "
        "heavy) key: partial counts on (key, salt), final on key — "
        "value-identical to the plain groupBy; matters for payload "
        "aggregations (collect_list-like) where map-side combine can't "
        "shrink the hot key's data"
    ),
)
def agg_salted_heavy_key(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    return salted_groupby_count(li, "l_returnflag", salt=16)


from sfs3_kinesis_spark.operators.scale import zorder_key_sql  # noqa: E402

_ZK = zorder_key_sql("l_partkey", "l_suppkey", bits=16)


@register(
    "layout_zorder_locality",
    f"""
    WITH z AS (
      SELECT l_partkey, l_suppkey, {_ZK} AS zkey
      FROM lineitem),
    b AS (SELECT *, zkey // 65536 AS zbucket FROM z)
    SELECT zbucket,
           count(*)        AS n_rows,
           max(l_partkey) - min(l_partkey) AS partkey_span,
           max(l_suppkey) - min(l_suppkey) AS suppkey_span
    FROM b GROUP BY zbucket
    """,
    tags=("layout", "zorder", "data_skipping", "exact_arithmetic"),
    description=(
        "Z-order (Morton) clustering key + locality audit: interleave "
        "the low 16 bits of (l_partkey, l_suppkey) with unrolled "
        "bit arithmetic — identical expression on both engines — then "
        "measure per-key-range min/max spans of BOTH dimensions, i.e. "
        "exactly the row-group statistics data skipping would use "
        "after OPTIMIZE ZORDER: each 2^16 key range covers a bounded "
        "square in (partkey, suppkey) space, so predicates on either "
        "column prune ranges.  The write path is "
        "operators/scale.py:compact_small_files(sort_cols=[zkey])"
    ),
)
def layout_zorder_locality(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    z = li.select("l_partkey", "l_suppkey", F.expr(_ZK).alias("zkey"))
    b = z.withColumn("zbucket", F.expr("zkey div 65536"))
    return b.groupBy("zbucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.max("l_partkey") - F.min("l_partkey")).alias("partkey_span"),
        (F.max("l_suppkey") - F.min("l_suppkey")).alias("suppkey_span"),
    )


@register(
    "window_salted_topk",
    """
    WITH c AS (
      SELECT o_custkey, o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders),
    r AS (
      SELECT o_custkey, o_orderkey, cents,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY cents DESC, o_orderkey) AS rnk
      FROM c)
    SELECT o_custkey, o_orderkey, cents, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 3
    """,
    tags=("window", "topk", "skew", "salting"),
    description=(
        "two-phase salted window top-k (skew-safe ranking): local "
        "top-3 inside (key, salt) — a hot key's rows spread over 8 "
        "reducers, each keeping only 3 survivors — then the true "
        "top-3 per key over <= salt*k rows; value-identical to the "
        "plain single-window form (the oracle) because the "
        "(cents DESC, orderkey) order is total.  The window-family "
        "counterpart of the salted join/agg — AQE cannot split a "
        "skewed window partition at all"
    ),
)
def window_salted_topk(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.scale import salted_window_topk

    o = t(spark, sf_dir, "orders")
    c = o.select(
        "o_custkey",
        "o_orderkey",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5D) AS BIGINT)").alias("cents"),
    )
    return salted_window_topk(
        c,
        "o_custkey",
        [F.desc("cents"), F.asc("o_orderkey")],
        k=3,
        salt=8,
        salt_on="o_orderkey",
    )


@register(
    "join_bloom_prefiltered",
    """
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_lineitems,
           CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_acctbal > 4500
    GROUP BY n_name
    """,
    tags=("join", "runtime_filter", "bloom", "scale", "pushdown"),
    description=(
        "runtime-filter (bloom-style) join pruning: the selective "
        "build side (suppliers with s_acctbal > 4500) is hashed into "
        "a tiny bit-position set that is pushed INTO the fact scan as "
        "a row-local predicate — most non-qualifying lineitems die at "
        "the scan, before the shuffle — and the exact semi/equi join "
        "afterwards removes the hash collisions, so the result is "
        "value-identical to the plain join (the oracle).  The "
        "declarative twin of Spark's runtime.bloomFilter rewrite, "
        "pinned explicitly so the pruning exists on any build; at "
        "100 TB the shuffle this avoids dominates the query"
    ),
)
def join_bloom_prefiltered(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 4500)
    n = t(spark, sf_dir, "nation")
    # build side: distinct hash-bit positions of qualifying keys (tiny:
    # <= 4096 ints regardless of build cardinality — same contract as a
    # bloom bitmap).  Collected once at plan build, shipped as a literal
    # array so the probe filter is row-local inside the scan projection.
    m = 4096
    bits = {
        int(r[0])
        for r in s.select(F.pmod(F.xxhash64("s_suppkey"), F.lit(m)).alias("b"))
        .distinct()
        .collect()
    }
    # pack into m/64 bitmap words: the probe is TWO O(1) bit ops per
    # row (word lookup + mask test), not an O(m) array scan
    words = [0] * (m // 64)
    for b in bits:
        words[b >> 6] |= 1 << (b & 63)
    signed = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    bm = F.array(*[F.lit(int(w)).cast("long") for w in signed])
    probe = (
        f"(element_at(_bf, CAST(pmod(xxhash64(l_suppkey), {m}) DIV 64 AS INT) + 1)"
        f" & shiftleft(1L, CAST(pmod(xxhash64(l_suppkey), {m}) % 64 AS INT))) != 0L"
    )
    pruned = li.withColumn("_bf", bm).filter(F.expr(probe)).drop("_bf")
    return (
        pruned.join(F.broadcast(s.select("s_suppkey", "s_nationkey")), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            F.expr(
                "CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5D) AS BIGINT)) AS BIGINT)"
            ).alias("cents"),
        )
    )
