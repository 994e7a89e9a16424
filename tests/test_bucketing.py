"""Bucketed co-located joins: the 100 TB join strategy.

At cluster scale the dominant cost of a big-big equi-join is the
shuffle of both fact tables.  Writing both sides bucketed by the
join key (`bucketBy(N, key).sortBy(key)`) pre-partitions the data
on disk so the join plans with ZERO Exchange operators — each task
reads matching buckets from both sides.  These tests pin that plan
property; losing it is a silent 2x-shuffle regression.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sfs3_kinesis_spark.plans.core import t

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    o = t(spark, SF, "orders")
    li = t(spark, SF, "lineitem")
    (
        o.write.mode("overwrite")
        .option("path", str(wh / "orders_b"))
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        li.write.mode("overwrite")
        .option("path", str(wh / "lineitem_b"))
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ot, lt = bucketed_tables
    # disable broadcast so the join must choose a co-located strategy
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table(lt)
            .join(spark.table(ot), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        # join inputs are pre-bucketed: no shuffle on either side
        pre_agg = plan.split("HashAggregate")[-1]  # below the partial agg
        assert "Exchange" not in pre_agg, pre_agg[:2000]
        assert "SortMergeJoin" in plan
        # and the result is still right
        n = j.agg(F.sum("n")).first()[0]
        assert n == spark.table(lt).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    ot, _ = bucketed_tables
    g = spark.table(ot).groupBy("o_orderkey").agg(F.sum("o_totalprice").alias("s"))
    plan = g._jdf.queryExecution().executedPlan().toString()
    # aggregation on the bucket key reuses the on-disk partitioning
    assert "Exchange" not in plan, plan[:2000]
