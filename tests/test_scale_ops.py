"""Skew-mitigation operators: salted join / salted aggregation must
be result-identical to their unsalted forms while spreading hot keys
across reducers."""

from __future__ import annotations

from pyspark.sql import functions as F

from sfs3_kinesis_spark.operators.scale import salted_groupby_count, salted_join


def _skewed(spark, n=10_000):
    # 90% of rows share one hot key
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(F.concat(F.lit("k"), F.col("id"))).alias("k"),
        F.col("id").alias("v"),
    )


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([("hot", 1), ("k5", 2), ("absent", 3)], "k string, dim int")
    expected = sorted(
        (r["k"], r["v"], r["dim"]) for r in big.join(small, "k").collect()
    )
    got = sorted(
        (r["k"], r["v"], r["dim"]) for r in salted_join(big, small, "k", salt=8).collect()
    )
    assert got == expected


def test_salted_join_left_preserves_unmatched(spark):
    big = _skewed(spark, 1000)
    small = spark.createDataFrame([("hot", 1)], "k string, dim int")
    out = salted_join(big, small, "k", salt=4, how="left")
    assert out.count() == 1000
    assert out.filter("dim IS NULL").count() == big.filter("k != 'hot'").count()


def test_salted_groupby_matches_plain(spark):
    df = _skewed(spark)
    expected = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    got = {r["k"]: r["n"] for r in salted_groupby_count(df, "k", salt=16).collect()}
    assert got == expected


def test_salt_actually_spreads_hot_key(spark):
    from sfs3_kinesis_spark.operators.scale import replicate, with_salt

    df = _skewed(spark, 1000)
    salted = df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(8)).cast("int")
    )
    n_buckets = salted.filter("k = 'hot'").select("_salt").distinct().count()
    assert n_buckets == 8  # the hot key occupies every salt bucket
    assert replicate(spark.createDataFrame([("hot", 1)], "k string, d int"), 8).count() == 8
    assert with_salt(df, 8).select("_salt").distinct().count() == 8
