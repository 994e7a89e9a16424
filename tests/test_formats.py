"""Format connectors beyond parquet: JSON / CSV / ORC round-trips
with explicit schemas (the engine reads the reference's native JSON
and generalizes to the standard columnar/text formats)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sfs3_kinesis_spark.plans.core import t

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("fmt", ["json", "csv", "orc"])
def test_round_trip(spark, tmp_path, fmt):
    src = t(spark, SF, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    path = str(tmp_path / fmt)
    writer = src.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true").option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
    writer.save(path)

    reader = spark.read.format(fmt).schema(src.schema)
    if fmt == "csv":
        reader = reader.option("header", "true").option(
            "timestampFormat", "yyyy-MM-dd HH:mm:ss"
        )
    back = reader.load(path)
    assert back.schema == src.schema
    # exact content equality both directions
    assert src.exceptAll(back).count() == 0
    assert back.exceptAll(src).count() == 0


def test_orc_predicate_pushdown(spark, tmp_path):
    src = t(spark, SF, "orders")
    path = str(tmp_path / "orc_pd")
    src.write.mode("overwrite").orc(path)
    q = spark.read.orc(path).filter(F.col("o_totalprice") > 400000).select("o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(o_totalprice,400000" in plan
