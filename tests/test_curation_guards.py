"""Degenerate-input guards added after the round-6 advice: paths the
TPC-H-ish fixtures can never reach, pinned with synthetic tables run
through the SAME Spark-vs-DuckDB compare as the driver's gate.

* ``sample_allocation_neyman`` on all-constant strata (every Neyman
  weight 0) must fall back to proportional-to-n allocation in BOTH
  engines instead of an engine-divergent zero division (Spark DIV ->
  NULL vs DuckDB // -> error).
* ``agg_countmin_heavy_audit`` hashes must stay bit-identical across
  engines for user_id beyond ~2.8e9, where the pre-fix raw product
  ``user_id * 3266489917`` overflowed int64 (silent wrap on non-ANSI
  Spark, loud error on DuckDB).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sfs3_kinesis_spark.plans import REGISTRY
from tests.oracle import compare, duck_connection

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def degenerate_sf(spark, tmp_path_factory):
    """A synthetic sf dir: every table empty except the two under
    test — documents with CONSTANT n_chars per lang, events with
    user_ids past the int64-overflow threshold of the old CMS hash."""
    import pyarrow.parquet as pq

    base = tmp_path_factory.mktemp("degenerate_sf")

    def write_single_file(df, name):
        # the fixture layout (and duck_connection) expects ONE parquet
        # FILE per table, not Spark's part-file directory
        pq.write_table(
            pq.ParquetFile(_first_part(df, str(base / f"_{name}_tmp"))).read(),
            str(base / f"{name}.parquet"),
        )

    def _first_part(df, tmp_dir):
        df.coalesce(1).write.mode("overwrite").parquet(tmp_dir)
        return next(
            os.path.join(tmp_dir, f)
            for f in os.listdir(tmp_dir)
            if f.endswith(".parquet")
        )

    for t in TABLES:
        write_single_file(
            spark.read.parquet(os.path.join(SF, f"{t}.parquet")).limit(0), t
        )
    docs = spark.createDataFrame(
        [(i, "x", "en" if i < 5 else "fr", "s", 100) for i in range(8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    write_single_file(docs, "documents")
    big = 3_000_000_000  # > ~2.8e9: old hash's key*a wrapped int64 here
    ev = spark.createDataFrame(
        [
            (i, uid)
            for i, uid in enumerate(
                [big, big, big, 2**34 + 17, 2**40 + 123, 5, 5, 2**40 + 123]
            )
        ],
        "event_id long, user_id long",
    ).select(
        "event_id",
        F.lit(None).cast("timestamp").alias("ts"),
        "user_id",
        F.lit("view").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    write_single_file(ev, "events")
    return str(base)


def test_neyman_all_zero_weights_falls_back_proportional(spark, degenerate_sf):
    spec = REGISTRY["sample_allocation_neyman"]
    df = spec.spark(spark, degenerate_sf)
    rows = {r["lang"]: r.asDict() for r in df.collect()}
    assert rows["en"]["neyman_weight"] == 0 and rows["fr"]["neyman_weight"] == 0
    # proportional to n: 5/8 and 3/8 of the 100k budget, summing exactly
    assert rows["en"]["alloc"] == 62500 and rows["fr"]["alloc"] == 37500
    ok, detail = compare(df, duck_connection(degenerate_sf), spec.oracle)
    assert ok, detail


def test_dbscan_oracle_asserts_convergence():
    """An under-provisioned min-label unroll must raise the NAMED
    convergence error (ADVICE r06), never return a silently
    unconverged labeling that reads as a confusing hash mismatch."""
    import duckdb

    import sfs3_kinesis_spark.plans.retrieval_queries as rq

    con = duck_connection(SF)
    orig = rq.DBSCAN_CC_ROUNDS
    rq.DBSCAN_CC_ROUNDS = 1
    try:
        with pytest.raises(duckdb.Error, match="NOT converged after 1 rounds"):
            con.execute(rq._dbscan_oracle()).fetchall()
    finally:
        rq.DBSCAN_CC_ROUNDS = orig


def test_countmin_hash_bit_identical_beyond_2_8e9(spark, degenerate_sf):
    spec = REGISTRY["agg_countmin_heavy_audit"]
    df = spec.spark(spark, degenerate_sf)
    ok, detail = compare(df, duck_connection(degenerate_sf), spec.oracle)
    assert ok, detail
    # the CMS guarantee must hold for the big ids too
    assert all(r["never_underestimates"] for r in df.collect())
