"""Batch sources: parquet fixture tables and JSON documents.

The reference's only batch source is a keyed S3 JSON point read
(``readInputDataJSON``, ``/root/reference/s3-for-process-data/
aprocess.js:15-32``).  The engine generalizes to columnar scans:
``spark.read.parquet`` gives predicate pushdown + column pruning for
free (the reference fetches and rewrites whole documents every
stage — SURVEY.md §4.1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import sfs3_kinesis_spark as pkg


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one fixture table (pushdown-capable).

    ``events.ts`` is stored as TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as LONG
    nanos, converted here via integer division (``div`` — a double
    division would lose precision above 2^53 ns).  The conf is set
    here (runtime-settable) rather than only in our session builder
    so externally-created sessions can read the fixtures too."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=pkg.TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=pkg.TABLES) -> None:
    """Register each fixture table as a temp view for the SQL API.

    Catalyst produces identical plans for the view + SQL route and
    the DataFrame route, so queries may use whichever reads better.
    """
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def read_json_documents(spark: SparkSession, path: str, schema) -> DataFrame:
    """JSON document source with an explicit schema (no inference in
    the hot path — infer once at the edge, then fix; SURVEY.md §1.4)."""
    return spark.read.schema(schema).json(path)
