"""Partitioned layout + partition pruning: a filter on the partition
column must prune directories at plan time (PartitionFilters), not
scan-and-filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from sfs3_kinesis_spark.plans.core import t
from sfs3_kinesis_spark.sources.sinks import write_partitioned

SF = "/root/testdata/sf0.001"


def test_partition_pruning(spark, tmp_path):
    events = t(spark, SF, "events")
    path = str(tmp_path / "events_by_type")
    write_partitioned(events, path, partition_by=["event_type"], target_file_partitions=4)

    back = spark.read.parquet(path)
    q = back.filter(F.col("event_type") == "purchase").select("event_id", "value")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # pruning happens at the partition (directory) level
    part_filters = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "= purchase)" in part_filters, plan
    # ...and the result is correct
    expected = events.filter(F.col("event_type") == "purchase").count()
    assert q.count() == expected


def test_partitioned_write_file_layout(spark, tmp_path):
    import os

    events = t(spark, SF, "events")
    path = str(tmp_path / "layout")
    write_partitioned(events, path, partition_by=["event_type"], target_file_partitions=1)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("event_type="))
    assert len(dirs) == 5  # one directory per type
    # target_file_partitions=1 -> exactly one data file per directory
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)
