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


def test_range_clustered_write_has_nonoverlapping_file_ranges(spark, tmp_path):
    """write_range_clustered's layout contract: every output file
    carries a narrow [min, max] on the cluster column and the file
    ranges never interleave — the property a zone-map / row-group
    pruner needs to skip data for range predicates."""
    import glob

    from pyspark.sql import functions as F

    from sfs3_kinesis_spark.sources.sinks import write_range_clustered

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = str(tmp_path / "clustered")
    write_range_clustered(li, out, cluster_by="l_shipdate", file_partitions=6)

    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) >= 4  # range partitioner may merge tiny tails
    ranges = []
    for f in files:
        row = (
            spark.read.parquet(f)
            .agg(F.min("l_shipdate").alias("lo"), F.max("l_shipdate").alias("hi"))
            .collect()[0]
        )
        if row.lo is not None:
            ranges.append((row.lo, row.hi))
    ranges.sort()
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        # boundaries may touch (equal keys share ONE file), never interleave
        assert hi_a <= lo_b, (hi_a, lo_b)

    # and the layout round-trips: nothing lost, nothing duplicated
    assert spark.read.parquet(out).count() == li.count()
