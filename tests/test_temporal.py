"""Edge-case tests for the temporal join operators (the oracle
corpus covers the happy path; these pin the tie/boundary semantics)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sfs3_kinesis_spark.operators.temporal import asof_join, interval_join_bucketed

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def ts(s):
    return T0 + dt.timedelta(seconds=s)


def _asof_case(spark, strict):
    left = spark.createDataFrame(
        [("u1", ts(10), 100), ("u1", ts(20), 101), ("u2", ts(10), 102), ("u3", ts(10), 103)],
        "k string, ts timestamp, lid int",
    )
    right = spark.createDataFrame(
        [("u1", ts(5), 1.0), ("u1", ts(10), 2.0), ("u1", ts(15), 3.0), ("u2", ts(50), 9.0)],
        "k string, ts timestamp, rv double",
    )
    out = asof_join(left, right, key="k", strict=strict)
    return {r["lid"]: r["rv"] for r in out.collect()}


def test_asof_backward_inclusive(spark):
    got = _asof_case(spark, strict=False)
    assert got[100] == 2.0  # tie at ts(10) counts (<= semantics)
    assert got[101] == 3.0  # latest prior among several
    assert got[102] is None  # right row only in the future
    assert got[103] is None  # key absent from right


def test_asof_strict_excludes_tie(spark):
    got = _asof_case(spark, strict=True)
    assert got[100] == 1.0  # tie at ts(10) NOT visible under <
    assert got[101] == 3.0


def test_interval_join_spanning_buckets(spark):
    points = spark.createDataFrame(
        [(1, ts(0)), (2, ts(3600)), (3, ts(7200)), (4, ts(10799)), (5, ts(10800))],
        "pid int, ts timestamp",
    )
    # one interval covering [ts(0), ts(10800)) = 3 hourly buckets
    intervals = spark.createDataFrame(
        [(ts(0), ts(10800), "iv1")], "s timestamp, e timestamp, name string"
    )
    out = interval_join_bucketed(
        points, intervals, point_ts="ts", start_ts="s", end_ts="e", bucket="1 hour"
    )
    rows = out.select("pid").collect()
    pids = sorted(r["pid"] for r in rows)
    # start inclusive, end exclusive, no duplicate pairs from the
    # interval spanning multiple buckets
    assert pids == [1, 2, 3, 4]


def test_interval_join_with_extra_key(spark):
    points = spark.createDataFrame(
        [(1, "a", ts(100)), (2, "b", ts(100))], "pid int, k string, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [("a", ts(0), ts(3600))], "k string, s timestamp, e timestamp"
    )
    out = interval_join_bucketed(
        points,
        intervals,
        point_ts="ts",
        start_ts="s",
        end_ts="e",
        bucket="1 hour",
        extra_key="k",
    )
    assert [r["pid"] for r in out.collect()] == [1]


def test_multimodal_features_shape(spark, sf_dir):
    from sfs3_kinesis_spark.operators.multimodal import (
        FEATURE_DIM,
        decode_and_featurize,
        documents_as_media,
    )
    from sfs3_kinesis_spark.plans.core import t

    docs = t(spark, sf_dir, "documents").limit(20)
    feats = decode_and_featurize(documents_as_media(docs))
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r["features"]) == FEATURE_DIM
        assert abs(sum(r["features"]) - 1.0) < 1e-9  # normalized histogram


def test_asof_tolerance_bounds_staleness(spark):
    """tolerance_s keeps a match exactly AT the bound and rejects one
    just past it (payload NULLs, left rows preserved)."""
    from pyspark.sql import functions as F

    from sfs3_kinesis_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 12:00:00")],
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:30:00", "a"), (2, "2024-01-01 09:00:00", "b")],
        "id long, ts string, payload string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = asof_join(
        left, right, key="id", payload_cols=["payload"], tolerance_s=1800
    ).orderBy("id").collect()
    assert out[0]["payload"] == "a"      # exactly 30 min old: kept
    assert out[1]["payload"] is None     # 3 h old: rejected
    assert len(out) == 2                 # left rows always survive


def test_asof_duplicate_right_rows_deterministic(spark):
    """Duplicate right rows at one (key, ts) resolve bit-stably (r02
    ADVICE): the payload struct is the tertiary sort key, so backward
    picks the GREATEST struct, forward the LEAST — independent of
    shuffle arrival order or input partitioning."""
    from sfs3_kinesis_spark.operators.temporal import (
        asof_join_forward,
        asof_join_nearest,
    )

    left = spark.createDataFrame(
        [("u1", ts(10), 100)], "k string, ts timestamp, lid int"
    )
    dup_rows = [("u1", ts(5), v) for v in (3.0, 1.0, 2.0)] + [
        ("u1", ts(20), v) for v in (7.0, 9.0, 8.0)
    ]
    for n_parts in (1, 3, 7):
        right = spark.createDataFrame(
            dup_rows, "k string, ts timestamp, rv double"
        ).repartition(n_parts)
        b = asof_join(left, right, key="k").collect()[0]["rv"]
        f = asof_join_forward(left, right, key="k").collect()[0]["rv"]
        n = asof_join_nearest(left, right, key="k").collect()[0]["rv"]
        assert b == 3.0, f"backward must take greatest dup payload, got {b}"
        assert f == 7.0, f"forward must take least dup payload, got {f}"
        assert b == n  # nearest tie breaks to the earlier (backward) row


def test_ewma_decays_by_calendar_gap_not_row_lag(spark):
    """A 3-day hole in the series must decay history by (3/4)^3, not
    (3/4)^1 — the calendar-gap kernel (a sparse event type's EWMA
    otherwise over-weights stale history)."""
    from sfs3_kinesis_spark.plans.temporal_queries import _ewma_terms
    from pyspark.sql import functions as F

    d = spark.createDataFrame(
        [("a", 10, 100), ("a", 13, 400)], "event_type string, day long, cents long"
    )
    num, den = _ewma_terms()
    out = {
        r["day"]: r["ewma"]
        for r in d.select(
            "day", F.expr(f"CAST(({num}) div ({den}) AS BIGINT)").alias("ewma")
        ).collect()
    }
    # day 13: weights (3/4)^0 for itself, (3/4)^3 for day 10
    # num = 400*16384 + 100*6912, den = 16384 + 6912
    assert out[13] == (400 * 16384 + 100 * 6912) // (16384 + 6912)
    assert out[10] == 100
