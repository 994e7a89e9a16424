"""Streaming log2-bucket latency quantiles: mergeable bucket-count
state + exact integer quantile reads — emissions match the batch twin
under per-key-ordered arrival, across micro-batch boundaries."""

from __future__ import annotations

import datetime as dt

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def ts(seconds):
    return T0 + dt.timedelta(seconds=seconds)


SCHEMA = "user_id long, ts timestamp"


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(path))


def test_streaming_quantiles_match_batch_twin(spark, tmp_path):
    from sfs3_kinesis_spark.streaming.quantiles import (
        latency_quantiles,
        latency_quantiles_batch,
    )

    src = tmp_path / "in"
    src.mkdir()
    # user 1: gaps 1, 3, 3, 120 s (buckets 1, 2, 2, 7) — and the
    # 120 s gap SPANS the batch boundary, exercising last_ts state;
    # user 2: a same-second duplicate (gap 0 → bucket 0)
    batch1 = [(1, ts(0)), (1, ts(1)), (1, ts(4)), (1, ts(7)), (2, ts(5)), (2, ts(5))]
    batch2 = [(1, ts(127)), (2, ts(9))]
    _write(spark, src, batch1)
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        latency_quantiles(stream)
        .writeStream.format("memory")
        .queryName("lat")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write(spark, src, batch2)
        q.processAllAvailable()
        # latest emission per user (n_gaps is monotone per key)
        rows = {}
        for r in spark.sql("SELECT * FROM lat").collect():
            cur = rows.get(r.user_id)
            if cur is None or r.n_gaps > cur.n_gaps:
                rows[r.user_id] = r
        # hand-checked: user 1 buckets {1:1, 2:2, 7:1}, n=4 →
        # p50 = bucket 2 (floor 2 s), p95/p99 = bucket 7 (floor 64 s)
        assert (
            rows[1].n_gaps,
            rows[1].p50_floor_s,
            rows[1].p95_floor_s,
            rows[1].p99_floor_s,
        ) == (4, 2, 64, 64)
        # user 2: gaps 0 (dup) and 4 → buckets {0:1, 3:1}; p50 = 0 s
        assert (rows[2].n_gaps, rows[2].p50_floor_s, rows[2].p99_floor_s) == (
            2,
            0,
            4,
        )

        expect = {
            r.user_id: r
            for r in latency_quantiles_batch(
                spark.createDataFrame(batch1 + batch2, SCHEMA)
            ).collect()
        }
        for uid, r in rows.items():
            e = expect[uid]
            assert (
                r.n_gaps,
                r.p50_floor_s,
                r.p95_floor_s,
                r.p99_floor_s,
            ) == (e.n_gaps, e.p50_floor_s, e.p95_floor_s, e.p99_floor_s), uid
    finally:
        q.stop()


def test_quantile_bucket_exact_rule_properties():
    """Hypothesis: the integer quantile rule equals the ceiling-rank
    pick over the expanded multiset, for any histogram."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sfs3_kinesis_spark.streaming.quantiles import quantile_bucket

    @settings(max_examples=200, deadline=None)
    @given(
        buckets=st.lists(
            st.integers(min_value=0, max_value=50), min_size=1, max_size=12
        ),
        q=st.sampled_from([50, 95, 99]),
    )
    def run(buckets, q):
        n = sum(buckets)
        got = quantile_bucket(buckets, q)
        if n == 0:
            assert got == 0
            return
        expanded = [b for b, c in enumerate(buckets) for _ in range(c)]
        rank = -(-q * n // 100)  # ceil(q*n/100), exact
        assert got == expanded[rank - 1]

    run()
