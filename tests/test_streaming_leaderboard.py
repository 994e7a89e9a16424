"""Streaming decayed-score tracker: the per-day histogram state makes
every emission bit-identical to a from-scratch batch recompute over
the same events, whatever the micro-batch boundaries — the property
a naive running-score fold (halved in place per elapsed day) cannot
have under truncating integer division."""

from __future__ import annotations

import datetime as dt

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
DAY0 = int(T0.timestamp()) // 86_400


def ts(day, hour=0):
    return T0 + dt.timedelta(days=day, hours=hour)


SCHEMA = "user_id long, ts timestamp, value double"


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(path))


def test_streaming_decayed_scores_match_batch_recompute(spark, tmp_path):
    from sfs3_kinesis_spark.streaming.leaderboard import (
        decayed_scores,
        decayed_scores_batch,
    )

    src = tmp_path / "in"
    src.mkdir()
    batch1 = [
        (1, ts(0), 10.00),   # day 0: 1000 cents
        (1, ts(0, 6), 2.51), # day 0: +251 cents (odd total → shifts truncate)
        (1, ts(1), 5.00),    # day 1: 500 cents
        (2, ts(1), 7.77),
    ]
    batch2 = [
        (1, ts(3), 1.00),    # advances user 1's as_of to day 3
        (1, ts(2), 3.33),    # out-of-order: lands on day 2, same batch
        (2, ts(3), 0.01),
    ]
    _write(spark, src, batch1)
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        decayed_scores(stream)
        .writeStream.format("memory")
        .queryName("lead")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # hand-checked: as of day 1, user 1 holds 1251 >> 1 + 500 = 1125
        rows = {
            (r.user_id, r.as_of_day): (r.score, r.n_days_live)
            for r in spark.sql("SELECT * FROM lead").collect()
        }
        assert rows[(1, DAY0 + 1)] == (1125, 2)
        assert rows[(2, DAY0 + 1)] == (777, 1)

        _write(spark, src, batch2)
        q.processAllAvailable()
        rows = {
            (r.user_id, r.as_of_day): (r.score, r.n_days_live)
            for r in spark.sql("SELECT * FROM lead").collect()
        }
        # as of day 3: 1251>>3 + 500>>2 + 333>>1 + 100 = 156+125+166+100
        assert rows[(1, DAY0 + 3)] == (547, 4)
        # as of day 3: 777>>2 + 1 = 194 + 1
        assert rows[(2, DAY0 + 3)] == (195, 2)

        # the defining property: every emission equals the batch twin
        # computed from scratch on ALL events seen so far
        all_events = spark.createDataFrame(batch1 + batch2, SCHEMA)
        expect = {
            (r.user_id, r.as_of_day): (r.score, r.n_days_live)
            for r in decayed_scores_batch(all_events).collect()
        }
        for k, v in expect.items():
            assert rows[k] == v, (k, rows[k], v)
    finally:
        q.stop()


def test_streaming_decayed_scores_horizon_eviction(spark, tmp_path):
    from sfs3_kinesis_spark.streaming.leaderboard import (
        HORIZON_DAYS,
        decayed_scores,
    )

    src = tmp_path / "in"
    src.mkdir()
    # an ancient burst, then one event far past the horizon
    _write(spark, src, [(9, ts(0), 100.0)])
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        decayed_scores(stream)
        .writeStream.format("memory")
        .queryName("lead_h")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        _write(spark, src, [(9, ts(HORIZON_DAYS + 5), 1.0)])
        q.processAllAvailable()
        rows = [
            r
            for r in spark.sql("SELECT * FROM lead_h").collect()
            if r.as_of_day == DAY0 + HORIZON_DAYS + 5
        ]
        # the day-0 bucket was evicted: only the fresh event scores,
        # and the state histogram is back to one live day
        assert rows and rows[0].score == 100 and rows[0].n_days_live == 1
    finally:
        q.stop()


def test_streaming_decayed_scores_checkpoint_restart(spark, tmp_path):
    """W6 discipline for the leaderboard: stop mid-run, restart from
    the checkpoint, feed more events — the per-day histogram state
    survives and the post-restart emission still equals the batch
    twin over ALL events (no double counting of batch 1, no lost
    buckets)."""
    from sfs3_kinesis_spark.streaming.leaderboard import (
        decayed_scores,
        decayed_scores_batch,
    )

    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    batch1 = [(1, ts(0), 10.00), (1, ts(1), 5.00)]
    batch2 = [(1, ts(2), 2.00)]

    def start():
        # memory sinks cannot recover from a checkpoint; a file sink
        # can — the same shape a production leaderboard feed uses
        stream = spark.readStream.schema(SCHEMA).parquet(str(src))
        return (
            decayed_scores(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

    _write(spark, src, batch1)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    _write(spark, src, batch2)
    q = start()
    try:
        q.processAllAvailable()
        rows = {
            (r.user_id, r.as_of_day): (r.score, r.n_days_live)
            for r in spark.read.parquet(out).collect()
        }
        all_events = spark.createDataFrame(batch1 + batch2, SCHEMA)
        expect = {
            (r.user_id, r.as_of_day): (r.score, r.n_days_live)
            for r in decayed_scores_batch(all_events).collect()
        }
        # as of day 2: 1000>>2 + 500>>1 + 200 = 250 + 250 + 200
        assert expect[(1, DAY0 + 2)] == (700, 3)
        assert rows[(1, DAY0 + 2)] == expect[(1, DAY0 + 2)]
    finally:
        q.stop()


def test_update_hist_split_invariance_property():
    """Hypothesis: folding the per-batch state transition over ANY
    partition of the events into batches yields the same histogram,
    as_of and score as one-shot application — the exactness property
    the per-day-histogram state design exists to provide (a running
    halved score would fail this under truncating division)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sfs3_kinesis_spark.streaming.leaderboard import (
        HORIZON_DAYS,
        fold_score,
        update_hist,
    )

    events = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3 * HORIZON_DAYS),
            st.integers(min_value=0, max_value=10_000_000),
        ),
        min_size=1,
        max_size=40,
    )

    @settings(max_examples=200, deadline=None)
    @given(evs=events, data=st.data())
    def run(evs, data):
        # one-shot
        hist_one, asof_one = update_hist({}, evs)
        # random contiguous split into 1..5 non-empty batches
        n_cuts = data.draw(st.integers(min_value=0, max_value=min(4, len(evs) - 1)))
        cuts = sorted(
            data.draw(
                st.lists(
                    st.integers(min_value=1, max_value=len(evs) - 1),
                    min_size=n_cuts,
                    max_size=n_cuts,
                    unique=True,
                )
            )
            if n_cuts
            else []
        )
        hist, asof = {}, None
        prev = 0
        for cut in cuts + [len(evs)]:
            hist, asof = update_hist(hist, evs[prev:cut])
            prev = cut
        assert (hist, asof) == (hist_one, asof_one)
        assert fold_score(hist, asof) == fold_score(hist_one, asof_one)

    run()
