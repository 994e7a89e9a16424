"""Streaming decayed-score tracker — the per-key state behind a
trending / freshness-weighted leaderboard, kept EXACT.

The batch twin (corpus query ``events_decayed_leaderboard``,
plans/events_queries.py) ranks users by an exponentially decayed
activity score: each day of age halves a contribution (integer bit
shifts — float ``exp()`` never enters, so partial-aggregation order
cannot wiggle the ranking).  This operator maintains the same
quantity incrementally over an unbounded stream.

The naive incremental state (one running score, halved per elapsed
day) is NOT exact: ``(a >> 1) + (b >> 1) != (a + b) >> 1`` under
truncation, so an incremental fold would drift from a batch
recompute by rounding — and two different batch boundaries would
disagree with each other.  Instead the state is the per-day
contribution histogram itself (at most ``horizon_days`` (day, cents)
buckets per key — bounded, the mergeable-sufficient-statistics
discipline of the sketch family), and the emitted score folds the
histogram at read time: ``score = sum(cents_d >> (as_of - d))``.
That makes the emission bit-identical to a from-scratch batch
computation over the same events (pinned by
tests/test_streaming_leaderboard.py), replay-deterministic under
retries, and indifferent to how events split across micro-batches —
including out-of-order arrivals anywhere inside the horizon.

Reference anchor: the closest behavior is the CloudWatch success
counter (``/root/reference/svcsample/pollingsvc.js:38-41``) — a
monotone count; this is the decayed, keyed generalization a ranking
surface needs.

Scale: state is <= horizon_days pairs of BIGINTs per key, partitioned
by key; each batch touches only keys present in the batch (the
applyInPandasWithState contract).  Emissions are per updated key per
trigger; the global top-k over emissions is one bounded
``salted_window_topk`` / TakeOrdered away and deliberately NOT fused
into the stateful operator (state stays per-key mergeable; ranking
is the reader's concern).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: contributions older than this many days shift to zero anyway
#: (BIGINT cents < 2^63 → 63 halvings kill any value); keeping the
#: horizon explicit bounds the state size per key
HORIZON_DAYS = 62

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("as_of_day", T.LongType()),
        T.StructField("score", T.LongType()),
        T.StructField("n_days_live", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("days", T.ArrayType(T.LongType())),
        T.StructField("cents", T.ArrayType(T.LongType())),
    ]
)


def fold_score(
    day_cents: dict[int, int], as_of: int, horizon_days: int = HORIZON_DAYS
) -> int:
    """The shared exact fold: sum of per-day contributions, each
    halved once per day of age (truncating shift).  Used by the
    stateful operator AND the test's batch recompute, so the two
    cannot drift."""
    total = 0
    for d, c in day_cents.items():
        age = as_of - d
        if 0 <= age < horizon_days:
            total += c >> age
    return total


def update_hist(
    hist: dict[int, int],
    day_cents: list[tuple[int, int]],
    horizon_days: int = HORIZON_DAYS,
) -> tuple[dict[int, int], int]:
    """The pure per-batch state transition: merge this batch's
    (day, cents) contributions into the histogram, advance ``as_of``
    to the newest day ever seen, and evict buckets past the horizon
    (they fold to zero forever).  Shared by the stateful operator and
    the split-invariance property test: folding update_hist over ANY
    partition of the events into batches must equal one-shot
    application — the module docstring's exactness claim."""
    hist = dict(hist)
    for d, v in day_cents:
        hist[int(d)] = hist.get(int(d), 0) + int(v)
    as_of = max(hist)
    return {d: v for d, v in hist.items() if as_of - d < horizon_days}, as_of


def _make_group_fn(horizon_days: int):
    def fn(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs))
        if state.exists:
            days, cents = state.get
            hist = dict(zip(days, cents))
        else:
            hist = {}
        # per-day integer-cents contributions from this batch
        # (floor, not int(): int() truncates toward zero — must match
        # the batch twin's floor() on any sign)
        import numpy as np

        # pandas datetime64[ns] → epoch days
        day = (rows["ts"].astype("int64") // 1_000_000_000) // 86_400
        c = np.floor(rows["value"] * 100 + 0.5).astype("int64")
        hist, as_of = update_hist(
            hist, list(zip(day.tolist(), c.tolist())), horizon_days
        )
        items = sorted(hist.items())
        state.update(([d for d, _ in items], [v for _, v in items]))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "as_of_day": [int(as_of)],
                "score": [int(fold_score(hist, as_of, horizon_days))],
                "n_days_live": [len(hist)],
            }
        )

    return fn


def decayed_scores(
    events: DataFrame, *, horizon_days: int = HORIZON_DAYS
) -> DataFrame:
    """Streaming tier: input columns (user_id, ts, value); emits one
    (user_id, as_of_day, score, n_days_live) row per updated key per
    micro-batch, where score is the exact halving-decayed activity
    total as of the key's newest observed day."""
    return events.select("user_id", "ts", "value").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _make_group_fn(horizon_days),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def decayed_scores_batch(events: DataFrame) -> DataFrame:
    """Batch twin: the same score from a from-scratch DataFrame
    computation (per-(user, day) cents rollup, halved by age against
    the per-user max day) — pure built-in expressions, no Python in
    the hot path.  The streaming tier must match this bit-for-bit
    on the same events."""
    rollup = (
        events.groupBy(
            "user_id",
            F.expr("(unix_micros(ts) div 1000000) div 86400").alias("day"),
        )
        .agg(
            F.sum(
                F.expr("CAST(floor(value * 100D + 0.5D) AS BIGINT)")
            ).alias("cents")
        )
    )
    w = F.max("day").over(W.partitionBy("user_id"))
    return (
        rollup.withColumn("as_of_day", w)
        .filter(F.col("as_of_day") - F.col("day") < HORIZON_DAYS)
        .groupBy("user_id", "as_of_day")
        .agg(
            F.sum(
                F.expr("shiftright(cents, CAST(as_of_day - day AS INT))")
            ).alias("score"),
            F.count(F.lit(1)).alias("n_days_live"),
        )
        .select(
            "user_id",
            F.col("as_of_day").cast("long"),
            F.col("score").cast("long"),
            F.col("n_days_live").cast("long"),
        )
    )
