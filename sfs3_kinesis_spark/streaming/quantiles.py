"""Streaming log2-bucket latency quantiles — the monitoring
percentile every operations platform tracks, kept exact and mergeable.

The batch twin (corpus query ``events_latency_log2_histogram``,
plans/analytics_queries.py) buckets inter-event gaps by bit length —
the HDR-histogram-style power-of-two layout.  This operator maintains
the same histogram incrementally per key and reads quantiles off it:

* state per key = (last event timestamp, 64 bucket counts) — bucket
  counts are MERGEABLE sufficient statistics (plain sums), so the
  histogram needs no rescaling, no re-bucketing, and no per-event
  storage ever; 64 BIGINTs cover every gap a 64-bit second count can
  express.
* quantile read = smallest bucket whose cumulative count covers the
  rank, with the exact integer rule ``100 * cum >= q * n`` — no
  floats, so the emitted p50/p95/p99 bucket floors are bit-stable
  under retries and partitionings.
* the only cross-batch state beyond the counts is the last timestamp
  (the gap that spans a batch boundary).  Within a batch, rows are
  sorted by (ts, event_id-free total order on ts + value) before
  folding.

Exactness contract: emissions equal the batch twin computed from
scratch WHEN each key's events arrive in event-time order across
batches (the reference's per-shard Kinesis ordering — SURVEY W7;
pinned by test).  A cross-batch late arrival changes which pairs are
adjacent — the gap sequence itself is order-dependent, for ANY
engine — and lands in the bucket its observed (negative → bucket 0)
gap implies; counts are never lost.

Reference anchor: the polling cadence monitor this generalizes is
``/root/reference/svcsample/pollingsvc.js:139-141`` (a fixed 1.5 s
sleep — the reference never measures its own latency distribution).

Scale: 64 BIGINTs + one timestamp per key, partitioned by key; the
emitted quantiles are O(1) rows per updated key per trigger.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

N_BUCKETS = 64

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_gaps", T.LongType()),
        T.StructField("p50_floor_s", T.LongType()),
        T.StructField("p95_floor_s", T.LongType()),
        T.StructField("p99_floor_s", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_s", T.LongType()),
        T.StructField("buckets", T.ArrayType(T.LongType())),
    ]
)


def gap_bucket(gap_s: int) -> int:
    """Bit-length bucket, identical to the batch twin's
    ``length(bin(gap))`` rule: non-positive gaps → bucket 0."""
    return gap_s.bit_length() if gap_s > 0 else 0


def bucket_floor(bucket: int) -> int:
    """Smallest gap (seconds) that lands in ``bucket``."""
    return 0 if bucket == 0 else 1 << (bucket - 1)


def quantile_bucket(buckets: list[int], q_pct: int) -> int:
    """Exact integer quantile read: the smallest bucket where
    ``100 * cumulative >= q_pct * n`` — the value at the ceiling rank
    of the sorted multiset, no floats anywhere."""
    n = sum(buckets)
    if n == 0:
        return 0
    cum = 0
    for b, c in enumerate(buckets):
        cum += c
        if 100 * cum >= q_pct * n:
            return b
    return len(buckets) - 1


def _group_fn(
    key: Tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs)).sort_values("ts", kind="mergesort")
    if state.exists:
        last_ts, buckets = state.get
        buckets = list(buckets)
    else:
        last_ts, buckets = None, [0] * N_BUCKETS
    ts_s = (rows["ts"].astype("int64") // 1_000_000_000).tolist()
    for t_s in ts_s:
        if last_ts is not None:
            buckets[gap_bucket(int(t_s) - int(last_ts))] += 1
        last_ts = int(t_s)
    state.update((last_ts, buckets))
    yield pd.DataFrame(
        {
            "user_id": [int(key[0])],
            "n_gaps": [sum(buckets)],
            "p50_floor_s": [bucket_floor(quantile_bucket(buckets, 50))],
            "p95_floor_s": [bucket_floor(quantile_bucket(buckets, 95))],
            "p99_floor_s": [bucket_floor(quantile_bucket(buckets, 99))],
        }
    )


def latency_quantiles(events: DataFrame) -> DataFrame:
    """Streaming tier: input columns (user_id, ts); emits one row per
    updated key per micro-batch with the exact log2-bucket p50/p95/p99
    floors over ALL gaps seen so far for that key."""
    return events.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        _group_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latency_quantiles_batch(events: DataFrame) -> DataFrame:
    """Batch twin: same buckets, same exact quantile rule, computed
    from scratch with built-in expressions (one keyed window for the
    gap, one per-key aggregate over the bucket rollup) — the streaming
    tier must match this on per-key-ordered arrival."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts")
    g = events.select(
        "user_id",
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias(
            "gap_s"
        ),
    ).filter(F.col("gap_s").isNotNull())
    b = g.select(
        "user_id",
        F.when(F.col("gap_s") <= 0, 0)
        .otherwise(F.length(F.bin(F.col("gap_s").cast("long"))))
        .alias("bucket"),
    )
    rollup = b.groupBy("user_id", "bucket").agg(F.count(F.lit(1)).alias("c"))
    wb = (
        W.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wn = W.partitionBy("user_id")
    cum = (
        rollup.withColumn("cum", F.sum("c").over(wb))
        .withColumn("n", F.sum("c").over(wn))
    )

    def pick(q_pct: int):
        # smallest bucket with 100*cum >= q*n: min over qualifying rows
        return F.min(
            F.when(100 * F.col("cum") >= q_pct * F.col("n"), F.col("bucket"))
        )

    out = cum.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_gaps"),
        pick(50).alias("_b50"),
        pick(95).alias("_b95"),
        pick(99).alias("_b99"),
    )
    for col, src in (("p50_floor_s", "_b50"), ("p95_floor_s", "_b95"), ("p99_floor_s", "_b99")):
        out = out.withColumn(
            col,
            F.expr(
                f"CAST(CASE WHEN {src} = 0 THEN 0"
                f" ELSE shiftleft(1L, CAST({src} AS INT) - 1) END AS BIGINT)"
            ),
        )
    return out.select(
        F.col("user_id").cast("long"), "n_gaps", "p50_floor_s", "p95_floor_s", "p99_floor_s"
    )
