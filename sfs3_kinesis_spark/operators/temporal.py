"""Temporal join operators the built-in DataFrame API lacks:
as-of join and big-big interval (range) join.

The reference has no joins at all (SURVEY.md §2.4 — only the keyed
stream-state lookup J1); these are the engine's green-field temporal
family, built as *compositions of existing DataFrame ops* (SURVEY
task brief's preferred tier (a)) — no Pandas UDFs, no custom
physical operators.

Scale posture:

* ``asof_join`` is ONE shuffle on the join key (union + keyed
  window), independent of time-range width.  The naive alternative
  — non-equi join then argmax — explodes |left| × |matching right|
  intermediates; at 100 TB the union form's shuffle is linear in
  input size and AQE handles key skew.
* ``interval_join_bucketed`` turns a point-in-interval theta join
  (which Catalyst can only plan as a broadcast nested loop) into an
  equi-join on a time bucket: intervals are exploded to the buckets
  they cover, points carry their own bucket, and the exact
  containment predicate filters after the bucket equi-join.  Bucket
  granularity trades explode factor vs bucket population, exactly
  like the band parameter in MinHash-LSH.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: list[str] | None = None,
    strict: bool = False,
    tolerance_s: int | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, attach the payload of
    the latest right row with ``right.ts <= left.ts`` (same key).

    Implementation: tag both sides, union by key, and take
    ``last(payload, ignorenulls)`` over a keyed event-time window —
    the classic union+window formulation.  Rows tie-break so that a
    right row at exactly left.ts is visible to the left row (``<=``
    semantics; ``strict=True`` gives ``<``).

    ``tolerance_s`` bounds match staleness (pandas
    ``merge_asof(tolerance=...)`` parity): a matched right row older
    than ``tolerance_s`` seconds is treated as no match (payload
    NULLs).  The bound is applied AFTER the window pass on the
    carried match timestamp — a row-local integer-microsecond
    comparison, so the plan shape (one keyed shuffle) is unchanged.

    Returns all left columns plus the right payload columns
    (NULL when no prior right row exists).
    """
    payload_cols = payload_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_left"),
    )
    right_types = dict(right.dtypes)
    _right_type = (
        "struct<"
        + ",".join(f"{c}:{right_types[c]}" for c in payload_cols)
        + f",_rts:{right_types[right_ts]}>"
    )
    l_tag = l_tag.withColumn("_right", F.lit(None).cast(_right_type))
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{dict(left.dtypes)[c]}" for c in left.columns) + ">"
        ).alias("_left"),
        F.struct(
            *[F.col(c) for c in payload_cols], F.col(right_ts).alias("_rts")
        ).alias("_right"),
    )
    # right rows order before left rows at equal ts (<= semantics);
    # strict mode flips the tie-break so the left row precedes it.
    # The payload struct is the deterministic TERTIARY key (r02
    # ADVICE): duplicate right rows at the same (key, ts) would
    # otherwise resolve to whichever the shuffle delivered last —
    # with it, the GREATEST payload struct wins, bit-stably.
    # (Payload fields must be orderable — no map columns; pass an
    # explicit orderable payload_cols subset otherwise.)
    side_order = F.col("_side").asc() if not strict else F.col("_side").desc()
    w = (
        W.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), side_order, F.col("_right").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, -1 if strict else 0)
    )
    matched = (
        l_tag.unionByName(r_tag)
        .withColumn("_asof", F.last("_right", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance_s is None:
        payload = [F.col(f"_asof.{c}").alias(c) for c in payload_cols]
    else:
        fresh = (
            F.unix_micros(F.col("_ts")) - F.unix_micros(F.col("_asof._rts"))
        ) <= F.lit(int(tolerance_s) * 1_000_000)
        payload = [F.when(fresh, F.col(f"_asof.{c}")).alias(c) for c in payload_cols]
    out = matched.select(
        *[F.col(f"_left.{c}").alias(c) for c in left.columns],
        *payload,
    )
    return out


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: list[str] | None = None,
    strict: bool = False,
    tolerance_s: int | None = None,
) -> DataFrame:
    """Forward as-of join: for each left row, attach the payload of
    the EARLIEST right row with ``right.ts >= left.ts`` (same key) —
    the time-reversed twin of :func:`asof_join` (pandas
    ``merge_asof(direction='forward')`` parity, property-tested
    against it).

    Same union+window shape and the same single keyed shuffle: rows
    order by (ts, side) with the left row preceding an equal-ts
    right row, so the ``rowsBetween(1, unboundedFollowing)`` frame's
    first non-null payload is the next right row at-or-after the
    left timestamp (``strict=True`` flips the tie so an equal-ts
    right row is excluded).  ``tolerance_s`` bounds how far in the
    future the match may be."""
    payload_cols = payload_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_left"),
    )
    right_types = dict(right.dtypes)
    _right_type = (
        "struct<"
        + ",".join(f"{c}:{right_types[c]}" for c in payload_cols)
        + f",_rts:{right_types[right_ts]}>"
    )
    l_tag = l_tag.withColumn("_right", F.lit(None).cast(_right_type))
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{dict(left.dtypes)[c]}" for c in left.columns) + ">"
        ).alias("_left"),
        F.struct(
            *[F.col(c) for c in payload_cols], F.col(right_ts).alias("_rts")
        ).alias("_right"),
    )
    # left rows order before right rows at equal ts (>= semantics: the
    # equal-ts right row falls INSIDE the following frame); strict
    # mode flips the tie so it falls outside
    # tertiary payload-struct key: duplicate right rows at one
    # (key, ts) resolve deterministically to the LEAST payload struct
    # (first() over the following frame) — see asof_join
    side_order = F.col("_side").desc() if not strict else F.col("_side").asc()
    w = (
        W.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), side_order, F.col("_right").asc_nulls_first())
        .rowsBetween(1, W.unboundedFollowing)
    )
    matched = (
        l_tag.unionByName(r_tag)
        .withColumn("_asof", F.first("_right", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance_s is None:
        payload = [F.col(f"_asof.{c}").alias(c) for c in payload_cols]
    else:
        fresh = (
            F.unix_micros(F.col("_asof._rts")) - F.unix_micros(F.col("_ts"))
        ) <= F.lit(int(tolerance_s) * 1_000_000)
        payload = [F.when(fresh, F.col(f"_asof.{c}")).alias(c) for c in payload_cols]
    return matched.select(
        *[F.col(f"_left.{c}").alias(c) for c in left.columns],
        *payload,
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: list[str] | None = None,
    tolerance_s: int | None = None,
) -> DataFrame:
    """Nearest as-of join: for each left row, the right row (same
    key) with the smallest |right.ts - left.ts|; ties break to the
    EARLIER right row (pandas ``merge_asof(direction='nearest')``
    parity, property-tested).

    Both candidate passes share ONE keyed sort: rows order by
    (ts, side right-first), the backward candidate is
    ``last(payload)`` over (unboundedPreceding, 0) and the forward
    candidate is ``first(payload)`` over (1, unboundedFollowing) —
    same partitioning and order, so Catalyst plans a single
    WindowExec and a single shuffle.  An equal-ts right row sorts
    before the left row, landing in the backward frame at distance
    0 — which is also why the forward frame can start at row 1.
    The winner is a row-local integer-microsecond comparison;
    ``tolerance_s`` nulls candidates farther than the bound on
    either side before the pick.
    """
    payload_cols = payload_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_left"),
    )
    right_types = dict(right.dtypes)
    _right_type = (
        "struct<"
        + ",".join(f"{c}:{right_types[c]}" for c in payload_cols)
        + f",_rts:{right_types[right_ts]}>"
    )
    l_tag = l_tag.withColumn("_right", F.lit(None).cast(_right_type))
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{dict(left.dtypes)[c]}" for c in left.columns) + ">"
        ).alias("_left"),
        F.struct(
            *[F.col(c) for c in payload_cols], F.col(right_ts).alias("_rts")
        ).alias("_right"),
    )
    # tertiary payload-struct key for duplicate (key, ts) right rows:
    # backward candidate = greatest struct, forward = least — both
    # deterministic (see asof_join)
    base = W.partitionBy("_k").orderBy(
        F.col("_ts").asc(), F.col("_side").asc(), F.col("_right").asc_nulls_first()
    )
    wb = base.rowsBetween(W.unboundedPreceding, 0)
    wf = base.rowsBetween(1, W.unboundedFollowing)
    m = (
        l_tag.unionByName(r_tag)
        .withColumn("_b", F.last("_right", ignorenulls=True).over(wb))
        .withColumn("_f", F.first("_right", ignorenulls=True).over(wf))
        .filter(F.col("_side") == 1)
    )
    b_d = F.unix_micros(F.col("_ts")) - F.unix_micros(F.col("_b._rts"))
    f_d = F.unix_micros(F.col("_f._rts")) - F.unix_micros(F.col("_ts"))
    if tolerance_s is not None:
        tol_us = F.lit(int(tolerance_s) * 1_000_000)
        m = m.withColumn("_b", F.when(b_d <= tol_us, F.col("_b"))).withColumn(
            "_f", F.when(f_d <= tol_us, F.col("_f"))
        )
    take_b = F.col("_b").isNotNull() & (F.col("_f").isNull() | (b_d <= f_d))
    m = m.withColumn("_asof", F.when(take_b, F.col("_b")).otherwise(F.col("_f")))
    return m.select(
        *[F.col(f"_left.{c}").alias(c) for c in left.columns],
        *[F.col(f"_asof.{c}").alias(c) for c in payload_cols],
    )


def interval_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket: str = "1 hour",
    extra_key: str | None = None,
) -> DataFrame:
    """Point-in-interval join ``start <= point_ts < end`` for two
    LARGE inputs, as a bucket equi-join.

    Each interval row explodes to one row per covered bucket
    (``sequence(bucket(start), bucket(end))``); each point carries
    its own bucket; the equi-join on (bucket [, extra_key]) shuffles
    both sides by bucket, then the exact predicate filters.  Output
    may contain each (point, interval) pair once (duplicates from
    intervals spanning several buckets are dropped).
    """
    b_expr = f"date_trunc('{_trunc_unit(bucket)}', {{c}})"
    p = points.withColumn("_bucket", F.expr(b_expr.format(c=point_ts)))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.expr(
                f"sequence({b_expr.format(c=start_ts)}, {b_expr.format(c=end_ts)}, interval {bucket})"
            )
        ),
    )
    on = ["_bucket"] + ([extra_key] if extra_key else [])
    exact: Column = (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    return p.join(iv, on=on, how="inner").filter(exact).drop("_bucket")


def _trunc_unit(bucket: str) -> str:
    unit = bucket.split()[-1].rstrip("s")
    if unit not in ("minute", "hour", "day", "week", "month"):
        raise ValueError(f"unsupported bucket unit: {bucket}")
    return unit
