"""Stream<->request correlation — the reference's one real stateful
operator (SURVEY.md §2.5 T12).

Reference behavior (``/root/reference/svcsample/svckinesis.js``):

* a pending HTTP request is inserted into an in-memory map keyed by
  txnId (``svckinesis.js:60,66``);
* each Kinesis status event is looked up by txnId: hit → complete
  the response (200 for SUCCEEDED, 400 otherwise) and evict
  (``:173-185`` + ``:90-106``); miss → log and drop the orphan
  (``:178-181``);
* requests time out after 20 s and are evicted, so their late
  events become orphans (``:157,80-88``).

Engine form: one keyed stateful operator over the *union* of the
request stream and the event stream (same key: txn_id), implemented
with ``applyInPandasWithState`` and a processing-time timeout.
(Spark 4's ``transformWithStateInPandas`` is the successor API with
per-key timers and state evolution; it requires a working
``google.protobuf`` runtime, absent in this container, so the engine
ships the applyInPandasWithState form — semantics are identical for
this operator.)
Keyed state serializes per-txn updates (the reference's per-shard
ordering guarantee, W7) while scaling horizontally across keys —
state lives in the state store, partitioned by key, so a 1000-node
cluster holds 1000× the pending requests with zero code change.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("txn_id", T.StringType()),
        T.StructField("outcome", T.StringType()),  # matched|orphan|timeout
        T.StructField("status", T.StringType()),
        T.StructField("http_code", T.IntegerType()),
        T.StructField("latency_ms", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("submitted_at_ms", T.LongType()),
        T.StructField("timeout_ms", T.LongType()),
    ]
)

DEFAULT_TIMEOUT_MS = 20_000  # the reference's 20 s request budget (pollingsvc.js:133)


def unioned_input(requests: DataFrame, events: DataFrame) -> DataFrame:
    """Merge the request stream and the status-event stream into one
    keyed stream (kind='request'|'event').  Requests carry
    submitted_at/timeout; events carry status/event_time."""
    r = requests.select(
        "txn_id",
        F.lit("request").alias("kind"),
        F.col("submitted_at").alias("ts"),
        F.lit(None).cast("string").alias("status"),
        F.coalesce(F.col("timeout_ms"), F.lit(DEFAULT_TIMEOUT_MS)).alias("timeout_ms"),
    )
    e = events.select(
        "txn_id",
        F.lit("event").alias("kind"),
        F.col("event_time").alias("ts"),
        "status",
        F.lit(None).cast("long").alias("timeout_ms"),
    )
    return r.unionByName(e)


def _http_code(status: str) -> int:
    # reference routing: SUCCEEDED → 200, anything else → 400
    # (svckinesis.js:97-104)
    return 200 if status == "SUCCEEDED" else 400


def _make_correlate_group(event_time_timers: bool):
    """Build the keyed state-machine body with the timer axis baked
    into the closure (a module global would not survive the worker
    re-import that cloudpickle's deserialization performs):

    * ``event_time_timers=False`` — processing-time budget, the
      reference's literal wall-clock 20 s timeout
      (pollingsvc.js:133); evictions depend on when batches run.
    * ``event_time_timers=True`` — the deadline lives on the EVENT-
      TIME axis (``submitted_at + timeout``) and fires when the
      WATERMARK passes it: same inputs always produce the same
      evictions, so a checkpoint replay or backfill reproduces the
      round bit-for-bit — the form a deterministic pipeline wants.
    """

    def _correlate_group(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        return _correlate_group_impl(key, pdfs, state, event_time_timers)

    return _correlate_group


def _correlate_group_impl(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    _EVENT_TIME_TIMERS: bool = False,
) -> Iterator[pd.DataFrame]:
    txn_id = key[0]
    out: list[dict] = []

    if state.hasTimedOut:
        if not state.exists:
            # a timer can outlive its request: the pandas GroupState
            # bridge does not clear a registered timeout when
            # ``remove()`` runs in the same invocation that armed it
            # (observed with EventTimeTimeout: a matched-and-removed
            # request still fired later).  No pending state = nothing
            # was evicted — suppress the spurious timeout row.
            state.remove()
            return
        # evict the pending request; its response was never completed
        # (svckinesis.js:80-88) — late events will be orphans
        state.remove()
        yield pd.DataFrame(
            [{"txn_id": txn_id, "outcome": "timeout", "status": None, "http_code": None, "latency_ms": None}]
        )
        return

    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values("ts", kind="stable")  # per-key event-time order (W7)

    pending = state.get if state.exists else None  # (submitted_at_ms, timeout_ms)

    for row in rows.itertuples(index=False):
        if row.kind == "request":
            submitted_ms = int(row.ts.value // 1_000_000)
            timeout_ms = int(row.timeout_ms)
            pending = (submitted_ms, timeout_ms)
            state.update(pending)
            if _EVENT_TIME_TIMERS:
                # deadline on the EVENT-TIME axis: fires when the
                # watermark passes submitted_at + budget — replay-
                # deterministic (same inputs -> same evictions).
                # Clamp to just past the CURRENT watermark: a backfill
                # can advance the watermark by more than the budget
                # between batches, and setTimeoutTimestamp raises on a
                # deadline at/under it (the row passed the late filter
                # against the PREVIOUS batch's watermark) — an
                # already-past-due request times out on the next
                # watermark tick instead of killing the query
                deadline_ms = submitted_ms + timeout_ms
                wm_ms = state.getCurrentWatermarkMs()
                if deadline_ms <= wm_ms:
                    deadline_ms = wm_ms + 1
                state.setTimeoutTimestamp(deadline_ms)
            else:
                state.setTimeoutDuration(timeout_ms)
        else:  # event
            if pending is not None:
                submitted_ms = pending[0]
                event_ms = int(row.ts.value // 1_000_000)
                out.append(
                    {
                        "txn_id": txn_id,
                        "outcome": "matched",
                        "status": row.status,
                        "http_code": _http_code(row.status),
                        "latency_ms": max(event_ms - submitted_ms, 0),
                    }
                )
                pending = None
                state.remove()
            else:
                # unknown/evicted txn — the reference logs & drops
                # (svckinesis.js:178-181); we emit an accountable row
                out.append(
                    {
                        "txn_id": txn_id,
                        "outcome": "orphan",
                        "status": row.status,
                        "http_code": None,
                        "latency_ms": None,
                    }
                )

    if out:
        yield pd.DataFrame(out)


def outcome_metrics(out: DataFrame, name: str = "correlate_metrics") -> DataFrame:
    """Attach ``observe()`` counters for matched/orphan/timeout rows
    (SURVEY.md W3: the reference only *logs* dropped orphans,
    svckinesis.js:178-181 — the engine makes the drop accountable).

    In streaming, the counters surface per micro-batch in
    ``StreamingQueryProgress.observedMetrics[name]``; in batch, pass
    the returned DataFrame through a ``pyspark.sql.Observation``.
    """
    return out.observe(
        name,
        F.count(F.when(F.col("outcome") == "matched", 1)).alias("n_matched"),
        F.count(F.when(F.col("outcome") == "orphan", 1)).alias("n_orphan"),
        F.count(F.when(F.col("outcome") == "timeout", 1)).alias("n_timeout"),
    )


def failover_resolve(correlate_out: DataFrame, state: DataFrame) -> DataFrame:
    """The polling↔events failover handoff (reference
    ``svcsample/svckinesis.js:70-78,126-152``): when the event path
    never completes a pending request — stream down, producer dead,
    or simply slower than the request budget — the reference moves
    the pending entry to the *polling* transition map and completes
    it from the Step Functions ``describeExecution`` status.

    Engine form: ``timeout`` rows from :func:`correlate` (the evicted
    pending requests) left-join the process-state store (the engine's
    describeExecution surface, ``Engine.status``).  A txn the
    pipeline HAS finished resolves with ``outcome='failover'`` and
    the same 200/400 routing the event path would have used; a txn
    the pipeline has not finished stays ``timeout`` (the reference's
    still-RUNNING poll, pollingsvc.js:77-93).  Late events for these
    txns remain accountable orphans in the correlate output — the
    handoff never double-completes (the event path's state entry was
    already evicted).

    A broadcast-friendly keyed equi-join: timeout rows are the rare
    tail of the outcome stream, so this runs as a tiny batch verb per
    poll cycle (or ``foreachBatch``) at any scale.
    """
    t_rows = correlate_out.filter(F.col("outcome") == "timeout").select("txn_id")
    s = state.select("txn_id", F.col("status").alias("_st"))
    # http_code only for resolved (failover) rows: a txn whose state
    # is still non-terminal (RUNNING) stays outcome='timeout' and must
    # carry NO response code, exactly like a txn with no state row at
    # all — the poll loop keeps waiting (ADVICE r03: the old
    # `_st.isNotNull() -> 400` branch gave RUNNING rows a 400).
    return t_rows.join(s, "txn_id", "left").select(
        "txn_id",
        F.when(F.col("_st").isin("SUCCEEDED", "FAILED"), F.lit("failover"))
        .otherwise(F.lit("timeout"))
        .alias("outcome"),
        F.col("_st").alias("status"),
        F.when(F.col("_st") == "SUCCEEDED", 200)
        .when(F.col("_st") == "FAILED", 400)
        .cast("int")
        .alias("http_code"),
    )


def correlate(requests: DataFrame, events: DataFrame) -> DataFrame:
    """The correlation operator: streaming in, streaming out.

    Input DataFrames may be streaming or batch (tests use batch via
    the same code path wrapped in a file-stream).  Output rows follow
    :data:`OUTPUT_SCHEMA`; matched/orphan rows are emitted as their
    events arrive, timeout rows when the state clock fires.
    """
    merged = unioned_input(requests, events)
    return merged.groupBy("txn_id").applyInPandasWithState(
        _make_correlate_group(event_time_timers=False),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def correlate_event_time(
    requests: DataFrame, events: DataFrame, *, watermark: str = "10 seconds"
) -> DataFrame:
    """The replay-deterministic twin of :func:`correlate`: request
    deadlines live in EVENT TIME (``submitted_at + timeout_ms``) and
    fire when the stream's WATERMARK passes them, not when a wall
    clock does.

    Consequences, versus the processing-time form:

    * a checkpoint replay / backfill reproduces the identical
      matched/timeout/orphan rows — wall-clock timers cannot promise
      that (the reference's 20 s budget, pollingsvc.js:133, is
      inherently wall-clock and so inherently non-replayable);
    * an idle stream evicts NOTHING (the watermark only advances
      with data) — the honest semantics for backfills, where "20
      seconds" means twenty seconds of STREAM time, not of operator
      wall time.

    ``watermark`` is the lateness allowance on the unioned input —
    state size is bounded by (timeout + watermark) × arrival rate,
    the same budget arithmetic the stream-stream join form uses.
    """
    merged = unioned_input(requests, events).withWatermark("ts", watermark)
    return merged.groupBy("txn_id").applyInPandasWithState(
        _make_correlate_group(event_time_timers=True),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
