"""``transformWithStateInPandas`` twin of the correlator (r07 verdict
next-round #2).

Spark 4's successor stateful API (typed state variables, per-key
timers with explicit register/delete, TTL) replaces the single
implicit timeout of ``applyInPandasWithState``.  This module ports
the keyed correlation state machine of
:mod:`sfs3_kinesis_spark.streaming.correlate` (reference semantics:
``svcsample/svckinesis.js:60,66`` pending insert, ``:173-185``
lookup-and-complete, ``:157,80-88`` 20 s eviction, ``:178-181``
orphan drop) onto that API — identical OUTPUT_SCHEMA, identical
matched/orphan/timeout rows on the same inputs.

CONTAINER-GATED: the API's state protocol serializes over protobuf
(``pyspark/sql/streaming/proto/StateMessage_pb2``), so the Python
worker needs ``google.protobuf`` at RUNTIME — absent and
uninstallable in this container (SCALE.md documents the crash).  The
class definitions import cleanly here (only the worker-side client
needs protobuf), so :func:`tws_available` probes the dependency and
the constructors raise loudly when it is missing; the equivalence
test (``tests/test_correlate_tws.py``) importorskips on
``google.protobuf`` with a recorded reason and passes wherever the
dependency exists — the same self-closing-gap pattern as the
jar-gated Kinesis round trip.

One deliberate improvement over the ``applyInPandasWithState`` form:
that bridge cannot clear a registered timeout when ``remove()`` runs
in the same invocation that armed it, so the group body must
suppress spurious timer firings for txns with no state.  Here the
timer is explicitly ``deleteTimer``-ed on match, so the
belt-and-braces no-state guard in ``handleExpiredTimer`` should
never fire — it is kept anyway (a timer that outlives its state must
never fabricate a timeout row).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from sfs3_kinesis_spark.streaming.correlate import (
    OUTPUT_SCHEMA,
    _http_code,
    unioned_input,
)

#: pending-request state: submitted_at, budget, and the armed timer's
#: deadline (kept so a re-request can deleteTimer the stale one — the
#: old API's implicit timeout had exactly-one-per-key semantics; v2
#: timers are a SET per key, so an un-deleted stale timer would fire)
STATE_DDL = "submitted_at_ms LONG, timeout_ms LONG, deadline_ms LONG"


def tws_available() -> tuple[bool, str]:
    """Probe the container for the transformWithStateInPandas runtime.

    Returns (ok, reason).  The binding is RUNTIME, not import-time:
    ``StatefulProcessor`` imports fine without protobuf, but the
    worker-side state client crashes at query start on
    ``StateMessage_pb2`` — so the probe checks ``google.protobuf``
    itself, the exact dependency SCALE.md records as absent here.
    """
    try:
        import google.protobuf  # noqa: F401
    except Exception as exc:  # noqa: BLE001 — record the real reason
        return (
            False,
            "google.protobuf unavailable "
            f"({exc!r}) — transformWithStateInPandas's state protocol "
            "(pyspark.sql.streaming.proto.StateMessage_pb2) cannot run "
            "in this container; the applyInPandasWithState correlator "
            "remains the executing form (SCALE.md)",
        )
    return True, "google.protobuf present — tws runtime available"


class CorrelateProcessor(StatefulProcessor):
    """Keyed request↔event state machine on the v2 API.

    ``event_time_timers=False`` → processing-time deadlines (the
    reference's literal wall-clock 20 s budget, pollingsvc.js:133);
    ``True`` → deadlines on the event-time axis that fire when the
    watermark passes ``submitted_at + timeout`` — replay-
    deterministic, mirroring ``correlate_event_time``.
    """

    def __init__(self, event_time_timers: bool = False) -> None:
        self._event_time = event_time_timers

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._pending = handle.getValueState("pending", STATE_DDL)

    def _arm(self, deadline_ms: int) -> None:
        self._handle.registerTimer(deadline_ms)

    def _disarm(self, deadline_ms: int) -> None:
        try:
            self._handle.deleteTimer(deadline_ms)
        except Exception:  # noqa: BLE001 — timer already fired/absent
            pass

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        txn_id = key[0] if isinstance(key, tuple) else key
        batch = pd.concat(list(rows), ignore_index=True)
        batch = batch.sort_values("ts", kind="stable")  # per-key order (W7)

        pending: Tuple[int, int, int] | None = (
            tuple(self._pending.get()) if self._pending.exists() else None
        )
        out: list[dict] = []
        for row in batch.itertuples(index=False):
            if row.kind == "request":
                submitted_ms = int(row.ts.value // 1_000_000)
                timeout_ms = int(row.timeout_ms)
                if pending is not None:
                    self._disarm(pending[2])
                if self._event_time:
                    # deadline on the event-time axis; clamp just past
                    # the current watermark (a backfill can advance the
                    # watermark past the deadline between batches —
                    # an already-past-due request must time out on the
                    # next tick, not be silently unregisterable)
                    deadline_ms = submitted_ms + timeout_ms
                    wm_ms = timerValues.getCurrentWatermarkInMs()
                    if deadline_ms <= wm_ms:
                        deadline_ms = wm_ms + 1
                else:
                    deadline_ms = (
                        timerValues.getCurrentProcessingTimeInMs() + timeout_ms
                    )
                pending = (submitted_ms, timeout_ms, deadline_ms)
                self._pending.update(pending)
                self._arm(deadline_ms)
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
                    self._disarm(pending[2])
                    pending = None
                    self._pending.clear()
                else:
                    # unknown/evicted txn — reference logs & drops
                    # (svckinesis.js:178-181); emit accountable row
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

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        txn_id = key[0] if isinstance(key, tuple) else key
        if not self._pending.exists():
            # timer outlived its state (matched in the same batch the
            # timer fired, or a stale timer the disarm missed) — a
            # timeout row here would fabricate an eviction
            return
        pending = tuple(self._pending.get())
        if int(pending[2]) != int(expiredTimerInfo.getExpiryTimeInMs()):
            # a stale timer for a SUPERSEDED request (re-request armed
            # a new deadline) — only the live deadline may evict
            return
        self._pending.clear()
        yield pd.DataFrame(
            [
                {
                    "txn_id": txn_id,
                    "outcome": "timeout",
                    "status": None,
                    "http_code": None,
                    "latency_ms": None,
                }
            ]
        )

    def close(self) -> None:
        pass


def _gated(fn_name: str) -> None:
    ok, reason = tws_available()
    if not ok:
        raise RuntimeError(f"{fn_name}: {reason}")


def correlate_tws(requests: DataFrame, events: DataFrame) -> DataFrame:
    """Processing-time twin of :func:`correlate.correlate` on the v2
    API.  Raises RuntimeError with the recorded probe reason where
    the protobuf runtime is absent (this container)."""
    _gated("correlate_tws")
    merged = unioned_input(requests, events)
    return merged.groupBy("txn_id").transformWithStateInPandas(
        CorrelateProcessor(event_time_timers=False),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="processingTime",
    )


def correlate_tws_event_time(
    requests: DataFrame, events: DataFrame, *, watermark: str = "10 seconds"
) -> DataFrame:
    """Event-time twin of :func:`correlate.correlate_event_time` on
    the v2 API: deadlines fire when the watermark passes
    ``submitted_at + timeout_ms`` — replay-deterministic."""
    _gated("correlate_tws_event_time")
    merged = unioned_input(requests, events).withWatermark("ts", watermark)
    return merged.groupBy("txn_id").transformWithStateInPandas(
        CorrelateProcessor(event_time_timers=True),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )
