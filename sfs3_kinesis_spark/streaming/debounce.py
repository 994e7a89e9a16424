"""Per-key debounce / throttle — the alert-deduplication primitive:
for each key, emit an event only if its event time is at least
``cooldown_ms`` after the LAST EMITTED event for that key; suppress
everything inside the cooldown.

This is NOT a fixed-bucket rollup (which re-arms on the calendar) and
NOT ``dropDuplicatesWithinWatermark`` (which keys on value identity):
the anchor is the previous *emission*, so a burst of n events spaced
just under the cooldown collapses to exactly one emission, then the
next event after the window re-arms.  The recurrence ``emit iff
ts >= last_emitted + cooldown`` is inherently sequential per key —
no window function expresses it (LAG sees the previous EVENT, not
the previous EMISSION) — which is exactly what keyed state is for.

The reference's closest shape is its polite poll re-arm
(``/root/reference/svcsample/svckinesis.js:207-211``: act, then
suppress for 1500 ms); this operator is that discipline applied
per key to a data stream.

Two tiers, one recurrence:

* **streaming**: ``applyInPandasWithState`` — state is one BIGINT
  (last emitted ms) per key; output is the emitted subset.
  Deterministic given per-key event-time order within each batch
  (the operator sorts its group input by (ts, event_type) — a total
  order on the fixture — so replay/backfill of the same batches
  yields the same emissions).
* **batch twin** (:func:`debounce_batch`): same recurrence as a
  per-key fold via ``applyInPandas`` — used by the DuckDB oracle
  (recursive CTE walks the same recurrence) to value-verify the
  logic the streaming tier runs.

Scale: state is 8 bytes per key, partitioned by key; a suppressed
event costs one state read — no shuffle beyond the keyed exchange
every stateful operator needs.
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
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("last_emit_ms", T.LongType())])


def _emit_fold(ts_ms_sorted, last_emit_ms: int | None, cooldown_ms: int):
    """The shared recurrence: returns (emitted index list, new last)."""
    out = []
    last = last_emit_ms
    for i, ts_ms in enumerate(ts_ms_sorted):
        if last is None or ts_ms >= last + cooldown_ms:
            out.append(i)
            last = ts_ms
    return out, last


def _make_debounce_group(cooldown_ms: int):
    def fn(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts", "event_type"], kind="mergesort").reset_index(drop=True)
        (last,) = state.get if state.exists else (None,)
        ts_ms = (rows["ts"].astype("int64") // 1_000_000).tolist()
        keep, last = _emit_fold(ts_ms, last, cooldown_ms)
        if last is not None:
            state.update((int(last),))
        if keep:
            yield rows.iloc[keep][["user_id", "ts", "event_type"]]

    return fn


def debounce(events: DataFrame, *, cooldown_ms: int) -> DataFrame:
    """Streaming tier: input columns (user_id, ts, event_type)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_debounce_group(cooldown_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def debounce_batch(
    events: DataFrame,
    *,
    cooldown_ms: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Batch twin: one ``applyInPandas`` fold per key — the same
    recurrence the streaming tier runs, so the two can never drift;
    the DuckDB recursive-CTE oracle value-verifies this form."""
    schema = events.select(key_col, ts_col, "event_type").schema

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, "event_type"], kind="mergesort").reset_index(drop=True)
        ts_ms = (pdf[ts_col].astype("int64") // 1_000_000).tolist()
        keep, _ = _emit_fold(ts_ms, None, cooldown_ms)
        return pdf.iloc[keep][[f.name for f in schema.fields]]

    return (
        events.select(key_col, ts_col, "event_type")
        .groupBy(key_col)
        .applyInPandas(fold, schema=schema)
    )
