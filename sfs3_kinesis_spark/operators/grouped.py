"""Grouped custom logic via ``applyInPandas`` (SURVEY.md §2.11).

The engine's three Python-boundary tiers are all Arrow-vectorized:
``mapInPandas`` (multimodal featurize), ``applyInPandasWithState``
(correlate), and this — per-group pandas computation.  The example
operator (per-user inter-event gap statistics) is deliberately also
SQL-expressible so the DuckDB oracle can verify the applyInPandas
plumbing VALUE-exactly; swap the body for genuinely non-relational
per-group logic (model scoring, curve fitting) without touching the
distributed shape.

Scale: one shuffle on the group key; each group materializes in one
worker's memory — the right tier when per-group size is bounded
(here: events per user), NOT for whole-partition-scale groups.

Precision note: gaps are computed in MICROseconds from the
microsecond-truncated timestamps — Spark timestamps are µs-precision
while the raw parquet is ns; µs is the finest unit both engines
agree on (ms-level date_diff counts boundary crossings, not floored
differences, and diverges on sub-ms components).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

GAP_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_gaps", T.LongType()),
        T.StructField("sum_gap_us", T.LongType()),
        T.StructField("max_gap_us", T.LongType()),
    ]
)


def _gap_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts", "event_id"])
    us = pdf["ts"].astype("datetime64[us]").astype("int64")
    gaps = us.diff().dropna()
    if len(gaps) == 0:
        return pd.DataFrame(columns=["user_id", "n_gaps", "sum_gap_us", "max_gap_us"]).astype(
            {"user_id": "int64", "n_gaps": "int64", "sum_gap_us": "int64", "max_gap_us": "int64"}
        )
    return pd.DataFrame(
        [
            {
                "user_id": int(pdf["user_id"].iloc[0]),
                "n_gaps": int(len(gaps)),
                "sum_gap_us": int(gaps.sum()),
                "max_gap_us": int(gaps.max()),
            }
        ]
    )


def user_gap_stats(events: DataFrame) -> DataFrame:
    """Per-user inter-event gap stats (count / sum / max in µs),
    event-time ordered with event_id tiebreak.  Users with fewer
    than two events produce no row."""
    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandas(_gap_stats, schema=GAP_SCHEMA)
    )
