"""DuckDB-oracle comparison harness, mirroring the driver's check:
row count + schema-insensitive, order-insensitive value comparison
with columns sorted by name."""

from __future__ import annotations

import math

import duckdb

import sfs3_kinesis_spark as pkg


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in pkg.TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style canonical float formatting
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon_cell(r[i]) for i in order) for r in rows)


def compare(spark_df, con, sql: str, timings: dict | None = None):
    """Return (ok, detail) comparing a Spark result with the oracle.
    When ``timings`` is given, record the Spark-collect and
    DuckDB-execute wall seconds into it (the per-query sweep ledger,
    r06 verdict next-round #4)."""
    import time as _time

    s_cols = [c.lower() for c in spark_df.columns]
    t0 = _time.time()
    s_rows = [tuple(r) for r in spark_df.collect()]
    if timings is not None:
        timings["spark_s"] = round(_time.time() - t0, 3)
    t0 = _time.time()
    res = con.execute(sql)
    d_cols = [c[0].lower() for c in res.description]
    d_rows = res.fetchall()
    if timings is not None:
        timings["oracle_s"] = round(_time.time() - t0, 3)
        timings["rows"] = len(s_rows)
    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    cs, cd = _canon_rows(s_cols, s_rows), _canon_rows(d_cols, d_rows)
    if cs != cd:
        diff = [(a, b) for a, b in zip(cs, cd) if a != b][:5]
        return False, f"value mismatch, first diffs: {diff}"
    return True, f"ok ({len(s_rows)} rows)"
