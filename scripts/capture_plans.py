"""Capture ``explain("formatted")`` output for named registry queries.

Usage::

    python scripts/capture_plans.py OUTDIR SUFFIX [SF_DIR] name [name ...]

Writes ``OUTDIR/<name>_<SUFFIX>.txt`` per query — the optimization
rounds commit these under ``plans/r10/`` etc. so plan claims in the
round notes (Exchange counts, join strategies, pushdown, pin shape)
are checkable without running Spark.  Mirrors ``plan_audit.py``'s
byte-reproducibility discipline: the keyed pin LRU and the catalog
cache are cleared before every capture so a capture never depends on
what ran earlier in the session.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import REGISTRY  # noqa: E402
from sfs3_kinesis_spark.session import get_spark  # noqa: E402


def explain_formatted(df) -> str:
    jqe = df._jdf.queryExecution()
    return df.sparkSession._jvm.PythonSQLUtils.explainString(jqe, "formatted")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.001", rest
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("capture-plans")
    from sfs3_kinesis_spark.operators.scale import clear_keyed_cache

    for name in names:
        clear_keyed_cache()
        spark.catalog.clearCache()
        try:
            df = REGISTRY[name].spark(spark, sf_dir)
            text = explain_formatted(df)
        except Exception as exc:  # noqa: BLE001
            text = f"CAPTURE FAILED: {exc}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
