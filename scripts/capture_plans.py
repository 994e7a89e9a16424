"""Capture ``explain("formatted")`` output for named registry queries.

Usage::

    python scripts/capture_plans.py OUTDIR SUFFIX [--sf-dir SF_DIR] name [name ...]

Writes ``OUTDIR/<name>_<SUFFIX>.txt`` per query — the optimization
rounds commit these under ``plans/r10/`` etc. so plan claims in the
round notes (Exchange counts, join strategies, pushdown, pin shape)
are checkable without running Spark.  Mirrors ``plan_audit.py``'s
byte-reproducibility discipline: the keyed pin LRU and the catalog
cache are cleared before every capture so a capture never depends on
what ran earlier in the session — and (r10 ADVICE) its AQE setting:
AQE is disabled so the committed artifact shows the same STATIC plan
the audit checks, not an AdaptiveSparkPlan wrapper.

A failed capture writes ``<name>_<SUFFIX>.txt.FAILED`` (never the
artifact itself) and the run exits nonzero (r10 ADVICE: failure text
must not be committable as a plan by accident).
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


def main() -> int:
    outdir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.001"
    executed = False
    if rest and rest[0] == "--executed":
        # capture the FINAL adaptive plan after actually running the
        # query through the noop sink (AQE on, the production
        # configuration): static estimates cannot see a pinned
        # intermediate's real size, so join strategies in the static
        # capture can differ from what executes — e.g. the r11
        # hash-keyed vocabulary join plans as SMJ statically and runs
        # as a broadcast under AQE.  Use this mode to document
        # runtime join strategy claims.
        executed, rest = True, rest[1:]
    if rest and rest[0] == "--sf-dir":
        sf_dir, rest = rest[1], rest[2:]
    names = rest
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("capture-plans")
    if not executed:
        # match plan_audit.py: capture the static plan, not the
        # AdaptiveSparkPlan wrapper, so artifact and audit agree
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    from sfs3_kinesis_spark.operators.scale import clear_keyed_cache

    failed = 0
    for name in names:
        clear_keyed_cache()
        spark.catalog.clearCache()
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        try:
            df = REGISTRY[name].spark(spark, sf_dir)
            if executed:
                df.write.format("noop").mode("overwrite").save()
                text = df._jdf.queryExecution().executedPlan().toString()
            else:
                text = explain_formatted(df)
        except Exception as exc:  # noqa: BLE001
            failed += 1
            path += ".FAILED"
            text = f"CAPTURE FAILED: {exc}"
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
