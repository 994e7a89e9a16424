"""Run the full corpus against the DuckDB oracle at a given sf dir —
the local twin of the driver's CORRECTNESS gate.

Usage: python scripts/check_oracle.py [sf_dir] [query_name ...]
(extra args restrict the run to queries whose name starts with any
of the given prefixes; a ``-prefix`` argument EXCLUDES matching
names — used at sf0.1 to skip the handful of O(n^2)-by-design
DuckDB oracles documented in SCALE.md, whose ORACLE side takes tens
of minutes at 5000 docs while the engine's pruned plan is seconds)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from sfs3_kinesis_spark.plans import REGISTRY  # noqa: E402
from sfs3_kinesis_spark.session import get_spark  # noqa: E402
from tests.oracle import compare, duck_connection  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    includes = tuple(a for a in sys.argv[2:] if not a.startswith("-"))
    excludes = tuple(a[1:] for a in sys.argv[2:] if a.startswith("-"))
    names = sorted(
        n
        for n in REGISTRY
        if (not includes or n.startswith(includes))
        and not (excludes and n.startswith(excludes))
    )
    spark = get_spark("oracle-check")
    con = duck_connection(sf_dir)
    failures = 0
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            df = spec.spark(spark, sf_dir)
            if spec.oracle is None:
                n = df.count()
                print(f"  {name:40s} rows-only ({n} rows) [{time.time()-t0:.1f}s]")
                continue
            ok, detail = compare(df, con, spec.oracle)
        except Exception as exc:  # noqa: BLE001
            ok, detail = False, f"exception: {exc}"
        status = "OK " if ok else "FAIL"
        if not ok:
            failures += 1
        print(f"  {name:40s} {status} {detail} [{time.time()-t0:.1f}s]")
    print(f"{'PASS' if failures == 0 else 'FAIL'}: {len(names) - failures}/{len(names)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
