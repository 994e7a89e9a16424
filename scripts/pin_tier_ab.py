"""A/B the above-cap pin tiers at sf10 (r08 verdict next-round #4).

The round-8 size guard was motivated by a measured inversion: at
~500k docs the DEFAULT deserialized-columnar cache of the shingle
prefix table made reuse SLOWER than recomputation (pinned warm 218 s
vs unpinned 120 s).  But "unpin and recompute per consumer" is only
one alternative — a serialized/disk tier may keep reuse cheap
without the deserialized-cache thrash, and for ITERATIVE consumers
(pagerank's 10 passes over the same edge table) recomputation
multiplies the corpus scan by the iteration count.  This script
measures, on the sf10 prefix corpus and the query with the original
inversion (``dedup_ngram_jaccard``):

* ``pin``        — size guard OFF: always pin, deserialized default
                   (the pre-r8 behavior that thrashed);
* ``none``       — guard on, above-cap frames UNPINNED (the r8 ship);
* ``disk``       — guard on, above-cap frames StorageLevel.DISK_ONLY
                   through the same LRU;
* ``memdiskser`` — guard on, above-cap frames serialized
                   MEMORY_AND_DISK.

Protocol: one discarded global warmup (JIT), then per config:
clear caches -> 1 cold + 2 warm materializations (noop sink).
``steady`` = min(warm).  The winner becomes
``SFS3K_PIN_OVERSIZE_LEVEL``'s default in operators/scale.py, and
the run is recorded in SCALE.md round 9 + PIN_TIER_AB.json.

Usage: python scripts/pin_tier_ab.py [out_json] [sf10_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from sfs3_kinesis_spark.plans import REGISTRY  # noqa: E402
from sfs3_kinesis_spark.session import get_spark  # noqa: E402

QUERY = "dedup_ngram_jaccard"

CONFIGS = [
    # (label, pin_max_est_bytes, oversize_level)
    ("pin", 0, "none"),
    ("none", 32 * 1024 * 1024, "none"),
    ("disk", 32 * 1024 * 1024, "disk"),
    ("memdiskser", 32 * 1024 * 1024, "memdiskser"),
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "PIN_TIER_AB.json"
    sf10_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10_prefix"
    if not os.path.exists(os.path.join(sf10_dir, "_COMPLETE")):
        print(f"sf10 corpus missing at {sf10_dir} — run sf10_stress_prefix.py first")
        return 2

    from sfs3_kinesis_spark.operators import scale
    from sfs3_kinesis_spark.operators.scale import clear_keyed_cache

    spark = get_spark("pin-tier-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spec = REGISTRY[QUERY]

    # global JIT warmup, discarded (cold-JIT trap in BASELINE.md)
    materialize(spec.spark(spark, sf10_dir))
    clear_keyed_cache()
    spark.catalog.clearCache()

    results: dict[str, dict] = {}
    for label, cap, level in CONFIGS:
        scale._PIN_MAX_EST_BYTES = cap
        scale._PIN_OVERSIZE_LEVEL = level
        clear_keyed_cache()
        spark.catalog.clearCache()
        t0 = time.time()
        materialize(spec.spark(spark, sf10_dir))
        cold = time.time() - t0
        warm = []
        for _ in range(2):
            t0 = time.time()
            materialize(spec.spark(spark, sf10_dir))
            warm.append(time.time() - t0)
        decisions = dict(scale.PIN_DECISIONS)
        scale.PIN_DECISIONS.clear()
        clear_keyed_cache()
        spark.catalog.clearCache()
        results[label] = {
            "cold": round(cold, 3),
            "steady": round(min(warm), 3),
            "pin_decisions": decisions,
        }
        print(
            f"  {label:12s} cold {cold:8.3f}s  steady {min(warm):8.3f}s  "
            f"{decisions}"
        )

    try:
        load_1m = round(os.getloadavg()[0], 2)
    except OSError:
        load_1m = None
    winner = min(results, key=lambda k: results[k]["steady"])
    doc = {
        "query": QUERY,
        "sf10_dir": sf10_dir,
        "load_1m": load_1m,
        "configs": results,
        "steady_winner": winner,
    }
    with open(out_json, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(f"wrote {out_json}; steady winner: {winner}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
