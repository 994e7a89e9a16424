"""One-decade scale stress for the scale-sensitive operators
(r06 verdict next-round #7): the fixtures stop at sf0.1, so this
script synthesizes an ~sf1 stress corpus — the sf0.1 facts unioned
10x with disjoint key offsets, document text re-tokenized per copy so
near-dup candidate volume grows LINEARLY like an organic crawl (10
verbatim copies of every doc would instead benchmark a pathological
all-duplicates corpus — the shape stress-TESTED in
tests/test_streaming_dedup.py, not organic growth) — then measures
the scale-sensitive queries at sf0.1 and sf1 and reports:

* wall-time scaling exponents  e = log10(t_sf1 / t_sf0.1)
  (e ~ 1.0 = linear, < 1 = fixed overhead amortizing, >> 1 = a
  super-linear shape that would NOT survive 100 TB);
* plan-shape drift: the number of single-partition global windows
  must not grow with scale (the two-phase rank/cumsum promise);
* persist hygiene: after clear_keyed_cache + clearCache the JVM
  holds no more cached RDDs than before the run (no per-call leak).

Usage: python scripts/sf1_stress.py [out_json] [stress_dir]
(stress corpus is built once under /tmp and reused; ~1.2 GB)
No oracle at sf1 — correctness at 3 SFs is the check_oracle ledger's
job; THIS measures how the plans scale.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from sfs3_kinesis_spark.plans import REGISTRY  # noqa: E402
from sfs3_kinesis_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
COPIES = 10
#: key offset per copy — far above every sf0.1 key domain, so the 10
#: copies are disjoint and parent/child joins stay referentially intact
OFF = 1_000_000_000

#: the scale-sensitive set: two-phase rank/cumsum consumers, MinHash
#: banding, iterative pagerank, window/sessionization, bitmap agg,
#: prefix-filter similarity join — every shape the verdicts flagged
#: as make-or-break at 1000x
QUERIES = [
    "mine_rfm_segmentation",       # chained global_rank (keyed cache)
    "mine_abc_classification",     # global_cumsum
    "mine_wilcoxon_rank_sum",      # global_cumsum, 2 sum cols
    "dedup_minhash_lsh",           # band-key self-join
    "dedup_exact_text",            # hash groupBy
    "graph_pagerank_parts",        # iterative broadcast joins
    "events_sessionization",       # keyed windows
    "window_topk_orders_per_customer",
    "agg_bitmap_distinct",
    "retrieval_bm25",
    # round-7 session-2 scale-proof rewrites: the exact prefix-filtered
    # set-similarity joins replaced the all-pairs theta joins (a naive
    # sf1 run would be 1.25e9 array intersections), the multiprobe
    # candidate join got an explicit bucket-key layout, and the
    # co-occurrence precompute persists its shared user-item table —
    # each must hold e ~ 1 at 10x or the rewrite is fixture-tuned.
    "dedup_ngram_jaccard",         # exact Jaccard via prefix filter
    "dedup_containment",           # asymmetric containment prefix filter
    "dedup_simhash_multiprobe",    # rotation-table candidate join
    "mine_sequential_pairs",       # span-table temporal pair join
    "recsys_item_item_topk",       # persisted co-occurrence + salted topk
]


def _offset(df, cols):
    for c in cols:
        df = df.withColumn(c, F.col(c) + F.lit(OFF) * F.col("_copy"))
    return df


def build(spark, out: str) -> None:
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        print(f"stress corpus already built at {out}")
        return
    os.makedirs(out, exist_ok=True)
    copies = spark.range(COPIES).select(F.col("id").cast("long").alias("_copy"))
    for name in ("region", "nation", "embeddings"):
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
    key_cols = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
    }
    for name, cols in key_cols.items():
        df = spark.read.parquet(f"{SRC}/{name}.parquet").crossJoin(copies)
        df = _offset(df, cols)
        if name == "documents":
            # per-copy token suffix: copy i>0 shares NO shingles with
            # copy 0, so MinHash/near-dup candidate volume scales like
            # an organic corpus, not an all-duplicates one
            df = df.withColumn(
                "text",
                F.when(F.col("_copy") == 0, F.col("text")).otherwise(
                    F.expr(
                        "concat_ws(' ', transform(split(text, ' '), "
                        "t -> concat(t, '_', CAST(_copy AS STRING))))"
                    )
                ),
            )
        df.drop("_copy").repartition(32).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
        print(f"built {name} x{COPIES}")
    open(marker, "w").close()


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def time_query(spark, name: str, sf_dir: str) -> dict:
    spec = REGISTRY[name]
    t0 = time.time()
    materialize(spec.spark(spark, sf_dir))
    cold = time.time() - t0
    warm = []
    for _ in range(2):
        t0 = time.time()
        materialize(spec.spark(spark, sf_dir))
        warm.append(time.time() - t0)
    spark.catalog.clearCache()
    return {"cold": round(cold, 3), "steady": round(min(warm), 3)}


def neardup_gate(spark, sf_dir: str, n_docs: int) -> float:
    """Docs/s through StreamingNearDup over the FIRST n_docs of the
    given corpus in 3 batches (bench.py discipline: epoch 0 = ramp)."""
    import shutil
    import tempfile

    from sfs3_kinesis_spark.streaming.neardup import StreamingNearDup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    total = docs.count()
    n_docs = min(n_docs, total)
    per_batch = n_docs // 3
    tmp = tempfile.mkdtemp(prefix="sf1_neardup_")
    try:
        nd = StreamingNearDup(spark, os.path.join(tmp, "ndx"))
        elapsed = 0.0
        timed_docs = 0
        for i in range(3):
            # hash-split, never a driver collect: three ~equal batches
            batch = docs.filter(
                F.pmod(F.xxhash64("doc_id"), F.lit(3 * total // n_docs or 1))
                == F.lit(i)
            )
            n_batch = batch.count()
            t0 = time.time()
            nd.process_batch(batch, i)
            if i > 0:
                elapsed += time.time() - t0
                timed_docs += n_batch
        return round(timed_docs / elapsed, 1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> int:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "SF1_STRESS.json"
    stress_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_stress"
    spark = get_spark("sf1-stress")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, stress_dir)

    from scripts.plan_audit import global_windows
    from sfs3_kinesis_spark.operators.scale import clear_keyed_cache

    clear_keyed_cache()
    spark.catalog.clearCache()
    persisted_before = spark.sparkContext._jsc.getPersistentRDDs().size()

    results: dict[str, dict] = {}
    for name in QUERIES:
        r01 = time_query(spark, name, SRC)
        r1 = time_query(spark, name, stress_dir)
        # static plan string, same extraction as scripts/plan_audit.py
        gw01 = global_windows(
            REGISTRY[name].spark(spark, SRC)._jdf.queryExecution().executedPlan().toString()
        )
        gw1 = global_windows(
            REGISTRY[name]
            .spark(spark, stress_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        exp = (
            round(math.log10(max(r1["steady"], 1e-3) / max(r01["steady"], 1e-3)), 2)
            if r01["steady"] > 0
            else None
        )
        results[name] = {
            "sf0.1": r01,
            "sf1": r1,
            "exponent_steady": exp,
            "global_windows_sf0.1": gw01,
            "global_windows_sf1": gw1,
        }
        print(
            f"  {name:34s} sf0.1 {r01['steady']:7.3f}s  sf1 {r1['steady']:7.3f}s"
            f"  e={exp}  gw {gw01}->{gw1}"
        )

    nd01 = neardup_gate(spark, SRC, 4800)
    nd1 = neardup_gate(spark, stress_dir, 48000)
    results["streaming_neardup_gate"] = {
        "sf0.1_docs_per_sec": nd01,
        "sf1_docs_per_sec": nd1,
        "rate_ratio": round(nd1 / nd01, 2) if nd01 else None,
    }
    print(f"  neardup gate: sf0.1 {nd01} docs/s, sf1 {nd1} docs/s")

    clear_keyed_cache()
    spark.catalog.clearCache()
    persisted_after = spark.sparkContext._jsc.getPersistentRDDs().size()

    flags = []
    for name in QUERIES:
        r = results[name]
        if r["global_windows_sf1"] > r["global_windows_sf0.1"]:
            flags.append(f"{name}: global windows grew with scale")
        if r["exponent_steady"] is not None and r["exponent_steady"] > 1.3:
            flags.append(
                f"{name}: super-linear steady scaling e={r['exponent_steady']}"
            )
    if persisted_after > persisted_before:
        flags.append(
            f"persist growth: {persisted_before} -> {persisted_after} cached RDDs"
        )

    try:
        load_1m = round(os.getloadavg()[0], 2)
    except OSError:
        load_1m = None
    report = {
        "src": SRC,
        "stress_dir": stress_dir,
        "copies": COPIES,
        "load_1m": load_1m,
        "persisted_rdds_before": persisted_before,
        "persisted_rdds_after": persisted_after,
        "flags": flags,
        "results": results,
    }
    with open(out_json, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {out_json}; flags: {flags or 'none'}")
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
