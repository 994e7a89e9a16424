"""Third-decade streaming near-dup stress (r09 verdict next-round #6):
the continuous-ingestion gate (streaming/neardup.py) measured
604-672 docs/s at sf0.1 and 1563 docs/s at sf1 (superscalar — batch
overhead amortizes), but an index holding ~sf10 history with the
bounded ``max_candidates_per_doc`` had never been observed.

This script streams the ~500k-document sf10 corpus (built by
scripts/sf10_stress_prefix.py under /tmp/sf10_prefix — per-copy token
suffixes, so cross-copy docs share no shingles and candidate volume
grows like an organic crawl) through the gate in ``EPOCHS`` equal
hash-split batches, recording per epoch:

* wall seconds + docs/s (the decade claim: flat-or-better as the
  probed index grows to 10x any previous run);
* index size (band-key rows + shingle rows actually persisted —
  the state the NEXT epoch probes against, logged to show growth is
  linear-in-docs and the probe stays an equi-join against it);
* cumulative matches emitted.

Epoch 0 is ramp (empty history + residual plan compilation — the
bench.py discipline); the flat-rate gate compares the LAST third of
epochs against the first third after ramp.  Results merge into
SF1_STRESS.json under ``"x100_streaming_neardup"``.

Usage: python scripts/sf10_stress_neardup.py [out_json] [sf10_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from sfs3_kinesis_spark.session import get_spark  # noqa: E402

EPOCHS = 10


def main() -> int:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "SF1_STRESS.json"
    sf10_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10_prefix"
    if not os.path.exists(os.path.join(sf10_dir, "_COMPLETE")):
        print(f"sf10 corpus missing at {sf10_dir} — run sf10_stress_prefix.py first")
        return 2
    spark = get_spark("sf10-neardup-stress")
    spark.sparkContext.setLogLevel("ERROR")

    from sfs3_kinesis_spark.streaming.neardup import StreamingNearDup

    docs = spark.read.parquet(f"{sf10_dir}/documents.parquet").select("doc_id", "text")
    total = docs.count()
    tmp = tempfile.mkdtemp(prefix="sf10_neardup_")
    epochs: list[dict] = []
    try:
        nd = StreamingNearDup(spark, os.path.join(tmp, "ndx"))
        for i in range(EPOCHS):
            batch = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(EPOCHS)) == F.lit(i))
            n_batch = batch.count()
            t0 = time.time()
            nd.process_batch(batch, i)
            wall = time.time() - t0
            # state actually persisted for the NEXT epoch to probe
            bands_rows = spark.read.parquet(nd.bands_dir).count()
            shingle_rows = spark.read.parquet(nd.shingles_dir).count()
            m = nd.matches()
            n_matches = m.count() if m is not None else 0
            row = {
                "epoch": i,
                "docs": n_batch,
                "wall_s": round(wall, 2),
                "docs_per_sec": round(n_batch / wall, 1) if wall else None,
                "index_band_rows": bands_rows,
                "index_shingle_rows": shingle_rows,
                "matches_total": n_matches,
            }
            epochs.append(row)
            print(f"  epoch {i}: {row}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    steady = epochs[1:]  # epoch 0 = ramp
    third = max(len(steady) // 3, 1)
    first_rate = sum(e["docs_per_sec"] for e in steady[:third]) / third
    last_rate = sum(e["docs_per_sec"] for e in steady[-third:]) / third
    flags = []
    if last_rate < 0.7 * first_rate:
        flags.append(
            f"ingest rate decays with history: first-third {first_rate:.0f} "
            f"-> last-third {last_rate:.0f} docs/s"
        )
    # index growth must be ~linear in ingested docs (delta-append +
    # compaction, never rewritten-per-epoch quadratic I/O)
    docs_seen = sum(e["docs"] for e in epochs)
    if epochs[-1]["index_band_rows"] > 40 * docs_seen:
        flags.append(
            f"band index super-linear: {epochs[-1]['index_band_rows']} rows "
            f"for {docs_seen} docs"
        )

    try:
        load_1m = round(os.getloadavg()[0], 2)
    except OSError:
        load_1m = None
    section = {
        "sf10_dir": sf10_dir,
        "total_docs": total,
        "epochs": epochs,
        "rate_first_third": round(first_rate, 1),
        "rate_last_third": round(last_rate, 1),
        "load_1m": load_1m,
        "flags": flags,
    }
    doc = {}
    if os.path.exists(out_json):
        doc = json.load(open(out_json))
    doc["x100_streaming_neardup"] = section
    with open(out_json, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(f"wrote {out_json} (x100_streaming_neardup); flags: {flags or 'none'}")
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
