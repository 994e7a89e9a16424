"""Second-decade (x10 -> x100) scale stress for the iterative heavies
that interact with the pin_shared size guard (r08 verdict next-round
#3): ``spatial_dbscan_core``, ``graph_pagerank_parts``,
``cluster_kmeans_lloyd``, ``dedup_semantic_cells``.

The guard's leaf-sum form was validated on DBSCAN at sf0.1 only; this
script observes the sf1/sf10 behavior the verdict called for —
which tables the guard pins vs guards out at each scale (the
PIN_DECISIONS log), whether the queries hold a sane exponent, and
that nothing leaks persistent RDDs.

Corpus construction (organic growth, never verbatim duplication):

* ``lineitem`` x10/x100 — key offsets per copy (disjoint orderkey
  domains, so the pagerank edge self-join stays copy-local);
* ``events``  x10/x100 — key offsets, plus a per-copy TORUS
  TRANSLATION of the DBSCAN coordinates (value re-encoded so the
  derived x shifts by EXACTLY 777*copy mod 1000 — integer-space
  shift after quantization, r09 ADVICE; user_id += 389*copy shifts
  y): within a
  copy the point geometry is preserved exactly (translation is an
  isometry on the grid torus), across copies the clouds overlap like
  independent data.  NOTE the fixed 1000x1000 torus means per-cell
  density necessarily grows with corpus size, so eps-neighbor PAIRS
  grow ~quadratically — a semantic property of radius joins on a
  fixed domain (organic spatial growth adds area; the oracle's
  determinism pins the domain).  DBSCAN is therefore flagged on
  wall-vs-PAIR-exponent, not wall-vs-1.0;
* ``embeddings`` x10/x100 — vec_id offsets, plus a per-copy
  REFLECTION (deterministic sign-flip vector from hash(copy, i)):
  an isometry, so each copy's similarity structure is an exact clone
  (true pairs scale linearly) while cross-copy cosines decorrelate —
  the embedding analog of the per-copy token suffixes.

Results merge into SF1_STRESS.json under ``"x100_heavies"``.

Round 10 adds the ``adaptive_scale_paths`` sub-section: the SAME
decade corpora driven through the operators' scale-adaptive defaults
(SemDeDup with corpus-derived k; the grid-contraction DBSCAN
``spatial_dbscan_clusters``), recording pair/examined-pair exponents
~<=1.0 where the fixture-pinned forms measure ~2.0 — the r09 verdict
next-round #1 closure.

Usage: python scripts/sf10_stress_heavies.py [out_json] [base_dir]
(corpora are built once under base_dir/{x10,x100} and reused)
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from sfs3_kinesis_spark.plans import REGISTRY  # noqa: E402
from sfs3_kinesis_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
OFF = 1_000_000_000

QUERIES = [
    "spatial_dbscan_core",
    "graph_pagerank_parts",
    "cluster_kmeans_lloyd",
    "dedup_semantic_cells",
]

#: wall-exponent threshold is pair-relative for the two semantically
#: quadratic queries (fixed torus / fixed cell count, see module
#: docstring); plain 1.3 for the rest
EXPECTED_SUPERLINEAR = {"spatial_dbscan_core", "dedup_semantic_cells"}


def build_scale(spark, out: str, copies: int) -> None:
    os.makedirs(out, exist_ok=True)
    cdf = spark.range(copies).select(F.col("id").cast("long").alias("_copy"))

    def done(t):
        return os.path.exists(os.path.join(out, f"_DONE_{t}"))

    def mark(t):
        open(os.path.join(out, f"_DONE_{t}"), "w").close()

    if not done("lineitem"):
        df = spark.read.parquet(f"{SRC}/lineitem.parquet").crossJoin(cdf)
        for c in ("l_orderkey", "l_partkey", "l_suppkey"):
            df = df.withColumn(c, F.col(c) + F.lit(OFF) * F.col("_copy"))
        df.drop("_copy").repartition(64).write.mode("overwrite").parquet(
            f"{out}/lineitem.parquet"
        )
        mark("lineitem")
        print(f"built lineitem x{copies} -> {out}")
    if not done("events"):
        df = spark.read.parquet(f"{SRC}/events.parquet").crossJoin(cdf)
        df = (
            df.withColumn("event_id", F.col("event_id") + F.lit(OFF) * F.col("_copy"))
            # torus translation: y residue shifts by 389*copy mod 1000
            .withColumn(
                "user_id",
                F.col("user_id") + (F.lit(OFF) + F.lit(389)) * F.col("_copy"),
            )
            # x residue shifts by 777*copy mod 1000 — EXACTLY: shift in
            # integer space AFTER quantization (r09 ADVICE: the old
            # `value + 7.77*copy` form added a non-representable double,
            # off by one grid cell near rounding boundaries).  The
            # queries derive x = floor(value*100 + 0.5) % 1000, so
            # re-encode value = (x_orig + 777*copy) / 100.0; the /100
            # round-trip is exact for the derivation because the
            # re-derived k - eps + 0.5 always floors back to k.
            .withColumn(
                "value",
                (
                    F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)")
                    + F.lit(777) * F.col("_copy")
                ).cast("double")
                / 100.0,
            )
        )
        df.drop("_copy").repartition(64).write.mode("overwrite").parquet(
            f"{out}/events.parquet"
        )
        mark("events")
        print(f"built events x{copies} -> {out}")
    if not done("embeddings"):
        df = spark.read.parquet(f"{SRC}/embeddings.parquet").crossJoin(cdf)
        df = df.withColumn(
            "vec_id", F.col("vec_id") + F.lit(OFF) * F.col("_copy")
        ).withColumn(
            "embedding",
            F.expr(
                "transform(embedding, (x, i) -> CASE"
                " WHEN _copy = 0 THEN x"
                " WHEN pmod(hash(_copy, i), 2) = 0 THEN x"
                " ELSE -x END)"
            ),
        )
        df.drop("_copy").repartition(8).write.mode("overwrite").parquet(
            f"{out}/embeddings.parquet"
        )
        mark("embeddings")
        print(f"built embeddings x{copies} -> {out}")


def dbscan_pair_count(spark, sf_dir: str) -> int:
    """Row count of the dominant DBSCAN intermediate (the directed
    eps-neighbor pair table) — the denominator for the fixed-torus
    wall-exponent comparison.  Same builders as the production query
    (plans/retrieval_queries.py)."""
    from sfs3_kinesis_spark.operators.spatial import grid_radius_pairs
    from sfs3_kinesis_spark.plans.core import t_nonnull
    from sfs3_kinesis_spark.plans.retrieval_queries import DBSCAN_EPS

    p = (
        t_nonnull(spark, sf_dir, "events", "value")
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("id"),
            (F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)") % 1000).alias("x"),
            (F.col("user_id") % 1000).alias("y"),
        )
    )
    return grid_radius_pairs(
        p, id_col="id", x="x", y="y", radius=DBSCAN_EPS, directed=True
    ).count()


def semantic_candidate_count(spark, sf_dir: str, k: int | None = 32) -> int:
    """sum(|cell| choose 2) over the SemDeDup cell assignment — the
    candidate-pair volume of ``dedup_semantic_cells``, computed from
    cell SIZES only (a groupBy count, never the join itself — at x100
    the join is the thing that fills the disk).  Same assignment
    builders as the production operator.  ``k=None`` = the operator's
    ADAPTIVE default (k = max(floor, ceil(n/target)), r10): the
    counter proving pair volume stays linear when cells scale with
    the corpus, next to the fixed-k=32 registry pin that doesn't."""
    from sfs3_kinesis_spark.operators.similarity import (
        SEMANTIC_MIN_CELLS,
        SEMANTIC_TARGET_PER_CELL,
        _assign_cells,
        _quantized,
    )
    from sfs3_kinesis_spark.plans.core import t
    from sfs3_kinesis_spark.plans.llm_queries import KMEANS_SCALE

    dfv = _quantized(t(spark, sf_dir, "embeddings"), "embedding", "vec_id", KMEANS_SCALE)
    if k is None:
        n = dfv.count()
        k = max(SEMANTIC_MIN_CELLS, -(-n // SEMANTIC_TARGET_PER_CELL))
    seed = dfv.orderBy("id").limit(k).collect()
    cents = [(i, list(r["vi"])) for i, r in enumerate(seed)]
    sizes = _assign_cells(dfv, cents).groupBy("cell").count().collect()
    return sum(r["count"] * (r["count"] - 1) // 2 for r in sizes)


def dbscan_contraction_counters(spark, sf_dir: str) -> dict:
    """Examined-pair counters for the grid-contraction DBSCAN
    (operators/spatial.py dbscan_examined_pairs) on the same point
    derivation as the registry queries — the r10 evidence that the
    contraction's point-level comparison volume stays ~flat while the
    naive radius join's pair count grows quadratically on the fixed
    torus."""
    from sfs3_kinesis_spark.operators.spatial import dbscan_examined_pairs
    from sfs3_kinesis_spark.plans.core import t_nonnull
    from sfs3_kinesis_spark.plans.retrieval_queries import DBSCAN_EPS, DBSCAN_MINPTS

    p = (
        t_nonnull(spark, sf_dir, "events", "value")
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("id"),
            (F.expr("CAST(floor(value * 100 + 0.5D) AS BIGINT)") % 1000).alias("x"),
            (F.col("user_id") % 1000).alias("y"),
        )
    )
    return dbscan_examined_pairs(
        p, id_col="id", x="x", y="y", eps=DBSCAN_EPS, min_pts=DBSCAN_MINPTS
    )


def _exp(lo: int | float, hi: int | float):
    """Decade exponent log10(hi/lo); 0.0 when both sides are zero
    (flat), None when only the low side is zero (undefined)."""
    if lo == 0 and hi == 0:
        return 0.0
    if lo <= 0:
        return None
    return round(math.log10(max(hi, 1e-9) / lo), 2)


PAIR_COUNTERS = {
    "spatial_dbscan_core": dbscan_pair_count,
    "dedup_semantic_cells": semantic_candidate_count,
}


def main() -> int:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "SF1_STRESS.json"
    base = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10_heavies"
    d10, d100 = os.path.join(base, "x10"), os.path.join(base, "x100")
    spark = get_spark("sf10-heavies-stress")
    spark.sparkContext.setLogLevel("ERROR")
    build_scale(spark, d10, 10)
    build_scale(spark, d100, 100)

    from scripts.plan_audit import global_windows
    from scripts.sf1_stress import time_query
    from sfs3_kinesis_spark.operators import scale
    from sfs3_kinesis_spark.operators.scale import clear_keyed_cache

    clear_keyed_cache()
    spark.catalog.clearCache()
    persisted_before = spark.sparkContext._jsc.getPersistentRDDs().size()

    # Two queries get the x1 -> x10 decade because their x100
    # EXECUTION is quadratic BY SEMANTICS, not by plan shape:
    # * spatial_dbscan_core — fixed 1000x1000 torus, eps-neighbor
    #   pair volume ~10^4x the sf0.1 count at x100 (billions of
    #   narrow pair rows);
    # * dedup_semantic_cells — SemDeDup with FIXED k=32 cells: pair
    #   volume is sum(|cell|^2), so 200k vectors over 32 cells is
    #   ~620M pair rows EACH CARRYING TWO dim-length vectors
    #   (~hundreds of GB of shuffle — the first x100 attempt filled
    #   the box's disk exactly as that analysis predicts).  SemDeDup
    #   scales k WITH the corpus (Abbas et al. 2023 use k ~ n/5000);
    #   the registered query pins k=32 for oracle determinism.
    # Their x100 guard behavior is still observed via a
    # plan-build-only PIN_DECISIONS snapshot — the size guard acts at
    # plan build, not at execution.
    scale_pairs = {name: (("x10", d10), ("x100", d100)) for name in QUERIES}
    scale_pairs["spatial_dbscan_core"] = (("x1", SRC), ("x10", d10))
    scale_pairs["dedup_semantic_cells"] = (("x1", SRC), ("x10", d10))

    def merge_out(partial: dict) -> None:
        doc = {}
        if os.path.exists(out_json):
            doc = json.load(open(out_json))
        doc.setdefault("x100_heavies", {}).update(partial)
        with open(out_json, "w") as fh:
            json.dump(doc, fh, indent=1)

    results: dict[str, dict] = {}
    crash_flags: list[str] = []
    for name in QUERIES:
        per_scale = {}
        try:
            for label, d in scale_pairs[name]:
                scale.PIN_DECISIONS.clear()
                r = time_query(spark, name, d)
                r["pin_decisions"] = dict(scale.PIN_DECISIONS)
                clear_keyed_cache()
                r["rows"] = REGISTRY[name].spark(spark, d).count()
                clear_keyed_cache()
                if name in PAIR_COUNTERS:
                    r["pairs"] = PAIR_COUNTERS[name](spark, d)
                    clear_keyed_cache()
                gw = global_windows(
                    REGISTRY[name]
                    .spark(spark, d)
                    ._jdf.queryExecution()
                    .executedPlan()
                    .toString()
                )
                clear_keyed_cache()
                r["global_windows"] = gw
                per_scale[label] = r
        except Exception as exc:  # noqa: BLE001 — keep the other rows
            crash_flags.append(f"{name}: CRASHED: {str(exc)[:200]}")
            clear_keyed_cache()
            spark.catalog.clearCache()
            merge_out({"partial_results": results})
            print(f"  {name:26s} CRASHED: {str(exc)[:120]}")
            continue
        lo_label, hi_label = (p[0] for p in scale_pairs[name])
        r10, r100 = per_scale[lo_label], per_scale[hi_label]
        e_wall = (
            round(math.log10(max(r100["steady"], 1e-3) / max(r10["steady"], 1e-3)), 2)
            if r10["steady"] > 0
            else None
        )
        e_rows = (
            round(math.log10(max(r100["rows"], 1) / max(r10["rows"], 1)), 2)
            if r10["rows"] > 0
            else None
        )
        e_pairs = None
        if "pairs" in r10:
            e_pairs = (
                round(math.log10(max(r100["pairs"], 1) / max(r10["pairs"], 1)), 2)
                if r10["pairs"] > 0
                else None
            )
        results[name] = {
            "scales": {lo_label: r10, hi_label: r100},
            "decade": f"{lo_label}->{hi_label}",
            "exponent_steady": e_wall,
            "exponent_rows": e_rows,
            "exponent_pairs": e_pairs,
        }
        if hi_label != "x100":
            # execution capped below x100 (pair volume, see docstring):
            # still observe where the size guard acts — at PLAN BUILD —
            # with a snapshot against the x100 corpus.  DBSCAN's FULL
            # build is NOT lazy (connected_components checkpoints
            # eagerly — executing the quadratic pair pipeline; the
            # first x100 attempt died there on disk), so its probe is
            # the lazy front half, which contains both pin sites.
            scale.PIN_DECISIONS.clear()
            try:
                if name == "spatial_dbscan_core":
                    from sfs3_kinesis_spark.plans.retrieval_queries import (
                        _dbscan_front,
                    )

                    _dbscan_front(spark, d100)
                else:
                    REGISTRY[name].spark(spark, d100)
                results[name]["pin_decisions_x100_build_only"] = dict(
                    scale.PIN_DECISIONS
                )
            except Exception as exc:  # noqa: BLE001
                crash_flags.append(f"{name}: x100 probe CRASHED: {str(exc)[:160]}")
            clear_keyed_cache()
        print(
            f"  {name:26s} {lo_label} {r10['steady']:8.3f}s  "
            f"{hi_label} {r100['steady']:8.3f}s"
            f"  e={e_wall}  rows e={e_rows}"
            + (f"  pairs e={e_pairs}" if e_pairs is not None else "")
            + f"  pins {hi_label}: {r100['pin_decisions']}"
        )
        merge_out({"partial_results": results})

    # ---- r10: ADAPTIVE scale paths (r09 verdict next-round #1) ----
    # The registry queries above pin k=32 / enumerate eps-pairs for
    # oracle reproducibility; the operator DEFAULTS now scale.  These
    # rows are the evidence: pair exponents ~<=1.0 per decade.
    adaptive: dict = {}
    sem: dict = {"scales": {}}
    for label, d in (("x1", SRC), ("x10", d10), ("x100", d100)):
        try:
            sem["scales"][label] = {
                "pairs_adaptive_k": semantic_candidate_count(spark, d, k=None)
            }
        except Exception as exc:  # noqa: BLE001
            crash_flags.append(f"semantic adaptive {label}: {str(exc)[:160]}")
        clear_keyed_cache()
    s = sem["scales"]
    if "x1" in s and "x10" in s:
        sem["exponent_pairs_x1_x10"] = _exp(
            s["x1"]["pairs_adaptive_k"], s["x10"]["pairs_adaptive_k"]
        )
    if "x10" in s and "x100" in s:
        sem["exponent_pairs_x10_x100"] = _exp(
            s["x10"]["pairs_adaptive_k"], s["x100"]["pairs_adaptive_k"]
        )
    adaptive["dedup_semantic_cells_adaptive_k"] = sem
    print(f"  semantic adaptive-k pairs: {sem}")

    dbs: dict = {"scales": {}}
    for label, d in (("x1", SRC), ("x10", d10), ("x100", d100)):
        try:
            scale.PIN_DECISIONS.clear()
            r = time_query(spark, "spatial_dbscan_clusters", d)
            clear_keyed_cache()
            r.update(dbscan_contraction_counters(spark, d))
            dbs["scales"][label] = r
        except Exception as exc:  # noqa: BLE001
            crash_flags.append(f"dbscan contraction {label}: {str(exc)[:160]}")
        clear_keyed_cache()
        spark.catalog.clearCache()
    ds = dbs["scales"]
    for lo, hi, tag in (("x1", "x10", "x1_x10"), ("x10", "x100", "x10_x100")):
        if lo in ds and hi in ds:
            dbs[f"exponent_wall_{tag}"] = _exp(
                max(ds[lo]["steady"], 1e-3), max(ds[hi]["steady"], 1e-3)
            )
            dbs[f"exponent_examined_pairs_{tag}"] = _exp(
                ds[lo]["examined_pairs"], ds[hi]["examined_pairs"]
            )
            dbs[f"exponent_points_{tag}"] = _exp(
                ds[lo]["points"], ds[hi]["points"]
            )
    adaptive["spatial_dbscan_clusters_contraction"] = dbs
    print(f"  dbscan contraction: {dbs}")
    merge_out({"adaptive_scale_paths": adaptive})

    clear_keyed_cache()
    spark.catalog.clearCache()
    persisted_after = spark.sparkContext._jsc.getPersistentRDDs().size()

    flags = list(crash_flags)
    # adaptive-path gates: pair growth must track the corpus, not its
    # square, and the contraction walls must stay ~linear
    for tag, e in (
        ("semantic adaptive x1->x10", sem.get("exponent_pairs_x1_x10")),
        ("semantic adaptive x10->x100", sem.get("exponent_pairs_x10_x100")),
        ("dbscan contraction wall x1->x10", dbs.get("exponent_wall_x1_x10")),
        ("dbscan contraction wall x10->x100", dbs.get("exponent_wall_x10_x100")),
    ):
        if e is not None and e > 1.3:
            flags.append(f"adaptive path super-linear: {tag} e={e}")
    for name, r in results.items():
        e = r["exponent_steady"]
        if e is None:
            continue
        if name in EXPECTED_SUPERLINEAR:
            # fixed-domain radius join: wall may track PAIR growth
            # (semantic), but must not exceed it
            if r["exponent_pairs"] is not None and e > r["exponent_pairs"] + 0.3:
                flags.append(
                    f"{name}: wall e={e} exceeds pair growth "
                    f"e={r['exponent_pairs']} + 0.3"
                )
        elif e > 1.3:
            flags.append(f"{name}: super-linear x10->x100 scaling e={e}")
        lo, hi = list(r["scales"].values())
        if hi["global_windows"] > lo["global_windows"]:
            flags.append(f"{name}: global windows grew with scale")
    if persisted_after > persisted_before:
        flags.append(
            f"persist growth: {persisted_before} -> {persisted_after} cached RDDs"
        )

    try:
        load_1m = round(os.getloadavg()[0], 2)
    except OSError:
        load_1m = None
    section = {
        "base_dir": base,
        "load_1m": load_1m,
        "persisted_rdds_before": persisted_before,
        "persisted_rdds_after": persisted_after,
        "flags": flags,
        "results": results,
        "adaptive_scale_paths": adaptive,
    }
    doc = {}
    if os.path.exists(out_json):
        doc = json.load(open(out_json))
    doc["x100_heavies"] = section
    with open(out_json, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(f"wrote {out_json} (x100_heavies section); flags: {flags or 'none'}")
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
