"""Error-bound tests for the sketch-based (rows-only) corpus queries.

These operators cannot be value-matched against DuckDB (sketch
internals are engine-specific), so the correctness gate only checks
that they run.  These tests pin the actual guarantee instead: each
estimate must land within the sketch's documented error envelope of
the EXACT answer computed in the same pass — a regression here means
a sketch is being fed wrong inputs, not that the sketch got unlucky
(bounds chosen ~5x the published standard error, deterministic
fixtures).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sfs3_kinesis_spark.plans import REGISTRY
from sfs3_kinesis_spark.plans.core import t

SF = "/root/testdata/sf0.01"


def test_hll_estimates_match_exact_within_bounds(spark):
    # approx_count_distinct default rsd = 5%; assert within 15%
    li = t(spark, SF, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx_parts"] - r["exact_parts"]) <= 0.15 * r["exact_parts"], (
            r["l_returnflag"],
            r["approx_parts"],
            r["exact_parts"],
        )


def test_approx_percentile_within_rank_error(spark):
    # approx_percentile default accuracy=10000 → rank error ~1e-4;
    # assert each reported pXX sits between the exact p(XX-2) and
    # p(XX+2) values (a 2-percentile-point envelope)
    o = t(spark, SF, "orders")
    got = {
        r["o_orderpriority"]: r
        for r in REGISTRY["agg_approx_quantiles"].spark(spark, SF).collect()
    }
    exact = {
        r["o_orderpriority"]: r
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, array(0.48, 0.52))").alias("p50b"),
            F.expr("percentile(o_totalprice, array(0.88, 0.92))").alias("p90b"),
            F.expr("percentile(o_totalprice, array(0.97, 1.0))").alias("p99b"),
        )
        .collect()
    }
    assert set(got) == set(exact) and got
    for k in got:
        for col, (lo, hi) in (
            ("p50", exact[k]["p50b"]),
            ("p90", exact[k]["p90b"]),
            ("p99", exact[k]["p99b"]),
        ):
            assert lo <= got[k][col] <= hi, (k, col, got[k][col], lo, hi)


def test_hll_merge_consistent_with_global_exact(spark):
    # the merged-month sketch row (day IS NULL) must estimate the
    # global distinct within 15%
    e = t(spark, SF, "events")
    exact = e.agg(F.countDistinct("user_id").alias("d")).collect()[0]["d"]
    out = REGISTRY["agg_hll_partition_merge"].spark(spark, SF)
    merged = [r for r in out.collect() if r["day"] is None]
    assert len(merged) == 1
    est = merged[0]["estimate"]
    assert abs(est - exact) <= 0.15 * exact, (est, exact)


def test_kmv_distinct_error_within_envelope(spark):
    # KMV with k=256: published std error ~ 1/sqrt(k-2) ~ 6.3%;
    # assert within ~5x (3150 bp) and exactness below the k floor
    rows = REGISTRY["agg_kmv_distinct_audit"].spark(spark, SF).collect()
    assert rows
    for r in rows:
        if r["exact_distinct"] < 256:
            assert r["kmv_estimate"] == r["exact_distinct"], r
        else:
            assert r["err_bp"] <= 3150, r


def test_kmv_intersection_error_within_envelope(spark):
    # intersection error compounds union + k_cap binomial noise; the
    # event-type audiences here overlap heavily (dense user overlap),
    # so 5x the ~6.3% std error still holds with margin
    rows = REGISTRY["agg_kmv_intersection_audit"].spark(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["exact_intersection"] > 0
        assert r["err_bp"] <= 4000, r
