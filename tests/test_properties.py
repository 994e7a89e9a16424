"""Property-based tests (hypothesis) for the pure-expression
operators: the SQL expression must agree with an independent Python
reference on arbitrary inputs, not just fixture values.

Each example runs as ONE Spark job over a generated batch (not a job
per value), so the suite stays fast; ``max_examples`` is kept small
because every example already covers dozens of generated rows.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from sfs3_kinesis_spark.operators.scale import zorder_key_sql

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _morton_ref(a: int, b: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i + 1)
        out |= ((b >> i) & 1) << (2 * i)
    return out


@_slow
@given(
    st.lists(
        st.tuples(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1)),
        min_size=1,
        max_size=64,
    )
)
def test_zorder_key_matches_python_reference(spark, pairs):
    df = spark.createDataFrame(pairs, "a BIGINT, b BIGINT")
    got = df.select("a", "b", F.expr(zorder_key_sql("a", "b")).alias("z")).collect()
    for r in got:
        assert r.z == _morton_ref(r.a, r.b), (r.a, r.b)


@_slow
@given(
    st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=200),
        min_size=1,
        max_size=16,
    )
)
def test_chunking_reconstructs_documents(spark, texts):
    """Chunking is lossless: re-joining a doc's chunks in chunk_idx
    order yields the original token sequence, and every chunk except
    the last is exactly max_tokens long."""
    from sfs3_kinesis_spark.operators import sampling

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    chunks = sampling.chunk_text(df, "doc_id", "text", 8).collect()
    by_doc: dict[int, list] = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
    for doc_id, text in rows:
        cs = sorted(by_doc[doc_id], key=lambda c: c.chunk_idx)
        toks = text.split(" ")
        rebuilt = [tok for c in cs for tok in (c.chunk_text.split(" ") if c.chunk_text else [""])]
        # a doc with no tokens still yields one (empty) chunk row
        assert rebuilt == toks or (toks == [""] and rebuilt == [""])
        for c in cs[:-1]:
            assert c.n_chunk_tokens == 8
        assert cs[-1].n_chunk_tokens <= 8


@_slow
@given(
    st.lists(  # left events: (key, ts_seconds)
        st.tuples(st.integers(0, 3), st.integers(0, 1000)),
        min_size=1,
        max_size=40,
    ),
    st.lists(  # right events: (key, ts_seconds, payload)
        st.tuples(st.integers(0, 3), st.integers(0, 1000), st.integers(-100, 100)),
        min_size=0,
        max_size=40,
    ),
    st.sampled_from([None, 0, 60, 500]),  # tolerance_s
)
def test_asof_join_matches_pandas_merge_asof(spark, left_rows, right_rows, tol):
    """asof_join must agree with pandas.merge_asof — an independent,
    widely-trusted as-of implementation — on arbitrary keyed event
    sets, including the tolerance variant.  Right side is deduped per
    (key, ts) keeping max payload so ties are deterministic in both
    implementations."""
    import pandas as pd

    base = pd.Timestamp("2024-01-01")
    lp = pd.DataFrame(
        {
            "k": [k for k, _ in left_rows],
            "ts": [base + pd.Timedelta(seconds=s) for _, s in left_rows],
        }
    )
    rp = (
        pd.DataFrame(
            {
                "k": pd.array([k for k, _, _ in right_rows], dtype="int64"),
                "ts": pd.to_datetime(
                    [base + pd.Timedelta(seconds=s) for _, s, _ in right_rows]
                ),
                "payload": pd.array([p for _, _, p in right_rows], dtype="int64"),
            }
        )
        .groupby(["k", "ts"], as_index=False)["payload"]
        .max()
        .astype({"k": "int64", "payload": "int64"})
    )

    expected = pd.merge_asof(
        lp.sort_values(["ts", "k"], kind="stable").reset_index(drop=True),
        rp.sort_values("ts", kind="stable").reset_index(drop=True),
        on="ts",
        by="k",
        direction="backward",
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
    )
    exp = sorted(
        (r.k, r.ts, None if pd.isna(r.payload) else int(r.payload))
        for r in expected.itertuples(index=False)
    )

    from sfs3_kinesis_spark.operators.temporal import asof_join

    left = spark.createDataFrame(lp, "k bigint, ts timestamp")
    right = spark.createDataFrame(rp, "k bigint, ts timestamp, payload bigint")
    got_rows = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts",
        payload_cols=["payload"], tolerance_s=tol,
    ).collect()
    got = sorted(
        (r["k"], pd.Timestamp(r["ts"]), None if r["payload"] is None else int(r["payload"]))
        for r in got_rows
    )
    assert got == exp


@_slow
@given(
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 60)),
        min_size=1,
        max_size=80,
    )
)
def test_connected_components_matches_union_find(spark, raw_edges):
    """connected_components must agree with a driver-side union-find
    on ARBITRARY graphs — including high-diameter paths, which plain
    min-label propagation (no pointer jump) silently got wrong under
    any finite round cap."""
    edges = [(a, b) for a, b in raw_edges if a != b]
    if not edges:
        return
    from sfs3_kinesis_spark.operators.dedup import connected_components

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    oracle = {v: find(v) for v in parent}

    df = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    got = {r["vertex"]: r["component"] for r in connected_components(df).collect()}
    assert got == oracle


@_slow
@given(
    st.lists(  # points: seconds offsets
        st.integers(0, 30000),
        min_size=1,
        max_size=30,
    ),
    st.lists(  # intervals: (start_s, duration_s)
        st.tuples(st.integers(0, 30000), st.integers(0, 14000)),
        min_size=1,
        max_size=15,
    ),
)
def test_interval_join_matches_bruteforce(spark, point_secs, ivals):
    """interval_join_bucketed (hour-bucket equi-join) must produce
    exactly the brute-force start <= p < end pairs — including
    points/intervals that straddle or land exactly on bucket
    boundaries."""
    import pandas as pd

    base = pd.Timestamp("2024-01-01")
    pts = [(i, base + pd.Timedelta(seconds=s)) for i, s in enumerate(point_secs)]
    ivs = [
        (j, base + pd.Timedelta(seconds=s), base + pd.Timedelta(seconds=s + d))
        for j, (s, d) in enumerate(ivals)
    ]
    expected = sorted(
        (pid, iid)
        for pid, pts_ts in pts
        for iid, s, e in ivs
        if s <= pts_ts < e
    )

    from sfs3_kinesis_spark.operators.temporal import interval_join_bucketed

    points = spark.createDataFrame(
        [(i, t.to_pydatetime()) for i, t in pts], "pid bigint, pts timestamp"
    )
    intervals = spark.createDataFrame(
        [(j, s_.to_pydatetime(), e.to_pydatetime()) for j, s_, e in ivs],
        "iid bigint, ps timestamp, pe timestamp",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join_bucketed(
            points, intervals, point_ts="pts", start_ts="ps", end_ts="pe"
        )
        .select("pid", "iid")
        .collect()
    )
    assert got == expected


@_slow
@given(
    st.lists(  # big side: (key, value) — keys drawn narrow to force skew
        st.tuples(st.integers(0, 4), st.integers(-50, 50)),
        min_size=1,
        max_size=60,
    ),
    st.lists(  # small side: (key, payload)
        st.tuples(st.integers(0, 6), st.integers(0, 9)),
        min_size=0,
        max_size=10,
    ),
    st.sampled_from(["inner", "left"]),
)
def test_salted_join_equals_plain_join(spark, big_rows, small_rows, how):
    """salted_join must be row-for-row identical (as a multiset) to
    the plain equi-join for inner/left, on arbitrary skewed inputs —
    including duplicate keys on BOTH sides (the replicate factor must
    not multiply matches)."""
    from collections import Counter

    from sfs3_kinesis_spark.operators.scale import salted_join

    big = spark.createDataFrame(big_rows, "k bigint, v bigint")
    # dedup small per key (the skew-join contract: small is a dim table)
    small_dedup = {}
    for k, p in small_rows:
        small_dedup.setdefault(k, p)
    small = spark.createDataFrame(
        list(small_dedup.items()) or [(None, None)], "k bigint, p bigint"
    ).filter(F.col("k").isNotNull())

    plain = Counter(
        (r["k"], r["v"], r["p"]) for r in big.join(small, "k", how).collect()
    )
    salted = Counter(
        (r["k"], r["v"], r["p"]) for r in salted_join(big, small, "k", how=how).collect()
    )
    assert salted == plain


@_slow
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)),
        min_size=1,
        max_size=40,
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000), st.integers(-100, 100)),
        min_size=0,
        max_size=40,
    ),
    st.sampled_from([None, 0, 60, 500]),
)
def test_asof_forward_matches_pandas(spark, left_rows, right_rows, tol):
    """asof_join_forward must agree with pandas.merge_asof
    (direction='forward'), including the tolerance variant."""
    import pandas as pd

    base = pd.Timestamp("2024-01-01")
    lp = pd.DataFrame(
        {
            "k": [k for k, _ in left_rows],
            "ts": [base + pd.Timedelta(seconds=s) for _, s in left_rows],
        }
    )
    rp = (
        pd.DataFrame(
            {
                "k": pd.array([k for k, _, _ in right_rows], dtype="int64"),
                "ts": pd.to_datetime(
                    [base + pd.Timedelta(seconds=s) for _, s, _ in right_rows]
                ),
                "payload": pd.array([p for _, _, p in right_rows], dtype="int64"),
            }
        )
        .groupby(["k", "ts"], as_index=False)["payload"]
        .max()
        .astype({"k": "int64", "payload": "int64"})
    )
    expected = pd.merge_asof(
        lp.sort_values(["ts", "k"], kind="stable").reset_index(drop=True),
        rp.sort_values("ts", kind="stable").reset_index(drop=True),
        on="ts",
        by="k",
        direction="forward",
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
    )
    exp = sorted(
        (r.k, r.ts, None if pd.isna(r.payload) else int(r.payload))
        for r in expected.itertuples(index=False)
    )

    from sfs3_kinesis_spark.operators.temporal import asof_join_forward

    left = spark.createDataFrame(lp, "k bigint, ts timestamp")
    right = spark.createDataFrame(rp, "k bigint, ts timestamp, payload bigint")
    got = sorted(
        (r["k"], pd.Timestamp(r["ts"]), None if r["payload"] is None else int(r["payload"]))
        for r in asof_join_forward(
            left, right, key="k", left_ts="ts", right_ts="ts",
            payload_cols=["payload"], tolerance_s=tol,
        ).collect()
    )
    assert got == exp


@_slow
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)),
        min_size=1,
        max_size=40,
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000), st.integers(-100, 100)),
        min_size=0,
        max_size=40,
    ),
    st.sampled_from([None, 0, 60, 500]),
)
def test_asof_nearest_matches_pandas(spark, left_rows, right_rows, tol):
    """asof_join_nearest must agree with pandas.merge_asof
    (direction='nearest'), including tolerance and the tie-to-earlier
    behavior."""
    import pandas as pd

    base = pd.Timestamp("2024-01-01")
    lp = pd.DataFrame(
        {
            "k": [k for k, _ in left_rows],
            "ts": [base + pd.Timedelta(seconds=s) for _, s in left_rows],
        }
    )
    rp = (
        pd.DataFrame(
            {
                "k": pd.array([k for k, _, _ in right_rows], dtype="int64"),
                "ts": pd.to_datetime(
                    [base + pd.Timedelta(seconds=s) for _, s, _ in right_rows]
                ),
                "payload": pd.array([p for _, _, p in right_rows], dtype="int64"),
            }
        )
        .groupby(["k", "ts"], as_index=False)["payload"]
        .max()
        .astype({"k": "int64", "payload": "int64"})
    )
    expected = pd.merge_asof(
        lp.sort_values(["ts", "k"], kind="stable").reset_index(drop=True),
        rp.sort_values("ts", kind="stable").reset_index(drop=True),
        on="ts",
        by="k",
        direction="nearest",
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
    )
    exp = sorted(
        (r.k, r.ts, None if pd.isna(r.payload) else int(r.payload))
        for r in expected.itertuples(index=False)
    )

    from sfs3_kinesis_spark.operators.temporal import asof_join_nearest

    left = spark.createDataFrame(lp, "k bigint, ts timestamp")
    right = spark.createDataFrame(rp, "k bigint, ts timestamp, payload bigint")
    got = sorted(
        (r["k"], pd.Timestamp(r["ts"]), None if r["payload"] is None else int(r["payload"]))
        for r in asof_join_nearest(
            left, right, key="k", left_ts="ts", right_ts="ts",
            payload_cols=["payload"], tolerance_s=tol,
        ).collect()
    )
    assert got == exp


@_slow
@given(
    st.lists(
        # straddle the origin: truncating (toward-zero) cell
        # division would double-width cell 0 here (r02 ADVICE)
        st.tuples(st.integers(-200, 200), st.integers(-200, 200)),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    st.integers(1, 40),
    st.integers(0, 30),  # cell slack above radius
)
def test_grid_radius_pairs_matches_bruteforce(spark, pts, radius, slack):
    """grid_radius_pairs must find exactly the brute-force Chebyshev
    pairs for ANY radius and any cell size >= radius (the coverage
    proof must not depend on cell == radius)."""
    from sfs3_kinesis_spark.operators.spatial import grid_radius_pairs

    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    expected = sorted(
        (a, b, max(abs(xa - xb), abs(ya - yb)))
        for a, xa, ya in rows
        for b, xb, yb in rows
        if a < b and max(abs(xa - xb), abs(ya - yb)) <= radius
    )
    df = spark.createDataFrame(rows, "id bigint, x bigint, y bigint")
    got = sorted(
        (r["a_id"], r["b_id"], r["d"])
        for r in grid_radius_pairs(
            df, id_col="id", x="x", y="y", radius=radius, cell=radius + slack
        ).collect()
    )
    assert got == expected


@_slow
@given(
    st.lists(  # rows: (key, order_value, payload) with heavy key ties
        st.tuples(st.integers(0, 2), st.integers(0, 5), st.integers(0, 10**6)),
        min_size=1,
        max_size=60,
    ),
    st.integers(1, 4),  # k
)
def test_salted_window_topk_equals_plain_window(spark, rows, k):
    """salted_window_topk must return exactly the single-window
    row_number()<=k rows for any data — provided the order is total
    (payload makes it total here), including heavy duplicate keys."""
    from pyspark.sql import Window

    from sfs3_kinesis_spark.operators.scale import salted_window_topk

    df = spark.createDataFrame(rows, "key bigint, v bigint, p bigint").dropDuplicates(
        ["key", "v", "p"]
    )
    order = [F.desc("v"), F.asc("p")]
    w = Window.partitionBy("key").orderBy(*order)
    plain = {
        (r["key"], r["v"], r["p"], r["rnk"])
        for r in df.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .collect()
    }
    salted = {
        (r["key"], r["v"], r["p"], r["rnk"])
        for r in salted_window_topk(df, "key", order, k=k, salt=4).collect()
    }
    assert salted == plain


@_slow
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(-100, 100)),
        min_size=1,
        max_size=80,
    )
)
def test_salted_groupby_count_equals_plain(spark, rows):
    """Two-phase salted counting must equal the plain groupBy count
    on arbitrary skewed keys."""
    from sfs3_kinesis_spark.operators.scale import salted_groupby_count

    df = spark.createDataFrame(rows, "key bigint, v bigint")
    plain = {(r["key"], r["count"]) for r in df.groupBy("key").count().collect()}
    salted = {(r["key"], r["n"]) for r in salted_groupby_count(df, "key").collect()}
    assert salted == plain


@_slow
@given(
    st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(1, 500)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 4),     # n_buckets
    st.integers(64, 1024),  # capacity
)
def test_pack_shards_invariants(spark, rows, n_buckets, capacity):
    """pack_shards on arbitrary (id, n_tokens): every doc lands in
    exactly one (bucket, shard); within a bucket the tokens BEFORE a
    shard's first doc are a multiple-free fill (shard_id == floor of
    cumulative-before / capacity, so shard boundaries are exactly the
    capacity grid in the deterministic hash order)."""
    from sfs3_kinesis_spark.operators.sampling import HASH_MOD, HASH_MULT, HASH_OFFSET, pack_shards

    df = spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")
    out = pack_shards(df, F.col("doc_id"), "n_tokens", n_buckets=n_buckets, capacity=capacity).collect()
    assert len(out) == len(rows)  # totality: no row lost or duplicated
    assert {r["doc_id"] for r in out} == {i for i, _ in rows}
    # recompute the reference packing driver-side in the same order
    by_bucket: dict[int, list] = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for bucket, members in by_bucket.items():
        members.sort(
            key=lambda r: ((r["doc_id"] * HASH_MULT + HASH_OFFSET) % HASH_MOD, r["doc_id"])
        )
        cum = 0
        for r in members:
            assert (r["doc_id"] * HASH_MULT + HASH_OFFSET) % HASH_MOD % n_buckets == bucket
            assert r["shard_id"] == cum // capacity, (bucket, r)
            cum += r["n_tokens"]


@_slow
@given(
    st.lists(  # (doc_id, stratum 0..3)
        st.tuples(st.integers(0, 10**6), st.integers(0, 3)),
        min_size=2,
        max_size=80,
        unique_by=lambda t: t[0],
    )
)
def test_temperature_resample_invariants(spark, rows):
    """temperature_resample on arbitrary strata: output is a subset
    of the input with the input schema, EVERY row of the smallest
    stratum survives (keep probability 1), membership is
    deterministic (two runs agree), and no stratum over-retains
    (observed keep count <= ceil expectation bound is NOT asserted —
    hash noise — but the minority-keeps-all and subset properties
    are exact)."""
    from sfs3_kinesis_spark.operators.sampling import temperature_resample

    df = spark.createDataFrame(rows, "doc_id bigint, lang bigint")
    out1 = temperature_resample(df, F.col("doc_id"), "lang")
    assert out1.columns == df.columns
    got1 = {(r["doc_id"], r["lang"]) for r in out1.collect()}
    got2 = {
        (r["doc_id"], r["lang"])
        for r in temperature_resample(df, F.col("doc_id"), "lang").collect()
    }
    assert got1 == got2  # deterministic under re-execution
    allrows = set(rows)
    assert got1 <= allrows  # pure subset, no fabricated rows
    from collections import Counter

    sizes = Counter(l for _, l in rows)
    min_size = min(sizes.values())
    minority = {l for l, n in sizes.items() if n == min_size}
    for d, l in rows:
        if l in minority:
            assert (d, l) in got1, ("minority row dropped", d, l)


@_slow
@given(
    st.lists(
        st.tuples(st.integers(-120, 120), st.integers(-120, 120)),
        min_size=2,
        max_size=30,
        unique=True,
    ),
    st.integers(1, 30),
    st.integers(1, 4),
)
def test_grid_knn_matches_bruteforce(spark, pts, radius, k):
    """grid_knn must return exactly the brute-force bounded kNN:
    per point the k nearest within the radius, ranked by
    (Chebyshev distance, id)."""
    from sfs3_kinesis_spark.operators.spatial import grid_knn

    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    expected = set()
    for a, xa, ya in rows:
        cands = sorted(
            (max(abs(xa - xb), abs(ya - yb)), b)
            for b, xb, yb in rows
            if b != a and max(abs(xa - xb), abs(ya - yb)) <= radius
        )
        for rk, (d, b) in enumerate(cands[:k], start=1):
            expected.add((a, rk, b, d))
    df = spark.createDataFrame(rows, "id bigint, x bigint, y bigint")
    got = {
        (r["a_id"], r["rk"], r["b_id"], r["d"])
        for r in grid_knn(df, id_col="id", x="x", y="y", radius=radius, k=k).collect()
    }
    assert got == expected


@_slow
@given(
    st.lists(  # (value with heavy ties, unique-ish tiebreak payload)
        st.tuples(st.integers(0, 4), st.integers(0, 10**6)),
        min_size=1,
        max_size=64,
    ),
    st.integers(2, 9),
)
def test_global_rank_property_matches_window(spark, rows, n_buckets):
    """Two-phase global_rank == single-window ROW_NUMBER for ANY
    value distribution (including all-ties) and ANY bucket count —
    the equivalence the r02-verdict rewiring rests on."""
    from pyspark.sql import Window as W

    from sfs3_kinesis_spark.operators.scale import global_rank

    data = [(i, v, p) for i, (v, p) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, v long, p long")
    order = [F.desc("v"), F.asc("id")]
    got = {r.id: r.rnk for r in global_rank(df, ["-v", "id"], n_buckets=n_buckets).collect()}
    exp = {
        r.id: r.rnk
        for r in df.withColumn(
            "rnk", F.row_number().over(W.orderBy(*order)).cast("long")
        ).collect()
    }
    assert got == exp


@_slow
@given(
    st.lists(
        st.tuples(st.integers(-5, 5), st.integers(-100, 100)),
        min_size=1,
        max_size=64,
    ),
    st.integers(2, 9),
)
def test_global_cumsum_property_matches_window(spark, rows, n_buckets):
    """Two-phase global_cumsum == single-window running SUM for ANY
    (possibly negative) values and ANY bucket count."""
    from pyspark.sql import Window as W

    from sfs3_kinesis_spark.operators.scale import global_cumsum

    data = [(i, v, w) for i, (v, w) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, v long, w long")
    order = [F.asc("v"), F.asc("id")]
    out = global_cumsum(df, ["v", "id"], {"w": "cw"}, n_buckets=n_buckets)
    got = {r.id: r.cw for r in out.collect()}
    win = W.orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    exp = {r.id: r.cw for r in df.withColumn("cw", F.sum("w").over(win)).collect()}
    assert got == exp
