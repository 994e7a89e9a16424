"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the correctness baseline; the LSH
(random-hyperplane) bucketed variant is the 100 TB scale path — it
turns the candidate set from |corpus| × |queries| into per-bucket
joins.  All linear algebra is built-in SQL expressions, JVM-side, no
Python in the scoring loop: when the embedding dimension is known
(one bounded probe) the dot product is an UNROLLED element_at sum
that participates in whole-stage codegen; the higher-order
``zip_with``/``aggregate`` fold — which Spark only interprets — is
kept as the bit-identical fallback for unknown or ragged dims (see
:func:`dot_sql`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
NORM = "sqrt(aggregate(transform({a}, x -> x * x), 0D, (acc, x) -> acc + x))"


def dot_sql(a: str, b: str, dim: int | None = None) -> str:
    """Dot-product SQL expression.

    Higher-order ``aggregate``/``zip_with`` lambdas are INTERPRETED —
    Spark never whole-stage-codegens them, so a pair join scoring
    n_pairs × dim lambda invocations dominates wall time (measured:
    the 2M-pair sf0.1 cosine join spends ~20 s in the fold).  With a
    known dimension the unrolled ``element_at`` sum compiles into the
    codegen'd projection and is BIT-IDENTICAL to the fold: both
    evaluate the left-associated IEEE sum 0 + p1 + p2 + ... + p_dim.
    The unrolled chain leads with the same ``0D +`` the fold's seed
    contributes — exact for every input INCLUDING the zero-sign edge
    (r07 ADVICE: without it, an all-negative-zero product chain
    yields -0.0 from the terms but +0.0 from the fold; harmless for
    threshold filters, visible through round()/display).  A size
    guard falls back to the fold for ragged rows, so unknown/mixed
    dims stay correct — and out-of-range ``element_at`` (an error
    under ANSI) is never evaluated.
    """
    fold = DOT.format(a=a, b=b)
    if dim is None:
        return fold
    terms = "0D + " + " + ".join(
        f"(element_at({a}, {i}) * element_at({b}, {i}))" for i in range(1, dim + 1)
    )
    return (
        f"CASE WHEN size({a}) = {dim} AND size({b}) = {dim} "
        f"THEN {terms} ELSE {fold} END"
    )


def sampled_dim(df: DataFrame, vec_col: str) -> int | None:
    """Peek the embedding dimension from one row (bounded driver-side
    probe, same budget class as guard_all_pairs' limit-count).  None
    on an empty input — callers then keep the interpreted fold."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    return int(row["d"]) if row is not None and row["d"] and row["d"] > 0 else None


def with_norm(df: DataFrame, vec_col: str = "v", out_col: str = "norm") -> DataFrame:
    return df.withColumn(out_col, F.expr(NORM.format(a=vec_col)))


def cosine(
    a: str, b: str, norm_a: str, norm_b: str, dim: int | None = None
) -> F.Column:
    return F.expr(dot_sql(a, b, dim)) / (F.col(norm_a) * F.col(norm_b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against
    the corpus, score with codegen'd expressions, then per-query
    row_number — Spark executes the ranking as a windowed top-k, and
    the corpus is scanned exactly once regardless of k.

    Returns (query_id, cand_id, rnk, cosine).
    """
    cand = with_norm(
        embeddings.select(F.col(id_col).alias("cand_id"), F.col(vec_col).cast("array<double>").alias("v")),
        "v",
        "nv",
    )
    q = with_norm(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")),
        "qv",
        "nq",
    )
    scored = cand.crossJoin(F.broadcast(q)).withColumn(
        "cos", cosine("v", "qv", "nv", "nq", sampled_dim(embeddings, vec_col))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "rnk", F.round("cos", 4).alias("cosine"))
    )


def cosine_pairs_above(
    embeddings: DataFrame,
    *,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_rows: int = 65_536,
) -> DataFrame:
    """All pairs (a < b) with cosine > threshold.  Exact O(n²)
    scoring — correct at fixture scale; at corpus scale use
    :func:`lsh_bucketed_pairs` to prune candidates first.  Guarded:
    refuses inputs above ``max_rows`` so the exact tier can't be
    pointed at a corpus by accident."""
    from sfs3_kinesis_spark.operators.scale import guard_all_pairs

    e = with_norm(
        guard_all_pairs(
            embeddings,
            op="cosine_pairs_above",
            scale_twin="operators.similarity.lsh_bucketed_pairs",
            max_rows=max_rows,
        ).select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")),
        "v",
        "n",
    )
    # The pair loop is a broadcast nested-loop join; its stream side
    # inherits the input's partitioning — a validation slice read from
    # one parquet file is ONE partition, so without this repartition a
    # single task evaluates every pair (measured: 13 s single-task vs
    # ~1 s across 32 at sf0.1).  One tiny shuffle of the slice buys
    # full-core scoring.
    shuffle_n = int(embeddings.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    a = e.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na")
    ).repartition(shuffle_n)
    b = e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb"))
    dim = sampled_dim(embeddings, vec_col)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine("va", "vb", "na", "nb", dim))
        .filter(F.col("cos") > threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cosine"))
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (pure-python LCG so
    results are reproducible without numpy state)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the second scale path
    next to :func:`lsh_bucketed_pairs`.

    1. a small centroid set is broadcast (default: deterministic
       corpus sample; pass ``centroids=train_ivf_centroids(...)`` for
       k-means-trained cells — the distributed shape is identical);
    2. every corpus vector is assigned to its nearest centroid cell
       (one codegen'd argmax projection — no shuffle);
    3. each query probes its ``n_probe`` nearest cells; candidates
       come from an EQUI-join on cell id, so the scan cost is
       |probed cells| not |corpus|;
    4. exact cosine re-scores the candidates; per-query top-k via
       window.

    ``n_probe == n_centroids`` degrades to exact brute force (used by
    the tests as the correctness oracle); recall rises with n_probe.
    """
    cand = with_norm(
        embeddings.select(
            F.col(id_col).alias("cand_id"), F.col(vec_col).cast("array<double>").alias("v")
        ),
        "v",
        "nv",
    )
    if centroids is not None:
        cents = [list(c) for c in centroids]
    else:
        # deterministic centroid sample: lowest ids (cheap default)
        cents = [
            r["v"]
            for r in cand.orderBy("cand_id").limit(n_centroids).select("v").collect()
        ]
    if not cents:
        # empty corpus: zero centroids would make the cell-assignment
        # lambda an untyped empty array (analysis error) — return the
        # stable empty schema instead
        return embeddings.sparkSession.createDataFrame(
            [], "query_id bigint, cand_id bigint, rnk bigint, cosine double"
        )
    cent_arr = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in cents])
    dim = len(cents[0]) if cents and cents[0] else None
    # Inside a transform() lambda the expression is interpreted no
    # matter what, and the unrolled element_at form is SLOWER there
    # (per-call bounds checks, no codegen to win) — measured 0.56 ->
    # 1.8 s on similarity_ivf_topk.  Keep the fold in lambda context;
    # the unrolled form pays off only in top-level row expressions
    # (the verify join below).
    dot_c = DOT.format(a="c", b="v")
    # cell = argmax over centroid dot products (normalized corpus side
    # is unnecessary for argmax per vector: norms cancel per-row)
    assign_expr = (
        "array_position(transform(cents, c -> " + dot_c + "), "
        "array_max(transform(cents, c -> " + dot_c + "))) - 1"
    )
    cells = cand.withColumn("cents", cent_arr).withColumn(
        "cell", F.expr(assign_expr).cast("int")
    ).drop("cents")

    q = with_norm(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
        ),
        "qv",
        "nq",
    )
    dot_q = DOT.format(a="c", b="qv")  # lambda context: fold (see dot_c)
    probe_expr = (
        f"slice(array_sort(transform(cents, (c, i) -> struct(-({dot_q}) AS negdot, i AS idx))), 1, {n_probe})"
    )
    probes = (
        q.withColumn("cents", cent_arr)
        .withColumn("probe", F.explode(F.expr(probe_expr + ".idx")))
        .drop("cents")
        .select("query_id", "qv", "nq", F.col("probe").cast("int").alias("cell"))
    )
    scored = cells.join(F.broadcast(probes), "cell").withColumn(
        "cos", cosine("v", "qv", "nv", "nq", dim)
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "rnk", F.round("cos", 4).alias("cosine"))
    )


SQDIST_INT = "aggregate(zip_with({c}, {v}, (x, y) -> (x - y) * (x - y)), 0L, (acc, x) -> acc + x)"


def _quantized(embeddings: DataFrame, vec_col: str, id_col: str, scale: int) -> DataFrame:
    """Vectors quantized to exact integer coordinates: float→double is
    an exact IEEE widening, `* scale` a correctly-rounded mult, and
    `floor(x+0.5)` exact — so every engine computes the identical
    bigint grid and all downstream k-means arithmetic is associative
    (order-independent) integer math, which is what makes a
    distributed iterative algorithm value-verifiable at all."""
    return embeddings.select(
        F.col(id_col).alias("id"),
        F.expr(
            f"transform(cast({vec_col} as array<double>), "
            f"x -> cast(floor(x * {scale}D + 0.5D) as bigint))"
        ).alias("vi"),
    )


def _assign_cells(dfv: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """Assign each vector to its nearest centroid: an Arrow-batched
    numpy argmin over the (tiny) centroid matrix — the dense
    linear-algebra hot loop where vectorized BLAS-style evaluation
    beats Catalyst's INTERPRETED higher-order lambdas ~2x (the
    transform/zip_with tree is not whole-stage-codegen'd; measured at
    sf0.1: 0.58 s vs 1.05 s per Lloyd pass).  All arithmetic stays
    int64 ((v-c)^2 <= 4e8 * dim fits easily), ties break to the
    lowest cell id (np.argmin returns the first minimum; centroids
    are ordered by cell) — outputs are BIT-IDENTICAL to the column-
    expression twin below, asserted in tests/test_similarity.py.

    No shuffle: the centroid matrix is a closure constant shipped to
    each Arrow worker; per 10k-row batch the work is one
    (n x k x dim) int64 broadcast subtract+square+sum.

    Dispatch (r02 ADVICE): pandas/numpy are probed at call time —
    an Arrow-less deployment falls back to the value-identical
    column-expression twin :func:`_assign_cells_expr` instead of
    hard-failing.  The id column's type is taken from the input
    schema, not hardcoded.
    """
    try:
        import numpy as np
        import pandas as pd
    except ImportError:  # pragma: no cover - both libs ship in tests
        return _assign_cells_expr(dfv, cents)

    C = np.array([v for _, v in cents], dtype=np.int64)
    cids = np.array([c for c, _ in cents], dtype=np.int64)
    c_sq = (C * C).sum(1)
    Cf_T = C.astype(np.float64).T

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["vi"].tolist(), dtype=np.int64)
            x_sq = (X * X).sum(1)
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 via matmul instead
            # of the broadcast (X[:,None,:] - C[None,:,:]) tensor: the
            # tensor is (batch x k x dim) int64 — 8 GB per 10k-row
            # batch at k=1563 (adaptive SemDeDup at x100), and 32
            # parallel Arrow workers OOM-killed the JVM (r10).  The
            # matmul form is (batch x k) — 125 MB — and EXACT in float64
            # whenever every term stays under 2^53: dot terms are
            # bounded by max|x| * max|c| * dim, and float64 represents
            # and adds integers exactly below 2^53.  Guarded: inputs
            # outside the bound take a centroid-chunked exact int64
            # path (strict-< running min keeps first-minimum/lowest-
            # cell tie-breaking identical to argmin).
            bound = (
                (np.abs(X).max(initial=0) + 1)
                * (np.abs(C).max(initial=0) + 1)
                * max(C.shape[1], 1)
            )
            if bound < 2 ** 53:
                d = (
                    x_sq[:, None].astype(np.float64)
                    + c_sq[None, :].astype(np.float64)
                    - 2.0 * (X.astype(np.float64) @ Cf_T)
                )
                k = d.argmin(1)
                dmin = d[np.arange(len(k)), k].astype(np.int64)
            else:  # pragma: no cover - needs |coords| ~2^23+ at dim 64
                nrows = max(len(X), 1)
                step = max(1, 10 ** 8 // (nrows * max(C.shape[1], 1)))
                dmin = np.full(len(X), np.iinfo(np.int64).max)
                k = np.zeros(len(X), dtype=np.int64)
                for lo in range(0, len(C), step):
                    blk = C[lo : lo + step]
                    db = ((X[:, None, :] - blk[None, :, :]) ** 2).sum(-1)
                    bk = db.argmin(1)
                    bmin = db[np.arange(len(bk)), bk]
                    upd = bmin < dmin
                    k[upd] = bk[upd] + lo
                    dmin[upd] = bmin[upd]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "vi": pdf["vi"],
                    "cell": cids[k],
                    "dist": dmin,
                }
            )

    id_type = dict(dfv.dtypes)["id"]
    return dfv.mapInPandas(
        fn, f"id {id_type}, vi array<bigint>, cell bigint, dist bigint"
    )


def _assign_cells_expr(dfv: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """Column-expression twin of :func:`_assign_cells` (argmin via
    higher-order lambdas, zero Python) — the verification twin AND
    the dispatched fallback when pandas/pyarrow are absent (see
    :func:`_assign_cells`).  Output schema matches the Arrow path
    exactly: (id, vi, cell bigint, dist bigint).  The centroid
    matrix rides in as a ONE-ROW broadcast DataFrame (a broadcast
    nested-loop join with a single row is just a projection), not as
    inline literals — a k x dim literal array inside a higher-order
    function made Catalyst compile time O(k*dim) per query, while
    the column form compiles in milliseconds."""
    spark = dfv.sparkSession
    cmat = spark.createDataFrame(
        [([list(map(int, vec)) for _, vec in cents], [int(c) for c, _ in cents])],
        "cvals array<array<bigint>>, cids array<int>",
    )
    d = SQDIST_INT.format(c="c", v="vi")
    return (
        dfv.join(F.broadcast(cmat))
        .withColumn("dists", F.expr(f"transform(cvals, c -> {d})"))
        .withColumn("dist", F.expr("array_min(dists)").cast("bigint"))
        .withColumn(
            "cell",
            F.expr(
                "element_at(cids, cast(array_position(dists, array_min(dists)) as int))"
            ).cast("bigint"),
        )
        .select("id", "vi", "cell", "dist")
    )


def _lloyd_centroids(
    dfv: DataFrame, k: int, iterations: int
) -> list[tuple[int, list[int]]]:
    """The Lloyd loop over quantized vectors: init from the k
    lowest-id vectors, then per iteration one broadcast-argmin
    projection + one map-side-combined groupBy whose shuffle payload
    is k×dim bigint partials per partition (not rows).  Centroids are
    driver-side ints (tiny); empty cells drop out."""
    init = dfv.orderBy("id").limit(k).collect()
    cents = [(i, list(r["vi"])) for i, r in enumerate(init)]
    if not cents:  # empty corpus: no centroids, downstream emits 0 rows
        return []
    dim = len(cents[0][1])
    sums = [F.sum(F.element_at("vi", i + 1)).alias(f"s{i}") for i in range(dim)]
    for _ in range(iterations):
        rows = _assign_cells(dfv, cents).groupBy("cell").agg(F.count("*").alias("n"), *sums).collect()
        cents = sorted(
            (int(r["cell"]), [int(r[f"s{i}"]) // int(r["n"]) for i in range(dim)]) for r in rows
        )
    return cents


def train_ivf_centroids(
    embeddings: DataFrame,
    *,
    k: int = 16,
    iterations: int = 2,
    scale: int = 10000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """k-means-trained centroids for :func:`ivf_topk`, de-quantized
    back to doubles.  Centroid quality only affects IVF recall, never
    correctness (candidates are exactly re-scored), so the quantized
    grid's rounding is irrelevant downstream."""
    dfv = _quantized(embeddings, vec_col, id_col, scale)
    return [[x / float(scale) for x in vec] for _, vec in _lloyd_centroids(dfv, k, iterations)]


def kmeans_lloyd(
    embeddings: DataFrame,
    *,
    k: int = 8,
    iterations: int = 2,
    scale: int = 10000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Distributed Lloyd's k-means over the embedding column — the
    iterative algorithm that trains the IVF centroids (:func:`ivf_topk`
    ships a placeholder sample; this is the swap-in).

    Spark-first shape (the same one MLlib uses): centroids live on the
    driver (k×dim ints — tiny), each iteration is one broadcast-argmin
    projection plus ONE shuffle (groupBy cell with per-coordinate
    sums); per-coordinate `sum` is a map-side-combined bigint
    aggregate, so the shuffle moves k×dim partials per partition, not
    rows.  At 100 TB the per-iteration cost is a single scan +
    k×dim×partitions bytes of shuffle — the canonical scalable k-means.

    Everything is exact integer arithmetic (quantized grid, bigint
    sums, floor-div centroid update), so the final assignment is
    bit-identical regardless of partitioning, engine, or summation
    order — verified value-exactly against a DuckDB oracle running the
    same unrolled iterations (empty clusters drop out on both sides).

    Returns (cell, n_members, inertia) ordered by cell, where inertia
    is the exact integer sum of squared distances to the final
    centroid set.
    """
    dfv = _quantized(embeddings, vec_col, id_col, scale).cache()
    cents = _lloyd_centroids(dfv, k, iterations)
    if not cents:  # empty corpus → empty result, stable schema
        return embeddings.sparkSession.createDataFrame(
            [], "cell INT, n_members BIGINT, inertia BIGINT"
        )
    out = (
        _assign_cells(dfv, cents)
        .groupBy("cell")
        .agg(F.count("*").cast("long").alias("n_members"), F.sum("dist").alias("inertia"))
        .orderBy("cell")
        .select(F.col("cell").cast("int").alias("cell"), "n_members", "inertia")
    )
    return out


def lsh_bucketed_pairs(
    embeddings: DataFrame,
    *,
    threshold: float,
    n_planes: int = 12,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Scale path: random-hyperplane LSH — sign-bit signature →
    bucket equi-join → exact cosine verify on candidates only.
    Recall < 1 by design; raise ``n_planes`` bands or OR-construct
    multiple tables for higher recall."""
    planes = random_hyperplanes(dim, n_planes)
    plane_arr = F.array(*[F.array(*[F.lit(x) for x in row]) for row in planes])
    e = (
        embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
        .withColumn("planes", plane_arr)
        .withColumn(
            "sig",
            F.expr(
                "aggregate(transform(planes, p -> CASE WHEN "
                + DOT.format(a="p", b="v")  # lambda context: fold
                + " > 0D THEN 1L ELSE 0L END), "
                "named_struct('acc', 0L, 'i', 0), "
                "(s, bit) -> named_struct('acc', s.acc * 2 + bit, 'i', s.i + 1), s -> s.acc)"
            ),
        )
        .drop("planes")
    )
    e = with_norm(e, "v", "n")
    a = e.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na"), F.col("sig").alias("sa"))
    b = e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb"), F.col("sig").alias("sb"))
    return (
        a.join(b, (F.col("sa") == F.col("sb")) & (F.col("id_a") < F.col("id_b")))
        .withColumn("cos", cosine("va", "vb", "na", "nb", dim))
        .filter(F.col("cos") > threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cosine"))
    )


#: adaptive-k default: target mean docs per SemDeDup cell.  Abbas et
#: al. 2023 size k proportionally (~n/5000 on LAION); 128 keeps the
#: per-cell pair work (|cell|²/2 ≈ 8k cosines) trivially small while
#: leaving enough cell mass for within-cell recall at fixture scales.
SEMANTIC_TARGET_PER_CELL = 128

#: adaptive-k floor — never fewer cells than the old fixed default,
#: so tiny corpora keep the recall behavior the oracle fixtures pin.
SEMANTIC_MIN_CELLS = 16


def semantic_dedup_pairs(
    embeddings: DataFrame,
    *,
    k: int | None = None,
    threshold: float = 0.35,
    scale: int = 10000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    target_per_cell: int = SEMANTIC_TARGET_PER_CELL,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    arXiv:2303.09540 — public): partition the corpus into ``k`` cells
    by nearest seed centroid, then score cosine pairs ONLY within a
    cell, so the all-pairs comparison shrinks from O(n²) to
    Σ|cell|² — the trick that makes embedding dedup feasible on a
    pretraining corpus.

    **Adaptive default (r09 verdict next-round #1):** ``k=None``
    derives the cell count from the corpus —
    ``k = max(SEMANTIC_MIN_CELLS, ceil(n / target_per_cell))`` — so
    mean cell size stays ~constant and the within-cell pair volume
    Σ|cell|² stays LINEAR in n.  A fixed k is quadratic by semantics:
    per-cell density grows with the corpus, so pair counts grow ~n²/k
    (measured e=1.94–2.00 per data decade in SF1_STRESS x100_heavies
    with k=32).  Pass an explicit ``k`` to pin the old behavior —
    the registry query does, for oracle reproducibility at fixture
    scale.  The extra cost of deriving k is one count() of the
    corpus, which any real pipeline already knows.

    Seeds are the ``k`` lowest-id vectors on the exact integer grid
    (zero Lloyd iterations), so the cell map is a pure function of
    the data (given k) — deterministic under retries AND reproducible
    by the SQL oracle.  Production swaps in
    :func:`train_ivf_centroids` output; cell quality only affects how
    many true pairs straddle a cell boundary (recall), never pair
    correctness.

    Scale shape: assignment is an Arrow-batched broadcast argmin (no
    shuffle; O(n·k·dim) — with adaptive k that is O(n²·dim/target),
    so production swaps in trained IVF centroids with a coarse-fine
    hierarchy once k reaches the tens of thousands); the pair join
    shuffles both sides once on ``cell``.  Returns
    (cell, id_a, id_b, cosine) with cosine rounded to 4dp.
    """
    dfv = _quantized(embeddings, vec_col, id_col, scale)
    if k is None:
        n_corpus = dfv.count()
        k = max(SEMANTIC_MIN_CELLS, -(-n_corpus // max(target_per_cell, 1)))
    seed = dfv.orderBy("id").limit(k).collect()
    cents = [(i, list(r["vi"])) for i, r in enumerate(seed)]
    dim = len(cents[0][1]) if cents and cents[0][1] else None
    spark = embeddings.sparkSession
    if not cents:
        return spark.createDataFrame(
            [], "cell int, id_a long, id_b long, cosine double"
        )
    assigned = _assign_cells(dfv, cents).select("id", "cell")
    ev = with_norm(
        embeddings.select(
            F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
        ),
        "v",
        "nrm",
    ).join(assigned, "id")
    a = ev.select(
        F.col("cell"), F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = ev.select(
        F.col("cell").alias("cell_b"), F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    return (
        a.join(b, (F.col("cell") == F.col("cell_b")) & (F.col("id_a") < F.col("id_b")))
        .withColumn("cos", cosine("va", "vb", "na", "nb", dim))
        .filter(F.col("cos") > threshold)
        .select(
            F.col("cell").cast("int").alias("cell"),
            "id_a",
            "id_b",
            F.round("cos", 4).alias("cosine"),
        )
    )


def matryoshka_recall_audit(
    embeddings: DataFrame,
    *,
    dims: int = 16,
    k: int = 10,
    n_queries: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Matryoshka-truncation recall audit (Kusupati et al. 2022,
    arXiv:2205.13147 — public): rank the corpus twice — full-dim
    cosine top-``k`` vs cosine over only the FIRST ``dims``
    coordinates (the MRL deployment trick: serve a prefix of the
    embedding to cut index memory/compute) — and report per query how
    many of the true top-``k`` the truncated index still finds.

    This is the measurement a pipeline runs before committing to a
    truncated serving dimension; the same audit-not-assume posture as
    ``similarity_ivf_recall_audit`` / ``dedup_lsh_recall_audit``.

    Scale shape: two broadcast-query brute-force scans (the query set
    is tiny; the corpus is scanned twice, each a single codegen
    projection + per-query windowed top-k) and a broadcast-size
    overlap join — output is ``n_queries`` rows: (query_id,
    n_overlap, recall_bp) with recall in integer basis points.
    """
    q = embeddings.filter(F.col(id_col) < n_queries)
    c = embeddings.filter(F.col(id_col) >= n_queries)
    full = brute_force_topk(c, q, k=k, vec_col=vec_col, id_col=id_col).select(
        "query_id", "cand_id"
    )
    trunc = F.slice(F.col(vec_col), 1, dims).alias(vec_col)
    tr = brute_force_topk(
        c.select(F.col(id_col), trunc),
        q.select(F.col(id_col), trunc),
        k=k,
        vec_col=vec_col,
        id_col=id_col,
    ).select("query_id", "cand_id")
    hits = full.join(tr, ["query_id", "cand_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("_n")
    )
    return (
        q.select(F.col(id_col).alias("query_id"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_overlap"),
            # integer div: bit-stable across engines (float / is not)
            F.expr(f"coalesce(_n, 0L) * 10000 div {int(k)}")
            .cast("long")
            .alias("recall_bp"),
        )
    )


def gram_moments(
    embeddings: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1000,
) -> DataFrame:
    """One-pass Gram/covariance moments over an embedding column:
    returns (i, j, s) rows where (i>=0, j>=i) carries the upper-
    triangle Gram sum Σ x_i·x_j on the exact integer grid, (i>=0,
    j=-1) the per-dimension sum Σ x_i, and (i=-1, j=-1) the row
    count — everything a covariance matrix, PCA pre-pass, or
    normal-equation OLS needs, in ONE scan of the corpus.

    Scale shape: the hot loop is an Arrow-batched numpy
    ``X.T @ X`` per ~10k-row batch (dense BLAS, int64 — per-batch
    partials stay far below 2^63 because the quantized grid bounds
    |x| and the batch bounds n), emitting d(d+1)/2 + d + 1 tiny
    partial rows per batch; the only shuffle is the (i, j)-keyed
    final sum, whose payload is O(d^2 · n_batches) scalars — never
    the corpus.  Final accumulation is DECIMAL(38,0), so corpus-scale
    totals cannot overflow.  The reference has no linear-algebra
    surface at all (SURVEY.md §2.12); this is the distributed moment
    kernel every featurizer needs.

    Falls back to a value-identical posexplode self-join twin when
    pandas/pyarrow are unavailable (same dispatch posture as
    :func:`_assign_cells`).
    """
    dfv = _quantized(embeddings, vec_col, id_col, scale)
    try:
        import numpy as np
        import pandas as pd
    except ImportError:  # pragma: no cover - both libs ship in tests
        parts = _gram_parts_expr(dfv)
    else:
        iu_cache: dict[int, tuple] = {}

        def fn(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.array(pdf["vi"].tolist(), dtype=np.int64)
                d = X.shape[1]
                if d not in iu_cache:
                    iu_cache[d] = np.triu_indices(d)
                iu_r, iu_c = iu_cache[d]
                G = X.T @ X
                yield pd.DataFrame(
                    {
                        "i": np.concatenate(
                            [iu_r, np.arange(d), [-1]]
                        ).astype(np.int32),
                        "j": np.concatenate(
                            [iu_c, np.full(d, -1), [-1]]
                        ).astype(np.int32),
                        "s": np.concatenate(
                            [G[iu_r, iu_c], X.sum(0), [len(X)]]
                        ).astype(np.int64),
                    }
                )

        parts = dfv.mapInPandas(fn, "i int, j int, s bigint")
    return parts.groupBy("i", "j").agg(
        F.sum(F.col("s").cast("decimal(38,0)")).alias("s")
    )


def _gram_parts_expr(dfv: DataFrame) -> DataFrame:
    """Expression twin of the Arrow Gram pass: posexplode + self-join
    on the row id (emits per-ROW partials rather than per-batch — the
    downstream (i, j) sum is identical).  Used only when Arrow is
    unavailable; d^2 rows per input row make it the slow path."""
    v = dfv.select("id", F.posexplode("vi").alias("i", "x"))
    g = (
        v.alias("a")
        .join(v.alias("b"), ["id"])
        .filter(F.expr("a.i <= b.i"))
        .select(
            F.col("a.i").cast("int").alias("i"),
            F.col("b.i").cast("int").alias("j"),
            F.expr("a.x * b.x").alias("s"),
        )
    )
    sums = v.select(
        F.col("i").cast("int").alias("i"),
        F.lit(-1).cast("int").alias("j"),
        F.col("x").alias("s"),
    )
    cnt = dfv.select(
        F.lit(-1).cast("int").alias("i"),
        F.lit(-1).cast("int").alias("j"),
        F.lit(1).cast("bigint").alias("s"),
    )
    return g.unionByName(sums).unionByName(cnt)


def pq_train_codebooks(
    embeddings: DataFrame,
    *,
    m_sub: int = 4,
    ksub: int = 16,
    iterations: int = 2,
    scale: int = 10000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[tuple[int, list[int]]]]:
    """Product-quantization codebooks (Jégou et al. 2011, public):
    the vector space splits into ``m_sub`` contiguous subspaces and
    each gets its own k-means codebook (``ksub`` centroids, Lloyd on
    the exact integer grid — the same deterministic trainer as IVF,
    :func:`_lloyd_centroids`).  Driver state is m_sub × ksub × d/m
    ints — bounded regardless of corpus size."""
    dfv = _quantized(embeddings, vec_col, id_col, scale)
    first = dfv.select(F.size("vi").alias("d")).first()
    if first is None:
        return []
    dim = int(first["d"])
    if dim % m_sub != 0:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    dsub = dim // m_sub
    books = []
    for m in range(m_sub):
        sub = dfv.select("id", F.slice("vi", m * dsub + 1, dsub).alias("vi"))
        books.append(_lloyd_centroids(sub, ksub, iterations))
    return books


def pq_encode(
    embeddings: DataFrame,
    books: list[list[tuple[int, list[int]]]],
    *,
    scale: int = 10000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ encoding: each vector becomes ``m_sub`` small codes (the
    nearest sub-centroid per subspace) — with ksub<=256 that is ONE
    BYTE per subspace, a dim·4/m_sub-fold compression of float32
    corpora.  One Arrow-batched pass, codebooks ride as closure
    constants; no shuffle, no collect.  Returns (id, codes
    array<int>, vi) — vi kept so audits can re-score exactly."""
    dfv = _quantized(embeddings, vec_col, id_col, scale)
    if not books:
        return dfv.select("id", F.expr("array()").cast("array<int>").alias("codes"), "vi")
    m_sub = len(books)
    try:
        import numpy as np
        import pandas as pd
    except ImportError:  # pragma: no cover
        out = dfv
        dsub = len(books[0][0][1])
        for m, book in enumerate(books):
            sub = out.select("id", F.slice("vi", m * dsub + 1, dsub).alias("vi"))
            a = _assign_cells_expr(sub, book).select(
                "id", F.col("cell").cast("int").alias(f"_c{m}")
            )
            out = out.join(a, "id")
        return out.select(
            "id",
            F.array(*[F.col(f"_c{m}") for m in range(m_sub)]).alias("codes"),
            "vi",
        )

    C = [np.array([v for _, v in book], dtype=np.int64) for book in books]
    cids = [np.array([c for c, _ in book], dtype=np.int64) for book in books]
    dsub = C[0].shape[1]

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["vi"].tolist(), dtype=np.int64)
            codes = np.empty((len(X), m_sub), dtype=np.int64)
            for m in range(m_sub):
                S = X[:, m * dsub : (m + 1) * dsub]
                d = ((S[:, None, :] - C[m][None, :, :]) ** 2).sum(-1)
                codes[:, m] = cids[m][d.argmin(1)]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "codes": [row.astype(int).tolist() for row in codes],
                    "vi": pdf["vi"],
                }
            )

    id_type = dict(dfv.dtypes)["id"]
    return dfv.mapInPandas(fn, f"id {id_type}, codes array<int>, vi array<bigint>")


def pq_adc_audit(
    embeddings: DataFrame,
    *,
    m_sub: int = 4,
    ksub: int = 16,
    iterations: int = 2,
    scale: int = 10000,
    n_queries: int = 8,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ + asymmetric-distance (ADC) recall audit: the lowest
    ``n_queries`` ids become queries, the rest the corpus; ADC ranks
    the corpus by Σ_m table_m[code_m(x)] where table_m is the query's
    exact squared distance to every sub-centroid (an m_sub × ksub int
    lookup, built once per query), and the audit reports how many of
    the true integer-grid top-``k`` the code-compressed index keeps.

    Scale shape: codebooks and per-query tables are bounded driver
    state; the ADC scan is one codegen projection over the CODES
    column (m_sub element_at lookups per row — it never touches the
    d-dimensional vector, which is the point of PQ: the corpus can
    stay on disk as 1-byte-per-subspace codes); exact re-scoring runs
    only for the audit.  Per-query top-k is a keyed window over the
    bounded query set.  Output: (query_id, n_overlap, recall_bp,
    compression_x100) — audit-not-assume, same posture as
    ``similarity_ivf_recall_audit``.
    """
    q = embeddings.filter(F.col(id_col) < n_queries)
    c = embeddings.filter(F.col(id_col) >= n_queries)
    books = pq_train_codebooks(
        c, m_sub=m_sub, ksub=ksub, iterations=iterations, scale=scale,
        vec_col=vec_col, id_col=id_col,
    )
    enc = pq_encode(c, books, scale=scale, vec_col=vec_col, id_col=id_col)
    qv = _quantized(q, vec_col, id_col, scale)
    dim_row = qv.select(F.size("vi").alias("d")).first()
    dim = int(dim_row["d"]) if dim_row is not None else 0
    compression = (dim * 4 * 100) // max(1, m_sub) if dim else 0
    if not books or dim == 0:
        return qv.select(
            F.col("id").alias("query_id"),
            F.lit(0).cast("long").alias("n_overlap"),
            F.lit(0).cast("long").alias("recall_bp"),
            F.lit(compression).cast("long").alias("compression_x100"),
        ).limit(0)
    dsub = dim // m_sub
    queries = qv.collect()  # bounded: n_queries rows

    # per-query ADC lookup tables (m_sub x ksub exact squared dists);
    # missing cell ids (empty Lloyd cells) never appear in codes
    spark = embeddings.sparkSession
    rows = []
    for r in queries:
        vi = list(r["vi"])
        tables = []
        for m, book in enumerate(books):
            sub = vi[m * dsub : (m + 1) * dsub]
            tbl = [0] * (max(cid for cid, _ in book) + 1)
            for cid, cent in book:
                tbl[cid] = sum((a - b) * (a - b) for a, b in zip(sub, cent))
            tables.append(tbl)
        rows.append((int(r["id"]), vi, tables))
    qdf = spark.createDataFrame(
        rows, "query_id bigint, qvi array<bigint>, tables array<array<bigint>>"
    )

    adc = enc.join(F.broadcast(qdf)).select(
        "query_id",
        F.col("id").alias("cand_id"),
        F.expr(
            "aggregate(sequence(0, size(codes) - 1), 0L, "
            "(acc, m) -> acc + tables[m][codes[m]])"
        ).alias("dist_adc"),
    )
    w = W.partitionBy("query_id").orderBy("dist_adc", "cand_id")
    adc_topk = adc.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    ).select("query_id", "cand_id")

    cv = _quantized(c, vec_col, id_col, scale)
    exact = cv.join(F.broadcast(qdf)).select(
        "query_id",
        F.col("id").alias("cand_id"),
        F.expr(SQDIST_INT.format(c="qvi", v="vi")).alias("dist"),
    )
    we = W.partitionBy("query_id").orderBy("dist", "cand_id")
    exact_topk = exact.withColumn("_rn", F.row_number().over(we)).filter(
        F.col("_rn") <= k
    ).select("query_id", "cand_id")

    hits = exact_topk.join(adc_topk, ["query_id", "cand_id"]).groupBy(
        "query_id"
    ).agg(F.count(F.lit(1)).alias("_n"))
    return (
        qdf.select("query_id")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_overlap"),
            F.expr(f"coalesce(_n, 0L) * 10000 div {int(k)}")
            .cast("long")
            .alias("recall_bp"),
            F.lit(compression).cast("long").alias("compression_x100"),
        )
    )


def covariance_ints(
    embeddings: DataFrame,
    *,
    scale: int = 1000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[list[int]], int]:
    """Full symmetric scaled-covariance matrix C[i][j] = n·Σxy − Σx·Σy
    as exact Python ints, from ONE :func:`gram_moments` corpus scan.
    Driver state is d(d+1)/2 + d + 1 rows (d=64 → 2145) — bounded by
    the embedding dimension, never the corpus."""
    rows = gram_moments(embeddings, vec_col=vec_col, id_col=id_col, scale=scale).collect()
    sums: dict[int, int] = {}
    gram: dict[tuple[int, int], int] = {}
    n = 0
    for r in rows:
        i, j, s = int(r["i"]), int(r["j"]), int(r["s"])
        if i == -1:
            n = s
        elif j == -1:
            sums[i] = s
        else:
            gram[(i, j)] = s
    d = len(sums)
    C = [[0] * d for _ in range(d)]
    for i in range(d):
        for j in range(d):
            sxy = gram[(i, j)] if i <= j else gram[(j, i)]
            C[i][j] = n * sxy - sums[i] * sums[j]
    return C, d


def pca_power_scores(
    embeddings: DataFrame,
    *,
    scale: int = 1000,
    iterations: int = 12,
    vscale: int = 1_000_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """First-principal-component projection, EXACT end to end: the
    covariance matrix comes from one distributed Gram pass
    (:func:`covariance_ints`), power iteration runs driver-side on
    the bounded d x d integer matrix (per step: w = C·v, then
    renormalize to |v|_inf = ``vscale`` with sign-magnitude
    TRUNCATING division — the semantics DuckDB's ``//`` and this
    loop share, so an unrolled-CTE oracle reproduces every
    iteration bit-for-bit), and the corpus projection x·v is one
    codegen zip_with/aggregate — no Python in the per-row path.

    Deterministic everywhere: all-ones init, fixed iteration count,
    integer arithmetic only.  If C·v vanishes (degenerate all-equal
    corpus) the previous vector is kept — same CASE in the oracle.
    Convergence to the true eigenvector depends on the spectral gap
    (audited in tests via the Rayleigh quotient); determinism and
    engine-parity do not.
    """
    C, d = covariance_ints(
        embeddings, scale=scale, vec_col=vec_col, id_col=id_col
    )
    spark = embeddings.sparkSession
    if d == 0:
        # empty corpus: stable empty schema, like the sibling operators
        return spark.createDataFrame([], "vec_id bigint, pc1_score bigint")
    v = [vscale] * d
    for _ in range(iterations):
        w = [sum(C[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in w)
        if m == 0:
            break
        v = [
            (abs(x) * vscale) // m * (1 if x >= 0 else -1) for x in w
        ]
    dfv = _quantized(embeddings, vec_col, id_col, scale)
    vdf = spark.createDataFrame([(list(map(int, v)),)], "pc array<bigint>")
    return (
        dfv.join(F.broadcast(vdf))
        .select(
            F.col("id").cast("long").alias("vec_id"),
            F.expr(
                "aggregate(zip_with(vi, pc, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"
            )
            .cast("long")
            .alias("pc1_score"),
        )
    )
