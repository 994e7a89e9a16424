"""Deterministic sampling / splitting / packing operators for
training-data pipelines.

The reference has no sampling surface (SURVEY.md §2.12 — its only
"selection" is the keyed point-read, aprocess.js:15-32); these are
green-field north-star operators.  Design rules for 100 TB:

* **Deterministic by key, never by rng.**  ``rand()`` resamples on
  every retry/recompute, which silently breaks exactly-once at
  scale (a recomputed partition draws different rows).  Everything
  here keys off an arithmetic hash of a stable id, so any executor,
  any retry, any engine computes the same membership.
* **No global coordination.**  Sampling/splitting are pure row-local
  predicates (embarrassingly parallel, no shuffle at all); shard
  packing shuffles once on the bucket key and does all sequencing
  inside each bucket partition — the global-ORDER-BY
  single-reducer bottleneck never appears.
* The arithmetic hash (Knuth multiplicative, mod a large prime) is
  chosen so the DuckDB oracle can reproduce values exactly.  A
  production deployment with >2**26-ish keys would swap in
  ``xxhash64`` (same operator shape, overflow-proof); the swap is
  one expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Knuth multiplicative constant, a prime offset, and a large prime
#: modulus — identical arithmetic on BIGINT in Spark and DuckDB.
HASH_MULT = 2654435761
HASH_OFFSET = 104729
HASH_MOD = 1_000_000_007

#: the same hash as ANSI SQL text, for oracle queries.
def hash_sql(key: str) -> str:
    return f"(({key} * {HASH_MULT} + {HASH_OFFSET}) % {HASH_MOD})"


def hash_key(key: Column) -> Column:
    """Deterministic pseudo-random BIGINT in [0, HASH_MOD)."""
    return F.pmod(key * F.lit(HASH_MULT) + F.lit(HASH_OFFSET), F.lit(HASH_MOD))


def sample_by_hash(df: DataFrame, key: Column, keep_of: int = 10, bucket: int = 0) -> DataFrame:
    """Keep rows whose hash bucket (mod ``keep_of``) == ``bucket`` —
    a deterministic 1/keep_of sample.  Pure row-local filter: no
    shuffle, no rng, stable under retries and re-runs."""
    return df.filter(F.pmod(hash_key(key), F.lit(keep_of)) == bucket)


def split_assign(df: DataFrame, key: Column, train_pct: int = 80, val_pct: int = 10) -> DataFrame:
    """Assign each row a ``split`` label (train/val/test) from its
    hash bucket in [0,100).  Membership is a function of the key
    alone, so the split is reproducible across runs, engines, and
    cluster sizes — the property a training pipeline actually needs."""
    b = F.pmod(hash_key(key), F.lit(100))
    return df.withColumn(
        "split",
        F.when(b < train_pct, "train").when(b < train_pct + val_pct, "val").otherwise("test"),
    )


def stratified_sample(df: DataFrame, strata_col: str, key: Column, n_per_stratum: int) -> DataFrame:
    """First ``n_per_stratum`` rows per stratum in hash order —
    an equal-allocation stratified sample.  One shuffle on the
    stratum key; within each stratum the window is a partial
    top-k (rank <= n prunes before the final sort at scale)."""
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(hash_key(key).asc(), key.asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def pack_shards(
    df: DataFrame, key: Column, tokens_col: str, n_buckets: int = 8, capacity: int = 2048
) -> DataFrame:
    """Pack documents into ~``capacity``-token training shards.

    Scale design: a single global running sum would serialize 100 TB
    through one reducer.  Instead rows are hashed into ``n_buckets``
    independent streams and packed *within* each bucket by a running
    token total — one shuffle on the bucket key, then fully parallel.
    ``shard_id`` = floor(tokens-before-this-doc / capacity), i.e.
    sequential fill in deterministic hash order.  Adds columns
    ``bucket``, ``shard_id``."""
    from pyspark.sql import Window

    h = hash_key(key)
    df = df.withColumn("bucket", F.pmod(h, F.lit(n_buckets)))
    w = Window.partitionBy("bucket").orderBy(h.asc(), key.asc())
    cum_before = F.sum(F.col(tokens_col)).over(w) - F.col(tokens_col)
    return df.withColumn("shard_id", F.floor(cum_before / F.lit(capacity)))


def chunk_text(df: DataFrame, id_col: str, text_col: str, chunk_tokens: int = 32) -> DataFrame:
    """Split each document into fixed-size token chunks (sequence
    packing / context-window pre-chunking).  One row in, ceil(n/K)
    rows out via a generator — no driver round-trip, no Python.
    Note: Catalyst inlines the token-array alias into the Generate
    and its downstream projection, so ``split`` re-evaluates ~k×
    per doc; at k = a few chunks that costs less than materializing
    the array, so we keep the narrow single-pass plan."""
    k = chunk_tokens
    toks = F.split(F.col(text_col), " ")
    d = df.select(id_col, toks.alias("toks"))
    n_chunks = F.ceil(F.size("toks") / F.lit(k)).cast("int")
    e = d.select(
        id_col,
        "toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    piece = F.slice(F.col("toks"), F.col("chunk_idx") * k + 1, k)
    return e.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
    )


def global_row_index(
    df: DataFrame, key: Column, *, n_buckets: int = 64, out_col: str = "global_idx"
) -> DataFrame:
    """Contiguous 1-based global row ids in deterministic hash order,
    without a single-reducer global sort.

    ``ROW_NUMBER() OVER (ORDER BY h)`` serializes every row through
    one partition.  Instead the hash space is *range*-bucketed (all
    of bucket i precedes bucket i+1 in hash order), so:

    1. per-bucket row counts (one partial+final aggregate);
    2. exclusive prefix-sum of the counts — a window over
       ``n_buckets`` rows, trivially small;
    3. broadcast the offsets back, id = bucket offset + intra-bucket
       row_number (one shuffle on the bucket key).

    The result is identical to the global ROW_NUMBER (ties broken by
    key), but the only data-sized shuffle partitions by bucket —
    at 100 TB every bucket sorts in parallel.  Raise ``n_buckets``
    with the cluster (it only needs to exceed executor count)."""
    from pyspark.sql import Window

    width = HASH_MOD // n_buckets + 1
    b = df.withColumn("_h", hash_key(key)).withColumn(
        "_bucket", F.expr(f"_h DIV {width}").cast("int")
    )
    counts = b.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_bucket", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_offset")
    )
    w_in = Window.partitionBy("_bucket").orderBy(F.col("_h").asc(), key.asc())
    return (
        b.join(F.broadcast(offsets), "_bucket")
        .withColumn(out_col, (F.col("_offset") + F.row_number().over(w_in)).cast("long"))
        .drop("_h", "_bucket", "_offset")
    )


def temperature_resample(df: DataFrame, key: Column, stratum_col: str) -> DataFrame:
    """Temperature-balanced undersampling across strata (the
    multilingual-corpus rebalancing step: majority languages are
    downsampled toward the minority, exponent alpha = 0.5).

    Stratum ``l`` keeps each row with probability
    ``sqrt(n_min / n_l)`` where ``n_min`` is the smallest stratum —
    keep probability 1 for the minority, shrinking as a stratum's
    share grows.  Membership is the deterministic hash-u01 of the
    key compared against the stratum's keep probability, so the
    sample is stable under retries, and because ``/`` and ``sqrt``
    are correctly-rounded IEEE ops, every engine computes the
    bit-identical threshold (that is why alpha is 1/2 and not an
    arbitrary ``pow``, which is NOT cross-engine bit-stable).

    Scale shape: the stratum table is |strata| rows — aggregated
    with map-side combine, then broadcast back onto the fact; the
    filter itself is row-local.  No fact-side shuffle anywhere.

    The output schema is exactly the input schema: helper columns
    live under collision-safe ``_tr_*`` names and are dropped before
    returning, so a caller's own ``u``/``n_l``/``keep_p`` columns
    pass through untouched.
    """
    from pyspark.sql import Window

    counts = df.groupBy(stratum_col).agg(F.count("*").alias("_tr_n_l"))
    counts = counts.withColumn("_tr_n_min", F.min("_tr_n_l").over(Window.partitionBy()))
    counts = counts.select(
        stratum_col,
        F.sqrt(F.col("_tr_n_min").cast("double") / F.col("_tr_n_l").cast("double")).alias(
            "_tr_keep_p"
        ),
    )
    u = (hash_key(key).cast("double") / F.lit(float(HASH_MOD))).alias("_tr_u")
    return (
        df.join(F.broadcast(counts), stratum_col)
        .withColumn("_tr_u", u)
        .filter(F.col("_tr_u") < F.col("_tr_keep_p"))
        .drop("_tr_u", "_tr_keep_p")
        .select(*df.columns)
    )


def domain_cap(
    df: DataFrame,
    domain_col: str,
    order_exprs: list,
    *,
    cap: int,
    salt: int = 8,
    salt_on: str | None = None,
) -> DataFrame:
    """Per-domain document cap — the crawl-balancing step that stops
    a single giant host/source from dominating a pretraining mix
    (the C4/CommonCrawl "limit documents per domain" rule): keep the
    top ``cap`` documents per ``domain_col`` under ``order_exprs``
    (the keep-priority, e.g. longest-first with doc_id tie-break so
    the survivor set is deterministic).

    Scale shape: delegates to :func:`~sfs3_kinesis_spark.operators.
    scale.salted_window_topk` — domains are the textbook hot-key
    distribution (a head domain can hold 1000x the median), so the
    per-domain rank runs two-phase: rank inside (domain, salt) and
    keep each bucket's local top-``cap``, then rank the ≤ salt*cap
    survivors per domain.  Output carries ``rnk`` (1..cap within the
    domain).
    """
    from sfs3_kinesis_spark.operators.scale import salted_window_topk

    return salted_window_topk(
        df, domain_col, order_exprs, k=cap, salt=salt, salt_on=salt_on
    )


def curriculum_stages(
    df: DataFrame,
    order_by: list[str],
    *,
    n_stages: int,
    out_col: str = "stage",
) -> DataFrame:
    """Curriculum bucketing: assign every document a training stage
    1..``n_stages`` by its global rank under ``order_by`` (column
    names, ``-`` prefix for descending — the global_rank spec; the
    difficulty/quality axis — e.g. short-and-clean first), stage
    boundaries exact: ``stage = ((rank-1) * n_stages) div n + 1``
    (pure integer arithmetic, so the oracle reproduces it bit-for-bit
    — unlike NTILE, whose remainder distribution differs, this floor
    rule is the same one-line formula in every engine).

    Scale shape: the global rank is the two-phase
    :func:`~sfs3_kinesis_spark.operators.scale.global_rank` (no
    single-reducer sort); ``n`` is a 1-row aggregate broadcast back.
    Callers must make ``order_by`` a total order (tie-break on a
    unique key).
    """
    from sfs3_kinesis_spark.operators.scale import global_rank

    ranked = global_rank(df, order_by, out_col="_cur_rnk")
    n = ranked.groupBy().agg(F.count(F.lit(1)).alias("_cur_n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .withColumn(
            out_col,
            F.expr(f"((_cur_rnk - 1) * {int(n_stages)}) div _cur_n + 1").cast("long"),
        )
        .drop("_cur_rnk", "_cur_n")
    )


def priority_sample_per_key(
    df: DataFrame,
    key_col: str,
    id_col: str,
    weight_col: str,
    *,
    k: int,
    salt: int = 8,
) -> DataFrame:
    """Weighted sample of ``k`` items per key by PRIORITY SAMPLING
    (Duffield-Lund-Thorup, JACM 2007): item priority q = w/u with u
    uniform(0,1], keep the k largest, and the (k+1)-th priority is the
    threshold ``tau`` that makes ``sum(max(w, tau))`` over the sample
    an unbiased estimator of the key's TOTAL weight — the
    subset-sum-estimating weighted sample a curation pipeline wants
    (sample big documents more, still estimate corpus mass exactly).

    Engine form is integer-exact and rng-free: u = (hash(id)+1)/M for
    the module's arithmetic hash and modulus M, so the priority
    surrogate is ``(w * M) DIV (hash+1)`` — BIGINT floor arithmetic
    both engines evaluate identically (w*M <= ~1e14 << 2^63).  Ranking
    runs through the salted two-phase window top-k, so a hot key's
    corpus-sized candidate list spreads over ``salt`` phase-1
    reducers.  Returns the top ``k+1`` rows per key with ``_pr``
    (scaled priority) and ``rnk``; rank k+1 is the threshold row —
    callers split sample (rnk <= k) from tau (rnk == k+1).
    """
    from sfs3_kinesis_spark.operators.scale import salted_window_topk

    out = df.withColumn(
        "_pr",
        F.expr(
            f"CAST({weight_col} AS BIGINT) * {HASH_MOD} "
            f"DIV ({hash_sql(id_col)} + 1)"
        ),
    )
    return salted_window_topk(
        out,
        key_col,
        [F.desc("_pr"), F.asc(id_col)],
        k=k + 1,
        salt=salt,
        salt_on=id_col,
    )
