"""Deduplication operators for large-scale text corpora.

Four tiers, all shuffle-efficient and expressed with JVM-side
built-ins (no Python in the hot path):

* exact        — hash groupBy on the raw or normalized text.
* fingerprint  — deterministic rolling-hash document fingerprint
                 (constant bytes per doc, groupBy on a BIGINT).
* MinHash+LSH  — shingle → minhash signature → banded bucket join →
                 verify Jaccard on candidates only.  The self-join is
                 on (band_id, band_hash) buckets, so at 100 TB the
                 candidate set — not the corpus cross-product —
                 drives cost.
* SimHash      — 64-bit simhash from token hashes; near-dup ==
                 small Hamming distance, bucketed by the top bits.

All hashing uses ``xxhash64`` (Spark built-in, codegen'd).
"""

from __future__ import annotations

import threading as _threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sfs3_kinesis_spark.operators.scale import lineage_pin, pin_shared

FINGERPRINT_MOD = 1_000_000_007


def tokens(col: str = "text") -> F.Column:
    return F.split(F.col(col), " ")


def exact_dedup(docs: DataFrame, key_expr: F.Column | None = None) -> DataFrame:
    """Exact dedup: one surviving doc_id per identical key.

    ``key_expr`` defaults to the raw text; pass a normalization
    (lower / strip punctuation / prefix) for canonicalized dedup.
    Single hash-aggregate: partial map-side combine then one shuffle
    on the key — the optimal distributed plan for this operation.
    """
    key = key_expr if key_expr is not None else F.col("text")
    return (
        docs.withColumn("dedup_key", key)
        .groupBy("dedup_key")
        .agg(F.min("doc_id").cast("long").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def fingerprint(docs: DataFrame, out_col: str = "fingerprint") -> DataFrame:
    """Deterministic rolling-hash fingerprint over the token stream.

    Polynomial fold ``acc*131 + (ascii(tok)*31 + len(tok)) mod p`` —
    chosen to be exactly reproducible in ANSI SQL (the DuckDB oracle
    computes the same fold), unlike xxhash64 which is Spark-specific.
    """
    expr = (
        "aggregate(split(text, ' '), CAST(0 AS BIGINT), "
        f"(acc, x) -> (acc * 131 + ascii(x) * 31 + length(x)) % {FINGERPRINT_MOD})"
    )
    return docs.withColumn(out_col, F.expr(expr))


def shingles(docs: DataFrame, n: int = 3, out_col: str = "shingles") -> DataFrame:
    """Distinct word n-gram shingles per document (built-in
    higher-order functions; no UDF).

    Built as an (n-1)-fold ``zip_with`` of the token array against
    its own shifted slices: each argument of ``zip_with`` is
    evaluated ONCE per row.  The naive
    ``transform(sequence(...), i -> slice(split(text), ...))`` form
    re-evaluates the split inside the lambda for every index —
    O(tokens²) per document, ~4× slower on the fixture corpus and
    catastrophically worse on long documents.

    Documents shorter than ``n`` tokens shingle to ``[text]``
    (zip_with pads the short slices with NULL; those partial grams
    are filtered out).
    """
    toks = "split(text, ' ')"
    acc = toks
    for k in range(2, n + 1):
        acc = f"zip_with({acc}, slice({toks}, {k}, size({toks})), (x, y) -> concat(x, ' ', y))"
    expr = (
        f"CASE WHEN size({toks}) < {n} THEN array(text) "
        f"ELSE array_distinct(filter({acc}, x -> x IS NOT NULL)) END"
    )
    return docs.withColumn(out_col, F.expr(expr))


def minhash_signature(docs_with_shingles: DataFrame, num_hashes: int = 32, out_col: str = "signature") -> DataFrame:
    """MinHash signature: for seed h, min over shingles of
    xxhash64(shingle, h).  One array column, computed in a single
    codegen'd projection."""
    mins = F.array(
        *[
            F.expr(f"array_min(transform(shingles, s -> xxhash64(s, {h})))")
            for h in range(num_hashes)
        ]
    )
    return docs_with_shingles.withColumn(out_col, mins)


def banded_keys(
    docs_with_shingles: DataFrame, *, num_hashes: int = 32, bands: int = 8
) -> DataFrame:
    """(doc_id, band_id, band_hash) LSH bucket keys from a shingle
    table — the narrow projection both the batch pair-join and the
    streaming delta-index share.

    Each band hash is computed DIRECTLY from its own rows_per_band
    minhash functions (one narrow union branch per band) rather than
    slicing a materialized signature column through posexplode:
    Catalyst inlines column aliases into the Generate, re-evaluating
    the full num_hashes-pass signature once per exploded row — a
    ``bands×`` blowup of the dominant xxhash cost.  The union form
    evaluates exactly num_hashes transforms."""
    rows_per_band = num_hashes // bands

    def band_hash(b: int) -> str:
        mins = ", ".join(
            f"cast(array_min(transform(shingles, s -> xxhash64(s, {h}))) as string)"
            for h in range(b * rows_per_band, (b + 1) * rows_per_band)
        )
        return f"xxhash64(concat_ws(',', {mins}))"

    from functools import reduce

    return reduce(
        DataFrame.unionByName,
        [
            docs_with_shingles.select(
                "doc_id",
                F.lit(b).alias("band_id"),
                F.expr(band_hash(b)).alias("band_hash"),
            )
            for b in range(bands)
        ],
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    *,
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH.

    Plan shape (the scale path): signature is a narrow projection;
    candidate generation explodes ``bands`` rows per doc and
    self-joins on (band_id, band_hash) — an equi-join Catalyst
    shuffles on the bucket key, so only colliding docs ever meet.
    Verification computes true shingle Jaccard on candidates only.
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    rows_per_band = num_hashes // bands
    # The shingle table is the one shared intermediate (feeds band
    # hashing AND both sides of the verify join) — persist it.  At
    # cluster scale this is the "signature table" you would write to
    # storage once and reuse; recomputing it per consumer would scan
    # the corpus five times.
    sh = pin_shared(
        shingles(docs, n=shingle_n).select("doc_id", "shingles"), tag="lsh_shingles"
    )
    banded = banded_keys(sh, num_hashes=num_hashes, bands=bands)
    # Candidate generation stays NARROW: only (doc_id, band_id,
    # band_hash) ever enters the self-join shuffle.  Shipping the
    # shingle arrays through the band join would multiply shuffle
    # bytes by bands × avg-shingle-size — the difference between a
    # bucket join and a corpus broadcast at 100 TB.
    left = banded.alias("a")
    right = banded.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # Verification tier: re-join the (narrow) candidate pairs against
    # the shingle sets — candidates, not the corpus, drive this cost.
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    jac = F.expr(
        "size(array_intersect(sh_a, sh_b)) / size(array_union(sh_a, sh_b))"
    )
    return (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _ranked_shingle_sets_str(docs_with_shingles: DataFrame) -> DataFrame:
    """String-keyed fallback of :func:`_ranked_shingle_sets` — the
    pre-r11 formulation, kept as the EXACT escape hatch for the
    (astronomically unlikely, but checked, never assumed) corpus
    whose shingle vocabulary collides under xxhash64.

    The (df, shingle) struct IS the global total order — no
    vocabulary-sized rank window.  The df table is vocabulary-sized:
    AQE broadcasts it at fixture/test scales, but at corpus scale the
    join degrades to a shuffle equi-join on the shingle key — still
    scale-safe (narrow rows, no all-pairs).
    """
    d = docs_with_shingles.select("doc_id", "shingles")
    df_tbl = (
        d.select(F.explode("shingles").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return (
        d.select("doc_id", F.explode("shingles").alias("tok"))
        .join(df_tbl, "tok")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "tok"))).alias("sorted_sh"))
        .select(
            "doc_id",
            F.expr("transform(sorted_sh, x -> x.tok)").alias("toks_sorted"),
            F.size("sorted_sh").alias("n"),
        )
    )


#: xxhash64 vocabulary-collision verdicts, keyed by (session id,
#: vocab-plan semanticHash) — see the memo note inside
#: :func:`_ranked_shingle_sets`.  Bounded; cleared implicitly by
#: session replacement (the id key no longer matches).
_VOCAB_COLLISION_MEMO: dict = {}
_VOCAB_COLLISION_LOCK = _threading.RLock()


def _ranked_shingle_sets(
    docs_with_shingles: DataFrame, *, tag: str = "shingle"
) -> DataFrame:
    """(doc_id, toks_sorted, n): each document's distinct shingles
    sorted rarest-first by corpus document frequency — HASH-KEYED
    (r11): ``toks_sorted`` is an ``array<bigint>`` of
    ``xxhash64(shingle)`` values in (df, hash) order, not the shingle
    strings.

    Why (guide §2.3, shuffle fewer bytes / §4.2 cheap per-row work):
    every downstream stage — the doc_id collect shuffle, the per-doc
    rarest-first sort, the candidate equi-join on prefix elements,
    and the exact ``array_intersect`` verification — only ever needs
    shingle IDENTITY and a consistent global total order, never the
    text.  An 8-byte hash is ~4x narrower than a 3-word shingle
    string in every one of those shuffles, sorts/compares without
    string allocation, and the prefix-filter guarantee holds under
    ANY global total order, so switching the order from (df, tok) to
    (df, xxhash64(tok)) cannot change which pairs are emitted.

    Exactness is GUARDED, not assumed: the vocabulary aggregate
    groups by the hash and keeps min/max of the underlying shingle
    per group — any group whose min != max is a genuine 64-bit
    collision, in which case this function returns the string-keyed
    fallback (identical results, pre-r11 plan).  With no collision
    the hash is injective over the vocabulary, so intersection sizes
    and therefore every emitted (pair, score) row are EXACTLY those
    of the string plan; the DuckDB all-pairs oracles re-prove this
    per sweep.  NULL shingles (a NULL-text document's ``[text]``
    fallback) are filtered before hashing, matching the null-unsafe
    ``tok`` equi-join that dropped them in the string plan.

    The vocabulary (h, df) table is pinned through the keyed LRU and
    explicitly broadcast-joined to the postings at or below the
    AQE/broadcast regime's natural threshold — at corpus scale the
    vocabulary is itself corpus-sized and the join degrades to a
    shuffle equi-join on the hash (narrow rows, no all-pairs).
    """
    d = docs_with_shingles.select("doc_id", "shingles")
    ex = d.select("doc_id", F.explode("shingles").alias("tok")).filter(
        F.col("tok").isNotNull()
    )
    voc_plan = (
        ex.groupBy(F.expr("xxhash64(tok)").alias("h"))
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.min("tok").alias("_t1"),
            F.max("tok").alias("_t2"),
        )
        .select("h", "df", (F.col("_t1") != F.col("_t2")).alias("_coll"))
    )
    voc = pin_shared(voc_plan, tag=f"{tag}_vocab")
    # collision verdict memo: the check is a pure function of the
    # (immutable within a session) source data and the vocab plan, so
    # one action per (session, plan) suffices — same validity domain
    # as Spark's own catalog cache and the pin LRU.  Without the memo
    # every warm re-build of a prefix-join query pays a vocab-scan
    # action just to re-learn "no collision" (measured +0.2 s steady
    # on similarity_join_prefix_filter at sf0.1).
    try:
        memo_key = (id(docs_with_shingles.sparkSession), voc_plan.semanticHash())
    except Exception:  # noqa: BLE001 — connect mode / exotic plans
        memo_key = None
    with _VOCAB_COLLISION_LOCK:
        collided = _VOCAB_COLLISION_MEMO.get(memo_key) if memo_key is not None else None
    if collided is None:
        collided = not voc.filter("_coll").isEmpty()
        if memo_key is not None:
            with _VOCAB_COLLISION_LOCK:
                if len(_VOCAB_COLLISION_MEMO) >= 256:
                    _VOCAB_COLLISION_MEMO.pop(next(iter(_VOCAB_COLLISION_MEMO)), None)
                _VOCAB_COLLISION_MEMO[memo_key] = collided
    if collided:
        return _ranked_shingle_sets_str(docs_with_shingles)
    ph = ex.select("doc_id", F.expr("xxhash64(tok)").alias("h"))
    return (
        ph.join(voc.select("h", "df"), "h")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "h"))).alias("sorted_sh"))
        .select(
            "doc_id",
            F.expr("transform(sorted_sh, x -> x.h)").alias("toks_sorted"),
            F.size("sorted_sh").alias("n"),
        )
    )


def _jaccard_prefix_frame(
    docs_with_shingles: DataFrame, *, threshold_bp: int
) -> DataFrame:
    """Ranked shingle sets plus the t-prefix slice — the shared front
    half of :func:`jaccard_pairs_exact`, pinned once per plan."""
    ranked = _ranked_shingle_sets(docs_with_shingles)
    # prefix length = n - ceil(t·n) + 1; ceil(t_bp·n/10000) in integers
    pref = ranked.withColumn(
        "prefix",
        F.expr(
            f"slice(toks_sorted, 1, n - (({threshold_bp} * n + 9999) DIV 10000) + 1)"
        ),
    )
    return pin_shared(pref, tag="jaccard_prefix")


def jaccard_candidates_exact(
    docs_with_shingles: DataFrame, *, threshold_bp: int, pref: DataFrame | None = None
) -> DataFrame:
    """Candidate stage of :func:`jaccard_pairs_exact` — distinct
    (doc_a, doc_b, s) pairs surviving prefix + length filtering,
    BEFORE exact verification.  Exposed so the decade stress
    (scripts/sf10_stress_prefix.py) can attribute wall-time growth to
    candidate fan-out vs true-pair growth (r08 verdict next-round #2).

    ``pref`` lets :func:`jaccard_pairs_exact` pass its already-pinned
    prefix frame through instead of re-entering the pin (r09 ADVICE:
    in fallback modes — semanticHash failure, SFS3K_KEYED_CACHE_MAX=0
    forensics — a second pin call persists the corpus-sized frame
    twice or unpersists the copy the verify stage still references)."""
    if pref is None:
        pref = _jaccard_prefix_frame(docs_with_shingles, threshold_bp=threshold_bp)
    pe = pref.select("doc_id", "n", F.explode("prefix").alias("pr"))
    return (
        pe.alias("a")
        .join(
            pe.alias("b"),
            (F.col("a.pr") == F.col("b.pr"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter: J ≥ t forces t·na ≤ nb and t·nb ≤ na
            & (F.col("b.n") * 10000 >= F.col("a.n") * threshold_bp)
            & (F.col("a.n") * 10000 >= F.col("b.n") * threshold_bp),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (F.col("a.n") + F.col("b.n")).alias("s"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )


def jaccard_pairs_exact(
    docs_with_shingles: DataFrame, *, threshold_bp: int
) -> DataFrame:
    """EXACT Jaccard >= t self-join without the O(n²) cross join.

    Prefix filtering (Chaudhuri/Ganti/Kaushik 2006; Bayardo et al.
    2007 — public literature): under any global total order on the
    shingle universe, the smallest common element e1 of a qualifying
    pair sits, within each document, before at least α-1 other common
    elements — so its position is ≤ n - α + 1, where α is the minimum
    overlap a qualifying pair must have.  For Jaccard ≥ t,
    i ≥ t·union ≥ t·n per side, so α = ceil(t·n) and each document
    need only index its first n - ceil(t·n) + 1 rarest shingles.
    Candidate pairs come from an equi-join on prefix shingles (narrow:
    only keys and sizes shuffle, never the arrays), then exact integer
    verification in basis points on the survivors.  The brute-force
    all-pairs oracle in the registry proves losslessness cross-engine.

    At 100 TB this replaces n²/2 array intersections with one
    vocabulary-keyed equi-join whose fan-out tracks the true-pair
    count: hot (high-df) shingles sort LAST and fall out of prefixes.
    Returns (doc_a, doc_b, jaccard_bp) with doc_a < doc_b,
    jaccard_bp = floor(10000·|A∩B| / |A∪B|) ≥ threshold_bp.
    """
    pref = _jaccard_prefix_frame(docs_with_shingles, threshold_bp=threshold_bp)
    cand = jaccard_candidates_exact(
        docs_with_shingles, threshold_bp=threshold_bp, pref=pref
    )
    arrs = pref.select("doc_id", "toks_sorted")
    ver = (
        cand.join(
            arrs.select(F.col("doc_id").alias("doc_a"), F.col("toks_sorted").alias("ra")),
            "doc_a",
        )
        .join(
            arrs.select(F.col("doc_id").alias("doc_b"), F.col("toks_sorted").alias("rb")),
            "doc_b",
        )
        .withColumn("i", F.size(F.array_intersect("ra", "rb")))
        .withColumn("jaccard_bp", F.expr("i * 10000 DIV (s - i)"))
    )
    return ver.filter(F.col("jaccard_bp") >= threshold_bp).select(
        "doc_a", "doc_b", "jaccard_bp"
    )


def containment_candidates_exact(
    docs_with_shingles: DataFrame,
    *,
    threshold_bp: int,
    ranked: DataFrame | None = None,
) -> DataFrame:
    """Candidate stage of :func:`containment_pairs_exact` — distinct
    (doc_contained, doc_container) pairs surviving the asymmetric
    prefix probe, BEFORE exact verification.  Exposed for the decade
    stress's fan-out attribution (r08 verdict next-round #2).
    ``ranked`` = pass-through of the caller's already-pinned ranked
    frame (same single-pin rationale as
    :func:`jaccard_candidates_exact`)."""
    if ranked is None:
        ranked = pin_shared(
            _ranked_shingle_sets(docs_with_shingles), tag="containment_ranked"
        )
    pe_a = ranked.select(
        "doc_id",
        F.explode(
            F.expr(
                f"slice(toks_sorted, 1, n - (({threshold_bp} * n + 9999) DIV 10000) + 1)"
            )
        ).alias("pr"),
    )
    pe_b = ranked.select("doc_id", F.explode("toks_sorted").alias("pr"))
    return (
        pe_a.alias("a")
        .join(
            pe_b.alias("b"),
            (F.col("a.pr") == F.col("b.pr"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_contained"),
            F.col("b.doc_id").alias("doc_container"),
        )
        .dropDuplicates(["doc_contained", "doc_container"])
    )


def containment_pairs_exact(
    docs_with_shingles: DataFrame, *, threshold_bp: int
) -> DataFrame:
    """EXACT directional containment |A∩B|/|A| ≥ c without all-pairs.

    Asymmetric prefix filter: a qualifying pair has overlap
    α = ceil(c·|A|), so the contained side A need only index its
    first |A| - ceil(c·|A|) + 1 rarest shingles (same smallest-
    common-element argument as :func:`jaccard_pairs_exact`).  The
    container side B gets NO per-size bound (α can be tiny relative
    to |B|), so B is indexed on ALL its shingles — an inverted-index
    probe, still an equi-join whose volume is the corpus posting
    count, never n².  Returns (doc_contained, doc_container,
    containment_bp) over distinct doc pairs.
    """
    ranked = pin_shared(_ranked_shingle_sets(docs_with_shingles), tag="containment_ranked")
    cand = containment_candidates_exact(
        docs_with_shingles, threshold_bp=threshold_bp, ranked=ranked
    )
    arrs = ranked.select("doc_id", "toks_sorted", "n")
    ver = (
        cand.join(
            arrs.select(
                F.col("doc_id").alias("doc_contained"),
                F.col("toks_sorted").alias("ra"),
                F.col("n").alias("na"),
            ),
            "doc_contained",
        )
        .join(
            arrs.select(
                F.col("doc_id").alias("doc_container"),
                F.col("toks_sorted").alias("rb"),
            ),
            "doc_container",
        )
        .withColumn(
            "containment_bp",
            F.expr("size(array_intersect(ra, rb)) * 10000 DIV na"),
        )
    )
    return ver.filter(F.col("containment_bp") >= threshold_bp).select(
        "doc_contained", "doc_container", "containment_bp"
    )


def simhash(docs: DataFrame, out_col: str = "simhash") -> DataFrame:
    """64-bit SimHash over token hashes.  Requires a unique ``doc_id``.

    Bit-parallel aggregate formulation: distinct tokens explode to
    (doc_id, xxhash64(token)) rows — each token hashed ONCE in a
    codegen'd projection — then one hash aggregate computes the 64
    per-bit set-counts s_b; bit b of the fingerprint is set iff
    2*s_b > n (exactly the classic +1/-1 sign rule: s_b - (n - s_b)
    > 0).  The previous per-row form folded an INTERPRETED
    higher-order aggregate per bit, re-hashing every token 64 times
    (64 x |tokens| lambda steps + xxhash calls per document); this
    form is entirely whole-stage-codegen'd and costs one narrow
    token-level shuffle with map-side partial aggregation — the same
    shape at 100 TB.  Values are bit-identical to the old form
    (docs with NULL text keep fingerprint 0, matching the old
    CASE-over-NULL collapse)."""
    th = docs.select(
        "doc_id",
        F.explode(F.expr("array_distinct(split(text, ' '))")).alias("tok"),
    ).select("doc_id", F.expr("xxhash64(tok)").alias("h"))
    sums = th.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(F.expr(f"int(shiftrightunsigned(h, {b}) & 1)")).alias(f"_s{b}")
            for b in range(64)
        ],
    )
    bits = " + ".join(
        f"(CASE WHEN 2 * _s{b} > _n THEN shiftleft(1L, {b}) ELSE 0L END)"
        for b in range(64)
    )
    # the (doc_id, simhash) aggregate is 16 bytes/doc but costs a
    # full token explode + 65-column aggregate to build — pin it so
    # plans with two simhash tiers (dedup_lsh_recall_audit runs the
    # single-prefix AND the multiprobe bucketing over the same
    # fingerprints) compute it once; Catalyst performs no CSE across
    # join branches, so without the pin the audit paid the xxhash
    # token pass twice (§5: cache what is reused and cheap to hold).
    # Single-consumer queries pay one trivial persist of the narrow
    # frame; the leaf-sum guard still unpins at corpus scale.
    from sfs3_kinesis_spark.operators.scale import pin_shared

    fp = pin_shared(sums.select("doc_id", F.expr(bits).alias(out_col)), tag="simhash_fp")
    return docs.join(fp, "doc_id", "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(0).cast("long"))
    )


def simhash_near_dup_pairs(docs: DataFrame, max_hamming: int = 8, prefix_bits: int = 16) -> DataFrame:
    """SimHash near-dup candidates bucketed by the top ``prefix_bits``
    bits (docs differing only in low bits still collide), verified by
    exact Hamming distance via bit_count(xor).

    WHEN TO USE WHICH NEAR-DUP PATH (measured, not hand-waved — the
    ``dedup_lsh_recall_audit`` query scores both against exact
    all-pairs 3-gram-Jaccard ground truth): at defaults this
    token-level SimHash recalls only **20–32 %** (2000–3214 bp at
    sf0.01/sf0.001) of Jaccard>=0.4 near-dup pairs, with ~100x extra
    candidates — it hashes unigram profiles, so word-order mutations
    that break shingles leave it unmoved and common-word overlap
    floods its buckets.  If your dedup criterion is shingle Jaccard
    (the usual training-data criterion), use ``minhash_lsh_pairs`` /
    ``dedup_minhash_lsh`` instead (measured 100 % recall on the same
    ground truth).  SimHash earns its keep only for bag-of-words
    near-identity (e.g. boilerplate detection where token multisets,
    not order, define similarity)."""
    sh = simhash(docs).select("doc_id", "simhash")
    bucketed = sh.withColumn("bucket", F.expr(f"shiftrightunsigned(simhash, {64 - prefix_bits})"))
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .withColumn("hamming", F.expr("bit_count(a.simhash ^ b.simhash)"))
        .filter(F.col("hamming") <= max_hamming)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"), "hamming")
    )


def simhash_multiprobe_pairs(
    docs: DataFrame,
    max_hamming: int = 8,
    prefix_bits: int = 16,
    n_tables: int = 16,
) -> DataFrame:
    """SimHash candidates via ROTATION tables (Manku et al. 2007,
    WWW — the Google near-dup scheme, public): the 64-bit fingerprint
    is rotated by ``64 / n_tables`` bits per table and bucketed on
    the top ``prefix_bits`` of each rotation, so a pair whose
    differing bits all miss ANY aligned window of the fingerprint
    collides in at least one table.  Measured on the sf0.001 fixture
    against brute-force hamming<=8 truth: single-prefix bucketing
    (:func:`simhash_near_dup_pairs`) finds 16.5 % of true pairs;
    4 tables 51 %, 8 tables 71 %, 16 tables 87.8 % (pinned in
    ``tests/test_dedup_clusters.py``) — rotation probing fixes the
    BUCKETING miss, and Jaccard-criterion recall in the
    ``dedup_lsh_recall_audit`` rises from 2000-3214 bp to
    8000-8571 bp.  The criterion gap remains: token-level SimHash
    still measures bag-of-words identity, so for shingle-Jaccard
    dedup use ``minhash_lsh_pairs`` (see the steering note on
    :func:`simhash_near_dup_pairs`).

    Scale shape — identical to MinHash-LSH banding: each doc explodes
    to ``n_tables`` (table_id, bucket) keys and candidates meet in ONE
    equi-join on that composite key (never an all-pairs product);
    expected candidate volume is n_tables * n^2 / 2^prefix_bits —
    tune prefix_bits up as the corpus grows.  Pairs deduplicate with
    one distinct before the exact bit_count verify.
    """
    if not (1 <= n_tables <= 64) or 64 % n_tables != 0:
        # n_tables > 64 makes rot = 0 (every table the identity
        # rotation: n_tables x the cost for single-table recall);
        # a non-divisor leaves trailing bits no window ever covers
        raise ValueError(
            f"n_tables must divide 64 and be in [1, 64], got {n_tables}"
        )
    rot = 64 // n_tables
    sh = simhash(docs).select("doc_id", "simhash")
    # Java shift semantics make t=0 safe: shiftrightunsigned(x, 64)
    # is x (count & 63 == 0), and x | x == x — the identity rotation
    tabs = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_tables - 1}), t -> named_struct("
                f"'table_id', t, "
                f"'bucket', shiftrightunsigned("
                f"shiftleft(simhash, t * {rot}) | "
                f"shiftrightunsigned(simhash, 64 - t * {rot}), {64 - prefix_bits})))"
            )
        ).alias("tb"),
    ).select("doc_id", "simhash", F.col("tb.table_id").alias("table_id"), F.col("tb.bucket").alias("bucket"))
    # Explicit hash partitioning on the composite bucket key: the key
    # table is tiny and highly compressible, so AQE's small-shuffle
    # coalescing would run the whole candidate join (n_tables x the
    # bucket fan-out, >1M rows at sf0.1) in ONE task.  A
    # user-specified partition count is exempt from coalescing and
    # both self-join sides reuse the layout with no extra shuffle.
    shuffle_n = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    tabs = tabs.repartition(shuffle_n, "table_id", "bucket")
    a, b = tabs.alias("a"), tabs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(sh_a ^ sh_b)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


#: adaptive strategy threshold for :func:`connected_components`: a
#: pair table at or below this many RAW rows (an upper bound on the
#: deduped directed edge count — r11 moved the gate before the
#: orientation-explode/dedup so small graphs skip that shuffle
#: entirely) is solved DRIVER-SIDE by union-find instead of the
#: iterative distributed loop.  Rationale (r10): the min-label + pointer-jump
#: loop converges in ~GRAPH-DIAMETER rounds on mesh-like graphs (the
#: label of an intermediate local minimum is itself, so the jump has
#: no chain to compress and the global min creeps one hop per round —
#: measured 32 rounds x ~1.1 s of per-round fixed cost on the 5.5k-
#: vertex DBSCAN hub grid, 35 s of overhead for milliseconds of
#: actual work).  Below the threshold the graph is BOUNDED (~2M edges
#: = tens of MB on the driver — the same order as a broadcast-join
#: side), union-find runs in linear time, and the output is
#: value-identical (min-id representative).  Above it, the
#: distributed loop runs exactly as before.  This is AQE-style
#: adaptive strategy selection, not a driver-side escape for
#: unbounded data: the collect is gated on the measured edge count.
#: Env-tunable; 0 forces the distributed path (tests use this).
import os as _os

DRIVER_CC_MAX_EDGES = int(
    _os.environ.get("SFS3K_DRIVER_CC_MAX_EDGES", "2000000")
)


def _driver_union_find(edge_rows, vertex_set) -> dict:
    """Min-representative union-find over collected edges: path
    halving + union-by-min, so find(v) ends at the component's
    minimum id — the exact value the distributed min-label loop
    converges to."""
    parent = {v: v for v in vertex_set}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for u, v in edge_rows:
        ru, rv = find(u), find(v)
        if ru != rv:
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    return {v: find(v) for v in vertex_set}


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 40,
) -> DataFrame:
    """Cluster the near-duplicate pair graph: assign every vertex the
    minimum doc_id reachable from it (label propagation to fixpoint).

    This is the step that turns pairwise near-dup evidence into
    dedup DECISIONS (keep one doc per cluster) — pairs alone
    over-delete when A~B and B~C but A!~C.  The reference has no
    analog (it has no joins at all, SURVEY.md §2.4); this is the
    standard large-scale formulation: per round

        label(v) <- min over {v} ∪ neighbors(v) of label(.)   (hop)
        label(v) <- label(label(v))                   (pointer jump)

    The pointer-jump (path-halving) step is what makes high-diameter
    graphs converge in O(log diameter) rounds instead of O(diameter)
    — a 40-node path converges in ~6 rounds where plain propagation
    needs 39 (and silently returned UNCONVERGED labels under any
    finite round cap; caught by the random-graph property test).
    Near-dup LSH cliques still converge at the first check.

    Each round is two key-shuffle joins + one groupBy; labels are
    pinned per round via :func:`~sfs3_kinesis_spark.operators.scale.
    lineage_pin` (a RELIABLE checkpoint when a checkpoint dir is
    configured — the session factory sets one — so executor loss
    recovers by re-reading checkpoint files instead of failing the
    job), which both materializes them AND truncates the logical
    plan — without it the plan tree grows geometrically per round
    and Catalyst planning time, not the data, becomes the
    bottleneck.  Convergence is a changed-vertex count — one tiny
    driver scalar per round.

    Returns (vertex, component) with component = min doc_id of the
    cluster; singleton vertices (no pair) are absent — callers union
    them back as their own components if needed.

    Strategy is ADAPTIVE on the measured pair count (r10, gate moved
    ahead of the orientation-explode/dedup shuffle in r11; see
    ``DRIVER_CC_MAX_EDGES``): bounded graphs solve driver-side in
    linear time (union-find, value-identical min representatives),
    unbounded graphs run the distributed loop.  Mesh-diameter graphs
    made the loop's round count degenerate (~diameter rounds x ~1 s
    fixed round cost — 35 s for the 21k-edge DBSCAN hub grid), and
    every production consumer's pair graph at fixture scale is deep
    under the threshold, so the loop is now the big-graph path only.
    """
    f = F
    # gate on the RAW pair-row count (r11): the pre-r10 formulation
    # exploded both orientations and dropDuplicates-shuffled BEFORE
    # the strategy decision, so even a 21k-edge graph paid an
    # orientation explode + a dedup shuffle + a persist just to learn
    # it should be solved driver-side (measured ~1.3 s of fixed
    # multi-job cost per DBSCAN invocation at sf0.1).  Union-find is
    # insensitive to duplicates and orientation, so the driver path
    # collects the raw (a, b) rows directly; the raw count is an
    # upper bound on the deduped directed count, so gating on it is
    # strictly conservative (a duplicate-heavy pair table falls back
    # to the distributed loop earlier, never later).  The pair table
    # is persisted so the upstream pair plan (for LSH pairs, the
    # dominant cost) runs exactly once either way.
    pairs_nn = pairs.select(f.col(a_col).alias("src"), f.col(b_col).alias("dst")).persist()
    n_pairs = pairs_nn.count()
    if 0 < DRIVER_CC_MAX_EDGES >= n_pairs:
        # bounded: collect the raw pairs and union-find on the driver.
        # Arrow toPandas when available: row-object collect() moves
        # ~50-100k rows/s through py4j pickling, Arrow ~millions/s —
        # at the 2M-edge threshold that is seconds vs sub-second.
        # Self-pairs and NULL endpoints are excluded exactly as the
        # old (explode -> dedup -> src < dst) pipeline excluded them.
        try:
            half_df = pairs_nn.filter(
                f.col("src").isNotNull()
                & f.col("dst").isNotNull()
                & (f.col("src") != f.col("dst"))
            )
            try:
                pdf = half_df.toPandas()
                edge_rows = list(zip(pdf["src"].tolist(), pdf["dst"].tolist()))
            except Exception:  # noqa: BLE001 — no pandas/Arrow: plain rows
                edge_rows = [
                    (r["src"], r["dst"]) for r in half_df.collect()
                ]
            vertices = set()
            for u, v in edge_rows:
                vertices.add(u)
                vertices.add(v)
            comp = _driver_union_find(edge_rows, vertices)
            spark = pairs.sparkSession
            vtype = dict(pairs.dtypes)[a_col]
            schema = f"vertex {vtype}, component {vtype}"
            try:
                import pandas as pd

                return spark.createDataFrame(
                    pd.DataFrame(
                        {
                            "vertex": list(comp.keys()),
                            "component": list(comp.values()),
                        }
                    ),
                    schema,
                )
            except Exception:  # noqa: BLE001 — no pandas/Arrow
                return spark.createDataFrame(list(comp.items()), schema)
        finally:
            pairs_nn.unpersist()

    # undirected edge list, both orientations, in ONE pass over the
    # (persisted) pair table
    edges = (
        pairs_nn.select(
            f.explode(
                f.array(
                    f.struct(f.col("src"), f.col("dst")),
                    f.struct(f.col("dst").alias("src"), f.col("src").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .dropDuplicates(["src", "dst"])
        .persist()
    )

    # initialize each vertex at its neighborhood minimum — one
    # groupBy that is exactly the first propagation round for free;
    # pure cliques (the common LSH-cluster shape) converge at the
    # first convergence check
    labels = (
        edges.groupBy(f.col("src").alias("vertex"))
        .agg(f.min("dst").alias("_nbr_min"))
        .select("vertex", f.least(f.col("vertex"), f.col("_nbr_min")).alias("component"))
        .transform(lineage_pin)
    )
    # try/finally so the persisted edge table is released on EVERY
    # exit — the non-convergence raise included (r02 ADVICE: the
    # failure path leaked cached storage)
    try:
        for _ in range(max_iter):
            # hop: for each vertex, the smallest label among itself
            # and its neighbors
            nbr = (
                edges.join(labels, edges.dst == labels.vertex)
                .select(f.col("src").alias("vertex"), f.col("component"))
                .unionByName(labels)
                .groupBy("vertex")
                .agg(f.min("component").alias("c1"))
            )
            # pointer jump: follow the label one step — label(label(v)).
            # Every label value IS a vertex of the graph (it is a min
            # of vertex ids), so the self-join lookup is total; the
            # parent's label is <= the child's by construction.
            parent = nbr.select(f.col("vertex").alias("_pv"), f.col("c1").alias("_pc"))
            jumped = (
                nbr.join(parent, nbr.c1 == f.col("_pv"))
                .select("vertex", f.col("_pc").alias("new_component"))
            )
            joined = lineage_pin(labels.join(jumped, "vertex"))
            changed = joined.filter(f.col("component") != f.col("new_component")).count()
            labels = joined.select("vertex", f.col("new_component").alias("component"))
            if changed == 0:
                break
        else:
            # silent wrong labels are worse than a loud failure: a
            # graph that has not reached fixpoint within max_iter
            # rounds (log-scale in diameter thanks to the jump step)
            # must not be reported as clustered
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds"
            )
    finally:
        edges.unpersist()
        pairs_nn.unpersist()
    return labels


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Full dedup decision table: every doc_id mapped to its cluster
    representative (the minimum doc_id of its connected component;
    singletons map to themselves).  ``is_keeper`` marks the one row
    per cluster that survives deletion."""
    comp = connected_components(pairs, a_col, b_col)
    out = (
        docs.select("doc_id")
        .join(comp, docs.doc_id == comp.vertex, "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("cluster_id"),
        )
        .withColumn("is_keeper", (F.col("doc_id") == F.col("cluster_id")).cast("int"))
    )
    return out
