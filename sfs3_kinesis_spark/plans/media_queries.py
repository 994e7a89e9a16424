"""Round-7 wave: REAL-codec multimodal queries with EXACT oracles,
ranking-quality eval (NDCG), and two statistics the curation family
lacked (Kendall tau-b, token entropy).

The PNG queries are the oracle-exact upgrade of the rows-only
``multimodal_features``: each payload's pixels are a deterministic
function of (media_id, x, y), so the DuckDB twin recomputes the same
channel statistics in closed form while the Spark side actually
round-trips REAL compressed PNG bytes — encode (deflate) ->
``mapInPandas`` decode (inflate + scanline unfilter) -> featurize /
resize — through the injectable codec seam in
:mod:`sfs3_kinesis_spark.operators.multimodal`.  That puts a real
compressed media format inside the driver's correctness gate, not
just the test suite (r06 verdict missing #2 follow-through).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sfs3_kinesis_spark.plans.core import register, t

#: synthetic image geometry: 12x8 = 96 pixels per media row — big
#: enough to exercise row padding / filter unrolling, small enough
#: that the oracle's per-pixel unnest stays |docs| * 96 rows
PNG_W, PNG_H = 12, 8
#: per-channel pixel formulas (mod 256) — shared literally by the
#: Spark-side payload synthesis and the DuckDB closed form
_PX = {
    "r": (7, 13, 29),
    "g": (11, 17, 31),
    "b": (13, 19, 37),
}


def _pixel_sql(ch: str, mid: str, x: str, y: str) -> str:
    a, bx, by = _PX[ch]
    return f"(({mid} * {a} + ({x}) * {bx} + ({y}) * {by}) % 256)"


def _png_media(spark: SparkSession, sf_dir: str):
    """One REAL PNG payload per document: pixels from the shared
    deterministic formula, encoded through zlib deflate inside an
    Arrow-batched ``mapInPandas`` (no driver collect — payloads are
    born on the executors, exactly where a corpus's blobs live)."""
    from sfs3_kinesis_spark.operators.multimodal import encode_png

    docs = t(spark, sf_dir, "documents").select(F.col("doc_id").alias("media_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                m = int(mid)
                rows = [
                    [
                        tuple(
                            (m * a + x * bx + y * by) % 256
                            for a, bx, by in (_PX["r"], _PX["g"], _PX["b"])
                        )
                        for x in range(PNG_W)
                    ]
                    for y in range(PNG_H)
                ]
                payloads.append(encode_png(PNG_W, PNG_H, rows))
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads})

    return docs.mapInPandas(gen, "media_id long, payload binary")


@register(
    "multimodal_png_features",
    f"""
    WITH px AS (
        SELECT doc_id,
               {_pixel_sql('r', 'doc_id', 'x', 'y')} AS r,
               {_pixel_sql('g', 'doc_id', 'x', 'y')} AS g,
               {_pixel_sql('b', 'doc_id', 'x', 'y')} AS b
        FROM documents,
             unnest(range(0, {PNG_W})) AS tx(x),
             unnest(range(0, {PNG_H})) AS ty(y))
    SELECT doc_id                 AS media_id,
           CAST(sum(r) AS BIGINT) AS sum_r,
           CAST(sum(g) AS BIGINT) AS sum_g,
           CAST(sum(b) AS BIGINT) AS sum_b,
           CAST(min(r) AS BIGINT) AS min_r,
           CAST(min(g) AS BIGINT) AS min_g,
           CAST(min(b) AS BIGINT) AS min_b
    FROM px GROUP BY doc_id
    """,
    tags=("multimodal", "png", "real_codec", "pandas_udf", "exact_arithmetic"),
    description=(
        "REAL compressed-format decode inside the correctness gate: "
        "one 12x8 PNG per document (pixels a deterministic function "
        "of media_id/x/y) is deflate-encoded and then inflate+"
        "unfilter-decoded by the pure-stdlib PNG codec through the "
        "same mapInPandas seam production hands to PIL; per-channel "
        "sums/mins reconstructed exactly from the codec's mean/min "
        "features match the oracle's closed-form pixel arithmetic "
        "bit-for-bit.  At corpus scale the payloads are born and "
        "decoded executor-side (zero driver bytes), 96 pixels/doc"
    ),
)
def multimodal_png_features(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.multimodal import (
        decode_and_featurize,
        stdlib_png_codec,
    )

    n_px = PNG_W * PNG_H
    feats = decode_and_featurize(_png_media(spark, sf_dir), codec=stdlib_png_codec)
    # codec features: [mean_r, mean_g, mean_b, min_r, min_g, min_b,
    # w/1000, h/1000] with means = sum/(255*n), mins = min/255 —
    # reconstruct the integer statistics exactly (the float error of
    # one divide+multiply is ~1e-12, rounded away)
    return feats.select(
        "media_id",
        *[
            F.round(F.col("features")[i] * F.lit(255 * n_px))
            .cast("long")
            .alias(f"sum_{ch}")
            for i, ch in enumerate(("r", "g", "b"))
        ],
        *[
            F.round(F.col("features")[3 + i] * F.lit(255))
            .cast("long")
            .alias(f"min_{ch}")
            for i, ch in enumerate(("r", "g", "b"))
        ],
    )


#: resize target for the audit below; PNG_W/PNG_H divide evenly so
#: the nearest-neighbor source coordinate is the exact integer
#: (x * PNG_W) // OUT = x * (PNG_W // OUT)
_OUT = 4


@register(
    "multimodal_png_resize_audit",
    f"""
    SELECT doc_id AS media_id,
           CAST(x AS INTEGER) AS x,
           CAST(y AS INTEGER) AS y,
           CAST({_pixel_sql('r', 'doc_id', f'x * {PNG_W // _OUT}', f'y * {PNG_H // _OUT}')} AS INTEGER) AS r,
           CAST({_pixel_sql('g', 'doc_id', f'x * {PNG_W // _OUT}', f'y * {PNG_H // _OUT}')} AS INTEGER) AS g,
           CAST({_pixel_sql('b', 'doc_id', f'x * {PNG_W // _OUT}', f'y * {PNG_H // _OUT}')} AS INTEGER) AS b
    FROM documents,
         unnest(range(0, {_OUT})) AS tx(x),
         unnest(range(0, {_OUT})) AS ty(y)
    """,
    tags=("multimodal", "png", "real_codec", "resize", "exact_arithmetic"),
    description=(
        "REAL compressed-format resize audited pixel-by-pixel: the "
        "12x8 PNGs are nearest-neighbor resized to 4x4 by the "
        "stdlib PNG codec (decode -> sample -> re-deflate), the "
        "resized payloads decoded AGAIN and exploded one row per "
        "pixel (media_pixels mapInPandas, w*h rows out per media, "
        "no driver collect); every output pixel equals the oracle's "
        "closed-form value at the exact NN source coordinate.  Two "
        "real inflate/deflate round-trips per row inside the gate"
    ),
)
def multimodal_png_resize_audit(spark: SparkSession, sf_dir: str):
    from sfs3_kinesis_spark.operators.multimodal import (
        decode_png,
        make_stdlib_png_resize,
        media_pixels,
        resize_media,
    )

    resized = resize_media(
        _png_media(spark, sf_dir),
        out_w=_OUT,
        out_h=_OUT,
        codec=make_stdlib_png_resize(_OUT, _OUT),
    )
    return media_pixels(
        resized.select("media_id", F.col("resized").alias("payload")), decode_png
    )


NDCG_K = 10


@register(
    "eval_ndcg_at_k",
    f"""
    WITH cand AS (
        SELECT lang, doc_id, n_chars, doc_id % 4 AS rel
        FROM documents),
    ranked AS (
        SELECT lang, rel,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY n_chars DESC, doc_id) AS pos
        FROM cand),
    ideal AS (
        SELECT lang, rel,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY rel DESC, doc_id) AS pos
        FROM cand),
    dcg AS (
        SELECT lang, sum((pow(2, rel) - 1) / log2(pos + 1)) AS dcg
        FROM ranked WHERE pos <= {NDCG_K} GROUP BY lang),
    idcg AS (
        SELECT lang, sum((pow(2, rel) - 1) / log2(pos + 1)) AS idcg
        FROM ideal WHERE pos <= {NDCG_K} GROUP BY lang)
    SELECT d.lang,
           round(d.dcg, 6)           AS dcg_at_k,
           round(i.idcg, 6)          AS idcg_at_k,
           round(d.dcg / i.idcg, 6)  AS ndcg_at_k
    FROM dcg d JOIN idcg i ON d.lang = i.lang
    """,
    tags=("eval", "ranking", "ndcg", "window"),
    description=(
        f"NDCG@{NDCG_K} per language: graded relevance (hash-derived "
        "0..3), system ranking by (n_chars DESC, doc_id) vs the ideal "
        "relevance-sorted ranking, DCG = sum (2^rel - 1)/log2(pos+1) "
        "over the top-k of each — THE ranking-quality metric "
        "retrieval eval suites report next to MRR/P@k (Jarvelin & "
        "Kekalainen 2002).  Both windows partition by lang (keyed, "
        "never global) and the top-k filter keeps the gain sum at "
        "k rows per group; ndcg is computed from unrounded dcg/idcg "
        "in both engines and rounded once at the boundary"
    ),
)
def eval_ndcg_at_k(spark: SparkSession, sf_dir: str):
    cand = t(spark, sf_dir, "documents").select(
        "lang", "doc_id", "n_chars", (F.col("doc_id") % 4).alias("rel")
    )
    gain = (F.pow(F.lit(2.0), F.col("rel")) - 1) / F.log2(F.col("pos") + 1)
    ranked = cand.withColumn(
        "pos",
        F.row_number().over(
            W.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
        ),
    ).filter(F.col("pos") <= NDCG_K)
    ideal = cand.withColumn(
        "pos",
        F.row_number().over(
            W.partitionBy("lang").orderBy(F.desc("rel"), F.asc("doc_id"))
        ),
    ).filter(F.col("pos") <= NDCG_K)
    dcg = ranked.groupBy("lang").agg(F.sum(gain).alias("dcg"))
    idcg = ideal.groupBy("lang").agg(F.sum(gain).alias("idcg"))
    return dcg.join(idcg, "lang").select(
        "lang",
        F.round("dcg", 6).alias("dcg_at_k"),
        F.round("idcg", 6).alias("idcg_at_k"),
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg_at_k"),
    )


@register(
    "mine_kendall_tau_b",
    """
    WITH d AS (
        SELECT o_orderpriority AS priority, o_orderdate AS day,
               count(*) AS c
        FROM orders
        WHERE year(o_orderdate) = 1995
        GROUP BY 1, 2),
    pairs AS (
        SELECT a.priority,
               sum(CASE WHEN b.c > a.c THEN 1 ELSE 0 END) AS concordant,
               sum(CASE WHEN b.c < a.c THEN 1 ELSE 0 END) AS discordant,
               sum(CASE WHEN b.c = a.c THEN 1 ELSE 0 END) AS tied
        FROM d a JOIN d b
          ON a.priority = b.priority AND a.day < b.day
        GROUP BY a.priority),
    nn AS (SELECT priority, count(*) AS n FROM d GROUP BY priority),
    n2 AS (
        SELECT priority, sum(tcnt * (tcnt - 1) // 2) AS n2
        FROM (SELECT priority, c, count(*) AS tcnt FROM d GROUP BY 1, 2)
        GROUP BY priority)
    SELECT p.priority,
           CAST(nn.n AS BIGINT)                         AS n_days,
           CAST(p.concordant AS BIGINT)                 AS concordant,
           CAST(p.discordant AS BIGINT)                 AS discordant,
           CAST(p.tied AS BIGINT)                       AS tied,
           CAST(nn.n * (nn.n - 1) // 2 AS BIGINT)       AS n0,
           CAST(n2.n2 AS BIGINT)                        AS ties_y_pairs,
           round((p.concordant - p.discordant)
                 / sqrt(CAST(nn.n * (nn.n - 1) // 2 AS DOUBLE)
                        * (nn.n * (nn.n - 1) // 2 - n2.n2)), 6) AS tau_b
    FROM pairs p JOIN nn USING (priority) JOIN n2 USING (priority)
    """,
    tags=("timeseries", "trend", "kendall", "nonparametric", "exact_arithmetic"),
    description=(
        "Kendall tau-b rank correlation between time and daily order "
        "volume, per priority over the 1995 calendar rollup — the "
        "tie-corrected NORMALIZED companion of mine_mann_kendall_"
        "trend's raw S statistic (tau-b = (C-D)/sqrt((n0-n1)(n0-n2)); "
        "days are distinct so n1=0).  Concordant/discordant/tied "
        "counts and both tie terms stay exact BIGINT; only the final "
        "normalization touches doubles (sqrt+divide of identical "
        "integers is IEEE-identical in both engines, rounded once).  "
        "Pair join over the <=365-rows-per-priority bounded rollup — "
        "broadcast equi-join, never a fact-sized nested loop.  Same "
        "single-day contract as Mann-Kendall: a priority observed on "
        "one day has no pairs and is absent from the output"
    ),
)
def mine_kendall_tau_b(spark: SparkSession, sf_dir: str):
    d = (
        t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1995)
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    a, b = d.alias("a"), d.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.priority") == F.col("b.priority"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.priority").alias("priority"))
        .agg(
            F.sum((F.col("b.c") > F.col("a.c")).cast("long")).alias("concordant"),
            F.sum((F.col("b.c") < F.col("a.c")).cast("long")).alias("discordant"),
            F.sum((F.col("b.c") == F.col("a.c")).cast("long")).alias("tied"),
        )
    )
    nn = d.groupBy("priority").agg(F.count(F.lit(1)).alias("n"))
    n2 = (
        d.groupBy("priority", "c")
        .agg(F.count(F.lit(1)).alias("tcnt"))
        .groupBy("priority")
        .agg(F.sum(F.expr("tcnt * (tcnt - 1) DIV 2")).alias("n2"))
    )
    return (
        pairs.join(nn, "priority")
        .join(n2, "priority")
        .select(
            "priority",
            F.col("n").cast("long").alias("n_days"),
            F.col("concordant").cast("long").alias("concordant"),
            F.col("discordant").cast("long").alias("discordant"),
            F.col("tied").cast("long").alias("tied"),
            F.expr("CAST(n * (n - 1) DIV 2 AS BIGINT)").alias("n0"),
            F.col("n2").cast("long").alias("ties_y_pairs"),
            F.round(
                (F.col("concordant") - F.col("discordant"))
                / F.sqrt(
                    F.expr(
                        "CAST(n * (n - 1) DIV 2 AS DOUBLE) "
                        "* (n * (n - 1) DIV 2 - n2)"
                    )
                ),
                6,
            ).alias("tau_b"),
        )
    )


@register(
    "text_entropy_by_lang",
    """
    WITH tk AS (
        SELECT lang, unnest(string_split(text, ' ')) AS term
        FROM documents),
    tc AS (SELECT lang, term, count(*) AS c FROM tk GROUP BY 1, 2)
    SELECT lang,
           CAST(sum(c) AS BIGINT)    AS n_tokens,
           CAST(count(*) AS BIGINT)  AS n_terms,
           round(log2(CAST(sum(c) AS DOUBLE))
                 - sum(c * log2(CAST(c AS DOUBLE))) / sum(c), 6) AS entropy_bits
    FROM tc GROUP BY lang
    """,
    tags=("text", "entropy", "quality", "distribution"),
    description=(
        "Shannon entropy of the token distribution per language, in "
        "bits — the vocabulary-diversity readout quality pipelines "
        "monitor for template spam / mode collapse (a crawl drop "
        "whose entropy falls is repeating itself).  Computed in the "
        "numerically stable rollup form H = log2(N) - sum(c*log2 c)/N "
        "over the (lang, term) count table (one map-side-combined "
        "aggregate over terms, then a |vocab|-row rollup — never a "
        "per-token log).  Doubles are summed in engine-specific "
        "order; the 1e-10-scale associativity noise is rounded away "
        "at 6 decimals, the corpus convention"
    ),
)
def text_entropy_by_lang(spark: SparkSession, sf_dir: str):
    tk = t(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split("text", " ")).alias("term")
    )
    tc = tk.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("c"))
    return tc.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.round(
            F.log2(F.sum("c").cast("double"))
            - F.sum(F.col("c") * F.log2(F.col("c").cast("double"))) / F.sum("c"),
            6,
        ).alias("entropy_bits"),
    )


@register(
    "text_js_divergence_langs",
    """
    WITH tc AS (
        SELECT lang, term, count(*) AS c
        FROM (SELECT lang, unnest(string_split(text, ' ')) AS term
              FROM documents)
        GROUP BY 1, 2),
    tot AS (SELECT lang, sum(c) AS n FROM tc GROUP BY lang),
    shared AS (
        SELECT a.lang AS lang_a, b.lang AS lang_b,
               sum(CAST(a.c AS DOUBLE) / ta.n) AS shared_p,
               sum(CAST(b.c AS DOUBLE) / tb.n) AS shared_q,
               sum(CAST(a.c AS DOUBLE) / ta.n
                   * log2(2.0 * (a.c / CAST(ta.n AS DOUBLE))
                          / (a.c / CAST(ta.n AS DOUBLE)
                             + b.c / CAST(tb.n AS DOUBLE)))) AS p_term,
               sum(CAST(b.c AS DOUBLE) / tb.n
                   * log2(2.0 * (b.c / CAST(tb.n AS DOUBLE))
                          / (a.c / CAST(ta.n AS DOUBLE)
                             + b.c / CAST(tb.n AS DOUBLE)))) AS q_term
        FROM tc a
        JOIN tc b ON a.term = b.term AND a.lang < b.lang
        JOIN tot ta ON ta.lang = a.lang
        JOIN tot tb ON tb.lang = b.lang
        GROUP BY 1, 2)
    SELECT lang_a, lang_b,
           round(0.5 * (p_term + (1 - shared_p))
                 + 0.5 * (q_term + (1 - shared_q)), 6) AS jsd_bits
    FROM shared
    """,
    tags=("text", "divergence", "jsd", "distribution", "curation"),
    description=(
        "Jensen-Shannon divergence (bits) between every pair of "
        "language token distributions — the bounded symmetric "
        "distribution-shift measure curation pipelines use to compare "
        "domain mixes and detect drift (0 = identical, 1 = disjoint).  "
        "Closed over the SHARED-vocabulary inner join only: a term "
        "present in one language alone contributes exactly p*log2(2) "
        "= p bits (its mixture weight is p/2), so the disjoint mass "
        "folds in as (1 - shared_p)/2 + (1 - shared_q)/2 without ever "
        "materializing the full outer vocabulary union.  The join is "
        "rollup-sized ((lang, term) counts, never token-level) and "
        "equi-keyed on term; 5 languages = 10 pairs out"
    ),
)
def text_js_divergence_langs(spark, sf_dir):
    tc = (
        t(spark, sf_dir, "documents")
        .select("lang", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = tc.groupBy("lang").agg(F.sum("c").alias("n"))
    a = tc.alias("a").join(tot.alias("ta"), F.col("a.lang") == F.col("ta.lang"))
    b = tc.alias("b").join(tot.alias("tb"), F.col("b.lang") == F.col("tb.lang"))
    p = F.col("a.c").cast("double") / F.col("ta.n")
    q = F.col("b.c").cast("double") / F.col("tb.n")
    shared = (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col("a.lang") < F.col("b.lang")))
        .groupBy(
            F.col("a.lang").alias("lang_a"), F.col("b.lang").alias("lang_b")
        )
        .agg(
            F.sum(p).alias("shared_p"),
            F.sum(q).alias("shared_q"),
            F.sum(p * F.log2(F.lit(2.0) * p / (p + q))).alias("p_term"),
            F.sum(q * F.log2(F.lit(2.0) * q / (p + q))).alias("q_term"),
        )
    )
    return shared.select(
        "lang_a",
        "lang_b",
        F.round(
            0.5 * (F.col("p_term") + (1 - F.col("shared_p")))
            + 0.5 * (F.col("q_term") + (1 - F.col("shared_q"))),
            6,
        ).alias("jsd_bits"),
    )


@register(
    "agg_mode_per_group",
    """
    WITH c AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY 1, 2),
    r AS (
        SELECT user_id, event_type, n,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY n DESC, event_type) AS rk
        FROM c)
    SELECT user_id,
           event_type            AS mode_event,
           CAST(n AS BIGINT)     AS mode_n
    FROM r WHERE rk = 1
    """,
    tags=("agg", "mode", "window", "exact_arithmetic"),
    description=(
        "exact per-group MODE (most frequent event_type per user, "
        "deterministic lexicographic tie-break) — the categorical "
        "summary statistic SQL lacks a builtin for: one map-side-"
        "combined count rollup, then a keyed window over the "
        "|users| x |event types| rollup (never over facts).  The "
        "tie-break makes the answer total, so it hash-matches across "
        "engines"
    ),
)
def agg_mode_per_group(spark, sf_dir):
    c = t(spark, sf_dir, "events").groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    r = c.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
        ),
    )
    return r.filter(F.col("rk") == 1).select(
        "user_id",
        F.col("event_type").alias("mode_event"),
        F.col("n").cast("long").alias("mode_n"),
    )
