"""Streaming near-duplicate detection: dedup each incoming document
micro-batch against the PERSISTED signature index of everything seen
before — the shape of continuous training-data ingestion (a new
crawl drop must be checked against the corpus, not only against
itself).

The reference has no analog (it has no joins at all, SURVEY.md
§2.12); this is the streaming composition of the engine's own batch
primitives:

* per batch, compute the narrow (doc_id, band_id, band_hash) LSH
  bucket keys (``operators.dedup.banded_keys`` — the SAME expression
  tree as the batch pair join, so the two tiers can never drift);
* candidate pairs = batch keys ⋈ historical index keys on (band_id,
  band_hash) PLUS the batch's within-batch self-join — both narrow
  equi-joins, only colliding docs ever meet;
* verify candidates against the shingle store (exact Jaccard, the
  precision tier), append matches to the output log;
* append the batch's keys + shingles to the index (delta-append,
  O(batch) per epoch — the same LSM posture as KeyedUpsertSink).

At 100 TB the index is a bucketed table keyed on (band_id,
band_hash) so the per-batch probe is a partition-pruned join; the
local parquet directory models exactly that layout.  State never
lives in the streaming engine — the index IS the state, so restarts
resume for free and the index is queryable by batch jobs
(``minhash_lsh_pairs``) at any time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfs3_kinesis_spark.operators.dedup import banded_keys, shingles


class StreamingNearDup:
    """foreachBatch body for continuous near-dup detection.

    Layout under ``root``: ``bands/`` (narrow key index),
    ``shingles/`` (verify store), ``matches/`` (append-only result
    log: new_doc_id, dup_of, jaccard, epoch).
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        shingle_n: int = 3,
        num_hashes: int = 32,
        bands: int = 8,
        jaccard_threshold: float = 0.5,
    ):
        self.spark = spark
        self.bands_dir = os.path.join(root, "bands")
        self.shingles_dir = os.path.join(root, "shingles")
        self.matches_dir = os.path.join(root, "matches")
        self.shingle_n = shingle_n
        self.num_hashes = num_hashes
        self.bands = bands
        self.threshold = jaccard_threshold

    # -- reads --------------------------------------------------------- #

    def _read(self, path: str) -> DataFrame | None:
        if not os.path.isdir(path) or not any(
            f.endswith(".parquet") for f in os.listdir(path)
        ):
            return None
        return self.spark.read.parquet(path)

    def matches(self) -> DataFrame | None:
        """The append-only match log (new_doc_id, dup_of, jaccard,
        epoch)."""
        return self._read(self.matches_dir)

    # -- the foreachBatch body ----------------------------------------- #

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            # idle trigger / empty file: don't litter the index and
            # match log with zero-row delta files
            return
        sh = (
            shingles(batch_df, n=self.shingle_n)
            .select("doc_id", "shingles")
            .persist()
        )
        keys = banded_keys(sh, num_hashes=self.num_hashes, bands=self.bands).persist()

        hist_keys = self._read(self.bands_dir)
        # candidates: batch vs history (new doc is always the left /
        # "new" side) + within-batch self-join (doc_a < doc_b);
        # narrow columns only enter either shuffle
        parts = []
        if hist_keys is not None:
            parts.append(
                keys.alias("n")
                .join(
                    hist_keys.alias("h"),
                    (F.col("n.band_id") == F.col("h.band_id"))
                    & (F.col("n.band_hash") == F.col("h.band_hash")),
                )
                .select(
                    F.col("n.doc_id").alias("new_doc_id"),
                    F.col("h.doc_id").alias("dup_of"),
                )
            )
        parts.append(
            keys.alias("a")
            .join(
                keys.alias("b"),
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") > F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("new_doc_id"),
                F.col("b.doc_id").alias("dup_of"),
            )
        )
        cand = parts[0]
        for p in parts[1:]:
            cand = cand.unionByName(p)
        cand = cand.dropDuplicates(["new_doc_id", "dup_of"])

        # verify tier: exact Jaccard against the shingle store.
        # Locally this scans the store per batch; at 100 TB the
        # shingle table is BUCKETED BY doc_id (and the band index by
        # (band_id, band_hash)), so this probe is a bucket-pruned
        # point lookup over only the candidate doc_ids — plus
        # Catalyst's runtime bloom filter on the join key prunes the
        # scan even without bucketing (tests/test_plans.py pins the
        # bloom-injection behavior).  The plan SHAPE (narrow probe,
        # verify only candidates) is the scale story; the storage
        # layout is deployment detail.
        hist_sh = self._read(self.shingles_dir)
        all_sh = sh if hist_sh is None else sh.unionByName(hist_sh)
        sa = sh.select(F.col("doc_id").alias("new_doc_id"), F.col("shingles").alias("sa"))
        sb = all_sh.select(F.col("doc_id").alias("dup_of"), F.col("shingles").alias("sb"))
        jac = F.expr("size(array_intersect(sa, sb)) / size(array_union(sa, sb))")
        matched = (
            cand.join(sa, "new_doc_id")
            .join(sb, "dup_of")
            .withColumn("jaccard", F.round(jac, 4))
            .filter(F.col("jaccard") >= self.threshold)
            .select(
                "new_doc_id",
                "dup_of",
                "jaccard",
                F.lit(int(epoch_id)).alias("epoch"),
            )
        )
        matched.write.mode("append").parquet(self.matches_dir)

        # delta-append this batch into the index (O(batch) writes)
        keys.write.mode("append").parquet(self.bands_dir)
        sh.write.mode("append").parquet(self.shingles_dir)
        sh.unpersist()
        keys.unpersist()

    def writer(self, stream_df: DataFrame):
        return stream_df.writeStream.foreachBatch(self.process_batch).outputMode(
            "update"
        )
