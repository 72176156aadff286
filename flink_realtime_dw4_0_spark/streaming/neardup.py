"""Streaming ingestion-time near-dup filter: an LSH index as keyed state.

A 100 TB curation pipeline dedups at INGESTION, not only in batch sweeps:
each arriving document is checked against everything already accepted, and
only novel documents enter the corpus (and the index).  This is the
streaming twin of `operators.dedup.minhash_lsh_pairs`, with the batch
corpus replaced by two keyed state tables:

  * index  — (band, bucket, doc_id): the LSH postings of every ACCEPTED doc
  * sigs   — (doc_id, mh0..mhN): accepted docs' minhash signatures

Per micro-batch (foreachBatch):
  1. signatures + banded buckets for the batch (same md5 pipeline as batch
     LSH — one signature aggregation over the batch's shingles);
  2. candidates = batch buckets ⋈ index on (band, bucket) — the ONLY join
     against state, equi-keyed so at scale it co-partitions with the
     index; its fan-out is bounded by index sparsity (see below), while
     the in-batch self-join gets the `max_bucket_size` cap (uncapped
     bucket ids cross batches — a chunk suffix would be computed from
     each batch's own population and never collide);
  3. verify on the minhash ESTIMATE: matching signature slots /
     num_perm >= threshold (no shingle storage; the standard
     streaming-scale tradeoff — estimate error falls as 1/sqrt(num_perm));
  4. in-batch novelty: batch-internal LSH pairs (same estimate) keep only
     the min-id representative of each in-batch near-dup group;
  5. accepted docs append their postings + signatures to state (MERGE —
     replay-idempotent: re-accepting the same doc rewrites the same keys).

Decisions are emitted per input doc: (doc_id, accepted, matched_id) where
matched_id (null when accepted) names an earlier member of the doc's
near-dup group — an indexed doc for history matches, or a smaller-id
batch mate for in-batch matches.  The witness may itself have been
rejected in favor of a yet-earlier member (witness CHAINS are not
resolved per batch — follow `matched_id` transitively, or use the batch
tier's `connected_components`, when the canonical representative is
needed).  Rejected docs are NOT indexed, so state grows with the UNIQUE
corpus, not the stream — which also keeps index buckets sparse: a hot
boilerplate cluster contributes ONE indexed representative, so the
state-probe join can't accumulate a quadratic bucket over time (the
in-batch side is additionally `max_bucket_size`-capped).

Replay contract: decisions are a pure function of (batch, state BEFORE
the batch) — the history probe masks the batch's own ids, so a
redelivered batch neither self-matches nor lets same-cluster
representatives reject each other — and the state merge re-writes the
same keys.  Replays therefore converge byte-identically (tested).

Reference parity: the reference has no dedup surface (its DWS module is
empty); this is an engine-level extension in the spirit of its keyed-state
jobs (DwdBaseLog.java ValueState first-seen pattern, generalized from
exact key equality to LSH similarity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import _cap_buckets, minhash_bands, minhash_signatures
from ..sinks.upsert import KeyedTable


class StreamingNearDup:
    """Ingestion-time near-dup filter over KeyedTable state."""

    def __init__(
        self,
        path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
        num_perm: int = 16,
        band_size: int = 4,
        threshold_num: int = 1,
        threshold_den: int = 2,
        max_bucket_size: int | None = 50,
    ):
        assert num_perm % band_size == 0
        self.id_col, self.text_col = id_col, text_col
        self.n, self.num_perm, self.band_size = n, num_perm, band_size
        self.threshold_num, self.threshold_den = threshold_num, threshold_den
        self.max_bucket_size = max_bucket_size
        self.index = KeyedTable(f"{path}/index", keys=["band", "bucket", "doc_id"])
        self.sigs = KeyedTable(f"{path}/sigs", keys=["doc_id"])

    # -- helpers ----------------------------------------------------------

    def _est_match(self, a_prefix: str, b_prefix: str):
        """est_jaccard >= num/den as exact integer arithmetic over
        matching signature slots: matches * den >= num * num_perm."""
        matches = sum(
            (F.col(f"{a_prefix}mh{i}") == F.col(f"{b_prefix}mh{i}")).cast("int")
            for i in range(self.num_perm)
        )
        return matches * self.threshold_den >= self.threshold_num * self.num_perm

    def _sig_cols(self, prefix: str = ""):
        return [F.col(f"mh{i}").alias(f"{prefix}mh{i}") for i in range(self.num_perm)]

    # -- the batch body ---------------------------------------------------

    def process_batch(self, batch: DataFrame, spark: SparkSession) -> DataFrame:
        """Returns the decision frame (doc_id, accepted, matched_id) and
        merges accepted docs into the state tables."""
        sig = minhash_signatures(
            batch, self.id_col, self.text_col, self.n, self.num_perm
        ).cache()
        # UNCAPPED bands for everything that crosses batches: capped
        # bucket ids carry a chunk suffix computed from the CURRENT
        # batch's population, so index entries written by one batch would
        # not collide with probes from another.  The index stays sparse
        # anyway (accepted uniques only — one representative per cluster),
        # which is what bounds the probe join; the cap below protects the
        # quadratic in-batch self-join, where hot clusters actually land.
        bands = minhash_bands(sig, self.num_perm, self.band_size).cache()
        bands_sj = (
            _cap_buckets(bands, self.max_bucket_size).cache()
            if self.max_bucket_size is not None
            else bands
        )

        # 1. against the ACCEPTED index: any estimated near-dup rejects
        idx = self.index.read(spark)
        if idx is not None:
            # Exclude ALL of the current batch's ids from the history
            # probe (not just self-matches): a redelivered batch finds its
            # own accepted docs in the index, and two same-cluster
            # representatives that the capped in-batch join let through
            # would otherwise reject EACH OTHER on replay — flipping a
            # previously-accepted decision.  With the batch's ids masked,
            # the probe sees exactly the pre-batch state, so decisions are
            # a pure function of (batch, state-before-batch).
            cand = (
                bands.join(idx.withColumnRenamed("doc_id", "old_id"), ["band", "bucket"])
                .join(
                    sig.select(F.col("doc_id").alias("old_id")),
                    "old_id",
                    "left_anti",
                )
                .select("doc_id", "old_id")
                .distinct()
            )
            old_sigs = self.sigs.read(spark).select(
                F.col("doc_id").alias("old_id"), *[F.col(f"mh{i}").alias(f"o_mh{i}") for i in range(self.num_perm)]
            )
            hist_matches = (
                cand.join(sig, "doc_id")
                .join(old_sigs, "old_id")
                .filter(self._est_match("", "o_"))
                .groupBy("doc_id")
                .agg(F.min("old_id").alias("hist_match"))
            )
        else:
            id_type = dict(batch.dtypes)[self.id_col]
            hist_matches = (
                sig.select("doc_id")
                .limit(0)
                .withColumn("hist_match", F.lit(None).cast(id_type))
            )

        # 2. in-batch novelty: min-id representative of each batch LSH group
        a = bands_sj.alias("a")
        b = bands_sj.alias("b")
        in_pairs = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
            .distinct()
            .join(sig.select(F.col("doc_id").alias("id_a"), *self._sig_cols("a_")), "id_a")
            .join(sig.select(F.col("doc_id").alias("id_b"), *self._sig_cols("b_")), "id_b")
            .filter(self._est_match("a_", "b_"))
        )
        # a doc loses to the smallest in-batch near-dup it collides with
        batch_matches = in_pairs.groupBy(F.col("id_b").alias("doc_id")).agg(
            F.min("id_a").alias("batch_match")
        )

        decisions = (
            sig.select("doc_id")
            .join(hist_matches, "doc_id", "left")
            .join(batch_matches, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("hist_match", "batch_match").alias("matched_id"),
            )
            .withColumn("accepted", F.col("matched_id").isNull().cast("int"))
            # eager localCheckpoint, not cache: (a) truncates lineage so
            # the returned frame cannot re-read index/sigs version dirs
            # that the merges below garbage-collect; (b) lets the
            # per-batch caches be released before the next micro-batch
            # instead of accumulating for the stream's lifetime
            .localCheckpoint(eager=True)
        )

        accepted = decisions.filter(F.col("accepted") == 1).select("doc_id")
        self.index.merge(spark, bands.join(accepted, "doc_id"))
        self.sigs.merge(spark, sig.join(accepted, "doc_id"))
        for df in (sig, bands, bands_sj):
            df.unpersist()
        return decisions

    def foreach_batch(self, decisions_sink: KeyedTable | None = None):
        def fn(batch: DataFrame, batch_id: int) -> None:
            out = self.process_batch(batch, batch.sparkSession)
            if decisions_sink is not None:
                decisions_sink.merge(batch.sparkSession, out)

        return fn
