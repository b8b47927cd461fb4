"""Incremental (streaming) twin of the batch curation funnel.

``run_curation`` (curation_job.py) is a one-shot pass; a pipeline
ingesting document batches into a growing corpus must not re-curate from
scratch per trigger. This module is the ``foreachBatch`` form: each
micro-batch pays only batch-sized work, and the accumulated stores
resolve to EXACTLY the batch funnel's output — the stream≡batch equality
is asserted in tests/test_curation_stream.py.

Per-batch work (``process_batch`` — attachable via ``attach`` to any
Structured Streaming source):

1. quality gate (stateless — same expressions as run_curation);
2. within-batch exact dedup (lowest id per content fingerprint), then an
   APPEND of the gated batch to the corpus store — cross-batch exact
   dedup is resolved merge-on-read (min doc_id per fingerprint at
   ``clean()`` time), which is what makes the stream arrival-order-proof:
   a later batch can deliver a lower-id copy and still win, exactly as
   the batch funnel would have chosen it;
3. incremental MinHash signing + banded pair search against the
   accumulated index (operators/incremental_dedup.py — the union of
   per-batch pair outputs equals the from-scratch candidate set), pairs
   appended to a pair store.

``clean()`` derives the final survivor set from the stores: resolve
exact dedup (min id per fingerprint), restrict accumulated candidate
pairs to same-source exact-survivors (run_curation blocks LSH by source;
the incremental index is unblocked, so blocking is re-applied here),
verify with exact shingle Jaccard on just the candidate docs, cluster
with connected components, and keep the longest member per cluster (tie:
lowest id) — the SAME keep-best rule as run_curation, evaluated over the
same pair graph, hence the equality. ``funnel()`` reports cumulative
raw/quality counts across batches plus the store-resolved exact/clean
counts and the surviving token total (the budget signal tracked across
batches).

Scale shape: each batch is O(|batch| + collisions) — one fingerprint
projection, one anti-join probe into the signature store, one broadcast
band join; the stores are append-only LSM-style parquet (merge-on-read,
compactable). ``clean()`` touches the corpus store once and re-shingles
only candidate-pair docs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.textstats import lang_id, n_tokens, normalize_ws, quality_score
from ..operators.dedup import connected_components, ngram_jaccard
from ..operators.incremental_dedup import MinHashSignatureStore


class CurationStream:
    """Accumulating curation state: corpus store + signature store +
    candidate-pair store, fed one batch at a time."""

    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        quality_min: float = 0.0,
        jaccard_threshold: float = 0.5,
        num_hashes: int = 12,
        band_size: int = 4,
        portable: bool = True,
    ):
        self.spark = spark
        self.quality_min = quality_min
        self.jaccard_threshold = jaccard_threshold
        self.corpus_path = os.path.join(store_dir, "corpus")
        self.pairs_path = os.path.join(store_dir, "pairs")
        self.sigs = MinHashSignatureStore(
            spark,
            os.path.join(store_dir, "sigs"),
            num_hashes=num_hashes,
            band_size=band_size,
            portable=portable,
        )
        self._raw = 0
        self._quality = 0

    # ------------------------------------------------------------ ingest

    def process_batch(self, batch: DataFrame, batch_id: int | None = None) -> dict:
        """Curate one batch of (doc_id, source, text); returns per-batch
        counts. Safe to call directly or from foreachBatch."""
        t = F.col("text")
        stats = batch.select(
            "doc_id",
            "source",
            "text",
            quality_score(t).alias("quality"),
            lang_id(t).alias("lang"),
            n_tokens(t).alias("n_tok"),
            F.md5(normalize_ws(t)).alias("content_fp"),
        )
        gated = stats.filter(F.col("quality") >= F.lit(self.quality_min))
        # within-batch exact dedup; cross-batch resolution is merge-on-read
        w = Window.partitionBy("content_fp").orderBy("doc_id")
        batch_kept = (
            gated.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        n_raw = batch.count()
        n_gated = gated.count()
        self._raw += n_raw
        self._quality += n_gated
        batch_kept.write.mode("append").parquet(self.corpus_path)
        new_sigs = self.sigs.upsert_batch(batch_kept.select("doc_id", "text"))
        pairs = self.sigs.incremental_pairs(new_sigs)
        pairs.write.mode("append").parquet(self.pairs_path)
        return {"raw": n_raw, "quality": n_gated}

    def attach(self, stream: DataFrame, checkpoint: str, **opts):
        """Wire onto a streaming DataFrame: one process_batch per trigger."""
        return (
            stream.writeStream.foreachBatch(
                lambda df, bid: self.process_batch(df, bid) and None
            )
            .option("checkpointLocation", checkpoint)
            .options(**opts)
        )

    # ----------------------------------------------------- derived state

    def _corpus(self) -> DataFrame:
        return self.spark.read.parquet(self.corpus_path)

    def exact_survivors(self) -> DataFrame:
        """Cross-batch exact dedup, merge-on-read: min doc_id per
        content fingerprint — arrival-order-independent, so it matches
        the batch funnel's global choice."""
        c = self._corpus()
        w = Window.partitionBy("content_fp").orderBy("doc_id")
        return (
            c.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def clean(self) -> DataFrame:
        """The survivor set ≡ run_curation(union of batches).clean."""
        surv = self.exact_survivors()
        try:
            cand = self.spark.read.parquet(self.pairs_path).distinct()
        except Exception:  # no pairs written yet
            return surv
        meta = surv.select("doc_id", "source")
        cand = (
            cand.join(
                meta.select(
                    F.col("doc_id").alias("id_a"), F.col("source").alias("src_a")
                ),
                "id_a",
            )
            .join(
                meta.select(
                    F.col("doc_id").alias("id_b"), F.col("source").alias("src_b")
                ),
                "id_b",
            )
            .filter(F.col("src_a") == F.col("src_b"))  # re-apply blocking
            .select("id_a", "id_b")
        )
        # verify on candidate docs only: re-shingle just that subset
        from ..operators.dedup import minhash_signatures

        touched = (
            cand.select(F.col("id_a").alias("doc_id"))
            .union(cand.select("id_b"))
            .distinct()
        )
        cand_docs = surv.join(touched, "doc_id", "left_semi")
        sh = minhash_signatures(cand_docs.select("doc_id", "text"))
        nd = (
            ngram_jaccard(cand, sh)
            .filter(F.col("jaccard") >= self.jaccard_threshold)
            .select("id_a", "id_b")
        )
        comps = connected_components(nd)
        lens = surv.select(
            F.col("doc_id").alias("node"),
            F.length(normalize_ws(F.col("text"))).alias("len"),
        )
        best = (
            comps.join(lens, "node")
            .groupBy("component")
            .agg(
                F.max_by(
                    F.col("node"),
                    F.struct(F.col("len"), (-F.col("node")).alias("nn")),
                ).alias("keep")
            )
        )
        losers = (
            comps.join(F.broadcast(best), "component")
            .filter(F.col("node") != F.col("keep"))
            .select(F.col("node").alias("doc_id"))
        )
        return surv.join(F.broadcast(losers), "doc_id", "left_anti")

    def funnel(self) -> dict[str, int]:
        """Cumulative funnel across every processed batch: ingest counters
        plus the store-resolved exact/clean counts and surviving tokens
        (the cross-batch budget signal)."""
        clean = self.clean()
        row = clean.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).alias("tok"),
        ).collect()[0]
        return {
            "raw": self._raw,
            "quality": self._quality,
            "exact": self.exact_survivors().count(),
            "clean": int(row["n"]),
            "clean_tokens": int(row["tok"]),
        }
