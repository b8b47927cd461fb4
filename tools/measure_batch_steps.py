"""Step-level timing inside CurationStream.process_batch (r12 opt):
mirrors the implementation with timers around each action so the ~11 s
steady-state batch cost can be attributed (stats agg / corpus write /
sig upsert / pair search / ledger)."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crypto_market_tracker_etl_spark.session import get_session  # noqa: E402
from crypto_market_tracker_etl_spark.queries_ext import (  # noqa: E402
    _augmented_corpus,
    _documents,
)
from crypto_market_tracker_etl_spark.functions.textstats import (  # noqa: E402
    lang_id,
    n_tokens,
    normalize_ws,
    quality_score,
)
from crypto_market_tracker_etl_spark.operators.dedup import exact_dedup  # noqa: E402
from crypto_market_tracker_etl_spark.plans.curation_stream import (  # noqa: E402
    CurationStream,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_session(app_name="measure_batch_steps")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = _augmented_corpus(spark, SF_DIR).unionByName(
        _documents(spark, SF_DIR).select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            "source",
            normalize_ws(F.col("text")).alias("text"),
        )
    )
    corpus.write.format("noop").mode("overwrite").save()  # warmup
    store = os.path.join(tempfile.gettempdir(), "measure_batch_steps")
    shutil.rmtree(store, ignore_errors=True)
    cs = CurationStream(spark, store)
    # two batches through the normal path to reach steady state
    for bid, rem in enumerate((2, 1)):
        t0 = time.perf_counter()
        cs.process_batch(corpus.filter(F.col("doc_id") % 3 == rem), batch_id=bid)
        print(f"batch{bid} full: {time.perf_counter() - t0:.2f}s")

    # third batch, step by step (mirrors process_batch)
    batch = corpus.filter(F.col("doc_id") % 3 == 0)
    marks = []

    def mark(label, t0):
        marks.append((label, time.perf_counter() - t0))

    t = F.col("text")
    t0 = time.perf_counter()
    stats = batch.select(
        "doc_id", "source", "text",
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang"),
        n_tokens(t).alias("n_tok"),
        F.md5(normalize_ws(t)).alias("content_fp"),
    ).persist()
    counts = stats.agg(
        F.count(F.lit(1)).alias("raw"),
        F.sum((F.col("quality") >= F.lit(0.0)).cast("long")).alias("quality"),
    ).collect()[0]
    mark("stats+agg", t0)
    gated = stats.filter(F.col("quality") >= F.lit(0.0))
    t0 = time.perf_counter()
    batch_kept = gated.join(
        exact_dedup(gated).select("doc_id"), "doc_id", "left_semi"
    ).persist()
    batch_kept.count()
    mark("exact_dedup+persist", t0)
    t0 = time.perf_counter()
    batch_kept.withColumn("bkey", F.lit(2)).write.mode("append").parquet(
        cs.corpus_path
    )
    mark("corpus write", t0)
    t0 = time.perf_counter()
    cs._recover_pairs()
    mark("recover_pairs", t0)
    t0 = time.perf_counter()
    pre = cs.sigs.read_or_none()
    if pre is not None:
        pre = pre.persist()
        pre.count()
    mark("store pre-read", t0)
    t0 = time.perf_counter()
    new_sigs = cs.sigs.upsert_batch(batch_kept.select("doc_id", "text"), known=pre)
    mark("upsert_batch(sign+write)", t0)
    t0 = time.perf_counter()
    pairs = cs.sigs.incremental_pairs(new_sigs, base=pre)
    pairs.write.mode("append").parquet(cs.pairs_path)
    cs._mark_pairs_done(cs.sigs.last_seq)
    mark("pairs+write", t0)
    if pre is not None:
        pre.unpersist()
    batch_kept.unpersist()
    stats.unpersist()
    t0 = time.perf_counter()
    spark.createDataFrame(
        [(2, int(counts["raw"]), int(counts["quality"] or 0))],
        "bkey long, raw long, quality long",
    ).write.mode("append").parquet(cs.ledger_path)
    mark("ledger write", t0)
    t0 = time.perf_counter()
    n = cs._store_file_count()
    mark(f"file_count({n})", t0)
    for label, sec in marks:
        print(f"{label:28s} {sec:7.3f}s")
    shutil.rmtree(store, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
