"""End-to-end curation pipeline (plans/curation_job.py): funnel
monotonicity, stage-level invariants recomputed independently, keep-best
semantics, split partitioning, packing accounting, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_market_tracker_etl_spark.catalog import load_table
from crypto_market_tracker_etl_spark.functions.textstats import normalize_ws
from crypto_market_tracker_etl_spark.plans.curation_job import run_curation
from tests.conftest import SF_DIR

CAP = 256


def _corpus(spark):
    """documents ∪ exact copies (id+200000) ∪ near-dup copies (id+100000,
    first two words dropped) — the corpus that exercises every funnel
    stage."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    )
    near = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        "source",
        F.concat_ws(
            " ",
            F.expr(
                "slice(split(text, ' '), 3, greatest(size(split(text, ' ')) - 2, 0))"
            ),
        ).alias("text"),
    )
    exact = docs.select(
        (F.col("doc_id") + 200000).alias("doc_id"), "source", "text"
    )
    return docs.unionByName(near).unionByName(exact).repartition(8, "doc_id")


def test_curation_funnel_and_invariants(spark):
    corpus = _corpus(spark)
    res = run_curation(spark, corpus, capacity=CAP)
    f = res.funnel()
    # monotone funnel, and both dedup stages actually removed something
    assert f["raw"] >= f["quality"] >= f["exact"] > 0
    assert f["exact"] < f["quality"], "exact copies must collapse"
    assert f["clean"] < f["exact"], "near-dups must collapse"

    # no two clean docs share normalized content
    clean = res.clean
    n_distinct = clean.select(
        normalize_ws(F.col("text")).alias("t")
    ).distinct().count()
    assert n_distinct == f["clean"]

    # keep-best: for every surviving doc of an (orig, mutated) near-dup
    # pair where the mutated twin was dropped, the survivor is the longer
    # text — spot-check: no mutated copy (id in [100000, 200000)) may
    # survive while its original (id-100000) was dropped, because the
    # original is strictly longer and the keep rule is longest-first
    kept = {r.doc_id for r in clean.select("doc_id").collect()}
    originals_dropped = {
        d - 100000
        for d in kept
        if 100000 <= d < 200000 and (d - 100000) not in kept
    }
    # any such case would mean the SHORTER mutated copy won — forbidden
    assert not originals_dropped, originals_dropped

    # splits partition clean exactly
    split_counts = dict(
        (r.split, r.n)
        for r in res.splits.groupBy("split").agg(F.count("*").alias("n")).collect()
    )
    assert sum(split_counts.values()) == f["clean"]
    assert split_counts.get("train", 0) > split_counts.get(
        "valid", 0
    ) and split_counts.get("train", 0) > split_counts.get("test", 0)

    # packing accounting: pack tokens sum to clean tokens; each pack
    # over-fills by at most one document (the documented one-pass trade)
    packs = res.packs.collect()
    total_tokens = res.splits.agg(F.sum("n_tok")).collect()[0][0]
    assert sum(r.tokens for r in packs) == total_tokens
    max_doc = res.splits.agg(F.max("n_tok")).collect()[0][0]
    for r in packs:
        assert r.tokens <= CAP + max_doc, r
        assert r.n_docs >= 1


def test_curation_is_deterministic(spark):
    corpus = _corpus(spark)
    f1 = run_curation(spark, corpus, capacity=CAP).funnel()
    f2 = run_curation(spark, corpus, capacity=CAP).funnel()
    assert f1 == f2


def test_boilerplate_reassembly_identity(spark):
    """With min_docs above any possible document frequency, NOTHING is
    boilerplate — so clean_text must equal the normalized input exactly.
    This pins the order-restoration path (pos-sorted reassembly) against
    the whole real corpus, not a toy example."""
    from crypto_market_tracker_etl_spark.operators.boilerplate import (
        boilerplate_table,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", normalize_ws(F.col("text")).alias("text")
    )
    out = boilerplate_table(docs, min_docs=10**9)
    joined = docs.join(out, "doc_id")
    assert joined.count() == docs.count()
    assert joined.filter(F.col("n_boilerplate") != 0).count() == 0
    assert joined.filter(F.col("clean_text") != F.col("text")).count() == 0


def test_curation_with_boilerplate_stage(spark):
    """Stage 0 strips before scoring: with exact copies in the corpus every
    segment of a copied doc recurs (df >= 2), so stripped docs lose text
    relative to the no-stage run, and the funnel still holds."""
    from crypto_market_tracker_etl_spark.operators.boilerplate import (
        boilerplate_table,
    )

    corpus = _corpus(spark)
    res = run_curation(
        spark, corpus, quality_min=0.3, capacity=CAP, boilerplate_min_docs=2
    )
    funnel = res.funnel()
    assert funnel["raw"] >= funnel["quality"] >= funnel["exact"] >= funnel["clean"]
    # the stage is the operator, not a reimplementation: stats.text must
    # equal boilerplate_table's clean_text on the same normalized corpus
    normed = corpus.select(
        "doc_id", "source", normalize_ws(F.col("text")).alias("text")
    )
    expect = boilerplate_table(normed, min_docs=2).select(
        "doc_id", F.col("clean_text").alias("expect")
    )
    diff = (
        res.stats.select("doc_id", "text")
        .join(expect, "doc_id")
        .filter(F.col("text") != F.col("expect"))
    )
    assert diff.count() == 0
    # exact copies make every original+copy segment recur: those docs are
    # stripped to empty and cannot pass a positive quality gate
    assert funnel["quality"] < funnel["raw"]


def test_curation_funnel_is_single_pass(spark):
    """The r6 funnel ran four standalone corpus .count() scans; the funnel
    is now ONE dedicated flag-aggregation action — zero DataFrame.count()
    calls on corpus-shaped frames inside run_curation (the only remaining
    counts are connected_components' limit(1) convergence probes on the
    small node/component label table). The four numbers must still equal
    the independently recomputed stage counts."""
    from unittest import mock

    corpus = _corpus(spark)
    cls = type(corpus)  # the concrete (classic) DataFrame class
    real_count = cls.count
    corpus_counts = []

    def counting(self):
        if "text" in self.columns:
            corpus_counts.append(self.columns)
        return real_count(self)

    with mock.patch.object(cls, "count", counting):
        res = run_curation(spark, corpus, capacity=CAP)
        f = res.funnel()
    assert corpus_counts == [], corpus_counts
    assert f["raw"] >= f["quality"] >= f["exact"] >= f["clean"] > 0
    # ground truth: the flag aggregation must equal the real stage counts
    assert f["raw"] == corpus.count()
    assert f["clean"] == res.clean.count()
