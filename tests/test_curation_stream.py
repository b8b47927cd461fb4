"""Streaming twin of the curation funnel (plans/curation_stream.py):
the accumulated stores must resolve to EXACTLY the batch funnel's
survivor set, independent of arrival order, and the foreachBatch wiring
must produce the same state as direct process_batch calls."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_market_tracker_etl_spark.plans.curation_job import run_curation
from crypto_market_tracker_etl_spark.plans.curation_stream import CurationStream
from tests.test_curation_job import _corpus


def _clean_ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def test_curation_stream_equals_batch(spark, tmp_path):
    """Three batches — fed in an order where a LATER batch carries the
    lower-id exact copy winners (arrival-order stress for the
    merge-on-read exact dedup) — must resolve to the batch funnel's
    survivor set and funnel numbers."""
    corpus = _corpus(spark)
    batch_res = run_curation(spark, corpus)
    want_clean = _clean_ids(batch_res.clean)
    want_funnel = batch_res.funnel()

    cs = CurationStream(spark, str(tmp_path / "store"))
    # mod-3 split, fed HIGH remainder first: the +200000 exact copies of
    # a doc often land in an earlier batch than the original
    for rem in (2, 1, 0):
        cs.process_batch(corpus.filter(F.col("doc_id") % 3 == rem))

    assert _clean_ids(cs.clean()) == want_clean
    got = cs.funnel()
    assert got["raw"] == want_funnel["raw"]
    assert got["quality"] == want_funnel["quality"]
    assert got["exact"] == want_funnel["exact"]
    assert got["clean"] == want_funnel["clean"]
    # the cross-batch budget signal: surviving tokens = sum over clean
    want_tok = (
        batch_res.splits.agg(F.sum("n_tok").alias("t")).collect()[0]["t"]
    )
    assert got["clean_tokens"] == int(want_tok)


def test_curation_stream_foreachbatch_wiring(spark, tmp_path):
    """End-to-end through a real Structured Streaming source: a file
    stream with one input file per trigger, attached via
    CurationStream.attach, must leave the same store state (clean set)
    as direct process_batch calls."""
    corpus = _corpus(spark)
    src = tmp_path / "in"
    for rem in (0, 1, 2):
        corpus.filter(F.col("doc_id") % 3 == rem).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    cs = CurationStream(spark, str(tmp_path / "store"))
    stream = (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        cs.attach(stream, checkpoint=str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    want = _clean_ids(run_curation(spark, corpus).clean)
    assert _clean_ids(cs.clean()) == want
    # ingest counters accumulated across micro-batches
    f = cs.funnel()
    assert f["raw"] == corpus.count()
    assert f["clean"] == len(want)


def test_curation_stream_restart_and_retry_proof(spark, tmp_path):
    """The funnel ledger must survive a restart (a FRESH CurationStream
    on the same store_dir reports the same funnel — no in-memory
    counters) and an at-least-once foreachBatch RETRY (re-delivering a
    batch under the same batch_id re-appends the same ledger row, which
    the latest-per-key collapse makes idempotent; the signature store's
    content-fingerprint anti-join absorbs the re-signing)."""
    corpus = _corpus(spark)
    store = str(tmp_path / "store")
    cs = CurationStream(spark, store)
    batches = {
        bid: corpus.filter(F.col("doc_id") % 3 == bid) for bid in (0, 1, 2)
    }
    for bid, b in batches.items():
        cs.process_batch(b, batch_id=bid)
    before = cs.funnel()

    # restart: fresh object, same stores
    cs2 = CurationStream(spark, store)
    assert cs2.funnel() == before

    # retry: batch 1 re-delivered under its original batch_id
    cs2.process_batch(batches[1], batch_id=1)
    after = cs2.funnel()
    assert after == before
    assert _clean_ids(cs2.clean()) == _clean_ids(cs.clean())


def test_curation_stream_compaction_invariance(spark, tmp_path):
    """compact() (all four stores: signature fold, doc-unique corpus,
    distinct pairs, one ledger row per batch) must be invisible to every
    derived result — clean set and funnel identical across the fold,
    even when a prior retry left physical duplicates in the stores — and
    ingestion must keep working after it."""
    corpus = _corpus(spark)
    store = str(tmp_path / "store")
    cs = CurationStream(spark, store)
    b0 = corpus.filter(F.col("doc_id") % 3 == 0)
    b1 = corpus.filter(F.col("doc_id") % 3 == 1)
    b2 = corpus.filter(F.col("doc_id") % 3 == 2)
    cs.process_batch(b0, batch_id=0)
    cs.process_batch(b1, batch_id=1)
    cs.process_batch(b1, batch_id=1)  # retry: physical duplicates on disk
    before_clean = _clean_ids(cs.clean())
    before_funnel = cs.funnel()

    cs.compact()
    assert _clean_ids(cs.clean()) == before_clean
    assert cs.funnel() == before_funnel

    # the fold is an append like any other: ingestion continues
    cs.process_batch(b2, batch_id=2)
    want = _clean_ids(run_curation(spark, corpus).clean)
    assert _clean_ids(cs.clean()) == want


def test_curation_stream_swap_crash_recovery_and_recency(spark, tmp_path):
    """Compaction crash windows must self-heal, and a changed-content
    redelivery must win by recency:
    (a) crash after rename(live -> .old): readers restore the original;
    (b) crash after the stage write with the live dir already gone:
        readers promote the completed stage (_SUCCESS present);
    (c) doc redelivered with NEW text in a later batch: clean()/corpus
        carry the latest text even across a compaction."""
    import os
    import shutil

    corpus = _corpus(spark)
    store = str(tmp_path / "store")
    cs = CurationStream(spark, store)
    cs.process_batch(corpus.filter(F.col("doc_id") % 2 == 0), batch_id=0)
    cs.process_batch(corpus.filter(F.col("doc_id") % 2 == 1), batch_id=1)
    want_clean = _clean_ids(cs.clean())
    want_funnel = cs.funnel()

    # (a) mid-swap crash: live renamed aside, stage never promoted
    os.rename(cs.pairs_path, cs.pairs_path + ".old")
    assert _clean_ids(cs.clean()) == want_clean
    assert not os.path.isdir(cs.pairs_path + ".old")  # garbage swept

    # (b) stage completed, live gone: promote the stage
    shutil.copytree(cs.corpus_path, cs.corpus_path + ".compacting")
    shutil.rmtree(cs.corpus_path)
    assert cs.funnel() == want_funnel
    assert os.path.isdir(cs.corpus_path)

    # (c) recency: doc 42 redelivered with different text in a later batch
    new_text = "completely new content for the redelivered document " * 3
    redelivery = spark.createDataFrame(
        [(42, new_text, "s1")], "doc_id long, text string, source string"
    ).select("doc_id", "source", "text")
    cs.process_batch(redelivery, batch_id=2)
    got = {
        r.doc_id: r.text
        for r in cs.exact_survivors().filter(F.col("doc_id") == 42).collect()
    }
    assert got[42].startswith("completely new content")
    cs.compact()  # the fold must bake in the LATEST text, not a stale pick
    got2 = {
        r.doc_id: r.text
        for r in cs.exact_survivors().filter(F.col("doc_id") == 42).collect()
    }
    assert got2[42].startswith("completely new content")


def test_curation_stream_pair_emission_crash_recovery(spark, tmp_path):
    """Crash between the committed signature upsert and the pair append
    (the ADVICE r7 medium): the retry's (doc_id, content_fp) anti-join
    signs nothing, so the crashed batch's candidate pairs can only come
    from the pair-completeness recovery replaying the STORED sig batch.
    Without it, clean() silently keeps the crashed batch's near-dups.
    Both recovery paths are exercised: the in-process retry and a fresh
    CurationStream on the same stores (restart)."""
    corpus = _corpus(spark)
    want_clean = _clean_ids(run_curation(spark, corpus).clean)
    b0 = corpus.filter(F.col("doc_id") % 2 == 0)
    b1 = corpus.filter(F.col("doc_id") % 2 == 1)

    store = str(tmp_path / "store")
    cs = CurationStream(spark, store)
    cs.process_batch(b0, batch_id=0)

    # inject a crash AFTER upsert_batch commits sigs/batch=N, BEFORE the
    # pair append — the exact window the protocol exists for
    orig = cs.sigs.incremental_pairs

    def boom(new_sigs):
        raise RuntimeError("injected crash before pair append")

    cs.sigs.incremental_pairs = boom
    with pytest.raises(RuntimeError, match="injected crash"):
        cs.process_batch(b1, batch_id=1)
    cs.sigs.incremental_pairs = orig

    # sig batch committed but unmarked: recovery has pending work
    assert set(cs.sigs.committed_batches()) - cs._pairs_done()

    # at-least-once retry of the same batch: the anti-join re-signs
    # nothing, so correctness of clean() proves the recovery replay
    cs.process_batch(b1, batch_id=1)
    assert _clean_ids(cs.clean()) == want_clean
    f = cs.funnel()
    assert f["raw"] == corpus.count()
    assert f["clean"] == len(want_clean)

    # restart path: rebuild the crash state, then recover via __init__
    # of a FRESH object (no retry) — the corpus rows are on disk, so
    # clean() must still converge once the pairs are re-derived
    store2 = str(tmp_path / "store2")
    cs2 = CurationStream(spark, store2)
    cs2.process_batch(b0, batch_id=0)
    cs2.sigs.incremental_pairs = boom
    with pytest.raises(RuntimeError, match="injected crash"):
        cs2.process_batch(b1, batch_id=1)
    cs3 = CurationStream(spark, store2)  # __init__ runs _recover_pairs
    assert not (set(cs3.sigs.committed_batches()) - cs3._pairs_done())
    assert _clean_ids(cs3.clean()) == want_clean


def test_curation_stream_compact_crash_injection(spark, tmp_path):
    """compact()'s swap protocol claims ANY single-point crash is
    recoverable: simulate a kill at each of the three intermediate
    states — staged-written (staged + live), live-moved (staged + .old,
    live gone), staged-promoted (live collapsed + .old) — for each of
    the three folded stores, and assert clean()/funnel() invariance
    after readers run recovery."""
    import os

    from crypto_market_tracker_etl_spark.plans.curation_stream import (
        _latest_per_doc,
        _ledger_collapsed,
        _read_or_none,
    )

    corpus = _corpus(spark)
    store = str(tmp_path / "store")
    cs = CurationStream(spark, store)
    cs.process_batch(corpus.filter(F.col("doc_id") % 2 == 0), batch_id=0)
    cs.process_batch(corpus.filter(F.col("doc_id") % 2 == 1), batch_id=1)
    cs.process_batch(corpus.filter(F.col("doc_id") % 2 == 1), batch_id=1)  # retry
    want_clean = _clean_ids(cs.clean())
    want_funnel = cs.funnel()

    def collapsed(path):
        view = _read_or_none(spark, path)
        if path == cs.corpus_path:
            return _latest_per_doc(view)
        if path == cs.pairs_path:
            return view.distinct()
        return _ledger_collapsed(view)

    for path in (cs.corpus_path, cs.pairs_path, cs.ledger_path):
        for crash_point in ("staged-written", "live-moved", "staged-promoted"):
            staged, old = path + ".compacting", path + ".old"
            view = collapsed(path)
            if crash_point == "staged-written":
                # killed after the stage write: staged beside intact live
                view.write.mode("overwrite").parquet(staged)
            elif crash_point == "live-moved":
                # killed between the two renames: live set aside, stage
                # complete but not yet promoted
                view.write.mode("overwrite").parquet(staged)
                os.rename(path, old)
            else:
                # killed before the final rmtree: promoted live + .old
                view.write.mode("overwrite").parquet(staged)
                os.rename(path, old)
                os.rename(staged, path)
            assert _clean_ids(cs.clean()) == want_clean, (path, crash_point)
            assert cs.funnel() == want_funnel, (path, crash_point)
            # recovery left exactly one live dir, no residue
            assert os.path.isdir(path)
            assert not os.path.isdir(staged) and not os.path.isdir(old)
