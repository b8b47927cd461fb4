"""Property tests for the round-6 text operators, beyond oracle parity:

- winnowing's PAPER guarantee (Schleimer et al. §2: any shared run of at
  least w + k - 1 tokens between two documents shares at least one
  selected fingerprint) exercised over many randomized planted pairs in
  ONE Spark job, plus the negative control (fully unique corpora share
  nothing);
- html_strip's entity-decode ordering ('&amp;lt;' must decode to '&lt;',
  never double-decode to '<') pinned against a hand-computed expected
  cleaning of a known document.
"""

from __future__ import annotations

import hashlib
import random
import re

import pandas as pd
import pytest

from crypto_market_tracker_etl_spark.queries_ext import (
    HTML_ENTITIES,
    HTML_MARKUP_TAIL,
    WIN_K,
    WIN_W,
    q_html_strip,
    q_winnowing,
)


def _write_docs(spark, path, texts):
    rows = [
        (i, t, "en", "synth", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_winnowing_shared_run_guarantee(spark, tmp_path):
    """40 doc pairs; pair (2i, 2i+1) shares a planted run of EXACTLY
    w + k - 1 words at a random position per doc (the guarantee's
    boundary case), every other word globally unique. Every doc must
    report shared_fp >= 1."""
    rng = random.Random(6)
    run_len = WIN_W + WIN_K - 1
    texts = []
    uid = 0
    for pair in range(40):
        run = [f"shared{pair}w{j}" for j in range(run_len)]
        for side in range(2):
            n_words = rng.randint(run_len, 40)
            pos = rng.randint(0, n_words - run_len)
            words = []
            for idx in range(n_words):
                if idx == pos:
                    words.extend(run)
                elif not (pos < idx < pos + run_len):
                    words.append(f"u{uid}x")
                    uid += 1
            texts.append(" ".join(words))
    _write_docs(spark, str(tmp_path), texts)
    out = q_winnowing(spark, str(tmp_path)).toPandas()
    assert len(out) == 80
    missing = out[out["shared_fp"] < 1]
    assert missing.empty, (
        f"guarantee violated for docs {missing['doc_id'].tolist()}"
    )


def test_winnowing_unique_corpus_shares_nothing(spark, tmp_path):
    """Negative control: globally unique token streams -> no shared
    fingerprints anywhere (the shared_frac signal carries no floor
    noise)."""
    texts = [
        " ".join(f"d{i}w{j}" for j in range(30)) for i in range(20)
    ]
    _write_docs(spark, str(tmp_path), texts)
    out = q_winnowing(spark, str(tmp_path)).toPandas()
    assert len(out) == 20
    assert (out["shared_fp"] == 0).all()
    assert (out["shared_frac"] == 0.0).all()


def _expected_clean(doc_id: int, text: str) -> str:
    markup = (
        f'<div class="doc"><h1>Doc {doc_id}</h1><p class="body">{text}'
        f' <a href="https://s{doc_id % 7}.example.org/doc/{doc_id}">link</a>'
        f"{HTML_MARKUP_TAIL}"
    )
    clean = re.sub(r"<[^>]+>", " ", markup)
    for ent, ch in HTML_ENTITIES:
        clean = clean.replace(ent, ch)
    return re.sub(r"\s+", " ", clean.strip())


def test_html_strip_no_double_decode(spark, tmp_path):
    """'&amp;lt;' in a document must surface as '&lt;' (one decode step),
    and real tags inside the text must strip — pinned by recomputing the
    exact expected cleaning in Python and matching the query's md5."""
    text = "keep &amp;lt;b&amp;gt; literal but strip <i>these tags</i> now"
    _write_docs(spark, str(tmp_path), [text])
    row = q_html_strip(spark, str(tmp_path)).toPandas().iloc[0]
    expected = _expected_clean(0, text)
    assert "&lt;b&gt;" in expected and "<b>" not in expected
    assert "<i>" not in expected and "these tags" in expected
    assert row["clean_fp"] == hashlib.md5(expected.encode()).hexdigest()
    assert row["clean_len"] == len(expected)
    # the planted anchor plus the two tags the text itself carries
    assert row["n_links"] == 1
    assert row["link_host"] == "s0.example.org"
