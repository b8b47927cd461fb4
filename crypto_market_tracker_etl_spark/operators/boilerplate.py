"""Cross-corpus boilerplate removal — line-level dedup in the CCNet/
RefinedWeb style, as a reusable operator (the attested query
``queries_ext2.q_boilerplate_strip`` and the curation pipeline's optional
stage 0 both delegate here).

A *segment* recurring in ≥ ``min_docs`` distinct documents (nav bars,
cookie banners, licence footers) is dropped from every document and the
cleaned text is reassembled in original order. On newline-free corpora the
segment unit is a fixed ``seg_len``-token window of the (already
normalized) text; on real corpora pass a splitter that breaks on '\\n' and
the rest of the plan is unchanged.

Scale shape (same analysis as the query docstring): narrow per-doc
segmentation → md5-keyed frequency shuffle (fixed-width key, never the
text) → co-partitioned join (AQE broadcasts the frequency sliver when
small) → per-doc reassembly that rides the incoming doc_id partitioning.
Order is restored by an explicit pos sort, never by collect order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SEG_LEN = 4
DEFAULT_MIN_DOCS = 2


def segment_text(
    docs: DataFrame, text_col: str = "text", seg_len: int = DEFAULT_SEG_LEN
) -> DataFrame:
    """(doc_id, pos, seg): consecutive ``seg_len``-token windows of
    ``text_col`` (the final partial window is kept). ``text_col`` must
    already be whitespace-normalized — segmentation is token-positional."""
    tok = docs.select("doc_id", F.split(text_col, " ").alias("toks"))
    return tok.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, CAST(ceil(size(toks) / {seg_len}.0) "
                f"AS INT) - 1), i -> concat_ws(' ', "
                f"slice(toks, i * {seg_len} + 1, {seg_len})))"
            )
        ).alias("pos", "seg"),
    )


def boilerplate_table(
    docs: DataFrame,
    text_col: str = "text",
    seg_len: int = DEFAULT_SEG_LEN,
    min_docs: int = DEFAULT_MIN_DOCS,
) -> DataFrame:
    """(doc_id, n_segments, n_boilerplate, clean_text): strip segments
    whose distinct-document frequency reaches ``min_docs`` and reassemble
    the survivors in original order ('' if everything was boilerplate)."""
    segs = segment_text(docs, text_col, seg_len)
    hashed = segs.withColumn("h", F.md5(F.col("seg")))
    counts = hashed.groupBy("h").agg(F.count_distinct("doc_id").alias("df"))
    flagged = hashed.join(counts, "h").withColumn(
        "boiler", F.col("df") >= min_docs
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(F.col("boiler").cast("long")).alias("n_boilerplate"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("boiler"), F.struct("pos", "seg"))
                    )
                ),
                lambda s: s.seg,
            ),
        ).alias("clean_text"),
    )
