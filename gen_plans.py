"""Regenerate PLANS.md: formatted physical plans of representative queries
with the scale-relevant shape called out. Run: python gen_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

# query -> what to look at in its plan
SHOWCASE = {
    "latest_per_key": (
        "One Exchange total; WindowGroupLimit(Partial) runs per-map-partition "
        "top-1 BEFORE the shuffle, so one row per key per partition moves."
    ),
    "dim_join": (
        "Every dimension side is a BroadcastExchange; the fact never "
        "shuffles for a join."
    ),
    "tpch_q6": (
        "All three predicates in PushedFilters at the parquet scan; no join; "
        "the only exchange gathers the 1-row final aggregate."
    ),
    "near_dup_pairs": (
        "Banded LSH: signatures computed once (InMemoryTableScan), pairs come "
        "from a band-key equi-join (hashpartitioning on band_key), Jaccard "
        "verification only on candidates."
    ),
    "knn_ivf": (
        "Corpus assignment is expression-only (no exchange before the list "
        "equi-join); queries broadcast; per-query top-k is a window rank, "
        "not a global sort."
    ),
    "tpch_q18": (
        "HAVING-sum sliver (ObjectHashAggregate on l_orderkey, filter "
        "total_qty>300) BROADCASTS into orders — lineitem scanned once, "
        "top-100 is TakeOrderedAndProject, never a range sort."
    ),
    "ewma": (
        "Sequential recurrence as one grouped fold: partial collect_list "
        "before the single Exchange, the multiply-add fold runs in the "
        "final Project — no window, no second shuffle, no Python."
    ),
    "chunk_docs": (
        "Narrow map end-to-end: the only exchange is the explicit "
        "CPU-spreading input repartition (REPARTITION_BY_NUM)."
    ),
    "weighted_sample": (
        "Weighted sampling as a pure hash-priority expression + "
        "TakeOrderedAndProject: per-partition top-K then driver merge of "
        "K-row slivers — the unselected mass is never shuffled, and the "
        "selection is a deterministic function of the key (backfill-stable)."
    ),
    "cluster_profile": (
        "Centroid assignment is expression-only (array_min over k scored "
        "structs): a narrow scan feeds the k-row aggregate; the only "
        "exchange is the final partial→final agg on cluster_id."
    ),
    "drift_report": (
        "Two broadcast 1-row anchors (value range, time midpoint); binning "
        "and period assignment are pure expressions; one ≤ types·10-group "
        "partial-agg shuffle; TVD/chi²/KS computed over that sliver with "
        "DECIMAL-exact accumulation."
    ),
    "knn_ivfpq": (
        "Fused Arrow ADC scan: ONE MapInPandas pass encodes each corpus "
        "batch, probe-filters it, scores all queries via int64 table "
        "gathers, and emits only per-partition top-R partials — the "
        "|corpus|×|Q| pair relation never exists in the plan. The windows "
        "see an R·|Q|·partitions sliver; re-rank broadcasts the bounded "
        "shortlist back into the corpus scan (point lookups, no shuffle)."
    ),
    "domain_mix": (
        "The |sources|-row mixing schedule is computed once (eager "
        "localCheckpoint — without it the counts subtree re-runs per "
        "consumer) and BROADCASTS into both the selection scan and the "
        "output join; the accept test is pure integer arithmetic so the "
        "corpus pass is a narrow scan + 3-group count."
    ),
    "hash_split": (
        "One narrow scan; split assignment is a seeded md5 expression "
        "(rerun-stable, engine-portable); the only exchange carries the "
        "3-group partial aggregate."
    ),
    "boilerplate_strip": (
        "Segment-frequency count keyed on md5(seg) — fixed-width shuffle "
        "key, never the text; AQE broadcasts the frequency sliver at this "
        "SF (co-partitioned shuffle join at corpus scale); the per-doc "
        "reassembly aggregate rides the doc_id partitioning — no exchange "
        "after the join."
    ),
    "cdc_apply": (
        "ONE exchange serves the row_number window AND the per-key "
        "aggregate (SortAggregate reuses the window's sort); tombstone "
        "semantics are pure projections on top."
    ),
    "cosine_topk_filtered": (
        "The label predicate pushes into the corpus parquet scan "
        "(PushedFilters) BEFORE any scoring — pre-filter semantics; "
        "queries broadcast, per-query top-k is a window rank."
    ),
    "weighted_median": (
        "GROUPED_AGG pandas UDF: Arrow ships each of the 4 bounded "
        "groups as one batch (no partial aggregation — the documented "
        "reason this surface is reserved for order statistics)."
    ),
    "udtf_spans": (
        "Python UDTF via LATERAL: BatchEvalPythonUDTF over a narrow "
        "pushed-filter scan; one input row fans out to its spans with "
        "no join or shuffle."
    ),
    "lm_perplexity": (
        "CCNet LM filter: transitions pre-aggregated to (doc, w1, w2) "
        "grain, then the bigram/context model tables (aggregates of that "
        "same grain) join back on their own keys; the vocabulary size is "
        "a broadcast 1-row anchor. The corpus explodes exactly once per "
        "model arm and never re-shuffles for the model."
    ),
    "quality_logit": (
        "Classifier quality filter: scan -> corpus-spread Exchange -> ONE "
        "Project carrying the whole feature extraction + dot product + "
        "threshold. Zero joins, zero generators -- 100 TB of raw text "
        "scores at scan speed."
    ),
    "winnowing": (
        "MOSS fingerprinting: gram hashes posexplode to rows and the "
        "window minimum is min() OVER a row frame riding the doc_id "
        "partitioning -- the array-slice-inside-transform formulation "
        "fell off codegen (interpreted nested HOFs re-evaluate the gram "
        "array per window: minutes at 5k docs, caught by the bench "
        "loop). Cross-doc matching joins the fingerprint grain to an "
        "fp-keyed aggregate; no doc-pair relation exists."
    ),
    "curation_pipeline": (
        "End-to-end funnel in ONE dataflow: every per-doc feature "
        "(language hits, quality logit, fingerprint, token count) in the "
        "scan projection; the only data-sized exchange is the fp hash for "
        "dedup ranking; the token-budget anchor joins via "
        "BroadcastNestedLoopJoin; runtime ReusedExchange collapses the "
        "anchor's duplicate lineage."
    ),
    "cms_heavy_hitters": (
        "Count-min sketch: partial map-side counters over a key space "
        "capped at D*W=4096 regardless of vocabulary size, then the "
        "bounded sketch BROADCASTS to the 20-row candidate probe -- "
        "constant sketch state, no SortMergeJoin anywhere."
    ),
    "vocab_stats": (
        "Zipf fit stays bounded: TakeOrderedAndProject(1000) selects the "
        "frequency head (never a vocabulary-wide rangepartitioning sort); "
        "corpus moments are a pure partial-agg reduction; the two 1-row "
        "results meet in a broadcast cross join."
    ),
    "tokenize_count": (
        "The top-512 vocabulary is bounded by construction "
        "(TakeOrderedAndProject) so the words-vocab join always "
        "broadcasts; (doc, word, count) grain and the per-doc rollup both "
        "ride the doc_id partitioning."
    ),
    "video_meta": (
        "Three Projects on purpose: payload synthesis AND the "
        "moov-anchored mvhd locate are alias barriers CollapseProject "
        "must not inline (SCALE.md planning-cost lesson); the ISO-BMFF "
        "box parse itself is expression-only, zero shuffles."
    ),
    "triangle_count": (
        "Degree-oriented triangle enumeration: rank = deg*2^32 + id "
        "packed into one BIGINT, wedges generated only at each edge's "
        "low-rank endpoint (fan-out bounded by arboricity), closure via "
        "one pair-keyed equi-join; the clustering denominator is a "
        "degree aggregate, never an enumeration."
    ),
    "setsim_join": (
        "PPJoin prefix filtering: per-doc rarity-ordered prefixes (a "
        "window riding the doc grain -- no global rank) bound candidate "
        "generation to rare-shingle postings; exact overlap verify joins "
        "only candidate pairs; the brute-force DuckDB oracle makes hash "
        "parity a differential proof of zero false negatives."
    ),
    "dedup_keep_one_span": (
        "Keep-one span dedup: the canonical pick is a hash-keyed "
        "min-struct HashAggregate (partial_min combines map-side) joined "
        "back on h -- deliberately NOT a per-hash window, which would "
        "single-task hot boilerplate hashes; two per-doc islands windows "
        "ride the (doc, pos) grain; the cut is an expression filter with "
        "exists() probes against the doc's own cut/shield arrays. No "
        "doc-pair relation anywhere."
    ),
    "bpe_tokenize_kernel": (
        "The Arrow BPE path: ONE ArrowEvalPython node on the "
        "distinct-word grain regardless of merge-table size (the "
        "expression cascade's plan is linear in it and dies past ~128 "
        "merges -- SCALE.md bpe-ceiling); counts join back on the word "
        "key and combine map-side (partial_sum)."
    ),
    "gopher_rules": (
        "The Gopher document-rule battery is one expression projection "
        "over the token array: a single Exchange (the corpus spread), no "
        "join, no aggregate, no window, no Python -- quality gating at "
        "scan speed."
    ),
    "bpe_bytes": (
        "Byte-level BPE over GPT-2-class pretokens: ONE JVM "
        "regexp_extract_all + explode to the (doc, pretoken) grain, the "
        "Arrow kernel (ArrowEvalPython) ONLY on the distinct-pretoken "
        "grain, counts join back on the pretoken key and combine "
        "map-side -- the r8 kernel economics carried to the "
        "production-fidelity byte alphabet."
    ),
    "bpe_bytes_8k": (
        "The SAME plan shape as bpe_bytes under the 8192-merge "
        "production-size table: still exactly ONE ArrowEvalPython node "
        "on the distinct-pretoken grain -- table size changes the "
        "kernel's Python-side dict, never the plan (the jump walk keeps "
        "per-word cost flat too, SCALE.md \u00a7bpe-8k)."
    ),
    "image_meta": (
        "Six image format families (PNG, GIF, JPEG, 3-variant WebP "
        "incl. the r10 VP8X-wrapped chunk walk, both-endian multi-IFD "
        "TIFF, both-layout BMP), zero shuffles beyond the corpus "
        "spread: the JPEG SOF walk, the TIFF IFD walk, and the VP8X "
        "chunk walk are each staged ONCE behind an alias barrier (HOFs "
        "are exempt from subexpression elimination), "
        "WebP-first-chunk/PNG/GIF/BMP are fixed-offset expressions; "
        "blobs never enter Python."
    ),
    "media_catalog": (
        "The 17-format router + all three modality parsers fused into "
        "one codegen'd projection: sniff dispatch, the three bounded "
        "walks, the audio aggregate and the mvhd locate staged as "
        "columns, union schema per blob; zero joins, zero Python."
    ),
}


def main() -> None:
    from crypto_market_tracker_etl_spark.session import get_session
    import __spark_entry__ as entrymod

    spark = get_session(app_name="gen-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out = [
        "# PLANS — physical-plan showcase",
        "",
        "Generated by `python gen_plans.py` (sf0.001 inputs; plan shapes are",
        "size-independent before AQE). The same properties are asserted as",
        "regression tests in `tests/test_plans.py`; this file is the",
        "human-readable tour.",
        "",
    ]
    for name, note in SHOWCASE.items():
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        # keep the operator tree, drop the verbose per-node detail section
        tree = plan.split("\n\n")[0]
        out += [f"## {name}", "", note, "", "```", tree, "```", ""]
    with open("PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
