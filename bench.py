"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints the
result as JSON: a full-detail line first (also written to
BENCH_DETAIL.json), then a compact FINAL line
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec},
"iterative_total": ..., "sf": ...}.

The two-line protocol exists because the driver records only the last
~2000 bytes of stdout and parses the LAST line as JSON: round 3's single
line (48 queries + a spread_pct map) outgrew that capture and arrived
truncated (BENCH_r03.json "parsed": null). The final line is size-guarded
(< 1800 bytes — the per-query map is dropped from it, never the totals, if
a future query set outgrows the margin); the spread_pct / iterative detail
always lives on the first line and in BENCH_DETAIL.json.

Each query is forced end-to-end with a noop-format write (full computation,
no driver collect, no disk) after a shared warmup that triggers JVM/codegen
spin-up. Each query runs three times and reports the MINIMUM — the
steady-state plan execution time, insulated from GC pauses and co-tenant
load spikes (observed single-run variance on this box is ±30%) — plus the
per-query spread ((max−min)/min, "spread_pct") so the ledger can tell a
real regression from box noise.

Iterative queries (pagerank: 3 power steps over a 1.9 M-edge graph) are
carved out of the headline total into a separate "iterative" section —
one 5 s query inside a 31 s total would otherwise mask smaller single-pass
regressions. The headline "value" covers single-pass queries only; compare
"iterative" rows separately (BENCH_BASELINE.md keeps both histories).

The SWEEP section (r12, judge directive: "a plan regression on an attested
query must not be invisible to the ledger") times every OTHER registered
query once — no min-of-N, no warm repeats: coverage, not steady state. A
single-run number carries the full ±30% box noise, so the ledger treats
sweep moves as triage hints (re-run isolated before believing one), but a
10× plan regression — the failure class the sweep exists for — clears that
noise floor by an order of magnitude. Sweep rows live in BENCH_DETAIL.json
and the detail line; the size-guarded FINAL line carries only sweep_total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crypto_market_tracker_etl_spark.session import get_session  # noqa: E402
from crypto_market_tracker_etl_spark import queries as qmod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "latest_per_key",
    "dim_join",
    "asof_lookup",
    "pct_change_24h",
    "lag_change",
    "daily_ohlc",
    "series_align",
    "upsert_keep_latest",
    "tumbling_ohlc",
    "session_window",
    "asof_join",
    "topk_per_key",
    "kpis",
    "dedup_exact",
    "near_dup_pairs",
    "near_dup_pairs_fast",
    "simhash",
    "simhash_fast",
    "cosine_topk",
    "cosine_topk_filtered",
    "knn_lsh",
    "knn_ivf",
    "knn_pq",
    "knn_ivfpq",
    "knn_ivfadc",
    "semdedup",
    "embedding_near_dup",
    "text_quality",
    "doc_repetition",
    "dup_spans",
    "dsir_weights",
    "lm_perplexity",
    "lm_perplexity_kn",
    "ppl_buckets_approx",
    "quality_logit",
    "gram_novelty",
    "html_strip",
    "winnowing",
    "lang_id",
    "url_normalize",
    "link_graph",
    "c4_filters",
    "audio_meta",
    "mime_sniff",
    "video_meta",
    "image_ahash",
    "image_dhash",
    "ahash_near_dup",
    "dhash_near_dup",
    "epoch_shuffle",
    "vocab_stats",
    "tokenize_count",
    "bpe_tokenize",
    "bpe_tokenize_kernel",
    "bpe_tokenize_512",
    "dup_extents",
    "dedup_cut_spans",
    "dedup_keep_one_span",
    "k_anonymity_summary",
    "gopher_rules",
    "encoding_quality",
    "curation_pipeline",
    "curation_media_pipeline",
    "cms_heavy_hitters",
    "media_catalog",
    "image_meta",
    "bpe_bytes",
    "bpe_bytes_8k",
    "bpe_encode_ids",
    "bm25_topk",
    "collocations",
    "k_anonymity",
    "tfidf",
    "weighted_median",
    "udtf_spans",
    "hash_split",
    "domain_mix",
    "boilerplate_strip",
    "cdc_apply",
    "weighted_sample",
    "weighted_sample_stratified",
    "cluster_profile",
    "drift_report",
    "rrf_fusion",
    "contamination",
    "sequence_packing",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    "tpch_q7",
    "tpch_q13",
    "tpch_q18",
]

# multi-pass/iterative/enumeration-heavy queries: timed identically but
# totalled separately so the headline total stays sensitive to single-pass
# regressions (pagerank: 3 join+agg power steps; triangle_count: the wedge
# enumeration over the 1.2M-edge co-order graph — 1.9M triangles at sf0.1)
ITERATIVE = [
    "pagerank",
    "triangle_count",
    "setsim_join",
    # token-exact decontamination: the 140-shingle/doc stream is
    # enumeration-heavy by nature (SCALE.md §r11-ops), the setsim_join
    # masking rationale
    "contamination_ids",
]

RUNS = 3  # min-of-3 protocol (BENCH_BASELINE.md)

# Multimodal payload parsers whose wall-seconds scale with the SYNTH
# CORPUS BYTE VOLUME, not just parser cost (r10 ledger lesson: adding
# payload classes grew image_meta +137% while per-byte cost stayed
# flat). bench records each one's total payload megabytes so the ledger
# can normalize: a mover whose seconds-per-byte is flat is corpus
# growth, not a parser regression (tools/bench_diff.py bytes_norm).
PAYLOAD_QUERIES = [
    "audio_meta",
    "image_meta",
    "media_catalog",
    "mime_sniff",
    "video_meta",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def time_query(spark, registry, name) -> tuple[float, float]:
    """(min_sec, spread_pct) over RUNS runs. The reported time is the min
    of ALL runs; spread_pct is (max−min)/min over the WARM runs only (run 1
    pays plan compilation — including it would swamp the noise signal the
    ledger uses to tell a real regression from box variance)."""
    print(f"[bench] {name}", file=sys.stderr, flush=True)  # progress; the
    # driver's JSON contract covers STDOUT only — stderr is free
    samples = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        force(registry[name](spark, SF_DIR))
        samples.append(time.perf_counter() - t0)
    warm = samples[1:]
    spread = (max(warm) - min(warm)) / min(warm) * 100
    return round(min(samples), 3), round(spread, 1)


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # -Xlog:disable: the JVM's unified logging writes to STDOUT (observed:
    # GCLocker allocation warnings, sometimes after spark.stop()), and any
    # such line breaks the driver's one-JSON-line stdout contract.
    spark = get_session(
        app_name="bench",
        extra_conf={"spark.driver.extraJavaOptions": "-Xlog:disable"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = qmod.queries()
    # bench times the RAW xxhash64 fast pipelines (the portable-hash-tax
    # measurement vs near_dup_pairs/simhash); their registry twins wrap
    # the same pipelines in a differential within_tolerance oracle and
    # would double-count the portable side here
    from crypto_market_tracker_etl_spark.queries_ext import (
        near_dup_pairs_fast_raw,
        simhash_fast_raw,
    )

    registry = {
        **registry,
        "near_dup_pairs_fast": near_dup_pairs_fast_raw,
        "simhash_fast": simhash_fast_raw,
    }

    # warmup: spin up codegen/shuffle machinery on a small plan
    force(registry["kpis"](spark, SF_DIR))

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name in HEADLINE:
        timings[name], spreads[name] = time_query(spark, registry, name)
    iterative: dict[str, float] = {}
    for name in ITERATIVE:
        iterative[name], spreads[name] = time_query(spark, registry, name)

    # coverage sweep: ONE timed run of every registered query not in the
    # headline/iterative sets (the near_dup_pairs_fast/simhash_fast
    # registry twins run both the raw and portable pipelines for their
    # differential oracle — their raw cost is already the headline row,
    # so the sweep times the registry versions as registered)
    sweep: dict[str, float] = {}
    covered = set(HEADLINE) | set(ITERATIVE)
    for name in registry:
        if name in covered:
            continue
        print(f"[bench] sweep {name}", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        force(registry[name](spark, SF_DIR))
        sweep[name] = round(time.perf_counter() - t0, 3)

    # payload byte volume (outside the timing loop — one cheap aggregate
    # per multimodal query; every PAYLOAD_QUERY emits n_bytes)
    payload_mb: dict[str, float] = {}
    for name in PAYLOAD_QUERIES:
        if name in timings or name in iterative:
            from pyspark.sql import functions as F

            row = (
                registry[name](spark, SF_DIR)
                .agg(F.sum("n_bytes").alias("b"))
                .collect()[0]
            )
            payload_mb[name] = round((row["b"] or 0) / 1e6, 2)

    total = round(sum(timings.values()), 3)
    # stop FIRST: the JVM occasionally writes warnings (e.g. GCLocker) to
    # stdout, and an interleaved line after the JSON would break the
    # driver's last-line-is-JSON contract. After stop() nothing else prints.
    spark.stop()

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "iterative": iterative,
        "iterative_total": round(sum(iterative.values()), 3),
        "sweep": sweep,
        "sweep_total": round(sum(sweep.values()), 3),
        "spread_pct": spreads,
        "payload_mb": payload_mb,
        "sf": sf_val,
    }
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_DETAIL.json"), "w"
        ) as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass  # read-only checkout: the detail stdout line below still has it
    print(json.dumps(detail), flush=True)

    # FINAL line — the one the driver parses. Must fit the driver's ~2000-
    # byte stdout tail with margin. Graded guard: (1) full per-query map;
    # (2) if that outgrows the cap, the TOP-N by time (the regression-triage
    # set) plus an omitted count — the full map was already emitted above
    # and lives in BENCH_DETAIL.json; (3) only if even that overflows, drop
    # the map and keep the totals.
    line = _build_summary_line(
        total, timings, iterative, sf_val, round(sum(sweep.values()), 3)
    )
    print(line, flush=True)


SUMMARY_TOP = 40  # per-query entries the final line keeps under pressure

# r13 (verdict #8 — harden the final line against top-N eviction): when the
# size guard must trim the per-query map, it keeps a STABLE set — the
# previous driver round's final-line names (the basis of PERF's common-set
# comparison) PLUS the current top-SUMMARY_TOP by time — instead of the raw
# top-N. In r12 one contaminated newcomer (dim_join 28.66 s) evicted eight
# stable sub-second queries from the parsed window and shrank PERF's common
# set; with the pinned set a noisy newcomer can no longer push a
# previously-reported query out. Additions-only: nothing that would have
# been reported before is dropped (trimming under the byte cap sheds the
# smallest NON-pinned entries first, pinned entries only as a last resort).
PREV_SUMMARY = [
    # BENCH_r12.json parsed final-line names (r12 driver run)
    "dim_join", "asof_lookup", "gram_novelty", "media_catalog",
    "curation_media_pipeline", "latest_per_key", "near_dup_pairs",
    "near_dup_pairs_fast", "rrf_fusion", "curation_pipeline", "mime_sniff",
    "dedup_keep_one_span", "image_meta", "embedding_near_dup", "knn_lsh",
    "semdedup", "audio_meta", "video_meta", "bpe_bytes_8k", "collocations",
    "knn_pq", "knn_ivf", "lm_perplexity_kn", "tpch_q1", "contamination",
    "knn_ivfpq", "pct_change_24h", "ppl_buckets_approx", "tpch_q18",
    "sequence_packing", "cluster_profile", "cms_heavy_hitters",
    "ahash_near_dup", "bm25_topk", "knn_ivfadc", "bpe_bytes",
    "dedup_cut_spans", "dhash_near_dup", "tpch_q7", "lm_perplexity",
]


def _build_summary_line(
    total, timings, iterative, sf_val, sweep_total=None
) -> str:
    summary = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "iterative_total": round(sum(iterative.values()), 3),
        "sf": sf_val,
    }
    if sweep_total is not None:
        summary["sweep_total"] = sweep_total
    line = json.dumps(summary)
    if len(line) > 1800:
        pinned = [n for n in PREV_SUMMARY if n in timings]
        pinned_set = set(pinned)
        by_time = sorted(timings.items(), key=lambda kv: (-kv[1], kv[0]))
        fill = [k for k, _ in by_time if k not in pinned_set][:SUMMARY_TOP]
        # trim order under the byte cap: smallest non-pinned first, pinned
        # last (and within each tier smallest-time first) — the stable set
        # survives unless even it alone cannot fit
        fill_by_size = sorted(fill, key=lambda k: (timings[k], k))
        pinned_by_size = sorted(pinned, key=lambda k: (timings[k], k))
        keep = set(pinned) | set(fill)
        trim_queue = fill_by_size + pinned_by_size
        while trim_queue:
            kept = {
                k: round(v, 2) for k, v in by_time if k in keep
            }  # heaviest-first rendering, like the old top-N line
            summary["queries"] = kept
            summary["queries_omitted"] = len(timings) - len(kept)
            summary["detail"] = "BENCH_DETAIL.json"
            line = json.dumps(summary)
            if len(line) <= 1800:
                break
            keep.discard(trim_queue.pop(0))
    if len(line) > 1800:
        summary.pop("queries", None)
        summary["queries_omitted"] = len(timings)  # ALL dropped, not N-40
        line = json.dumps(summary)
    return line


if __name__ == "__main__":
    main()
