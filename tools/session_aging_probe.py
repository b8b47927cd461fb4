"""Controlled probe of the bench-session aging effect (r12 opt round).

Phase 1: run the known cache-leaking queries (near_dup_pairs,
near_dup_pairs_fast raw, setsim_join, embedding_near_dup, pagerank) 3×
each, like the bench does. Phase 2: time the victim queries
(tpch_q1, weighted_median, sequence_packing, bpe_encode_ids) min-of-3.
With CLEAR=1, spark.catalog.clearCache() after phase 1 — if the victims
speed up, CacheManager leakage is the aging mechanism; if not, look at
Python workers / GC instead. Prints persistent-RDD count either way.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_market_tracker_etl_spark.session import get_session  # noqa: E402
from crypto_market_tracker_etl_spark import queries as qmod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CLEAR = os.environ.get("CLEAR", "0") == "1"

LEAKERS = ["near_dup_pairs", "setsim_join", "embedding_near_dup", "pagerank"]
VICTIMS = ["tpch_q1", "weighted_median", "sequence_packing", "bpe_encode_ids"]


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_session(app_name="aging_probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = qmod.queries()
    from crypto_market_tracker_etl_spark.queries_ext import (
        near_dup_pairs_fast_raw,
    )

    registry = {**registry, "near_dup_pairs_fast": near_dup_pairs_fast_raw}
    force(registry["kpis"](spark, SF_DIR))
    for name in LEAKERS + ["near_dup_pairs_fast"]:
        for _ in range(3):
            force(registry[name](spark, SF_DIR))
        print(f"leaker {name} done", file=sys.stderr, flush=True)
    n_rdds = len(spark.sparkContext._jsc.getPersistentRDDs())
    print(f"persistent RDDs after leakers: {n_rdds}")
    if CLEAR:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        print("cache cleared")
    for name in VICTIMS:
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(registry[name](spark, SF_DIR))
            samples.append(round(time.perf_counter() - t0, 3))
        print(f"{name:20s} runs={samples} min={min(samples):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
