"""Full-session aging probe: run every headline query ONCE (1/3 of the
bench's work), snapshotting JVM heap / python worker count / shuffle-dir
size every 10 queries; then min-of-3 the victim queries, force GC +
clearCache, and min-of-3 them again. Separates 'accumulated state a GC
would reclaim' from 'permanent session degradation'."""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_market_tracker_etl_spark.session import get_session  # noqa: E402
from crypto_market_tracker_etl_spark import queries as qmod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
VICTIMS = ["tpch_q1", "weighted_median", "sequence_packing", "bpe_encode_ids"]


def force(df):
    df.write.format("noop").mode("overwrite").save()


def diag(spark, label):
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    used_mb = (rt.totalMemory() - rt.freeMemory()) / 1e6
    try:
        n_py = int(
            subprocess.run(
                ["pgrep", "-c", "-f", "pyspark.daemon"],
                capture_output=True, text=True,
            ).stdout.strip() or 0
        )
    except Exception:
        n_py = -1
    n_shuffle = len(glob.glob("/tmp/blockmgr-*/*/shuffle_*.data"))
    n_rdds = len(spark.sparkContext._jsc.getPersistentRDDs())
    print(
        f"[diag {label:24s}] heap={used_mb:7.0f}MB pydaemons={n_py} "
        f"shuffle_files={n_shuffle} cached_rdds={n_rdds}",
        flush=True,
    )


def time3(spark, registry, name):
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        force(registry[name](spark, SF_DIR))
        samples.append(round(time.perf_counter() - t0, 3))
    return samples


def main() -> None:
    import bench

    spark = get_session(app_name="aging_probe2")
    spark.sparkContext.setLogLevel("ERROR")
    registry = qmod.queries()
    from crypto_market_tracker_etl_spark.queries_ext import (
        near_dup_pairs_fast_raw,
        simhash_fast_raw,
    )

    registry = {
        **registry,
        "near_dup_pairs_fast": near_dup_pairs_fast_raw,
        "simhash_fast": simhash_fast_raw,
    }
    force(registry["kpis"](spark, SF_DIR))
    diag(spark, "start")
    t_start = time.perf_counter()
    for i, name in enumerate(bench.HEADLINE):
        if name in VICTIMS:
            continue
        t0 = time.perf_counter()
        force(registry[name](spark, SF_DIR))
        dt = time.perf_counter() - t0
        print(f"[{i:3d}] {name:28s} {dt:6.2f}s", file=sys.stderr, flush=True)
        if i % 10 == 9:
            diag(spark, f"after {i + 1} queries")
    print(f"headline single pass: {time.perf_counter() - t_start:.1f}s")
    diag(spark, "pre-victims")
    for name in VICTIMS:
        print(f"AGED   {name:20s} {time3(spark, registry, name)}")
    diag(spark, "post-victims")
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    time.sleep(3)
    diag(spark, "post-gc")
    for name in VICTIMS:
        print(f"POSTGC {name:20s} {time3(spark, registry, name)}")
    spark.stop()


if __name__ == "__main__":
    main()
