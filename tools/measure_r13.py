"""r13 optimization-round measurement harness.

For each named query: time (a) DataFrame construction, (b) analysis +
physical planning (executedPlan), (c) three noop-sink executions — so a
mover can be attributed to driver-side plan work vs cluster execution
before any code is touched (guide §1: measure first, and §7.3's
"driver doing single-threaded work" failure class shows up as a large
(b)). Optionally dumps explain('formatted') to plans/r13/<q>_<tag>.txt.

Usage:
  python tools/measure_r13.py q1 q2 ...            # measure only
  PLAN_TAG=before python tools/measure_r13.py q1   # + dump plans
  RUNS=5 python tools/measure_r13.py q1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_market_tracker_etl_spark.session import get_session  # noqa: E402
from crypto_market_tracker_etl_spark import queries as qmod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("RUNS", "3"))
PLAN_TAG = os.environ.get("PLAN_TAG", "")
PLAN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
)


def main() -> None:
    names = sys.argv[1:]
    spark = get_session(app_name="measure_r13")
    spark.sparkContext.setLogLevel("ERROR")
    registry = qmod.queries()
    if names == ["--all-headline"]:
        import bench

        names = bench.HEADLINE
    # warmup
    spark.sparkContext.setJobDescription("warmup")
    registry["kpis"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    out = {}
    for name in names:
        fn = registry[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()  # force analyze+optimize+plan
        t_plan = time.perf_counter() - t0
        runs = []
        for i in range(RUNS):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.perf_counter()
            # fresh build per run, like bench.time_query
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "build": round(t_build, 3),
            "plan": round(t_plan, 3),
            "runs": runs,
            "min": min(runs),
        }
        print(
            f"{name:32s} build={t_build:6.3f} plan={t_plan:6.3f} "
            f"runs={runs} min={min(runs):6.3f}",
            file=sys.stderr,
            flush=True,
        )
        if PLAN_TAG:
            os.makedirs(PLAN_DIR, exist_ok=True)
            plan_txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(PLAN_DIR, f"{name}_{PLAN_TAG}.txt"), "w"
            ) as f:
                f.write(plan_txt)
    spark.stop()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
