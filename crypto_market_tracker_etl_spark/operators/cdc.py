"""CDC changelog compaction: materialize a keyed table's final state from
an insert/update/delete op stream (the Debezium→table / Delta-CDF apply
step), with delete tombstones and resurrection.

Why this is its own operator and not just latest-per-key: the compacted
state is an **argmax by (ts, id) plus counters — a commutative monoid** —
so the batch window computation and the streaming per-key fold are exact
twins by construction: arrival order across micro-batches cannot change
the result (unlike an EWMA fold, which is order-sensitive). The streaming
twin lives in streaming/stateful.py::cdc_apply_stream and is pinned
bit-equal to this operator by test_cdc_stream_equals_batch.

Missing-data policy (mirrored batch/stream, same discipline as the drift
family): NULL-``ts`` rows are dropped — a changelog row without an event
time has no position in the op order, so folding it would make the result
depend on arrival order and break the twin contract.

Scale: ONE shuffle on the key serves both the row_number window and the
per-key aggregate (the window leaves the data hash-partitioned on the key,
and the aggregate reuses the window's sort — SortAggregate, no re-hash;
asserted in tests/test_plans.py::test_cdc_apply_single_shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdc_compact(
    df: DataFrame,
    key: str,
    ts_col: str,
    id_col: str,
    op_col: str,
    value: str,
) -> DataFrame:
    """Compact a changelog: per key the LAST op in (ts_col, id_col) order
    wins. ``op_col`` holds 'I'/'U'/'D'; a trailing 'D' tombstones the key
    (live=false, final_value/final_ts NULL — emitted rather than dropped,
    because a downstream MERGE needs the delete keys), any later I/U
    resurrects it. Output: key, n_ops, n_deletes, live, final_value,
    final_ts."""
    w = Window.partitionBy(key).orderBy(F.desc(ts_col), F.desc(id_col))
    ranked = (
        df.filter(F.col(ts_col).isNotNull())
        .select(key, ts_col, id_col, value, op_col)
        .withColumn("rn", F.row_number().over(w))
    )
    last = F.max(F.when(F.col("rn") == 1, F.col(op_col)))
    return (
        ranked.groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_ops"),
            F.sum((F.col(op_col) == "D").cast("long")).alias("n_deletes"),
            last.alias("_last_op"),
            F.max(F.when(F.col("rn") == 1, F.col(value))).alias("_lv"),
            F.max(F.when(F.col("rn") == 1, F.col(ts_col))).alias("_lt"),
        )
        .select(
            key,
            "n_ops",
            "n_deletes",
            (F.col("_last_op") != "D").alias("live"),
            F.when(F.col("_last_op") != "D", F.col("_lv")).alias("final_value"),
            F.when(F.col("_last_op") != "D", F.col("_lt")).alias("final_ts"),
        )
    )
