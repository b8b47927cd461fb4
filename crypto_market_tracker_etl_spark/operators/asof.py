"""As-of (point-in-time) lookup and generalized as-of join.

The reference's only as-of computation is "price at the latest ts ≤ now−24h,
per asset", written as a max(ts) subquery + self-join (reference
``sql/views.sql:13-21``). Two forms here:

- ``asof_lookup``: the reference's constant-cutoff case — filter + one
  partial-aggregated shuffle (max_by). Linear, no join.
- ``asof_join``: the general per-row backward as-of join (Spark has no
  builtin). Implemented with the union + conditional last_value(ignore
  nulls) trick: tag right rows as quotes, union with left probes, and for
  each probe take the last quote value seen at or before it in (key, ts)
  order. ONE shuffle + sort, no range-explosion, no per-key collect —
  this is the scalable shape (pandas merge_asof semantics, distributed).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_lookup(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    cutoff: Column,
    values: Sequence[str],
) -> DataFrame:
    """Per key: the ``values`` of the latest row with ``ts_col <= cutoff``."""
    filtered = df.filter(F.col(ts_col) <= cutoff)
    aggs = [F.max_by(v, ts_col).alias(v) for v in values] + [
        F.max(ts_col).alias(f"{ts_col}_asof")
    ]
    return filtered.groupBy(*keys).agg(*aggs)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tolerance: Column | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: for each left row, the most recent right row
    with ``right.ts <= left.ts`` on the same key.

    Output = all left columns + ``<value>_asof`` columns (null when no prior
    right row exists, or when outside ``tolerance``).
    """
    keys = list(keys)
    # Quotes sort before probes at identical timestamps (side=0 < 1), so a
    # right row at exactly left.ts is visible to that probe.
    right_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(v).alias(f"{v}{suffix}") for v in value_cols],
    )
    left_tagged = left.select(
        *left.columns,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"{v}{suffix}") for v in value_cols],
    )
    unioned = left_tagged.unionByName(right_tagged, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned
    for v in value_cols:
        filled = filled.withColumn(
            f"{v}{suffix}", F.last(f"{v}{suffix}", ignorenulls=True).over(w)
        )
    if tolerance is not None:
        ts_w = F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True).over(w)
        filled = filled.withColumn("__quote_ts", ts_w)
        cond = F.col("__quote_ts") >= F.col("__ts") - tolerance
        for v in value_cols:
            filled = filled.withColumn(
                f"{v}{suffix}", F.when(cond, F.col(f"{v}{suffix}"))
            )
        filled = filled.drop("__quote_ts")
    return filled.filter(F.col("__side") == 1).drop("__ts", "__side")


def asof_join_directional(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    direction: str = "backward",
    suffix: str = "_asof",
) -> DataFrame:
    """``asof_join`` generalized to pandas-merge_asof's direction surface:

    - ``backward``: latest right row at-or-before the probe (the default
      everywhere else in this repo);
    - ``forward``: earliest right row at-or-after the probe — implemented
      as BACKWARD OVER REVERSED TIME (both timestamps negated), so it
      inherits the same single-shuffle union + running-last plan rather
      than a second implementation;
    - ``nearest``: both passes, then per probe keep the closer match
      (ties → the backward one, matching pandas). Two shuffles on the
      same keys instead of one — still no range explosion.

    Timestamps are negated as epoch µs longs (exact; no double rounding —
    the cast is monotonic, so ordering is preserved in any session tz).
    Probe rows must be unique (the standard as-of contract); duplicate
    probes would cross-multiply in the ``nearest`` recombination join.
    Output adds ``<v>_asof`` columns plus ``<right_ts>_asof`` (the matched
    quote time, null when no match exists in the given direction).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction}")
    left_ts_type = left.schema[left_ts].dataType.simpleString()

    def negated(df: DataFrame, ts: str) -> DataFrame:
        return df.withColumn(ts, -F.unix_micros(F.col(ts).cast("timestamp")))

    def run(backward: bool, sfx: str) -> DataFrame:
        r = right.select(*keys, right_ts, *value_cols).withColumn(
            f"__qts{sfx}", F.col(right_ts)
        )
        if backward:
            return asof_join(
                left, r, keys, left_ts, right_ts,
                [*value_cols, f"__qts{sfx}"], suffix=sfx,
            )
        ln = negated(left, left_ts)
        rn = negated(r, right_ts)
        out = asof_join(
            ln, rn, keys, left_ts, right_ts,
            [*value_cols, f"__qts{sfx}"], suffix=sfx,
        )
        # restore the probe timestamp; the matched quote ts rode along
        # un-negated inside __qts
        return out.withColumn(
            left_ts, F.timestamp_micros(-F.col(left_ts)).cast(left_ts_type)
        )

    if direction == "backward":
        out = run(True, suffix)
        return out.withColumnRenamed(f"__qts{suffix}{suffix}", f"{right_ts}{suffix}")
    if direction == "forward":
        out = run(False, suffix)
        return out.withColumnRenamed(f"__qts{suffix}{suffix}", f"{right_ts}{suffix}")
    b = run(True, "_b")
    f = run(False, "_f")
    join_cols = [*keys, left_ts, *[c for c in left.columns if c not in (*keys, left_ts)]]
    both = b.join(f, join_cols)
    lts = F.unix_micros(F.col(left_ts).cast("timestamp"))
    db = lts - F.unix_micros(F.col("__qts_b_b").cast("timestamp"))
    df_ = F.unix_micros(F.col("__qts_f_f").cast("timestamp")) - lts
    take_b = F.col("__qts_f_f").isNull() | (
        F.col("__qts_b_b").isNotNull() & (db <= df_)
    )
    sel = [F.col(c) for c in join_cols]
    for v in value_cols:
        sel.append(
            F.when(take_b, F.col(f"{v}_b")).otherwise(F.col(f"{v}_f")).alias(
                f"{v}{suffix}"
            )
        )
    sel.append(
        F.when(take_b, F.col("__qts_b_b"))
        .otherwise(F.col("__qts_f_f"))
        .alias(f"{right_ts}{suffix}")
    )
    return both.select(*sel)
