"""Percent-change and lag-based change operators.

Re-expresses the reference's ``v_price_change_24h`` view (reference
``sql/views.sql:10-28``): latest value per key LEFT JOIN value-as-of
(cutoff), null-guarded pct change rounded to 4 (reference
``sql/views.sql:23-25``). Plus the idiomatic window alternative ``lag``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .asof import asof_lookup
from .latest import latest_per_key_agg


def pct_change_expr(now: Column, then: Column, scale: int = 4) -> Column:
    """Null-guarded ``round((now-then)/then*100, scale)`` (reference
    ``sql/views.sql:23-25``); null when either side is missing or then=0."""
    return F.when(
        then.isNotNull() & (then != F.lit(0.0)) & now.isNotNull(),
        F.round((now - then) / then * F.lit(100.0), scale),
    )


def change_vs_asof(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value: str,
    cutoff: Column,
    order: Sequence[str | Column] | None = None,
    carry: Sequence[str] = (),
) -> DataFrame:
    """Latest value per key vs value as-of ``cutoff``, with pct change.

    Both sides are partial-aggregated (max_by) before a small key-level
    join — at scale this joins |keys| rows, not |fact| rows.

    ``carry``: additional columns taken from the LATEST row per key and
    passed through unrenamed — e.g. the market_cap the reference's
    ``v_price_change_24h`` orders by (``sql/views.sql:28`` ends
    ``order by l.market_cap desc nulls last``, and ``l`` is the latest
    row) — rides the same max_by aggregate, no extra shuffle.
    """
    order = list(order or [ts_col])
    latest = latest_per_key_agg(
        df, keys, order, [value, *carry]
    ).withColumnRenamed(value, f"{value}_now")
    asof = asof_lookup(df, keys, ts_col, cutoff, [value]).select(
        *keys, F.col(value).alias(f"{value}_then")
    )
    joined = latest.join(asof, list(keys), "left")
    return joined.withColumn(
        "pct_change",
        pct_change_expr(F.col(f"{value}_now"), F.col(f"{value}_then")),
    )


def lag_change(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str | Column],
    value: str,
) -> DataFrame:
    """Per-row delta and pct change vs the previous row in (keys, order).

    Adds ``prev_value`` / ``delta`` / ``pct_change`` columns; all source
    columns are preserved.
    """
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order]
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn("prev_value", F.lag(value).over(w))
        .withColumn("delta", F.col(value) - F.col("prev_value"))
        .withColumn("pct_change", pct_change_expr(F.col(value), F.col("prev_value")))
    )


def ewma_last(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alpha: float = 0.25,
) -> DataFrame:
    """Final exponentially-weighted moving average per key:
    ``s_i = alpha*x_i + (1-alpha)*s_{i-1}``, seeded with the first value.

    EWMA is inherently sequential — no window frame expresses it — but the
    per-key FOLD does: collect the key's values in total order, then
    ``aggregate`` left-to-right. One shuffle (the groupBy), JVM-side
    throughout, state is one double per key.

    Scale bound — BATCH vs STREAMING split: this batch fold materializes
    each key's FULL value list in one aggregate buffer, so a key's
    history must fit in a row (~millions of doubles — fine for bounded
    per-key history like the reference's per-asset daily series). For
    unbounded per-key history, use the streaming twin
    ``streaming.stateful.ewma_stream`` (applyInPandasWithState): state is
    2 numbers per key regardless of history length, and it is
    pytest-pinned bit-equal to this fold on the same ordered input
    (test_ewma_stream_matches_batch_fold). SCALE.md §ewma records both.

    The closed form (sum of alpha*(1-alpha)^k terms) is deliberately NOT
    used: pow() evaluation order differs across engines/LLVM builds, while
    the fold performs the identical IEEE multiply-add sequence everywhere
    — results are bit-reproducible, not just approximately equal.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    beta = 1.0 - alpha
    ordered = F.sort_array(
        F.collect_list(F.struct(*order_cols, value_col))
    )
    vals = F.transform(ordered, lambda s: s.getField(value_col))
    folded = F.aggregate(
        F.slice(vals, F.lit(2), F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(alpha) * x + F.lit(beta) * acc,
    )
    return df.groupBy(*key_cols).agg(folded.alias("ewma"))
