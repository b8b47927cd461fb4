"""OHLC (open/high/low/close) bucketed aggregation.

The reference computes daily OHLC in driver Python over an API-ordered list
(reference ``src/etl.py:46-54``) with two quirks we deliberately generalize
away (documented divergence, SURVEY.md §3.1): it stamps every fetched point
with "today in IST" instead of each point's own date, and open/close trust
array order. Here the bucket is each row's own event-time bucket and
open/close are defined by an explicit total order — min_by/max_by over
``struct(ts, tiebreak)``, which partial-aggregates map-side: one combined
shuffle row per (key, bucket), the right shape for 100 TB of ticks.

``ohlc_tumbling`` is the same aggregation on an arbitrary event-time window
(``F.window``) — usable identically in batch and Structured Streaming (with
a watermark upstream).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ohlc_aggs(value: str, order: Column) -> list[Column]:
    return [
        F.min_by(value, order).alias("open"),
        F.max(value).alias("high"),
        F.min(value).alias("low"),
        F.max_by(value, order).alias("close"),
        F.count(value).alias("n_obs"),
    ]


def ohlc(
    df: DataFrame,
    keys: Sequence[str],
    bucket: Column,
    value: str,
    order: Sequence[str | Column] = ("ts",),
) -> DataFrame:
    """OHLC of ``value`` per (keys, bucket); open/close by ``order``."""
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order]
    ord_struct = order_cols[0] if len(order_cols) == 1 else F.struct(*order_cols)
    return df.groupBy(*keys, bucket).agg(*_ohlc_aggs(value, ord_struct))


def ohlc_daily(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Daily OHLC keyed by each row's own UTC date (the corrected semantics
    of reference ``src/etl.py:46-54``)."""
    order: list[str | Column] = [ts_col, *tiebreak]
    return ohlc(df, keys, F.to_date(ts_col).alias("day"), value, order)


def ohlc_tumbling(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value: str,
    window_duration: str = "1 day",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """OHLC per tumbling event-time window; emits window_start/window_end.
    ``tiebreak`` extends the open/close order to a total order on equal
    timestamps (same contract as ohlc_daily)."""
    win = F.window(ts_col, window_duration)
    order_cols = [F.col(ts_col), *(F.col(c) for c in tiebreak)]
    ord_struct = order_cols[0] if len(order_cols) == 1 else F.struct(*order_cols)
    out = df.groupBy(*keys, win.alias("w")).agg(*_ohlc_aggs(value, ord_struct))
    return out.select(
        *keys,
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "open",
        "high",
        "low",
        "close",
        "n_obs",
    )
