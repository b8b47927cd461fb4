"""The reference's four SQL views (its entire query surface,
``/root/reference/sql/views.sql:2-42``) re-expressed as DataFrame builders.

Differences from the reference, on purpose (SURVEY.md §2.5, §4):
- greatest-n-per-group is a window/max_by, not a self-join on max(ts)
  (one shuffle instead of two scans + join);
- the assets dimension is broadcast (it is bounded by the tracked universe);
- "now()" is an injected ``as_of`` column so results are deterministic and
  replayable — pass ``F.current_timestamp()`` to get the reference's
  behavior.

Every builder returns a lazy DataFrame; Catalyst folds caller-side filters
(e.g. the dashboard's ``asset_id = X``) into the scans, which is what
PostgREST's server-side filter pushdown did for the reference dashboard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.change import change_vs_asof
from ..operators.latest import latest_per_key
from ..operators.ohlc import ohlc_daily


def v_latest_prices(prices: DataFrame, assets: DataFrame) -> DataFrame:
    """Latest price row per asset + dimension columns, richest first
    (reference ``sql/views.sql:2-8``)."""
    latest = latest_per_key(prices, ["asset_id"], ["ts"])
    return (
        latest.join(F.broadcast(assets.select("asset_id", "symbol", "name")), "asset_id")
        .select("asset_id", "symbol", "name", "price", "market_cap", "volume", "ts")
        .orderBy(F.desc_nulls_last("market_cap"))
    )


def v_price_change_24h(prices: DataFrame, as_of: Column) -> DataFrame:
    """Per asset: latest price vs price as-of 24h before ``as_of``, with
    null-guarded pct change (reference ``sql/views.sql:10-28``)."""
    cutoff = as_of - F.expr("INTERVAL 24 HOURS")
    out = change_vs_asof(prices, ["asset_id"], "ts", "price", cutoff)
    return out.select(
        "asset_id",
        F.col("price_now"),
        F.col("price_then").alias("price_24h"),
        F.col("pct_change").alias("pct_change_24h"),
    )


def v_daily_ohlc(prices: DataFrame, assets: DataFrame) -> DataFrame:
    """Daily OHLC per asset joined to the dimension (reference
    ``sql/views.sql:30-35``), computed from ticks with per-row dates (the
    corrected ``src/etl.py:46-54`` semantics)."""
    daily = ohlc_daily(prices, ["asset_id"], "ts", "price")
    return (
        daily.join(F.broadcast(assets.select("asset_id", "symbol")), "asset_id")
        .select("asset_id", "symbol", "day", "open", "high", "low", "close", "n_obs")
        .orderBy("asset_id", F.desc("day"))
    )


def register_market_views(
    prices: DataFrame, assets: DataFrame, as_of: Column | None = None
) -> None:
    """Expose the four views to ``spark.sql`` under the reference's names —
    the engine's SQL surface (reference consumers query views, not tables).

    ``as_of`` defaults to the stream's max(ts), attached via a broadcast
    1-row aggregate so nothing is collected driver-side.
    """
    anchored = prices
    if as_of is None:
        mx = prices.agg(F.max("ts").alias("__max_ts"))
        anchored = prices.crossJoin(F.broadcast(mx))
        as_of = F.col("__max_ts")
    v_latest_prices(prices, assets).createOrReplaceTempView("v_latest_prices")
    v_price_change_24h(anchored, as_of).createOrReplaceTempView("v_price_change_24h")
    v_daily_ohlc(prices, assets).createOrReplaceTempView("v_daily_ohlc")
    v_price_sparkline_7d(anchored, assets, as_of).createOrReplaceTempView(
        "v_price_sparkline_7d"
    )


def v_price_sparkline_7d(prices: DataFrame, assets: DataFrame, as_of: Column) -> DataFrame:
    """Trailing-7-day price points per asset for sparklines (reference
    ``sql/views.sql:37-42``)."""
    cutoff = as_of - F.expr("INTERVAL 7 DAYS")
    return (
        prices.filter(F.col("ts") >= cutoff)
        .join(F.broadcast(assets.select("asset_id", "symbol")), "asset_id")
        .select("asset_id", "symbol", "ts", "price")
        .orderBy("asset_id", "ts")
    )
