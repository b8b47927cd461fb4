"""REST market-data connector (reference src/coingecko.py), distributed.

The reference fetches serially on one process: markets snapshot in ≤250-id
chunks (src/coingecko.py:42-62) and one market_chart call per asset
(src/coingecko.py:70-90), with tenacity exponential backoff on HTTP 429
(src/coingecko.py:36-41). Spark-first redesign:

- the asset universe is a DataFrame partitioned into id-slices;
- fetching happens INSIDE executor tasks via ``mapInPandas`` (Arrow-batched,
  one HTTP session per partition, per-partition pacing — Spark task retries
  are too coarse for rate limits, so the retry loop lives in the UDF);
- the transport is injectable (``fetcher``): tests and offline runs pass a
  fake; production passes ``http_fetcher`` (urllib, stdlib-only).

Payload normalization is pure Spark: the market_chart response's three
parallel ``[[epoch_ms, value], ...]`` arrays (reference src/etl.py:36-43)
are exploded and joined on epoch ms — the relational form of the
reference's ms-keyed dict probes.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# fetcher(url) -> response body (str). Injectable for tests/offline.
Fetcher = Callable[[str], str]

API_BASE = "https://api.coingecko.com/api/v3"
MARKETS_CHUNK = 250  # reference src/coingecko.py:47-48
RETRY_ATTEMPTS = 6  # reference src/coingecko.py:36-41
RETRY_MIN_S = 1.0
RETRY_MAX_S = 30.0


class RateLimitError(RuntimeError):
    """HTTP 429 surfaced as a typed error (reference src/coingecko.py:13-34)."""


def http_fetcher(url: str) -> str:
    import urllib.error
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=30) as resp:
            return resp.read().decode("utf-8")
    except urllib.error.HTTPError as err:  # pragma: no cover - needs network
        if err.code == 429:
            raise RateLimitError(str(err)) from err
        raise


def fetch_with_retry(fetcher: Fetcher, url: str, sleep: Callable[[float], None] = time.sleep) -> str:
    """Exponential backoff 1→30 s, 6 attempts, on rate-limit/transient errors
    (the reference's tenacity policy, hand-rolled to stay dependency-free)."""
    delay = RETRY_MIN_S
    for attempt in range(RETRY_ATTEMPTS):
        try:
            return fetcher(url)
        except (RateLimitError, ConnectionError, TimeoutError):
            if attempt == RETRY_ATTEMPTS - 1:
                raise
            sleep(delay)
            delay = min(delay * 2, RETRY_MAX_S)
    raise AssertionError("unreachable")


MARKETS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("price_change_pct_24h", T.DoubleType()),
        T.StructField("price_change_pct_7d", T.DoubleType()),
        T.StructField("price_change_pct_30d", T.DoubleType()),
    ]
)

CHART_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("payload", T.StringType()),  # raw JSON body
    ]
)

# market_chart body: three parallel [[ms, value], ...] arrays
CHART_JSON_SCHEMA = T.StructType(
    [
        T.StructField("prices", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("market_caps", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("total_volumes", T.ArrayType(T.ArrayType(T.DoubleType()))),
    ]
)


def fetch_markets(universe: DataFrame, fetcher: Fetcher, vs: str = "usd") -> DataFrame:
    """Markets snapshot (reference src/coingecko.py:42-62): one request per
    ≤250-id slice, executed inside each partition's task."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids = [i for b in batches for i in b["asset_id"].tolist()]
        for at in range(0, len(ids), MARKETS_CHUNK):
            chunk = ids[at : at + MARKETS_CHUNK]
            url = (
                f"{API_BASE}/coins/markets?vs_currency={vs}"
                f"&ids={','.join(chunk)}&price_change_percentage=24h,7d,30d"
            )
            rows = json.loads(fetch_with_retry(fetcher, url))
            yield pd.DataFrame(
                {
                    "asset_id": [r.get("id") for r in rows],
                    "symbol": [r.get("symbol") for r in rows],
                    "name": [r.get("name") for r in rows],
                    "price_change_pct_24h": [
                        r.get("price_change_percentage_24h_in_currency") for r in rows
                    ],
                    "price_change_pct_7d": [
                        r.get("price_change_percentage_7d_in_currency") for r in rows
                    ],
                    "price_change_pct_30d": [
                        r.get("price_change_percentage_30d_in_currency") for r in rows
                    ],
                }
            )

    return universe.mapInPandas(run, MARKETS_SCHEMA)


def fetch_market_charts(
    universe: DataFrame,
    fetcher: Fetcher,
    days: int = 1,
    vs: str = "usd",
    pacing_s: float = 0.0,
) -> DataFrame:
    """Per-asset market_chart fetch (reference src/coingecko.py:70-90) —
    parallel across partitions, paced within each (reference
    src/backfill.py:31's 1 s sleep becomes per-partition pacing)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        first = True
        for b in batches:
            for cid in b["asset_id"].tolist():
                if not first and pacing_s:
                    time.sleep(pacing_s)
                first = False
                url = f"{API_BASE}/coins/{cid}/market_chart?vs_currency={vs}&days={days}"
                body = fetch_with_retry(fetcher, url)
                yield pd.DataFrame({"asset_id": [cid], "payload": [body]})

    return universe.mapInPandas(run, CHART_SCHEMA)


def normalize_chart_payloads(charts: DataFrame, cutoff_ms: int | None = None) -> DataFrame:
    """Parallel-array JSON → prices rows (reference src/etl.py:36-44).

    from_json + explode of the ``prices`` array, then ms-keyed LEFT joins
    against the exploded market_caps/total_volumes arrays — the relational
    equivalent of the reference's ``mc_map.get(ms)`` dict probes. The
    optional ``cutoff_ms`` reproduces the hourly-emulation trim (reference
    src/coingecko.py:79-84).
    """
    parsed = charts.select(
        "asset_id", F.from_json("payload", CHART_JSON_SCHEMA).alias("j")
    )

    def series(field: str, value_name: str) -> DataFrame:
        out = parsed.select(
            "asset_id", F.explode(f"j.{field}").alias("pt")
        ).select(
            "asset_id",
            F.col("pt")[0].cast("long").alias("ms"),
            F.col("pt")[1].alias(value_name),
        )
        if cutoff_ms is not None:
            out = out.filter(F.col("ms") >= F.lit(cutoff_ms))
        return out

    prices = series("prices", "price")
    mcaps = series("market_caps", "market_cap")
    vols = series("total_volumes", "volume")
    joined = prices.join(mcaps, ["asset_id", "ms"], "left").join(
        vols, ["asset_id", "ms"], "left"
    )
    # epoch-ms → UTC ts at second precision (reference src/etl.py:42)
    return joined.select(
        "asset_id",
        F.date_trunc("second", F.timestamp_millis("ms")).alias("ts"),
        "price",
        "market_cap",
        "volume",
        F.lit("coingecko").alias("source"),
        F.current_timestamp().alias("inserted_at"),
    )
