"""Deterministic sampling for dataset curation.

``df.sample()`` is seed-dependent per partitioning and not reproducible
across engines or re-runs with different layouts; curation pipelines need
CONTENT-keyed sampling: a row is in or out as a pure function of its key,
so reruns, backfills, and downstream joins all agree on the split.

- ``hash_sample``: keep rows where hash(key) mod D < rate·D.
- ``stratified_sample``: per-stratum rates (e.g. downsample one language,
  keep all of another) — the dataset-mixing primitive.
- ``split``: disjoint train/validation/test assignment from one hash.

All are single-pass filters (no shuffle, no state); the portable md5-fold
hash reproduces in any engine (functions.hashing), xxhash64 on the fast
path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import fast_long, md5_long

DENOM = 10_000  # rate resolution: 0.01%


def _bucket(key: Column, seed: str, portable: bool) -> Column:
    h = md5_long(key.cast("string"), seed=seed) if portable else fast_long(
        key.cast("string"), seed=seed
    )
    return F.pmod(h, F.lit(DENOM))


def hash_sample(
    df: DataFrame,
    key: str | Column,
    rate: float,
    seed: str = "sample:",
    portable: bool = True,
) -> DataFrame:
    """Keep ~``rate`` of rows, membership a pure function of ``key``."""
    key_col = F.col(key) if isinstance(key, str) else key
    return df.filter(_bucket(key_col, seed, portable) < int(rate * DENOM))


def stratified_sample(
    df: DataFrame,
    key: str | Column,
    stratum: str | Column,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: str = "sample:",
    portable: bool = True,
) -> DataFrame:
    """Per-stratum keep rates; strata absent from ``rates`` get
    ``default_rate``. One filter expression, no shuffle."""
    key_col = F.col(key) if isinstance(key, str) else key
    strat_col = F.col(stratum) if isinstance(stratum, str) else stratum
    threshold = F.lit(int(default_rate * DENOM))
    for value, rate in sorted(rates.items()):
        threshold = F.when(strat_col == value, F.lit(int(rate * DENOM))).otherwise(
            threshold
        )
    return df.filter(_bucket(key_col, seed, portable) < threshold)


def split(
    df: DataFrame,
    key: str | Column,
    weights: dict[str, float],
    seed: str = "split:",
    portable: bool = True,
) -> DataFrame:
    """Adds a ``split`` column assigning each row to one named bucket with
    probability ∝ weight (weights should sum to ≤ 1; remainder → null)."""
    key_col = F.col(key) if isinstance(key, str) else key
    bucket = _bucket(key_col, seed, portable)
    expr = F.lit(None).cast("string")
    low = 0
    for name, w in sorted(weights.items()):
        high = low + int(w * DENOM)
        expr = F.when((bucket >= low) & (bucket < high), F.lit(name)).otherwise(expr)
        low = high
    return df.withColumn("split", expr)
