"""Latest-row-per-key (greatest-n-per-group) and arg-min/max operators.

The reference expresses "latest price per asset" as a self-join against a
per-key ``max(ts)`` subquery (reference ``sql/views.sql:5-6``). That shape
scans + shuffles the fact table twice. Spark-first replacements, in order of
preference at scale:

1. ``latest_per_key`` — window ``row_number() == 1``. On Spark 3.5+/4 this
   plans as ``WindowGroupLimit(Partial)``: a per-map-partition top-1 runs
   BEFORE the shuffle, so only one row per key per partition moves — and
   the whole pipeline stays in whole-stage codegen. Measured fastest at
   every scale (50M rows / 50k keys: ~3 s on local[32]).
2. ``latest_per_key_agg`` — ``groupBy(keys).agg(max_by(payload, order))``:
   also one partial-aggregated shuffle, but max_by is an
   ObjectHashAggregate (JVM object per group, no codegen); prefer it only
   when the consumer is already aggregate-shaped. session.py raises the
   128-group sort-fallback threshold that would otherwise cripple it.

Ties: callers must pass an ``order`` that is a total order (e.g. ts then a
unique id) or results are nondeterministic — same caveat as the reference's
upsert last-writer-wins (reference ``src/db.py:93-97``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(cols: Sequence[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str | Column],
) -> DataFrame:
    """Keep the single row per key that sorts LAST by ``order`` (desc)."""
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in _cols(order)])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def earliest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str | Column],
) -> DataFrame:
    """Keep the single row per key that sorts FIRST by ``order`` (asc)."""
    w = Window.partitionBy(*keys).orderBy(*_cols(order))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_per_key_agg(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str | Column],
    payload: Sequence[str],
) -> DataFrame:
    """Partial-aggregation form: one combined shuffle row per key.

    Returns ``keys + payload`` columns where every payload value comes
    from the SAME row — the one maximizing ``order`` (lexicographic
    struct comparison). One max_by over a struct of the whole payload,
    not one per column (r10 review): per-column max_by resolves ties
    independently, so two payload columns could come from DIFFERENT
    tied rows — a (price_now, market_cap) combination existing on no
    input row, which the reference's whole-row DISTINCT ON can never
    produce. Row atomicity must hold even when the caller's ``order``
    is not total (the module-docstring caveat covers WHICH row, not
    row integrity).
    """
    ord_struct = F.struct(*_cols(order))
    row = F.max_by(F.struct(*[F.col(p) for p in payload]), ord_struct)
    return (
        df.groupBy(*keys)
        .agg(row.alias("__row"))
        .select(*keys, *[F.col(f"__row.{p}").alias(p) for p in payload])
    )


def arg_max(df: DataFrame, keys: Sequence[str], value: str, by: str | Column) -> DataFrame:
    """Per-key value at the max of ``by`` (reference ``src/etl.py:50-53``:
    market-cap at the day's last timestamp). Partial-agg friendly."""
    return df.groupBy(*keys).agg(F.max_by(value, by).alias(value))


def top_k_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str | Column],
    k: int,
) -> DataFrame:
    """Top-k rows per key by ``order`` desc, with a ``rank`` column (1-based).

    Window-rank is the scalable top-k: no global sort, one hash shuffle on
    ``keys``, per-partition heaps via WindowExec's sort.
    """
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in _cols(order)])
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
