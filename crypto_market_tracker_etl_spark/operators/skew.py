"""Skew-mitigation operators: salted aggregation and salted joins.

AQE's skew-join handling (on by default in session.py) covers sort-merge
skew splitting at runtime; these operators cover the cases AQE cannot:

- ``salted_aggregate``: two-phase aggregation for hot grouping keys. Phase 1
  aggregates on (key, salt) — spreading one hot key over N reducers — phase
  2 combines the N partials. Correct for algebraic aggregates (sum, count,
  min, max), which is exactly what reduces losslessly.
- ``salted_join``: equi-join where ONE hot build-side key would overwhelm a
  reducer and the build side is too large to broadcast. The probe side gets
  a deterministic salt from a high-entropy column; the build side is
  replicated across all salt values. Output equals the unsalted join.

Salt fan-out trades build-side duplication (×N) for reducer balance — pick
N ≈ (hot-key rows / target partition rows), not "as big as possible".
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

AggSpec = dict[str, str]  # output name -> "fn(col)" with fn in sum|count|min|max


_COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
_PARTIAL = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}


def _parse(spec: str) -> tuple[str, str]:
    fn, _, col = spec.partition("(")
    return fn.strip(), col.rstrip(")").strip()


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: AggSpec,
    salt_buckets: int = 16,
    salt_on: str | Column | None = None,
) -> DataFrame:
    """Two-phase aggregation over (keys + salt) then (keys).

    ``aggs`` maps output column → "fn(col)" with fn ∈ sum/count/min/max.
    ``salt_on`` seeds the salt (default: spark_partition_id — stable within
    a run, spreads rows regardless of key distribution).
    """
    salt = (
        F.pmod(F.xxhash64(salt_on if isinstance(salt_on, Column) else F.col(salt_on)), F.lit(salt_buckets))
        if salt_on is not None
        else F.spark_partition_id() % salt_buckets
    )
    partials = []
    finals = []
    for out, spec in aggs.items():
        fn, col = _parse(spec)
        partials.append(_PARTIAL[fn](col).alias(f"__p_{out}"))
        finals.append(_COMBINE[fn](f"__p_{out}").alias(out))
    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partials)
    return phase1.groupBy(*keys).agg(*finals)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    salt_col: str | Column,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: probe side salted by ``salt_col``'s hash,
    build side replicated across every salt value, join on keys + salt.

    Result is row-identical to ``left.join(right, keys, how)`` for
    ``how`` ∈ {inner, left}. Other join types are rejected: the build side
    is replicated ×``salt_buckets``, so right/full joins would emit every
    unmatched build row once per salt value, and semi/anti joins would
    probe against replicas — use AQE's skew-join handling for those.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only, got {how!r}: "
            "the replicated build side breaks right/full/semi/anti semantics"
        )
    keys = list(keys)
    salt_src = salt_col if isinstance(salt_col, Column) else F.col(salt_col)
    lsalted = left.withColumn("__salt", F.pmod(F.xxhash64(salt_src), F.lit(salt_buckets)))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("__salt")
    rrep = right.select("*", salts).withColumn("__salt", F.col("__salt").cast("long"))
    out = lsalted.join(rrep, [*keys, "__salt"], how)
    return out.drop("__salt")


def null_tolerant_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the null hot-partition eliminated.

    Null join keys can never match, yet a plain shuffle join still hashes
    every null-keyed row to partition hash(null) — on sparse foreign keys
    that is THE skew bucket (one reducer receives all of them to produce
    nothing). Here null-keyed left rows bypass the join entirely: they are
    filtered before the shuffle and, for outer semantics, unioned back
    null-extended afterward. Row-identical to ``left.join(right, keys,
    how)`` for inner/left (asserted in tests); fully-null-keyed data never
    moves.
    """
    if how not in ("inner", "left"):
        raise ValueError("null_tolerant_join supports how in {'inner','left'}")
    any_null = None
    for k in keys:
        c = F.col(k).isNull()
        any_null = c if any_null is None else (any_null | c)
    matchable = left.filter(~any_null)
    joined = matchable.join(right, list(keys), how)
    if how == "inner":
        return joined
    nulls = left.filter(any_null)
    for c in joined.columns:
        if c not in nulls.columns:
            nulls = nulls.withColumn(c, F.lit(None).cast(joined.schema[c].dataType))
    return joined.unionByName(nulls.select(*joined.columns))
