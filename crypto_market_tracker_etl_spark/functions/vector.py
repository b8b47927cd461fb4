"""Vector math over ``array<float|double>`` columns — pure Catalyst
expressions (zip_with / aggregate fold), no UDFs, so similarity search stays
inside whole-stage codegen and never crosses the Python boundary.

Floats are cast to double before folding: the fold is sequential, so the
result is bit-reproducible across engines that fold in array order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_with_norms(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """``cosine`` with per-row precomputed norms: in pair-join plans the
    norm folds run once per ROW instead of once per CANDIDATE PAIR (3× less
    fold work on the hot path). Bit-identical to ``cosine`` when the norm
    columns were produced by ``norm`` — same fold, same division order."""
    return dot(a, b) / (norm_a * norm_b)


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
