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


def quantize_scale(v: Column) -> Column:
    """Per-vector symmetric int8 scale: max |x| (1.0 for the zero vector
    so dequantization never divides by zero)."""
    mx = F.array_max(F.transform(v, lambda x: F.abs(x)))
    return F.when(mx > 0, mx).otherwise(F.lit(1.0))


def quantize_int8(v: Column, scale: Column) -> Column:
    """Symmetric int8 codes: floor(x/scale·127) ∈ [−127, 127].

    ``floor`` (not round/cast) on purpose: Spark's double→int cast
    truncates while DuckDB's rounds, so floor is the only conversion both
    engines (and any SIMD kernel) agree on bit-for-bit. At 100 TB this is
    the 4× embedding-storage reduction (64 doubles → 64 bytes + 1 float);
    search kernels dot the int8 codes and rescale once per pair.
    """
    return F.transform(v, lambda x: F.floor(x / scale * 127).cast("int"))


def dequantize(codes: Column, scale: Column) -> Column:
    return F.transform(codes, lambda q: q / 127.0 * scale)


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
