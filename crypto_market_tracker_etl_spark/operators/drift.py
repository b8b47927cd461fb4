"""Distribution-drift operators: histogram counts → portable drift metrics.

The reference repo has no monitoring surface; this module is part of the
LLM-data-pipeline extension tier (SURVEY.md §2.11) — every training-data
refresh wants "did the distribution move?" answered cheaply and
reproducibly. Two deliberate design positions:

- **Log-free metrics.** Total-variation distance (½·Σ|p−q|) and the
  symmetrized chi-square (Σ(p−q)²/(p+q)) instead of PSI/KL: ln() is
  correctly-rounded in NO mainstream libm, so log-based drift numbers
  differ in the last ulp across engines — these are +,-,*,/ only and
  reproduce bit-identically (the [drift_report] oracle proves it).
- **Order-independent accumulation.** Per-bin terms are rounded to 8dp
  and summed as DECIMAL(18,8) — exact integer arithmetic underneath — so
  partial-aggregation order (Spark) vs sequential order (DuckDB, pandas)
  cannot flip a low bit. Cast to double only at the output boundary.

Scale shape: binning and period assignment are pure expressions; counts
are one partial-aggregated shuffle of ≤ |keys|·n_bins groups; the metric
aggregate runs over that sliver. One scan, no window, no collect. The
streaming twin (streaming/stateful.py::histogram_drift_counts_stream)
maintains the same counts as 2·n_bins longs of per-key state and feeds
THIS module's metric aggregation, so batch and stream share one metric
definition by construction.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fixed_bin(value: Column, lo: float, hi: float, n_bins: int) -> Column:
    """Clamped fixed-width bin id in [0, n_bins): floor((v−lo)/(hi−lo)·n).
    Out-of-range values land in the edge bins (monitoring wants them
    counted, not dropped). NULL and NaN values land in a dedicated NULL
    bin — the explicit missing-data policy shared with the streaming twin.
    Both cases need explicit mapping: floor(NaN) would clamp into bin 0,
    and so would NULL, because least/greatest SKIP null arguments rather
    than propagate them (greatest(0, NULL) = 0)."""
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    if n_bins < 2:
        raise ValueError(f"need n_bins >= 2, got {n_bins}")
    v = value.cast("double")
    raw = F.floor((v - F.lit(float(lo))) / F.lit(float(hi - lo)) * n_bins)
    clamped = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), raw)).cast("int")
    return F.when(
        v.isNull() | F.isnan(v), F.lit(None).cast("int")
    ).otherwise(clamped)


def drift_metrics_from_counts(
    counts: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """(keys…, bin, n_a, n_b) per bin → (keys…, n_bins, total_a, total_b,
    tvd, chi2, ks). The single source of the metric arithmetic — the batch
    query, the fixed-bin batch twin, and the streaming snapshot all route
    through here, so "equal by construction" is literal.

    KS (max |CDF_a − CDF_b|) needs cumulative sums in bin order: a window
    partitioned by keys with a FIXED accumulation order, so the double
    sums are bit-identical across engines despite being unrounded. The
    window does cost one extra exchange (upstream counts are
    hash-partitioned on (keys, bin), the window re-partitions on keys
    alone) — but it moves only the ≤ |keys|·n_bins counts sliver, not the
    input, so it is noise at any scale."""
    from pyspark.sql import Window

    keys = list(keys)
    tot = counts.groupBy(keys).agg(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")
    )
    p = F.when(F.col("ta") > 0, F.col("n_a") / F.col("ta")).otherwise(F.lit(0.0))
    q = F.when(F.col("tb") > 0, F.col("n_b") / F.col("tb")).otherwise(F.lit(0.0))
    tvd_term = F.round(F.abs(p - q), 8).cast("decimal(18,8)")
    chi_term = F.round((p - q) * (p - q) / (p + q), 8).cast("decimal(18,8)")
    w = (
        Window.partitionBy(keys)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ks_term = F.abs(F.sum(p.alias("p")).over(w) - F.sum(q.alias("q")).over(w))
    return (
        counts.join(F.broadcast(tot), keys)
        .withColumn("ks_term", ks_term)
        .groupBy(keys)
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.first("ta").alias("total_a"),
            F.first("tb").alias("total_b"),
            F.round(F.sum(tvd_term).cast("double") * 0.5, 6).alias("tvd"),
            F.round(F.sum(chi_term).cast("double"), 6).alias("chi2"),
            F.round(F.max("ks_term"), 6).alias("ks"),
        )
    )


def fixed_bin_histogram_drift(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value: str,
    lo: float,
    hi: float,
    n_bins: int,
    boundary: dt.datetime,
) -> DataFrame:
    """Batch drift with CALLER-FIXED bins and period boundary — the form a
    monitoring job uses (edges from the training snapshot's spec, not from
    the incoming data) and the exact batch twin of the streaming operator.
    Rows with ts ≤ boundary (full µs precision) are the reference period.
    Missing-data policy, mirrored in the streaming twin: NULL/NaN values
    count in a dedicated NULL bin; NULL-ts rows are dropped (they belong
    to no period)."""
    keys = list(keys)
    b = fixed_bin(F.col(value), lo, hi, n_bins)
    in_a = F.col(ts_col) <= F.lit(boundary)
    counts = (
        df.filter(F.col(ts_col).isNotNull())
        .select(*keys, b.alias("bin"), in_a.alias("in_a"))
        .groupBy(*keys, "bin")
        .agg(
            F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(~F.col("in_a"), 1).otherwise(0)).alias("n_b"),
        )
    )
    return drift_metrics_from_counts(counts, keys)
