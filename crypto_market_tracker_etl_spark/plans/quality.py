"""In-flight data-quality metrics via the Observation API.

A 100 TB pipeline cannot afford a second scan just to count nulls or
range-check a column — ``df.observe`` attaches aggregate metrics to the
EXISTING job: they are computed by the same tasks that produce the
output, collected on the driver when the action completes, at zero extra
passes. This module packages the engine's standard quality battery as an
observation, the runtime complement to the batch ``profile`` query
(which IS a scan, for when a standalone audit is wanted).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame,
    numeric_cols: Sequence[str] = (),
    required_cols: Sequence[str] = (),
    name: str = "quality",
) -> tuple[DataFrame, Observation]:
    """Attach row count, per-required-column null counts, and
    per-numeric-column min/max to ``df``'s next action.

    Returns ``(observed_df, observation)`` — run any action on the
    returned frame, then read ``observation.get`` (blocks until the
    action finishes). Metrics reflect the rows that actually flowed
    through this point of the plan, which is exactly what an ingest
    gate wants to assert on.
    """
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in required_cols:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}")
        )
    for c in numeric_cols:
        metrics.append(F.min(c).alias(f"min_{c}"))
        metrics.append(F.max(c).alias(f"max_{c}"))
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def assert_quality(
    observation: Observation,
    max_null_fraction: float = 0.0,
    required_cols: Sequence[str] = (),
) -> dict:
    """Read the finished observation and enforce the null-budget gate.
    Returns the metrics dict; raises ValueError past budget."""
    got = observation.get
    n = got["n_rows"]
    for c in required_cols:
        bad = got[f"n_null_{c}"]
        if n and bad > max_null_fraction * n:
            raise ValueError(
                f"column {c}: {bad}/{n} nulls exceeds budget {max_null_fraction}"
            )
    return got
