"""User-extensible function surface (SURVEY §2.10): the two shapes the
DataFrame API can't express natively, each in its Arrow-vectorized form.

- ``weighted_median`` — a GROUPED_AGG pandas UDF (true UDAF): whole-group
  reduction the builtin aggregates don't cover. Arrow ships each group's
  columns as one batch; no row-at-a-time Python anywhere. Caveat at
  scale: GROUPED_AGG is not partial-aggregating (a hot group's rows all
  meet in one task) — use builtins whenever algebra allows, which is why
  this surface is reserved for order-statistics-style reductions.
- ``SpanSplitter`` — a Python UDTF (Spark 4): one input row → many output
  rows with state-free logic, the table-function shape (LATERAL VIEW's
  user-defined cousin). Used here to split text into (start, end, span)
  sentence-ish spans without a regex explode chain.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def weighted_median(v: pd.Series, w: pd.Series) -> float:
    """Weighted median of v with weights w (linear-scan on the sorted
    group; ties resolve to the lower value — deterministic)."""
    df = pd.DataFrame({"v": v, "w": w}).dropna().sort_values("v")
    if df.empty:
        return None
    cum = df["w"].cumsum()
    half = df["w"].sum() / 2.0
    return float(df.loc[cum >= half, "v"].iloc[0])


@udtf(returnType="start: int, end: int, span: string")
class SpanSplitter:
    """Split text on '.', '!' or '?' into trimmed spans with their
    [start, end) character offsets in the ORIGINAL string."""

    def eval(self, text: str):
        if text is None:
            return
        start = 0
        for i, ch in enumerate(text):
            if ch in ".!?":
                piece = text[start:i]
                stripped = piece.strip()
                if stripped:
                    lead = len(piece) - len(piece.lstrip())
                    yield (start + lead, start + lead + len(stripped), stripped)
                start = i + 1
        tail = text[start:]
        stripped = tail.strip()
        if stripped:
            lead = len(tail) - len(tail.lstrip())
            yield (start + lead, start + lead + len(stripped), stripped)
