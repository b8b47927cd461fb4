"""Display formatting (reference apps/streamlit-dashboard/app.py:63-75,
152-156): presentation-layer scalar expressions, kept JVM-side so the
dashboard edge can format inside the same plan instead of in pandas.

Reproduced semantics:
- ``fmt_price``: ``$1,234.56`` for values ≥ 1, 3-significant-digit
  ``$0.000123`` style below 1 (the reference's two-branch price format).
- ``fmt_pct``: sign-carrying ``+1.23%`` / ``-0.45%``.
- ``fmt_compact``: ``$1,234,567`` whole-dollar grouping for market caps.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fmt_price(x: Column) -> Column:
    big = F.concat(F.lit("$"), F.format_number(x, 2))
    # 3 significant digits for sub-unit prices. The SQL format_number
    # accepts a per-row decimals column; only the Python wrapper insists on
    # an int literal, hence call_function.
    magnitude = F.floor(F.log10(F.abs(x)))
    decimals = (F.lit(2) - magnitude).cast("int")
    small = F.concat(F.lit("$"), F.call_function("format_number", x, decimals))
    return F.when(x.isNull(), F.lit(None)).when(F.abs(x) >= 1, big).otherwise(small)


def fmt_pct(x: Column) -> Column:
    return F.when(
        x.isNotNull(),
        F.concat(
            F.when(x >= 0, F.lit("+")).otherwise(F.lit("")),
            F.format_number(x, 2),
            F.lit("%"),
        ),
    )


def fmt_compact(x: Column) -> Column:
    return F.when(x.isNotNull(), F.concat(F.lit("$"), F.format_number(F.round(x, 0), 0)))
