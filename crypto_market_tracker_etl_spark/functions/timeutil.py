"""Time conversion helpers mirroring the reference's timestamp handling.

Reference semantics covered:
- epoch-ms → UTC timestamp at second precision (reference ``src/etl.py:42``)
- IST calendar-day bucketing (reference ``src/etl.py:15,47`` — the engine's
  default is each row's own UTC date; IST bucketing is provided explicitly)
- display formatting (reference ``apps/streamlit-dashboard/app.py:156``)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_ms_to_ts(ms: Column) -> Column:
    """Epoch milliseconds → timestamp truncated to whole seconds, matching
    ``datetime.fromtimestamp(ms/1000).replace(microsecond=0)``."""
    return F.date_trunc("second", F.timestamp_millis(ms))


def ts_to_epoch_ms(ts: Column) -> Column:
    return F.unix_millis(ts)


def day_in_tz(ts: Column, tz: str = "Asia/Kolkata") -> Column:
    """Calendar date of a UTC instant in ``tz`` (the reference's IST daily
    bucket; see SURVEY.md §3.1 for the divergence we document)."""
    return F.to_date(F.from_utc_timestamp(ts, tz))


def format_minute(ts: Column) -> Column:
    """Dashboard display format 'yyyy-MM-dd HH:mm'."""
    return F.date_format(ts, "yyyy-MM-dd HH:mm")


def trailing_window_cutoff(anchor: Column, interval: str) -> Column:
    """``anchor - INTERVAL`` (e.g. '7 days', '24 hours'). The reference pins
    anchors to now(); deterministic tests pin them to max(ts)."""
    return anchor - F.expr(f"INTERVAL {interval}")
