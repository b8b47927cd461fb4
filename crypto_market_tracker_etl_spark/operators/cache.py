"""Result caching with TTL — the reference dashboard's per-view cache
(``@st.cache_data(ttl=60)`` / ``ttl=300``, reference
``apps/streamlit-dashboard/app.py:33-51``) as an engine-side utility.

A cached entry is a persisted DataFrame (Tungsten columnar blocks on the
executors — the distributed analogue of Streamlit's driver-side pickle
cache). After ``ttl_s`` the entry is unpersisted and rebuilt on next
access, which is exactly the staleness contract the reference dashboard
gives its users. The clock is injectable so expiry is unit-testable.

Not correctness-bearing (SURVEY.md §2.1 S11): a cache miss only costs a
recompute; plans remain the source of truth.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


class TTLCache:
    """Keyed DataFrame cache: ``get(key, build)`` returns the persisted
    frame, rebuilding when absent or older than ``ttl_s`` seconds."""

    def __init__(
        self,
        ttl_s: float,
        clock: Callable[[], float] = time.monotonic,
        storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    ):
        self.ttl_s = ttl_s
        self.clock = clock
        self.storage_level = storage_level
        self._entries: dict[str, tuple[float, DataFrame]] = {}

    def get(self, key: str, build: Callable[[], DataFrame]) -> DataFrame:
        now = self.clock()
        hit = self._entries.get(key)
        if hit is not None:
            born, df = hit
            if now - born < self.ttl_s:
                return df
            df.unpersist()
        df = build().persist(self.storage_level)
        self._entries[key] = (now, df)
        return df

    def invalidate(self, key: str | None = None) -> None:
        """Drop one entry (or all) and release executor storage."""
        keys = [key] if key is not None else list(self._entries)
        for k in keys:
            hit = self._entries.pop(k, None)
            if hit is not None:
                hit[1].unpersist()
