"""Keyed upsert (merge) semantics — the reference's write path, Spark-first.

The reference upserts row-at-a-time into Postgres with ``INSERT ... ON
CONFLICT DO UPDATE`` on (asset_id, ts) / (asset_id, date) keys (reference
``src/db.py:73-117``). The relational meaning is *keep the latest version of
each key* (last-writer-wins), which distributes as:

- ``dedup_keep_latest``: batch-internal dedup — one shuffle on the key.
- ``merge_upsert``: new ∪ old, keep-latest per key, preferring new rows on
  version ties (the ON CONFLICT update).
- ``ParquetUpsertSink``: a date-partitioned parquet table with MERGE
  semantics via dynamic partition overwrite: only partitions containing
  incoming keys are read + rewritten, so a day's increment touches a day's
  partitions — not the 100 TB table. (Delta's MERGE INTO is the managed
  version of exactly this; parquet keeps the repo dependency-free.)
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .latest import latest_per_key


def dedup_keep_latest(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str | Column],
) -> DataFrame:
    """Collapse duplicate keys to their latest version (reference
    ``src/db.py:93-97`` batch semantics, where later executemany rows win)."""
    return latest_per_key(df, keys, order)


def merge_upsert(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    order: Sequence[str | Column] | None = None,
) -> DataFrame:
    """MERGE: rows from ``new`` replace same-key rows in ``old``.

    With no ``order`` (the reference's ON CONFLICT DO UPDATE), a new row
    ALWAYS wins over an old one with the same key. With ``order``, the
    highest version wins and ``__src`` breaks exact version ties in favor
    of new rows.
    """
    tagged = old.withColumn("__src", F.lit(0)).unionByName(
        new.withColumn("__src", F.lit(1))
    )
    return dedup_keep_latest(tagged, keys, [*(order or []), "__src"]).drop("__src")


class ParquetUpsertSink:
    """Date-partitioned parquet table with keyed-upsert writes.

    Layout: ``path/dt=YYYY-MM-DD/*.parquet``. ``upsert(batch)`` rewrites only
    the partitions the batch touches (partition pruning on read + dynamic
    partition overwrite on write).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: Sequence[str],
        ts_col: str,
        order: Sequence[str] | None = None,
    ):
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.ts_col = ts_col
        self.order = list(order or [ts_col])

    def _exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            name.startswith("dt=") for name in os.listdir(self.path)
        )

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def upsert(self, batch: DataFrame) -> None:
        batch = batch.withColumn("dt", F.to_date(self.ts_col))
        if self._exists():
            days = [r["dt"] for r in batch.select("dt").distinct().collect()]
            # touched partitions only: pruned scan, bounded by batch's days
            old = self.read().filter(F.col("dt").isin(days))
            merged = merge_upsert(old, batch, self.keys, self.order)
        else:
            merged = dedup_keep_latest(batch, self.keys, self.order)
        (
            merged.repartition("dt")
            .write.mode("overwrite")
            .partitionBy("dt")
            .parquet(self.path)
        )
