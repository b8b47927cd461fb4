"""Table layout management: the Spark replacement for the reference's btree
indexes (reference sql/schema.sql:39-40, sql/views.sql:45-46).

Postgres accelerates `(asset_id, ts)` lookups with indexes; a Parquet lake
gets the same selectivity from LAYOUT:

- **date partitioning** (`dt=YYYY-MM-DD` directories) → partition pruning
  for every time-range predicate (the sparkline/as-of cutoffs);
- **sort-within-files on (key, ts)** → Parquet row-group min/max statistics
  become range indexes: a key-equality or ts-range filter skips row groups
  without decoding them;
- **sized files** (`maxRecordsPerFile`) → bounded task memory and balanced
  scans at any table size.

``write_time_partitioned`` applies all three; ``read_pruned`` demonstrates
(and tests assert) that time filters reach the scan as PartitionFilters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    sort_keys: Sequence[str] = (),
    max_records_per_file: int = 5_000_000,
) -> None:
    """Write ``df`` as a date-partitioned, file-sorted parquet table."""
    out = df.withColumn("dt", F.to_date(ts_col))
    (
        out.repartition("dt")
        .sortWithinPartitions(*sort_keys, ts_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("dt")
        .parquet(path)
    )


def read_pruned(
    spark: SparkSession,
    path: str,
    start_date: str | None = None,
    end_date: str | None = None,
) -> DataFrame:
    """Read with partition-pruning date bounds (inclusive)."""
    df = spark.read.parquet(path)
    if start_date:
        df = df.filter(F.col("dt") >= F.lit(start_date))
    if end_date:
        df = df.filter(F.col("dt") <= F.lit(end_date))
    return df
