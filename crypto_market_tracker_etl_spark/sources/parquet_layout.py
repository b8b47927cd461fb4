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


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 16,
    sort_cols: Sequence[str] = (),
) -> None:
    """Persist as a bucketed managed table: rows are hash-distributed into
    ``num_buckets`` files by ``bucket_cols`` and sorted within each.

    Bucketing is the shuffle-amortization layout: two tables bucketed the
    same way join WITHOUT either side shuffling (Catalyst recognizes the
    co-partitioning), and aggregations on the bucket key skip the exchange
    entirely. At 100 TB this turns the nightly fact-to-fact join from the
    dominant shuffle into a map-side zip. (Parquet path tables cannot carry
    bucket metadata; this must be a catalog table, hence saveAsTable.)
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


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
