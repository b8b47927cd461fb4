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


def zorder_key(df: DataFrame, cols: Sequence[str], bits: int = 8) -> DataFrame:
    """Attach ``__z``: a Morton (bit-interleaved) key over the numeric
    ``cols``, each first normalized to a ``2^bits``-bin rank via min/max
    anchors.

    The anchors are a 1-row broadcast aggregate (the max-ts anchor
    pattern) — no global sort, no window over the whole table, so the key
    is computed in a single narrow scan at any size. Min/max binning is
    coarser than Delta's range-id normalization under heavy skew, but
    skew-robustness here comes from the later ``repartitionByRange`` on
    the key (sampled range bounds), which still yields balanced files.
    """
    anchors = df.agg(
        *[F.min(c).cast("double").alias(f"__mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__mx_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(anchors))
    nbins = 1 << bits
    binned = []
    for c in cols:
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        span = F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
        b = F.floor((F.col(c).cast("double") - mn) / span * nbins)
        binned.append(F.least(F.lit(nbins - 1), F.greatest(F.lit(0), b)))
    k = len(cols)
    # disjoint bit positions → plain sum assembles the interleaved key
    z = sum(
        (
            F.shiftleft(
                F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), i * k + j
            )
            for i in range(bits)
            for j, b in enumerate(binned)
        ),
        F.lit(0).cast("long"),
    )
    return out.withColumn("__z", z).drop(
        *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int = 32,
    bits: int = 8,
) -> None:
    """Write ``df`` clustered on the Z-order curve of ``cols`` — the
    multi-column generalization of sort-within-files: each file covers a
    small HYPER-RECTANGLE of the key space instead of a slab of one
    column, so parquet min/max footer stats prune files for predicates on
    ANY subset of ``cols`` (a linear sort only prunes its leading column).
    Same mechanism Delta's OPTIMIZE ZORDER BY applies, expressed as
    repartitionByRange(__z) + per-file sort; one range shuffle total.
    """
    (
        zorder_key(df, cols, bits)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
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
