"""Delimited/JSON-lines file sources with quarantine semantics.

The reference ingests exclusively from REST (reference ``src/api.py``); a
general engine also has to mount the files users actually have. These
readers wrap ``spark.read`` with the postures that matter at 100 TB:

- **Explicit schema is mandatory.** Schema inference is a full extra pass
  over the input (and samples JSON types nondeterministically); at scale
  that is a second 100 TB read before the first real one. Callers pass a
  DDL string or StructType; the reader never infers.
- **Malformed rows are data, not exceptions.** Default PERMISSIVE mode
  captures undecodable lines into a corrupt-record column; ``quarantine``
  splits them off so the clean side flows on while the bad side lands in
  a dead-letter sink. One torn line in shard 80,000 must not kill a
  10-hour job — but must also not silently vanish.
- **FAILFAST is opt-in** (``strict=True``) for contract-enforcing loads
  (dimension feeds) where a malformed row means upstream breakage.

Scale note: both formats are splittable as generated here (uncompressed,
newline-delimited), so Spark parallelizes by HDFS/S3 block without help.
Gzip inputs are NOT splittable — one task per file — which is a layout
problem to fix upstream (or via a recompression pass), not a reader flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _schema_with_corrupt(schema: str | T.StructType) -> T.StructType:
    st = (
        T.StructType.fromDDL(schema) if isinstance(schema, str) else schema
    )
    if CORRUPT_COL not in st.fieldNames():
        st = st.add(T.StructField(CORRUPT_COL, T.StringType()))
    return st


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | T.StructType,
    *,
    header: bool = True,
    sep: str = ",",
    strict: bool = False,
) -> DataFrame:
    """CSV with explicit schema; malformed lines captured, not thrown."""
    reader = (
        spark.read.format("csv")
        .option("header", header)
        .option("sep", sep)
        .option("mode", "FAILFAST" if strict else "PERMISSIVE")
    )
    if strict:
        return reader.schema(schema).load(path)
    return (
        reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(_schema_with_corrupt(schema))
        .load(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | T.StructType,
    *,
    strict: bool = False,
) -> DataFrame:
    """Newline-delimited JSON with explicit schema (no inference pass)."""
    reader = spark.read.format("json").option(
        "mode", "FAILFAST" if strict else "PERMISSIVE"
    )
    if strict:
        return reader.schema(schema).load(path)
    return (
        reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(_schema_with_corrupt(schema))
        .load(path)
    )


def quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE read into (clean, dead_letter).

    Clean rows drop the corrupt column entirely; dead-letter rows keep the
    raw undecodable line plus nothing else — ready for a quarantine sink
    and a human. Spark requires caching the frame before the corrupt
    column is referenced in a filter (SPARK-38523); doing it here keeps
    callers out of that trap.
    """
    if CORRUPT_COL not in df.columns:
        raise ValueError(f"no {CORRUPT_COL} column: read with strict=False")
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, bad
