"""Shared fixtures: one local SparkSession, a DuckDB oracle connection, and
the parity comparator that mirrors the driver's correctness gate."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_market_tracker_etl_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    s = get_session(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style normalization: columns sorted by name, datetimes to µs
    ISO strings, NaN→None, rows sorted by every column."""
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        col = out[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            out[c] = col.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif col.dtype == object:
            out[c] = col.map(
                lambda v: v.isoformat() if hasattr(v, "isoformat") else v
            )
    out = out.astype(object).where(pd.notna(out), None)
    rows = sorted(map(tuple, out.itertuples(index=False)), key=repr)
    return pd.DataFrame(rows, columns=out.columns)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    # Decimal guard: DuckDB silently widens sum(int)→HUGEINT and decimal
    # literal math→DECIMAL, which arrow hands back as Decimal objects. The
    # elementwise compare below treats Decimal('7') == 7 as equal, but a
    # hash-of-values driver gate may not — require the oracle SQL to cast
    # to the Spark-matching type at the output boundary.
    import decimal

    for c in oracle_pdf.columns:
        col = oracle_pdf[c]
        if (
            col.dtype == object
            and c in spark_pdf.columns
            and spark_pdf[c].dtype != object  # both-Decimal (DecimalType) is fine
            and len(col.dropna())
            and isinstance(col.dropna().iloc[0], decimal.Decimal)
        ):
            raise AssertionError(
                f"{name}: oracle column {c!r} is Decimal-typed but Spark's is "
                f"{spark_pdf[c].dtype} — add a CAST (DOUBLE/BIGINT) at the "
                "oracle output boundary"
            )
    s = normalize(spark_pdf)
    o = normalize(oracle_pdf)
    mismatched = (s != o) & ~(s.isna() & o.isna())
    if mismatched.any().any():
        bad = mismatched.any(axis=1)
        detail = pd.concat(
            {"spark": s[bad].head(5), "oracle": o[bad].head(5)}, axis=1
        )
        raise AssertionError(f"{name}: value mismatch:\n{detail}")
