"""Cross-engine deterministic hashing helpers.

The dedup/similarity operators need hash functions that produce IDENTICAL
values in Spark SQL and in the DuckDB oracle. Spark's native ``hash``/
``xxhash64`` and DuckDB's ``hash`` are different algorithms, so the portable
common denominator is ``md5`` (same hex output in both) plus arithmetic:

- md5 hex strings compare lexicographically the same everywhere → usable
  directly for MinHash (min over hex strings).
- ``hex_prefix_to_long`` folds the first N hex chars into a BIGINT with
  pure strpos/substr arithmetic — the only portable hex→int available in
  both dialects — giving a uniform 4N-bit integer hash for SimHash et al.

Production note (100 TB): inside Spark, ``xxhash64`` is ~an order of
magnitude cheaper than md5 and should be preferred when cross-engine
reproducibility is not required; operators take a ``portable`` flag.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = "0123456789abcdef"


def hex_prefix_to_long_sql(hash_expr: str, n_hex: int = 12, dialect: str = "duckdb") -> str:
    """SQL text computing a BIGINT from the first ``n_hex`` chars of a hex
    string expression. ``dialect``: 'duckdb' (strpos) or 'spark' (instr)."""
    pos = "strpos" if dialect == "duckdb" else "instr"
    terms = []
    for j in range(1, n_hex + 1):
        weight = 16 ** (n_hex - j)
        terms.append(
            f"({pos}('{HEX_DIGITS}', substr({hash_expr}, {j}, 1)) - 1) * {weight}"
        )
    return "(" + " + ".join(terms) + ")"


def md5_long(col: Column, seed: str = "", n_hex: int = 12) -> Column:
    """Portable integer hash: value of md5's first ``n_hex`` hex chars.

    Spark-side this is a single base-16 ``conv`` (verified bit-identical to
    the positional substr/instr fold the DuckDB oracle uses — same number,
    one expression instead of 3·n_hex); n_hex ≤ 15 keeps it under 2⁶³.
    """
    h = F.md5(F.concat(F.lit(seed), col))
    return F.conv(F.substring(h, 1, n_hex), 16, 10).cast("long")


def fast_long(col: Column, seed: str = "") -> Column:
    """Engine-native fast path (NOT oracle-portable): xxhash64."""
    return F.xxhash64(F.concat(F.lit(seed), col))
