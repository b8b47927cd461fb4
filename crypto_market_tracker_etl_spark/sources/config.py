"""Asset-universe config scan (reference src/coins.yaml + src/etl.py:17-19).

The universe is config-as-data: a small list of asset ids that seeds
ingestion. Kept driver-side (it is bounded and human-maintained) and turned
into a DataFrame so it can drive distributed fetch partitions.

YAML parsing is a 3-line subset (a flat ``assets:`` list) implemented
directly so the engine has zero non-baked dependencies; a full YAML file
from the reference repo parses identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def parse_asset_list(text: str) -> list[str]:
    """Parse a flat YAML list: ``assets:`` followed by ``- id`` lines.
    Comments and blank lines are ignored."""
    assets: list[str] = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if line.startswith("- "):
            assets.append(line[2:].strip().strip("'\""))
    return assets


def load_asset_universe(path: str) -> list[str]:
    with open(path, encoding="utf-8") as fh:
        return parse_asset_list(fh.read())


def asset_universe_df(spark: SparkSession, assets: list[str], slices: int | None = None) -> DataFrame:
    """Universe as a DataFrame, repartitioned so each fetch task owns a
    bounded id slice (the Spark analogue of the reference's 250-id chunks,
    reference src/coingecko.py:47-48)."""
    df = spark.createDataFrame([(a,) for a in assets], "asset_id string")
    return df.repartition(slices or max(1, len(assets) // 250 + 1))
