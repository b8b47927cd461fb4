"""The manifest table's change feed as a registrable Spark STREAMING
source (Python Data Source API, Spark 4):

    register_cdf(spark)
    spark.readStream.format("manifest_cdf")
         .option("path", table_path).option("keys", "k").load()

— the streaming form of ``ManifestParquetSink.changes`` (Delta's
``readChangeFeed`` surface): each micro-batch delivers the keyed I/U/D
diff between two table versions, with the version number as the stream
OFFSET. Offsets are replayable (``readBetweenOffsets`` recomputes any
window deterministically — manifests and data dirs are immutable), so
checkpoint recovery never duplicates or drops changes, WITHIN VACUUM
RETENTION: replaying an offset whose manifest was vacuumed fails loudly,
the same contract as ``changes_since_checkpoint``.

Design note — why the diff runs driver-side in pyarrow/pandas rather than
delegating to ``changes()``: a data source's ``read`` executes inside the
streaming engine's planning thread, where launching nested Spark jobs is
reentrant. A micro-batch diff is bounded by the commits that landed since
the last trigger (touched days only, thanks to the manifest diff), which
is exactly the size class the Simple (driver-side) reader variant exists
for. Consumers that need cluster-scale diffs use the batch ``changes()``
directly.

Semantics match ``changes()`` exactly: I/U rows carry the NEW values, D
rows the deleted row's PRE-IMAGE; a day whose manifest entry is identical
between versions is never read.
"""

from __future__ import annotations

import json
import os
import re
from collections.abc import Iterator

import pandas as pd
import pyarrow.dataset as pa_ds
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import LongType, StringType, StructField, StructType

_MANIFEST_RE = re.compile(r"^v(\d+)\.json$")
_SPARK_META_KEY = b"org.apache.spark.sql.parquet.row.metadata"


def _current_version(path: str) -> int:
    mdir = os.path.join(path, "_manifests")
    if not os.path.isdir(mdir):
        return 0
    versions = [
        int(m.group(1))
        for name in os.listdir(mdir)
        if (m := _MANIFEST_RE.match(name))
    ]
    return max(versions, default=0)


def _load_manifest(path: str, version: int) -> dict[str, str]:
    if version == 0:
        return {}
    with open(os.path.join(path, "_manifests", f"v{version}.json")) as f:
        return json.load(f)["partitions"]


def _table_schema(path: str) -> StructType:
    """The table's Spark schema, reconstructed from the footer metadata
    Spark itself wrote into any live data file — no type-mapping table to
    drift out of sync."""
    # the CURRENT manifest may be empty (deletes emptied the table) while
    # older retained manifests still reference data — any live file works
    # for the schema, so walk back through retention
    rel = None
    for v in range(_current_version(path), 0, -1):
        try:
            manifest = _load_manifest(path, v)
        except FileNotFoundError:
            break  # vacuumed past here
        if manifest:
            rel = next(iter(manifest.values()))
            break
    if rel is None:
        raise ValueError(
            f"{path} has no data-bearing commits within retention; the cdf "
            "stream needs a table schema — start it after the first upsert"
        )
    frag = pa_ds.dataset(os.path.join(path, rel))
    meta = frag.schema.metadata or {}
    if _SPARK_META_KEY not in meta:
        raise ValueError(f"{path} data files carry no Spark schema metadata")
    return StructType.fromJson(json.loads(meta[_SPARK_META_KEY]))


def _read_days(path: str, manifest: dict[str, str], days) -> pd.DataFrame:
    dirs = [os.path.join(path, manifest[d]) for d in days if d in manifest]
    if not dirs:
        return pd.DataFrame()
    # a LIST argument to dataset() must be file paths; directories need
    # one dataset each, unioned
    return (
        pa_ds.dataset([pa_ds.dataset(p) for p in dirs]).to_table().to_pandas()
    )


def _py(v):
    """pandas/numpy value → plain Python for the row tuples."""
    if v is None or (pd.api.types.is_scalar(v) and pd.isna(v)):
        return None
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    return v.item() if hasattr(v, "item") else v


_INT_TYPES = {"byte", "short", "integer", "long"}
_FLOAT_TYPES = {"float", "double"}


class ManifestCdfStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict, schema: StructType):
        if "path" not in options or "keys" not in options:
            raise ValueError("manifest_cdf requires options 'path' and 'keys'")
        self.path = options["path"]
        self.keys = [k.strip() for k in options["keys"].split(",") if k.strip()]
        self.start_version = int(options.get("startingversion", "0"))
        self.cols = [
            f.name
            for f in schema.fields
            if f.name not in ("_op", "_commit_version")
        ]
        self.non_keys = [c for c in self.cols if c not in self.keys]
        # pandas outer merges NaN-promote int columns to float (ver 1 →
        # 1.0), which the source API would reject for an IntegerType
        # field — coerce each value back to its declared Spark type
        self.coerce = {}
        for f in schema.fields:
            t = f.dataType.typeName()
            if t in _INT_TYPES:
                self.coerce[f.name] = int
            elif t in _FLOAT_TYPES:
                self.coerce[f.name] = float

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def _diff_rows(self, v1: int, v2: int) -> list[tuple]:
        old_m = _load_manifest(self.path, v1)
        new_m = _load_manifest(self.path, v2)
        changed = sorted(
            d for d in set(old_m) | set(new_m) if old_m.get(d) != new_m.get(d)
        )
        if not changed:
            return []
        old = _read_days(self.path, old_m, changed)
        new = _read_days(self.path, new_m, changed)
        if old.empty and new.empty:
            return []
        empty = pd.DataFrame(columns=self.cols)
        merged = (old if not old.empty else empty).merge(
            new if not new.empty else empty,
            on=self.keys,
            how="outer",
            suffixes=("_old", "_new"),
            # itertuples renames underscore-prefixed fields positionally,
            # so the indicator needs a plain identifier
            indicator="mergeside",
        )
        rows: list[tuple] = []
        for r in merged.itertuples(index=False):
            d = r._asdict()
            if d["mergeside"] == "right_only":
                op, side = "I", "_new"
            elif d["mergeside"] == "left_only":
                op, side = "D", "_old"  # pre-image, like changes()
            else:
                same = all(
                    (pd.isna(d[f"{c}_old"]) and pd.isna(d[f"{c}_new"]))
                    or d[f"{c}_old"] == d[f"{c}_new"]
                    for c in self.non_keys
                )
                if same:
                    continue
                op, side = "U", "_new"
            vals = []
            for c in self.cols:
                v = _py(d[c] if c in self.keys else d[f"{c}{side}"])
                if v is not None and c in self.coerce:
                    v = self.coerce[c](v)
                vals.append(v)
            rows.append(tuple(vals) + (op, v2))
        return rows

    def read(self, start: dict):
        cur = _current_version(self.path)
        start_v = start["version"]
        if cur <= start_v:
            return iter([]), start
        return iter(self._diff_rows(start_v, cur)), {"version": cur}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(self._diff_rows(start["version"], end["version"]))


class ManifestCdfDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "manifest_cdf"

    def schema(self) -> StructType:
        base = _table_schema(self.options["path"])
        return StructType(
            base.fields
            + [
                StructField("_op", StringType(), False),
                # the version bound of the batch that surfaced the change
                # (Delta's _commit_version analogue). A snapshot diff nets
                # intermediate history, so rows carry the WINDOW's end
                # version, not a per-commit one — still strictly ordered
                # across batches, which is what lets a downstream CDC
                # consumer place a delete AFTER the insert it deletes
                # (the D pre-image's own ts/id predate it).
                StructField("_commit_version", LongType(), False),
            ]
        )

    def simpleStreamReader(self, schema) -> ManifestCdfStreamReader:
        return ManifestCdfStreamReader(self.options, schema)


def register_cdf(spark) -> None:
    spark.dataSource.register(ManifestCdfDataSource)
