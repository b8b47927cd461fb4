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
reentrant. The diff cost is bounded by the TOUCHED DAYS' total row count
(the manifest diff prunes untouched days; both versions of a touched day
are read) — which stays micro-batch-sized exactly when ingestion is
day-local, the incremental-ETL shape (measured in SCALE.md: a
1M-row/4-day table diffs in ~8-14s driver-side; a daily load into a
10-year table reads ~1/1800th of it). For wide rewrites — backfills,
full-table churn — use the batch ``changes()`` path, which runs the same
manifest-diff plan on the cluster.

Semantics match ``changes()`` exactly: I/U rows carry the NEW values, D
rows the deleted row's PRE-IMAGE; a day whose manifest entry is identical
between versions is never read.

Options: ``path`` (table root), ``keys`` (comma-separated merge keys),
``startingVersion`` (default 0 — the FIRST batch then delivers the whole
current snapshot as inserts, the CDF bootstrap convention; on a large
existing table that initial diff is table-sized and driver-side, so pass
``startingVersion = current_version`` to start from new changes only).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import pandas as pd
import pyarrow.dataset as pa_ds
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import LongType, StringType, StructField, StructType

_SPARK_META_KEY = b"org.apache.spark.sql.parquet.row.metadata"

# ONE implementation of the manifest layout, shared with the sink — a
# format change (e.g. manifest sharding) lands in both readers at once
from ..operators.txn_sink import (  # noqa: E402
    manifest_current_version as _current_version,
    manifest_load as _load_manifest,
)


def _table_schema(path: str) -> StructType:
    """The table's Spark schema, reconstructed from the footer metadata
    Spark itself wrote into the live data files — no type-mapping table to
    drift out of sync. Fields are UNIONED across the manifest's distinct
    commits (first-appearance order): under additive schema evolution
    different partitions carry different vintages, and sampling one
    arbitrary file would nondeterministically drop late-added columns
    from the whole feed."""
    # the CURRENT manifest may be empty (deletes emptied the table) while
    # older retained manifests still reference data, so walk retention
    manifest: dict[str, str] = {}
    for v in range(_current_version(path), 0, -1):
        try:
            manifest = _load_manifest(path, v)
        except FileNotFoundError:
            break  # vacuumed past here
        if manifest:
            break
    if not manifest:
        raise ValueError(
            f"{path} has no data-bearing commits within retention; the cdf "
            "stream needs a table schema — start it after the first upsert"
        )
    # one footer read per distinct COMMIT (a commit's partitions share a
    # write schema), unioned by field name
    commits: dict[str, str] = {}
    for rel in manifest.values():
        commits.setdefault(rel.split(os.sep)[1], rel)
    fields: dict[str, object] = {}
    for rel in commits.values():
        meta = pa_ds.dataset(os.path.join(path, rel)).schema.metadata or {}
        if _SPARK_META_KEY not in meta:
            raise ValueError(
                f"{path} data files carry no Spark schema metadata"
            )
        for f in StructType.fromJson(json.loads(meta[_SPARK_META_KEY])):
            prev = fields.get(f.name)
            if prev is None:
                fields[f.name] = f
            elif prev.dataType != f.dataType:
                # same-name field with a DIFFERENT type across commits:
                # keeping the first-appearance type silently would misread
                # the other vintage's files. Numeric widenings resolve to
                # the wider type (safe: the driver-side row build emits
                # plain Python ints/floats either way); anything else is a
                # rewrite the additive-evolution contract excludes — loud.
                widened = _widen(prev.dataType, f.dataType)
                if widened is None:
                    raise ValueError(
                        f"{path}: column '{f.name}' changes type across "
                        f"commits ({prev.dataType.typeName()} vs "
                        f"{f.dataType.typeName()}) — only additive or "
                        "numeric-widening schema evolution is supported"
                    )
                fields[f.name] = StructField(f.name, widened, True)
    return StructType(list(fields.values()))


# numeric widening chains: later entries can represent every earlier one
_WIDEN_INT = ["byte", "short", "integer", "long"]
_WIDEN_FLOAT = ["float", "double"]


def _widen(a, b):
    """The wider of two Spark numeric types along the int or float chain,
    or None when the pair is not a pure widening (int→double included:
    crossing chains loses 64-bit int exactness, so it stays loud)."""
    ta, tb = a.typeName(), b.typeName()
    for chain in (_WIDEN_INT, _WIDEN_FLOAT):
        if ta in chain and tb in chain:
            return a if chain.index(ta) >= chain.index(tb) else b
    return None


def _read_days(path: str, manifest: dict[str, str], days) -> pd.DataFrame:
    dirs = [os.path.join(path, manifest[d]) for d in days if d in manifest]
    if not dirs:
        return pd.DataFrame()
    # One dataset per directory, concatenated with PERMISSIVE promotion:
    # a union dataset would refuse mixed physical int widths across
    # commit vintages (int32 vs int64 under widening evolution), while
    # permissive concat widens them. integer_object_nulls keeps int
    # columns exact through pandas — an int64 column absent from one
    # vintage gains nulls, and the default NaN-promotion to float64 would
    # corrupt values past 2^53 (2^60 == 2^60+1), suppressing updates.
    import pyarrow as pa

    tables = [pa_ds.dataset(p).to_table() for p in dirs]
    merged = (
        tables[0]
        if len(tables) == 1
        else pa.concat_tables(tables, promote_options="permissive")
    )
    return merged.to_pandas(integer_object_nulls=True)


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

    def _normalize(self, frame: pd.DataFrame) -> pd.DataFrame:
        """Align a side of the diff to the declared columns. (1) reindex
        to exactly self.cols: under additive schema evolution one side may
        predate a column — without the reindex, pandas merge suffixes only
        SHARED columns and the per-side lookups KeyError (a poison-pill
        replay). (2) integer columns go to nullable Int64: a plain int64
        column NaN-promotes to float64 the moment any I/D row appears,
        silently corrupting values past 2^53 and making 2^60 == 2^60+1
        compare equal (a suppressed update)."""
        frame = frame.reindex(columns=self.cols)
        for c, f in self.coerce.items():
            if f is int and c in frame.columns:
                frame[c] = frame[c].astype("Int64")
        return frame

    def _diff_rows(self, v1: int, v2: int) -> list[tuple]:
        try:
            old_m = _load_manifest(self.path, v1)
            new_m = _load_manifest(self.path, v2)
        except FileNotFoundError as e:
            raise ValueError(
                f"cdf stream offset references version {v1} or {v2} of "
                f"{self.path}, which vacuum retention has removed — "
                "resync: restart the stream with a fresh checkpoint (the "
                "first batch re-delivers the current snapshot as inserts)"
            ) from e
        changed = sorted(
            d for d in set(old_m) | set(new_m) if old_m.get(d) != new_m.get(d)
        )
        if not changed:
            return []
        old = self._normalize(_read_days(self.path, old_m, changed))
        new = self._normalize(_read_days(self.path, new_m, changed))
        if old.empty and new.empty:
            return []
        merged = old.merge(
            new,
            on=self.keys,
            how="outer",
            suffixes=("_old", "_new"),
            indicator=True,
        )
        rows: list[tuple] = []
        # dict-records iteration: itertuples positionally renames any
        # field that is not a valid Python identifier (underscore-prefixed
        # table columns included), which would KeyError the lookups below
        for d in merged.to_dict("records"):
            if d["_merge"] == "right_only":
                op, side = "I", "_new"
            elif d["_merge"] == "left_only":
                op, side = "D", "_old"  # pre-image, like changes()
            else:
                # null-safe SCALAR compare: a nullable-Int64 value that is
                # NA on exactly one side (NULL→value flip, or an int column
                # added under additive evolution — exactly what _normalize's
                # astype('Int64') produces) makes a bare `==` yield pd.NA,
                # and bool(pd.NA) raises — a poison-pill that would fail
                # this micro-batch AND every checkpoint replay of it. The
                # batch changes() handles the same case with eqNullSafe.
                same = True
                for c in self.non_keys:
                    o, n = d[f"{c}_old"], d[f"{c}_new"]
                    o_na, n_na = bool(pd.isna(o)), bool(pd.isna(n))
                    if o_na and n_na:
                        continue
                    if o_na != n_na or not bool(o == n):
                        same = False
                        break
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
        if "path" not in self.options:
            # schema resolution runs before the reader's own validation,
            # so a forgotten option must fail helpfully HERE
            raise ValueError("manifest_cdf requires options 'path' and 'keys'")
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
