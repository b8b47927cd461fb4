"""Custom stateful streaming on the transformWithState API (Spark 4).

``streaming/stateful.py`` implements running per-key statistics with
``applyInPandasWithState`` — the Spark-3 API whose state is one opaque
per-key tuple. This module is the same operator on the Spark-4
``transformWithStateInPandas`` engine, which is the forward path for a
100 TB deployment:

- state lives in named, schema'd slots (ValueState/ListState/MapState)
  inside the RocksDB state store (the API requires
  RocksDBStateStoreProvider — state size is bounded by disk, not JVM heap);
- per-slot TTL is declarative (``ttlDurationMs``) instead of hand-rolled
  timeout bookkeeping;
- timers (not used here) replace the processing-time timeout dance.

**Status: experimental in this environment.** The transformWithState
state protocol requires ``google.protobuf``, which this container does
not ship, so the end-to-end path cannot execute here; the processor's
accumulation logic is unit-tested directly against the StatefulProcessor
contract (tests/test_datasource_stateful.py::
test_running_stats_processor_contract), and the engine-level equivalence
claim is carried by the ``applyInPandasWithState`` twin in
``streaming/stateful.py``, whose stream≡batch battery does run. On a
real cluster (protobuf present) ``running_stats_tws`` is the drop-in
forward path.

**Environment recipe (r10)** — to execute the e2e path outside this
container, the ONLY missing piece is the protobuf runtime PySpark's
state-server protocol imports (``pyspark/sql/streaming/proto/*_pb2.py``
→ ``google.protobuf``):

    pip install 'protobuf>=4.25'   # pure-Python runtime is sufficient;
                                   # no compiler / grpc needed
    python -m pytest tests/test_datasource_stateful.py -k tws

The protobuf-gated e2e test
(``test_running_stats_tws_engine_if_available``) then runs for real: it
starts a RocksDB-backed transformWithState stream with a checkpointed
restart and asserts it equals the ``applyInPandasWithState`` twin and
the batch aggregate. Nothing in
this repo needs regenerating — the .proto stubs ship inside pyspark;
vendoring protobuf into the repo was considered and rejected (the
runtime is ~400 files with C-accelerated variants; a stale copy
shadowing a cluster's real one is worse than a visible skip).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

_STATE_SCHEMA = "n BIGINT, total DOUBLE, vmin DOUBLE, vmax DOUBLE"
_OUT_SCHEMA = "user_id BIGINT, n BIGINT, total DOUBLE, vmin DOUBLE, vmax DOUBLE"


class RunningStatsProcessor(StatefulProcessor):
    """Per-key running count/sum/min/max over a value column."""

    def __init__(self, value_col: str = "value", ttl_ms: int | None = None):
        self._value_col = value_col
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "stats", _STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        prev = self._state.get()
        n, total, vmin, vmax = prev if prev is not None else (0, 0.0, None, None)
        for pdf in rows:
            v = pdf[self._value_col].dropna()
            if len(v) == 0:
                continue
            n += int(len(v))
            total += float(v.sum())
            bmin, bmax = float(v.min()), float(v.max())
            vmin = bmin if vmin is None else min(vmin, bmin)
            vmax = bmax if vmax is None else max(vmax, bmax)
        self._state.update((n, total, vmin, vmax))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n": [n],
                "total": [total],
                "vmin": [vmin],
                "vmax": [vmax],
            }
        )

    def close(self) -> None:
        pass


def running_stats_tws(
    stream: DataFrame,
    key: str = "user_id",
    value_col: str = "value",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Continuously-updated per-key stats; each micro-batch emits the new
    cumulative row for every key it touched (Update mode)."""
    return stream.groupBy(key).transformWithStateInPandas(
        statefulProcessor=RunningStatsProcessor(value_col, ttl_ms),
        outputStructType=_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
