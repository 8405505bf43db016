"""Custom stateful streaming operator: per-user running activity profile via
``applyInPandasWithState`` (SURVEY.md §2.10 scale track).

This is the engine's arbitrary-stateful-processing surface — the Spark idiom
for operators that no built-in windowed aggregate expresses (running ML
feature state, per-entity counters that survive across micro-batches,
session accumulators with custom eviction). State is partitioned by the
group key (user_id), stored in the state store per partition, checkpointed
with the query — at 1000 executors each partition owns its slice of users,
so state size scales horizontally with the cluster, never with the driver.

The batch analogues of these aggregates are oracle-checked elsewhere
(events_hourly_stats, events_sessions); here the operator contract under
test is *statefulness itself*: totals must accumulate across micro-batches
and emit once per (user, batch) — see tests/test_stateful.py.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("batch_rows", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),
    ]
)


def _update_profile(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into the running (count,
    sum) state; emit one row with the post-batch running totals. Values are
    accumulated in cents (ints) so the running sum is exact and
    order-independent."""
    (user_id,) = key
    n, cents = state.get if state.exists else (0, 0)
    batch_rows = 0
    for pdf in pdfs:
        batch_rows += len(pdf)
        n += len(pdf)
        cents += int(round(pdf["value"].mul(100).round(0).sum())) if len(pdf) else 0
    state.update((n, cents))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [cents / 100.0],
            "batch_rows": [batch_rows],
        }
    )


def user_running_profile(stream: DataFrame) -> DataFrame:
    """events stream -> one row per (user, micro-batch) carrying the running
    event count and exact running value total. State: (count, cents)."""
    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming exact dedup: emit each fingerprint's first occurrence only ---
DEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("fp", T.StringType()),
        T.StructField("first_event_id", T.LongType()),
        T.StructField("n_new", T.LongType()),
    ]
)

DEDUP_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def _emit_first(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Emit one row the FIRST time this fingerprint appears on the stream;
    afterwards the state marks it seen and later occurrences are dropped —
    exactly the semantics of streaming exact dedup over an unbounded corpus."""
    (fp,) = key
    if state.exists:
        return
    first_id = None
    n = 0
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            m = int(pdf["event_id"].min())
            first_id = m if first_id is None else min(first_id, m)
    if n == 0:
        return
    state.update((True,))
    yield pd.DataFrame({"fp": [fp], "first_event_id": [first_id], "n_new": [n]})


def streaming_dedup(stream: DataFrame, fp_col: str = "fp") -> DataFrame:
    """Streaming exact dedup keyed by content fingerprint: the state store
    holds one boolean per fingerprint ever seen (partitioned across
    executors with the key — at 100 TB this is the canonical 'have I seen
    this document' set, sharded and checkpointed for free). First
    occurrence wins; re-lands and cross-batch duplicates never re-emit."""
    return stream.groupBy(fp_col).applyInPandasWithState(
        _emit_first,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
