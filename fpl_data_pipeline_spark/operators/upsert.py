"""Keyed last-write-wins upsert — the engine-level MERGE (SURVEY.md §2.4
A-UPSERT, §4.3.1).

The reference implements idempotent loads as row-at-a-time
``INSERT ... ON CONFLICT (pk) DO UPDATE SET <all non-key cols>``
(reference sql_queries.py:28-36,38-96,98-109,207-218,265-273 executed by
includes.py loops). The engine re-expresses that as one set-based operation
on DataFrames, dependency-free (no Delta):

1. dedup the incoming batch by key, keeping the LAST row per key in batch
   order (the reference's loop order semantics: later INSERT wins);
2. anti-join the base table against the batch keys (drop rows being updated);
3. union the survivors with the deduped batch.

Idempotency: upsert(upsert(T, B), B) == upsert(T, B). PK uniqueness is an
invariant: if base is key-unique, the result is key-unique.

Scale: one shuffle on the key for the dedup (window) + one for the anti-join;
at 100 TB both sides hash-partition on the same key so AQE plans a single
co-partitioned exchange, and the physical write should be a partition
overwrite limited to touched partitions (dynamic partitionOverwriteMode).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def dedup_last_wins(batch: DataFrame, keys: Sequence[str], order_by: str | None = None) -> DataFrame:
    """Keep one row per key: the last by ``order_by`` — reference semantics
    where the later row of a batch overwrites the earlier.

    "Last in batch order" is only well-defined when the batch carries an
    order column, so callers that need the reference's loop-order semantics
    MUST pass ``order_by`` (a monotone sequence/timestamp column).  With
    ``order_by=None`` the survivor is instead chosen by a deterministic
    total order over the non-key columns (greatest tuple wins) — stable
    under any physical partitioning or shuffle layout, unlike
    monotonically_increasing_id, which is partition-major and plan-dependent.
    """
    if order_by is None:
        rest = [c for c in batch.columns if c not in set(keys)]
        if not rest:
            # keys cover all columns: duplicate-key rows are identical, any
            # survivor is THE row — a constant order is correct, not arbitrary
            order_col = F.lit(1)
        else:
            unorderable = [
                c for c in rest if batch.schema[c].dataType.typeName() == "map"
            ]
            if unorderable:
                raise ValueError(
                    f"dedup_last_wins(order_by=None) orders by the non-key struct, "
                    f"but columns {unorderable} are map-typed (not orderable). "
                    f"Pass an explicit order_by (sequence/timestamp) column."
                )
            order_col = F.struct(*[F.col(c) for c in rest])
    else:
        order_col = F.col(order_by)
    w = Window.partitionBy(*keys).orderBy(order_col.desc())
    return (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert(
    base: DataFrame,
    batch: DataFrame,
    keys: Sequence[str],
    order_by: str | None = None,
) -> DataFrame:
    """MERGE INTO base USING batch ON keys WHEN MATCHED UPDATE * WHEN NOT
    MATCHED INSERT * — as a pure DataFrame expression."""
    deduped = dedup_last_wins(batch.select(*base.columns), keys, order_by)
    kept = base.join(deduped.select(*keys), list(keys), "left_anti")
    # the USING join floats key columns to the front: restore base order so
    # the merged schema is stable across bootstrap and incremental runs
    return kept.unionByName(deduped).select(*base.columns)
