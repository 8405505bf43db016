"""Query registry: named DataFrame programs + their DuckDB oracle SQL.

Every operator from SURVEY.md §2 claims completion by registering here; the
driver (and tests/test_oracle_parity.py) runs the Spark side and the oracle
side against the same parquet tables and compares row-count + schema +
order-insensitive value hash.

Conventions (SURVEY.md §4.3) that make the hash comparison deterministic:
- every computed column is aliased identically in Spark and SQL;
- every top-k has a total-order tiebreaker (metric DESC, key ASC);
- sums over double columns go through DECIMAL(18,2) (exact, order-independent)
  and are CAST to DOUBLE at the end — bitwise identical in Spark and DuckDB;
- averages/ratios are double divisions of those exact doubles.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a (spark, sf_dir) -> DataFrame program under ``name``.

    ``oracle`` is the equivalent ANSI SQL for DuckDB (tables region nation
    customer supplier part orders lineitem events documents embeddings are
    pre-registered views over the same parquet). Omit it only for genuinely
    non-SQL-expressible ops (the driver then records a rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from fpl_data_pipeline_spark.plans import (  # noqa: F401
        flagship,
        core_relational,
        aggregates,
        windows,
        topk,
        advanced_relational,
    )
    from fpl_data_pipeline_spark.operators import (  # noqa: F401
        dedup,
        similarity,
        upsert_queries,
        sampling,
    )
    from fpl_data_pipeline_spark.functions import (  # noqa: F401
        text_queries,
        scalar_queries,
        quality,
    )
    from fpl_data_pipeline_spark.streaming import event_queries  # noqa: F401
    from fpl_data_pipeline_spark.operators import multimodal  # noqa: F401
