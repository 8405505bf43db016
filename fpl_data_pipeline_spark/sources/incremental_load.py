"""Batch-incremental week loading (SURVEY.md §2.10, §4.1): the reference's
high-water-mark + ``data_flow`` override protocol, set-based.

Reference (includes.py:173-182 + pull_fpl_data_s3_postgre.py:11-14):
- read the last data-checked week id from week_info_dm (coalesce 0);
- data_flow == 'All'   -> reload everything;
- data_flow == <int>   -> reload exactly that week;
- data_flow == 'Skip'  -> load nothing;
- otherwise            -> load weeks > high-water mark.

The filter compiles to a pushed-down predicate; on a round_gw-partitioned
layout (io.write_partitioned) it prunes whole partitions. Idempotency comes
from merging the selected weeks with operators.upsert, so overlapping
re-loads are safe (the reference gets the same property from ON CONFLICT).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from fpl_data_pipeline_spark.operators.upsert import upsert


def high_water_mark(week_info_dm: DataFrame) -> int:
    """Last data-checked week, 0 on an empty/bootstrap table
    (reference sql_queries.py:275-276 semantics)."""
    row = (
        week_info_dm.filter(F.col("data_checked"))
        .agg(F.coalesce(F.max("id"), F.lit(0)).alias("hwm"))
        .first()
    )
    return int(row["hwm"])


def select_weeks(
    fact_source: DataFrame, hwm: int, data_flow: str | int | None = None
) -> DataFrame:
    """Apply the data_flow override protocol to the incoming fact rows."""
    if data_flow == "Skip":
        return fact_source.limit(0)
    if data_flow == "All":
        return fact_source
    if data_flow is not None and str(data_flow).isdigit():
        return fact_source.filter(F.col("round_gw") == int(data_flow))
    return fact_source.filter(F.col("round_gw") > hwm)


def incremental_load(
    base: DataFrame,
    fact_source: DataFrame,
    week_info_dm: DataFrame,
    data_flow: str | int | None = None,
) -> DataFrame:
    """One incremental run: pick weeks per protocol, merge idempotently."""
    hwm = high_water_mark(week_info_dm)
    batch = select_weeks(fact_source, hwm, data_flow)
    return upsert(base, batch, keys=["element_", "round_gw"])
