"""Empty-input and degenerate-input behavior of the engine's core operators:
a distributed engine meets empty partitions, empty batches, and key-miss
joins constantly — they must degrade to correct empties, not errors."""

from __future__ import annotations

import pyspark.sql.functions as F

from fpl_data_pipeline_spark.operators.dedup import connected_components
from fpl_data_pipeline_spark.operators.upsert import upsert
from fpl_data_pipeline_spark.sources.incremental_load import (
    high_water_mark,
    select_weeks,
)


def test_upsert_empty_batch_is_noop(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    empty = spark.createDataFrame([], "id long, v string")
    out = upsert(base, empty, keys=["id"])
    assert {tuple(r) for r in out.collect()} == {(1, "a"), (2, "b")}


def test_upsert_into_empty_base(spark):
    base = spark.createDataFrame([], "id long, v string")
    batch = spark.createDataFrame([(1, "a")], "id long, v string")
    out = upsert(base, batch, keys=["id"])
    assert [tuple(r) for r in out.collect()] == [(1, "a")]


def test_high_water_mark_empty_table(spark):
    wk = spark.createDataFrame([], "id int, data_checked boolean")
    assert high_water_mark(wk) == 0


def test_select_weeks_skip_returns_empty(spark):
    src = spark.createDataFrame([(1, 1), (2, 2)], "element_ int, round_gw int")
    assert select_weeks(src, hwm=0, data_flow="Skip").count() == 0


def test_connected_components_no_edges(spark):
    pairs = spark.createDataFrame([], "doc_id_a long, doc_id_b long")
    assert connected_components(pairs).count() == 0


def test_topk_on_empty_filter(spark):
    """TakeOrderedAndProject over an empty relation returns an empty result
    with the right schema (not an error)."""
    df = spark.range(10).filter(F.col("id") < 0)
    out = df.orderBy(F.col("id").desc()).limit(5)
    assert out.count() == 0
    assert out.columns == ["id"]
