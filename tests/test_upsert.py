"""Upsert (A-UPSERT) semantics: idempotency, last-write-wins within a batch,
PK uniqueness, non-key column overwrite (SURVEY.md §5.2.3)."""

from __future__ import annotations

import pyspark.sql.functions as F

from fpl_data_pipeline_spark.operators.upsert import upsert, dedup_last_wins

KEYS = ["element_", "round_gw"]


def _state(df):
    return {
        tuple(r[k] for k in KEYS): r["total_points"]
        for r in df.select(*KEYS, "total_points").collect()
    }


def test_upsert_idempotent(player_week_ft):
    batch = player_week_ft.limit(50)
    once = upsert(player_week_ft, batch, KEYS)
    twice = upsert(once, batch, KEYS)
    assert _state(once) == _state(twice)
    assert once.count() == player_week_ft.count()


def test_upsert_updates_nonkey_columns(player_week_ft):
    batch = player_week_ft.limit(20).withColumn("total_points", F.lit(999))
    merged = upsert(player_week_ft, batch, KEYS)
    updated_keys = {tuple(r[k] for k in KEYS) for r in batch.collect()}
    st = _state(merged)
    for k in updated_keys:
        assert st[k] == 999
    assert merged.count() == player_week_ft.count()


def test_upsert_inserts_new_keys(player_week_ft):
    batch = player_week_ft.limit(10).withColumn("element_", F.col("element_") + 100_000)
    merged = upsert(player_week_ft, batch, KEYS)
    assert merged.count() == player_week_ft.count() + 10


def test_upsert_last_write_wins_within_batch(spark, player_week_ft):
    # same PK twice in one batch (reference loop order: later INSERT wins)
    one = player_week_ft.limit(1)
    first = one.withColumn("total_points", F.lit(111))
    second = one.withColumn("total_points", F.lit(222))
    batch = first.unionByName(second)  # union order = batch order
    merged = upsert(player_week_ft, batch, KEYS)
    key = tuple(one.first()[k] for k in KEYS)
    assert _state(merged)[key] == 222
    assert merged.count() == player_week_ft.count()


def test_upsert_dedups_dirty_batch(player_week_ft_dirty, player_week_ft):
    # dirty batch has 2 duplicate-PK rows: result must be key-unique
    merged = upsert(player_week_ft.limit(0), player_week_ft_dirty, KEYS)
    assert (
        merged.groupBy(*KEYS).count().filter(F.col("count") > 1).count() == 0
    )


def test_dedup_last_wins_explicit_order(spark):
    df = spark.createDataFrame(
        [(1, 1, 10), (1, 2, 20), (2, 1, 30)], ["k", "seq", "v"]
    )
    out = dedup_last_wins(df, ["k"], order_by="seq")
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: 20, 2: 30}
