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


def test_repriced_sum_is_tie_free_at_scale_3(spark):
    """Round-2 driver hash-fail regression: a 2-decimal price repriced *1.1
    is a 3-decimal value; summing it through DECIMAL(18,2) re-rounds and
    lands on half-cent ties (x.xx5) that Spark (shortest-repr) and DuckDB
    (exact binary) resolve differently. At scale 3 every repriced value is
    exactly representable, so the sum must equal the exact decimal total —
    tie-free by construction (operators/upsert_queries.py)."""
    from decimal import Decimal

    import pyspark.sql.functions as F
    from fpl_data_pipeline_spark.functions.exact import dsum

    # odd-cent prices: x.x5 products land exactly on the half-cent boundary
    prices = [101.35, 7.15, 999.95, 42.05, 13.25]
    df = spark.createDataFrame([(p,) for p in prices], ["price"])
    repriced = df.withColumn(
        "price",
        (F.col("price").cast("decimal(12,2)") * F.lit(1.1).cast("decimal(3,1)")).cast(
            "double"
        ),
    )
    got = repriced.agg(dsum("price", "total", scale=3)).first()["total"]
    want = float(sum(Decimal(str(p)) * Decimal("1.1") for p in prices))
    assert got == want
