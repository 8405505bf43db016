"""Cross-implementation and algebraic invariants for the advanced relational
operators (plans/advanced_relational.py), run at sf0.001."""

from __future__ import annotations

import pyspark.sql.functions as F

from fpl_data_pipeline_spark.plans.advanced_relational import (
    asof_join_purchase_click,
    asof_join_cogrouped,
    except_lapsed_customers,
    intersect_repeat_customers,
    rollup_lineitem_status,
    salted_agg_user_activity,
)
from fpl_data_pipeline_spark.tables import table

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return {tuple(r) for r in df.collect()}


def test_asof_implementations_agree(spark):
    """The join+window as-of and the cogrouped merge_asof must produce the
    identical relation (same tiebreaks)."""
    a = asof_join_purchase_click(spark, SF)
    b = asof_join_cogrouped(spark, SF)
    assert _pairs(a) == _pairs(b)


def test_asof_click_never_after_purchase(spark):
    out = asof_join_purchase_click(spark, SF)
    bad = out.filter(F.col("click_ts") > F.col("ts")).count()
    assert bad == 0


def test_rollup_grand_total_matches_count(spark):
    li = table(spark, SF, "lineitem")
    out = rollup_lineitem_status(spark, SF)
    grand = out.filter((F.col("g_flag") == 1) & (F.col("g_status") == 1)).collect()
    assert len(grand) == 1
    assert grand[0]["n"] == li.count()


def test_rollup_subtotals_sum_to_grand(spark):
    out = rollup_lineitem_status(spark, SF).collect()
    grand = next(r for r in out if r["g_flag"] == 1)
    level1 = [r for r in out if r["g_flag"] == 0 and r["g_status"] == 1]
    assert sum(r["n"] for r in level1) == grand["n"]


def test_intersect_except_partition_1995(spark):
    """intersect(95,96) ∪ except(95,96) == distinct 1995 customers, and the
    two sides are disjoint."""
    o = table(spark, SF, "orders")
    y95 = {r[0] for r in o.filter(F.year("o_orderdate") == 1995).select("o_custkey").distinct().collect()}
    inter = {r[0] for r in intersect_repeat_customers(spark, SF).collect()}
    exc = {r[0] for r in except_lapsed_customers(spark, SF).collect()}
    assert inter | exc == y95
    assert inter & exc == set()


def test_salted_agg_matches_plain_groupby(spark):
    e = table(spark, SF, "events")
    plain = {
        (r["user_id"], r["n"]): r["v"]
        for r in e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v"),
        )
        .collect()
    }
    salted = {
        (r["user_id"], r["n_events"]): r["total_value"]
        for r in salted_agg_user_activity(spark, SF).collect()
    }
    assert plain == salted


def test_kmeans_inertia_decreases(spark):
    from fpl_data_pipeline_spark.operators.similarity import kmeans_fit
    import pyspark.sql.functions as F2

    emb = table(spark, SF, "embeddings")
    inertia = []
    for iters in (1, 3):
        assigned = kmeans_fit(emb, k=4, iters=iters)
        inertia.append(assigned.agg(F2.sum("sq_dist")).first()[0])
    assert inertia[1] <= inertia[0] + 1e-9
