"""Physical-plan shape assertions — the structural half of the 100 TB
argument (ARCHITECTURE.md §1, tools/explain_audit.py as pytest): what
broadcasts, what prunes, what avoids a global sort is scale-invariant and
checkable at any data size."""

from __future__ import annotations

import pytest

from fpl_data_pipeline_spark.registry import QUERIES, load_all

SF = "/root/testdata/sf0.001"

load_all()


def plan(spark, name: str) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES[name](spark, SF).explain("formatted")
    return buf.getvalue()


def test_flagship_broadcasts_and_topk(spark):
    p = plan(spark, "flagship_customer_activity")
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p  # dims broadcast, fact streams
    assert "TakeOrderedAndProject" in p  # top-k, never a global sort


def test_hwm_filter_pushed_to_scan(spark):
    p = plan(spark, "filter_range_hwm")
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in p


def test_scan_prunes_columns(spark):
    p = plan(spark, "projection")
    # projection reads only the referenced columns, not the full row
    assert "ReadSchema" in p
    readschema = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "o_comment" not in readschema and "o_orderpriority" not in readschema


def test_topk_take_ordered(spark):
    p = plan(spark, "topk_order_revenue")
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_dedup_candidates_are_equi_joins(spark):
    for name in ("dedup_ngram_jaccard", "dedup_minhash_pairs", "dedup_winnowing_pairs"):
        p = plan(spark, name)
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name


def test_ordered_shingles_skips_repartition_when_well_partitioned(spark):
    """The winnowing fan-out repartition must be CONDITIONAL: an input
    already at/above session parallelism keeps its partitioning (no extra
    corpus-wide Exchange — round-3 verdict nit), while an under-partitioned
    input is still fanned out to cores."""
    from fpl_data_pipeline_spark.operators.dedup import ordered_shingles
    from fpl_data_pipeline_spark.tables import table

    par = spark.sparkContext.defaultParallelism
    docs = table(spark, SF, "documents").select("doc_id", "text")

    wide = docs.repartition(par + 4)
    assert ordered_shingles(wide).rdd.getNumPartitions() == par + 4

    narrow = docs.coalesce(1)
    assert ordered_shingles(narrow).rdd.getNumPartitions() == par


def test_semi_and_anti_join_strategies(spark):
    assert "LeftSemi" in plan(spark, "semi_join")
    assert "LeftAnti" in plan(spark, "anti_join_orphans")


@pytest.mark.parametrize("name", ["ann_lsh_bucketed", "emb_neardup_pairs"])
def test_lsh_probe_is_hash_join(spark, name):
    p = plan(spark, name)
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p
    assert "CartesianProduct" not in p
