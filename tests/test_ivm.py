"""Incremental view maintenance invariants beyond the oracle parity of
ivm_delta_view: delta-merge == full recompute on an unrelated table/split,
and retraction round-trip (apply a delta, then its negation -> the exact
base view back, bit-for-bit)."""

from __future__ import annotations

import pyspark.sql.functions as F

from fpl_data_pipeline_spark.operators.ivm import (
    finalize_view,
    merge_view_delta,
    zset_agg_view,
)
from fpl_data_pipeline_spark.tables import table

SF = "/root/testdata/sf0.001"
KEYS = ["l_returnflag", "l_linestatus"]
SUMS = {"qty": "l_quantity", "price": "l_extendedprice"}


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ivm_merge_equals_recompute(spark):
    """V(base) ⊕ V(Δ) == V(base ∪ Δ⁺ \\ Δ⁻) on lineitem with a different
    split modulus than the registered query uses."""
    li = table(spark, SF, "lineitem")
    base = li.filter(F.col("l_orderkey") % 3 != 0)
    ins = li.filter(F.col("l_orderkey") % 3 == 0).withColumn("w", F.lit(1))
    dels = base.filter(F.col("l_partkey") % 11 == 0).withColumn("w", F.lit(-1))
    delta = ins.unionByName(dels)

    base_view = zset_agg_view(base.withColumn("w", F.lit(1)), KEYS, "w", SUMS)
    delta_view = zset_agg_view(delta, KEYS, "w", SUMS)
    maintained = finalize_view(
        merge_view_delta(base_view, delta_view, KEYS, list(SUMS)), KEYS, list(SUMS)
    )

    net = base.filter(~(F.col("l_partkey") % 11 == 0)).unionByName(
        li.filter(F.col("l_orderkey") % 3 == 0)
    )
    recomputed = finalize_view(
        zset_agg_view(net.withColumn("w", F.lit(1)), KEYS, "w", SUMS),
        KEYS,
        list(SUMS),
    )
    assert _rows(maintained) == _rows(recomputed)


def test_ivm_retraction_roundtrip(spark):
    """Applying a delta and then its sign-flipped negation returns the base
    view exactly — the Z-set group-inverse property that makes corrections
    and GDPR erasures safe to replay."""
    li = table(spark, SF, "lineitem")
    base = li.filter(F.col("l_orderkey") % 2 == 0)
    delta = li.filter(F.col("l_orderkey") % 2 == 1).withColumn("w", F.lit(1))
    neg = delta.withColumn("w", F.lit(-1))

    base_view = zset_agg_view(base.withColumn("w", F.lit(1)), KEYS, "w", SUMS)
    up = merge_view_delta(
        base_view, zset_agg_view(delta, KEYS, "w", SUMS), KEYS, list(SUMS)
    )
    down = merge_view_delta(up, zset_agg_view(neg, KEYS, "w", SUMS), KEYS, list(SUMS))
    assert _rows(finalize_view(down, KEYS, list(SUMS))) == _rows(
        finalize_view(base_view, KEYS, list(SUMS))
    )


def test_ivm_empty_group_vanishes(spark):
    """A group retracted to count 0 disappears from the maintained view (no
    zero-count residue rows)."""
    li = table(spark, SF, "lineitem").limit(50)
    base_view = zset_agg_view(li.withColumn("w", F.lit(1)), KEYS, "w", SUMS)
    neg_view = zset_agg_view(li.withColumn("w", F.lit(-1)), KEYS, "w", SUMS)
    emptied = merge_view_delta(base_view, neg_view, KEYS, list(SUMS))
    assert emptied.count() == 0
