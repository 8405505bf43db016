"""Adaptive Query Execution behavior proofs — ARCHITECTURE.md's runtime
claims ("AQE coalesces post-shuffle partitions", "skewed keys are split by
the AQE skew join") demonstrated against this Spark build, not just cited.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture()
def aqe_conf(spark):
    """Force-SMJ + hair-trigger skew thresholds for the skew test; restore
    after."""
    keys = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    }
    old = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_coalesces_small_shuffle(spark):
    """A tiny groupBy under shuffle.partitions=32 must NOT surface 32
    post-shuffle partitions: AQE coalesces them to a handful at runtime."""
    df = spark.range(1000).groupBy((F.col("id") % 5).alias("k")).count()
    df.collect()  # materialize so AQE finalizes the plan
    n = df.rdd.getNumPartitions()
    assert n < int(spark.conf.get("spark.sql.shuffle.partitions"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan


def test_aqe_splits_planted_skew_join(aqe_conf):
    """A join where ONE key owns ~95% of the left side: with hair-trigger
    thresholds AQE must mark the sort-merge join's oversized partition as
    skewed (skew=true) and split it, and results must equal the unsplit
    semantics (count preserved)."""
    spark = aqe_conf
    left = spark.range(200_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.concat(F.lit("padpadpadpadpadpad-"), F.col("id")).alias("payload"),
    )
    right = spark.range(0, 200_001).select(F.col("id").alias("k"))
    j = left.join(right, "k")
    # collect() materializes THIS DataFrame's own query execution (count()
    # would wrap it in a new plan and leave j's plan isFinalPlan=false)
    rows = j.collect()
    assert len(rows) == left.count()  # every left key matches exactly once
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "skew=true" in plan
