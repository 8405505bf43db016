"""Bucketed-layout contract: a join on the bucket key reads both sides
co-located and produces a plan with NO shuffle Exchange — the storage-side
scale property local data can actually prove (plan shape is scale-invariant).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fpl_data_pipeline_spark.sources.bucketing import (
    assert_no_shuffle,
    colocated_join,
    write_bucketed,
)
from fpl_data_pipeline_spark.tables import table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = table(spark, SF, "lineitem")
    od = table(spark, SF, "orders")
    write_bucketed(li, "bkt_lineitem", ["l_orderkey"], 8, str(base / "lineitem"))
    write_bucketed(
        od.withColumnRenamed("o_orderkey", "l_orderkey"),
        "bkt_orders",
        ["l_orderkey"],
        8,
        str(base / "orders"),
    )
    yield "bkt_lineitem", "bkt_orders"
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_colocated_join_has_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable dynamic broadcast so the test pins the merge-join path the
    # layout is designed for (at 100 TB neither fact side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, lt, rt, ["l_orderkey"]).groupBy("l_orderkey").agg(
            F.count(F.lit(1)).alias("n")
        )
        assert_no_shuffle(j)
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_colocated_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    li = table(spark, SF, "lineitem")
    od = table(spark, SF, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    expected = li.join(od, "l_orderkey").count()
    assert colocated_join(spark, lt, rt, ["l_orderkey"]).count() == expected


def test_bucket_count_mismatch_rejected(spark, bucketed_tables, tmp_path):
    lt, _ = bucketed_tables
    od = table(spark, SF, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    write_bucketed(od, "bkt_orders_16", ["l_orderkey"], 16, str(tmp_path / "o16"))
    try:
        with pytest.raises(ValueError, match="bucket count mismatch"):
            colocated_join(spark, lt, "bkt_orders_16", ["l_orderkey"])
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_orders_16")


def test_groupby_on_bucket_key_avoids_shuffle(spark, bucketed_tables):
    """Aggregation on the bucket key also reuses the layout: the partial
    aggregate is already final per bucket, so no Exchange appears."""
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty")
    )
    assert_no_shuffle(agg)
