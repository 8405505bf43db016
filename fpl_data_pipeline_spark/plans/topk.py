"""Top-k retrieval (SURVEY.md §2.6) — the reference's signature pattern:
every analytical query ends in ORDER BY metric DESC LIMIT k.

Spark plans ORDER BY+LIMIT as TakeOrderedAndProject: per-partition heaps, no
global sort — exactly the distributed top-k we want at 100 TB. Every query
carries a key tiebreaker so results are deterministic under ties (§4.3.2).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from fpl_data_pipeline_spark.registry import register
from fpl_data_pipeline_spark.tables import table
from fpl_data_pipeline_spark.functions.exact import (
    dsum,
    dsum_sql,
    revenue_col,
    REVENUE_SQL,
    portable_round,
    portable_round_sql,
)


# --- T1: basic top-9 by a dim metric (sql_queries.py:111 basic_ply_data) ----
@register(
    "topk_basic",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey ASC
    LIMIT 9
    """,
)
def topk_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        .limit(9)
    )


# --- T2: top-9 with derived ratio column (sql_queries.py:113-116) -----------
@register(
    "topk_value_ratio",
    """
    SELECT c_custkey, c_name, c_acctbal,
           FLOOR((c_acctbal / 10.0) * 100 + 0.5) / 100 AS point_value
    FROM customer
    WHERE c_acctbal > 0
    ORDER BY c_acctbal DESC, c_custkey ASC
    LIMIT 9
    """,
)
def topk_value_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_acctbal") > 0)
        .select(
            "c_custkey",
            "c_name",
            "c_acctbal",
            portable_round(F.col("c_acctbal") / 10.0).alias("point_value"),
        )
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        .limit(9)
    )


# --- T4/T5 shape: top-15 over grouped fact metrics (sql_queries.py:220-256) -
@register(
    "topk_supplier_volume",
    f"""
    SELECT l_suppkey,
           {dsum_sql('l_quantity')} AS total_qty,
           {dsum_sql('l_extendedprice')} AS total_price
    FROM lineitem
    GROUP BY l_suppkey
    ORDER BY total_qty DESC, l_suppkey ASC
    LIMIT 15
    """,
)
def topk_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(dsum("l_quantity", "total_qty"), dsum("l_extendedprice", "total_price"))
        .orderBy(F.col("total_qty").desc(), F.col("l_suppkey").asc())
        .limit(15)
    )


@register(
    "topk_part_revenue",
    f"""
    SELECT l_partkey,
           CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
    GROUP BY l_partkey
    ORDER BY revenue DESC, l_partkey ASC
    LIMIT 15
    """,
)
def topk_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.sum(revenue_col()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_partkey").asc())
        .limit(15)
    )


# --- T6: last-k selector over a ranked tiny set (sql_queries.py:142,165) ----
@register(
    "topk_last_3_periods",
    """
    SELECT period
    FROM (SELECT DISTINCT year(o_orderdate) * 100 + month(o_orderdate) AS period
          FROM orders)
    ORDER BY period DESC
    LIMIT 3
    """,
)
def topk_last_3_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fpl_data_pipeline_spark.plans.flagship import period_col

    return (
        table(spark, sf_dir, "orders")
        .select(period_col())
        .distinct()
        .orderBy(F.col("period").desc())
        .limit(3)
    )


# --- TPC-H Q3 shape: join + agg + top-10 (shipping priority) ----------------
@register(
    "topk_order_revenue",
    f"""
    SELECT l_orderkey,
           CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS revenue,
           year(o.o_orderdate) * 100 + month(o.o_orderdate) AS period
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l_orderkey, year(o.o_orderdate) * 100 + month(o.o_orderdate)
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def topk_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    period = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("period")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey, "left_semi")
        .groupBy("l_orderkey", period)
        .agg(F.sum(revenue_col()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "period")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )
