"""Aggregate rollup routing — the materialized-view navigator.

A warehouse that maintains aggregate views (see operators/ivm.py) only
profits if queries actually READ them: the router answers a coarse
aggregate from a finer maintained view whenever the requested grouping is
a subset of the view's grouping and every requested measure is
re-aggregable (SUM/COUNT roll up; MIN/MAX roll up; AVG only via
SUM+COUNT) — the classic summary-table navigation of Oracle query rewrite
/ BigQuery materialized views.

At 100 TB this is the difference between scanning the fact table and
scanning a view that is orders of magnitude smaller; correctness rests on
the rollup algebra, which the registered query PROVES: Spark answers the
segment-level question by re-aggregating the (segment x month) view, the
DuckDB oracle computes straight from the base fact join, and the driver
hash-compares them — exact-decimal partials make the two bit-identical.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from fpl_data_pipeline_spark.registry import register
from fpl_data_pipeline_spark.tables import table
from fpl_data_pipeline_spark.functions.exact import dsum_sql


def can_route(requested_keys: list[str], view_keys: list[str]) -> bool:
    """A query groups coarser-or-equal than the view -> routable."""
    return set(requested_keys).issubset(set(view_keys))


def route_rollup(
    view: DataFrame,
    requested_keys: list[str],
    view_keys: list[str],
    sum_cols: list[str],
    count_col: str,
) -> DataFrame:
    """Answer groupBy(requested_keys) from the finer view: SUM the sum
    partials and the count partial. Raises if the grouping is not
    routable — the caller then falls back to the base table."""
    if not can_route(requested_keys, view_keys):
        raise ValueError(
            f"grouping {requested_keys} not answerable from view keyed {view_keys}"
        )
    aggs = [F.sum(c).alias(c) for c in sum_cols] + [
        F.sum(count_col).cast("long").alias(count_col)
    ]
    return view.groupBy(*requested_keys).agg(*aggs)


@register(
    "rollup_routed_revenue",
    f"""
    SELECT c.c_mktsegment,
           {dsum_sql('o.o_totalprice')} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def rollup_routed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level revenue answered FROM the maintained (segment, month)
    view — Spark never re-groups the base fact rows at segment level; the
    oracle computes from base, so hash equality proves the rollup algebra.
    The view partials stay DECIMAL until the final cast (exact,
    order-independent)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    # the maintained view (in production: read from its bucketed table /
    # kept current by operators/ivm.py — here derived in-plan)
    month = F.expr(
        "unix_micros(cast(o_orderdate as timestamp)) div 86400000000 div 30"
    )
    view = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", month.alias("month_bucket"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    routed = route_rollup(
        view,
        requested_keys=["c_mktsegment"],
        view_keys=["c_mktsegment", "month_bucket"],
        sum_cols=["revenue"],
        count_col="n_orders",
    )
    return routed.select(
        "c_mktsegment",
        F.col("revenue").cast("double").alias("revenue"),
        "n_orders",
    ).orderBy("c_mktsegment")
