"""Oracle-checked upsert query: apply a derived update batch to ``orders``
and aggregate the merged state.

The batch re-prices the latest period's orders (+10%) and adds synthetic new
orders (key-shifted); the query returns per-status counts and exact sums of
the merged table — small, deterministic output that proves both the
update-in-place and the insert path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from fpl_data_pipeline_spark.registry import register
from fpl_data_pipeline_spark.tables import table
from fpl_data_pipeline_spark.operators.upsert import upsert
from fpl_data_pipeline_spark.functions.exact import dsum, dsum_sql


def _update_batch(orders: DataFrame) -> DataFrame:
    """Latest-month orders re-priced +10% (updates) plus the same orders
    key-shifted by +10_000_000 (inserts)."""
    period = F.year("o_orderdate") * 100 + F.month("o_orderdate")
    latest = orders.withColumn("p", period)
    maxp = latest.agg(F.max("p").alias("mp"))
    upd = (
        latest.join(F.broadcast(maxp), F.col("p") == F.col("mp"))
        .drop("p", "mp")
        .withColumn("o_totalprice", (F.col("o_totalprice").cast("decimal(12,2)") * F.lit(1.1).cast("decimal(3,1)")).cast("double"))
    )
    ins = upd.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10_000_000))
    return upd.unionByName(ins)


@register(
    "upsert_merged_state",
    f"""
    WITH latest AS (
      SELECT MAX(year(o_orderdate) * 100 + month(o_orderdate)) AS mp FROM orders
    ),
    upd AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(1.1 AS DECIMAL(3,1)) AS DOUBLE)
               AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders, latest
      WHERE year(o_orderdate) * 100 + month(o_orderdate) = mp
    ),
    batch AS (
      SELECT * FROM upd
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate, o_orderpriority
      FROM upd
    ),
    merged AS (
      SELECT * FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM batch b WHERE b.o_orderkey = o.o_orderkey)
      UNION ALL
      SELECT * FROM batch
    )
    SELECT o_orderstatus, COUNT(*) AS n_orders, {dsum_sql('o_totalprice', scale=3)} AS total
    FROM merged
    GROUP BY o_orderstatus
    """,
)
def upsert_merged_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged-state aggregate over the upserted orders table.

    The repriced rows carry 3-decimal values (decimal(12,2) * 1.1 -> scale 3)
    stored as double, so the exact sum MUST run at scale 3: re-rounding the
    computed double through decimal(18,2) lands on half-cent ties that Spark
    and DuckDB resolve differently (the round-2 driver hash-fail). At scale 3
    every value in the column is representable exactly -> tie-free by
    construction on both engines.
    """
    orders = table(spark, sf_dir, "orders")
    merged = upsert(orders, _update_batch(orders), keys=["o_orderkey"])
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total", scale=3)
    )
