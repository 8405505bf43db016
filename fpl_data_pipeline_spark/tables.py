"""Table access for the driver's synthetic star schema.

``load(spark, sf_dir)`` returns the ten tables as DataFrames; ``views``
registers them as temp views so plans can also be written in Spark SQL.
Reading is plain ``spark.read.parquet`` — schema comes from parquet footers,
filters and projections push down to the scan (verify with
``df.explain('formatted')`` → PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for spark.sql plans."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
