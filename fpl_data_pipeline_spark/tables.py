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
    if name == "events":
        return events_table(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ts as TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader rejects. Read nanos as long (legacy conf, safe to set at
    runtime) and expose both the raw ``ts_ns`` and a microsecond-truncated
    ``ts`` timestamp — identical to how DuckDB/pandas truncate ns->us.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return raw.select(
        "event_id",
        F.col("ts").alias("ts_ns"),
        # integer div: ns ~1.7e18 exceeds double's 53-bit mantissa, so a
        # float division here would corrupt microseconds
        F.timestamp_micros(F.expr("ts div 1000")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def load(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for spark.sql plans."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
