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
    """events.parquet has shipped with two ts layouts across driver testdata
    generations: TIMESTAMP(NANOS) (which Spark's vectorized parquet reader
    only accepts as long via the legacy conf) and plain TIMESTAMP(MICROS).
    Adapt to whichever is on disk and expose the same two columns either
    way: raw ``ts_ns`` (nanos as long) and a microsecond ``ts`` timestamp —
    identical to how DuckDB/pandas read the file.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(raw.schema["ts"].dataType, LongType):
        # TIMESTAMP(NANOS) read as long. Integer div: ns ~1.7e18 exceeds
        # double's 53-bit mantissa, so a float division here would corrupt
        # microseconds.
        ts_ns = F.col("ts")
        ts = F.timestamp_micros(F.expr("ts div 1000"))
    else:
        # TIMESTAMP(MICROS); parquet without tz metadata arrives as NTZ —
        # cast to session-tz timestamp (UTC everywhere in this engine) so
        # downstream window/unix_* semantics match the legacy path.
        ts = F.col("ts").cast("timestamp")
        ts_ns = F.unix_micros(ts) * F.lit(1000).cast("long")
    return raw.select(
        "event_id",
        ts_ns.alias("ts_ns"),
        ts.alias("ts"),
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
