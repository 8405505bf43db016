"""Bucketed table layout: the shuffle-elimination half of the 100 TB story.

A fact table that is repeatedly joined or aggregated on the same key (the
reference's player-week fact keyed by (ply_id, week_id) — see
/root/reference/sql_queries.py MERGE/join keys — or lineitem⋈orders on the
order key here) should be *stored* pre-partitioned on that key. Spark's
bucketing does exactly that: ``bucketBy(n, key)`` hash-partitions rows into
``n`` files per partition at write time and records the layout in the
catalog; any later equi-join or groupBy on the bucket key reads both sides
already co-located and skips the Exchange entirely — at 100 TB the
difference between an hours-long shuffle of the whole fact table and none.

Design rules encoded here:
- bucket count is chosen once per table from target bucket-file size
  (~128-256 MB post-compression), not per query;
- both join sides must share bucket count (or be exact multiples) for the
  co-located read; we enforce equality;
- bucketed writes also ``sortBy`` the key so merge joins read presorted
  runs (no per-task sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    keys: list[str],
    num_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet-backed catalog table hash-bucketed on
    ``keys``. The explicit ``path`` keeps data out of the default warehouse
    so tests and pipelines control placement; ``overwrite`` makes the write
    idempotent (re-runs replace the table, same as the engine's other
    publish paths)."""
    w = df.write.format("parquet").mode("overwrite").option("path", path)
    w = w.bucketBy(num_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket keys. With matching
    bucket counts the physical plan is a SortMergeJoin whose children are
    bucketed scans — no Exchange on either side (assert with
    ``assert_no_shuffle``)."""
    lb, rb = (_bucket_count(spark, t) for t in (left_table, right_table))
    if lb != rb:
        raise ValueError(
            f"bucket count mismatch: {left_table}={lb} vs {right_table}={rb}; "
            "co-located join requires equal bucket counts"
        )
    return spark.table(left_table).join(spark.table(right_table), on, how)


def _bucket_count(spark: SparkSession, table_name: str) -> int:
    for row in spark.sql(f"DESCRIBE EXTENDED {table_name}").collect():
        if row.col_name == "Num Buckets":
            return int(row.data_type)
    raise ValueError(f"{table_name} is not bucketed")


def assert_no_shuffle(df: DataFrame) -> None:
    """Raise if the physical plan contains any Exchange (shuffle or
    broadcast-exchange is allowed only when it's a broadcast): the
    co-location contract."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line and "BroadcastExchange" not in line:
            raise AssertionError(f"unexpected shuffle in plan:\n{plan}")
