"""Small-file compaction planner — the OPTIMIZE/binpack maintenance pass.

The reference lands one small JSON file per week pull (includes.py
get_bootstrap_data / get_id_data write per-pull artifacts); an hourly event
feed at 100 TB does the same thing thousands of times a day, and small files
are the classic lake killer: every scan pays per-file open/footer costs and
the driver pays per-file planning. Table formats answer with a compaction
pass (Delta OPTIMIZE, Iceberg rewrite_data_files binpack) that coalesces
size-ordered runs of small files into target-size outputs WITHOUT breaking
the sort order of the layout.

This module plans that pass as a pure DataFrame program:

- the file inventory is one row per landed micro-partition (here: each
  (day, hour) cell of the events feed, sized by its row count — at scale
  this comes from the catalog/manifest listing instead, same shape);
- within each day (the rewrite unit — compaction never crosses partition
  boundaries), files are packed IN HOUR ORDER into output bins of target
  size T by streaming offset division: a file starting at cumulative offset
  o joins bin o div T. Contiguous runs are preserved, so a time-ordered
  (or z-ordered; see zorder_layout_stats) layout stays clustered after the
  rewrite.

Scale design: one window cumsum partitioned by day (single shuffle on the
partition key — exactly the parallelism of the real rewrite job), then a
hash agg per (day, bin). No collect; the plan output is one row per day —
the job manifest a scheduler would execute. Invariants (every file in
exactly one bin, bins contiguous, non-final bins reach the target) are
pinned in tests/test_compaction.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from fpl_data_pipeline_spark.registry import register
from fpl_data_pipeline_spark.tables import table

TARGET_ROWS = 100  # target output-file size, in rows (bytes/row is constant here)


def compaction_bins(
    files: DataFrame, part_col: str, order_col: str, size_col: str, target: int
) -> DataFrame:
    """Assign each file to an output bin: streaming pack in ``order_col``
    order within each ``part_col`` partition. Adds ``bin_id`` (integer
    division of the file's starting offset by ``target`` — exact BIGINT
    arithmetic, no double rounding)."""
    w = Window.partitionBy(part_col).orderBy(order_col)
    return files.withColumn(
        "__cum_before", F.sum(size_col).over(w) - F.col(size_col)
    ).withColumn("bin_id", F.expr(f"__cum_before div {target}")).drop("__cum_before")


@register(
    "compaction_plan",
    f"""
    WITH files AS (
      SELECT date_trunc('day', ts) AS day, date_trunc('hour', ts) AS hour,
             COUNT(*) AS size
      FROM events GROUP BY 1, 2
    ),
    packed AS (
      SELECT day, hour, size,
             (SUM(size) OVER (PARTITION BY day ORDER BY hour
                              ROWS UNBOUNDED PRECEDING) - size)
               // {TARGET_ROWS} AS bin_id
      FROM files
    ),
    bins AS (
      SELECT day, bin_id, COUNT(*) AS n_files, SUM(size) AS bin_rows
      FROM packed GROUP BY day, bin_id
    )
    SELECT f.day,
           CAST(f.n_files AS BIGINT) AS n_files,
           CAST(b.n_bins AS BIGINT) AS n_bins,
           CAST(f.files_small_before AS BIGINT) AS files_small_before,
           CAST(b.bins_small_after AS BIGINT) AS bins_small_after,
           CAST(f.rows_day AS BIGINT) AS rows_day,
           CAST(b.max_bin_rows AS BIGINT) AS max_bin_rows
    FROM (
      SELECT day, COUNT(*) AS n_files,
             SUM(CASE WHEN size < {TARGET_ROWS} THEN 1 ELSE 0 END)
               AS files_small_before,
             SUM(size) AS rows_day
      FROM files GROUP BY day
    ) f
    JOIN (
      SELECT day, COUNT(*) AS n_bins,
             SUM(CASE WHEN bin_rows < {TARGET_ROWS} THEN 1 ELSE 0 END)
               AS bins_small_after,
             MAX(bin_rows) AS max_bin_rows
      FROM bins GROUP BY day
    ) b USING (day)
    ORDER BY day
    """,
)
def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day compaction manifest for the events feed's (day, hour)
    micro-partitions: how many landed files, how many output files the
    binpack produces, and how the small-file count collapses."""
    e = table(spark, sf_dir, "events")
    files = e.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("size"))

    packed = compaction_bins(files, "day", "hour", "size", TARGET_ROWS)
    bins = packed.groupBy("day", "bin_id").agg(
        F.count(F.lit(1)).alias("n_files_bin"), F.sum("size").alias("bin_rows")
    )
    per_day_before = files.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum((F.col("size") < TARGET_ROWS).cast("long")).alias("files_small_before"),
        F.sum("size").alias("rows_day"),
    )
    per_day_after = bins.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum((F.col("bin_rows") < TARGET_ROWS).cast("long")).alias("bins_small_after"),
        F.max("bin_rows").alias("max_bin_rows"),
    )
    return (
        per_day_before.join(per_day_after, "day")
        .select(
            "day",
            "n_files",
            "n_bins",
            "files_small_before",
            "bins_small_after",
            "rows_day",
            "max_bin_rows",
        )
        .orderBy("day")
    )


# --- encoding advisor: RLE run counts under candidate sort orders ------------
# Parquet's RLE/dictionary encodings compress in proportion to how few
# value RUNS a column has within each file — which the WRITE-TIME SORT
# ORDER controls. This advisor measures, for candidate layouts, the run
# count of each column (a run boundary = value != previous value in layout
# order): the direct proxy for encoded size that lets a table owner pick
# the sort key before rewriting terabytes (the zorder_layout_stats
# companion: that one measures read-side skipping, this one write-side
# compression). Runs are counted with one lag() window per layout — the
# window orders by the layout's sort key, tie-broken to a total order so
# both engines count identical boundaries.
@register(
    "layout_rle_advisor",
    """
    WITH nat_flags AS (
      SELECT CASE WHEN o_orderstatus <> LAG(o_orderstatus) OVER w
                   OR LAG(o_orderstatus) OVER w IS NULL THEN 1 ELSE 0 END AS sb,
             CASE WHEN o_orderpriority <> LAG(o_orderpriority) OVER w
                   OR LAG(o_orderpriority) OVER w IS NULL THEN 1 ELSE 0 END AS pb
      FROM orders WINDOW w AS (ORDER BY o_orderkey)
    ),
    srt_flags AS (
      SELECT CASE WHEN o_orderstatus <> LAG(o_orderstatus) OVER w
                   OR LAG(o_orderstatus) OVER w IS NULL THEN 1 ELSE 0 END AS sb,
             CASE WHEN o_orderpriority <> LAG(o_orderpriority) OVER w
                   OR LAG(o_orderpriority) OVER w IS NULL THEN 1 ELSE 0 END AS pb
      FROM orders
      WINDOW w AS (ORDER BY o_orderstatus, o_orderpriority, o_orderkey)
    ),
    natural_runs AS (
      SELECT 'natural(orderkey)' AS layout,
             SUM(sb) AS status_runs, SUM(pb) AS priority_runs
      FROM nat_flags
    ),
    sorted_runs AS (
      SELECT 'sorted(status, priority)' AS layout,
             SUM(sb) AS status_runs, SUM(pb) AS priority_runs
      FROM srt_flags
    )
    SELECT layout, CAST(status_runs AS BIGINT) AS status_runs,
           CAST(priority_runs AS BIGINT) AS priority_runs
    FROM natural_runs
    UNION ALL
    SELECT layout, CAST(status_runs AS BIGINT), CAST(priority_runs AS BIGINT)
    FROM sorted_runs
    ORDER BY layout
    """,
)
def layout_rle_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run counts of the low-cardinality order columns under the natural
    vs status-sorted layout — the write-side compression advisor (sorted
    layout collapses status to ~3 runs and priority to ~15).

    The exact global run count comes from ``global_run_counts``
    (plans/scale_primitives.py): per-range-partition boundary counting
    with a <= RANGE_PARTS-row seam correction — no single-partition sort
    of the fact table; property-tested against a pandas ground truth over
    random multi-run data."""
    from fpl_data_pipeline_spark.plans.scale_primitives import global_run_counts

    o = table(spark, sf_dir, "orders")

    def runs(layout_name: str, order_cols: list) -> DataFrame:
        return global_run_counts(
            o.select("o_orderkey", "o_orderstatus", "o_orderpriority"),
            order_cols,
            ["o_orderstatus", "o_orderpriority"],
        ).select(
            F.lit(layout_name).alias("layout"),
            F.col("o_orderstatus_runs").alias("status_runs"),
            F.col("o_orderpriority_runs").alias("priority_runs"),
        )

    nat = runs("natural(orderkey)", [F.col("o_orderkey")])
    srt = runs(
        "sorted(status, priority)",
        [F.col("o_orderstatus"), F.col("o_orderpriority"), F.col("o_orderkey")],
    )
    return nat.unionAll(srt).orderBy("layout")
