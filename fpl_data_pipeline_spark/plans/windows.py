"""Window functions (SURVEY.md §2.5): the reference's single row_number use
(sql_queries.py:154-156) plus the frame/lag/lead surface a complete engine
needs.

Scale note: unpartitioned windows serialize to one task — acceptable only on
tiny inputs (the reference ranks <=38 gameweeks). Every window here that runs
over fact-sized data is partitioned; the unpartitioned rank runs on the
distinct-period table (<= #months rows).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from fpl_data_pipeline_spark.registry import register
from fpl_data_pipeline_spark.tables import table
from fpl_data_pipeline_spark.functions.exact import dsum, dsum_sql


# --- W1: row_number over global ordering on a tiny ranked set ---------------
@register(
    "window_rank_periods",
    """
    SELECT period, row_number() OVER (ORDER BY period DESC) AS rn
    FROM (SELECT DISTINCT year(o_orderdate) * 100 + month(o_orderdate) AS period
          FROM orders)
    """,
)
def window_rank_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fpl_data_pipeline_spark.plans.flagship import period_col

    return (
        table(spark, sf_dir, "orders")
        .select(period_col())
        .distinct()
        .withColumn("rn", F.row_number().over(Window.orderBy(F.col("period").desc())))
    )


# --- partitioned rank: top-3 orders per customer (deterministic tiebreak) ---
@register(
    "window_rank_per_customer",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_rank_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


# --- lag/lead: period-over-period delta per customer ------------------------
@register(
    "window_lag_delta",
    f"""
    WITH per_period AS (
      SELECT o_custkey, year(o_orderdate) * 100 + month(o_orderdate) AS period,
             {dsum_sql('o_totalprice')} AS spend
      FROM orders GROUP BY o_custkey, year(o_orderdate) * 100 + month(o_orderdate)
    )
    SELECT o_custkey, period, spend,
           spend - COALESCE(lag(spend) OVER (PARTITION BY o_custkey ORDER BY period), 0.0)
             AS spend_delta
    FROM per_period
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fpl_data_pipeline_spark.plans.flagship import period_col
    from fpl_data_pipeline_spark.functions.exact import dsum

    per_period = (
        table(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice", period_col())
        .groupBy("o_custkey", "period")
        .agg(dsum("o_totalprice", "spend"))
    )
    w = Window.partitionBy("o_custkey").orderBy("period")
    return per_period.withColumn(
        "spend_delta",
        F.col("spend") - F.coalesce(F.lag("spend").over(w), F.lit(0.0)),
    )


# --- sliding frame: 3-period moving sum per customer ------------------------
@register(
    "window_moving_sum",
    f"""
    WITH per_period AS (
      SELECT o_custkey, year(o_orderdate) * 100 + month(o_orderdate) AS period,
             {dsum_sql('o_totalprice')} AS spend
      FROM orders GROUP BY o_custkey, year(o_orderdate) * 100 + month(o_orderdate)
    )
    SELECT o_custkey, period,
           CAST(SUM(CAST(spend AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY period
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS moving_3p
    FROM per_period
    """,
)
def window_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fpl_data_pipeline_spark.plans.flagship import period_col
    from fpl_data_pipeline_spark.functions.exact import dsum

    per_period = (
        table(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice", period_col())
        .groupBy("o_custkey", "period")
        .agg(dsum("o_totalprice", "spend"))
    )
    w = Window.partitionBy("o_custkey").orderBy("period").rowsBetween(-2, 0)
    return per_period.select(
        "o_custkey",
        "period",
        F.sum(F.col("spend").cast("decimal(18,2)")).over(w).cast("double").alias("moving_3p"),
    )


# --- ntile + cumulative distribution over customers by balance --------------
@register(
    "window_ntile_cume",
    """
    SELECT c_custkey,
           ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS balance_quartile,
           rank()   OVER (ORDER BY c_acctbal DESC) AS balance_rank
    FROM customer
    """,
)
def window_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global quartile + rank over every customer by balance — WITHOUT the
    unpartitioned window the builtin ntile()/rank() compile to (a
    single-partition sort of the whole customer table: one core, OOM at
    cluster scale).  Decomposition: range-partitioned global numbering
    under the total order (acctbal DESC, custkey ASC), then

    - ntile(4)  = exact bucket arithmetic from (rank, count)
      (``ntile_from_rank`` — bit-identical to the builtin);
    - rank()    = min(row_number) among ties, i.e. MIN(global_rn) OVER
      (PARTITION BY c_acctbal) — a HASH-partitioned window (each balance
      value is its own small partition), never a global sort.

    The oracle keeps the builtin ntile()/rank() spelling."""
    from fpl_data_pipeline_spark.plans.scale_primitives import (
        global_row_numbers,
        ntile_from_rank,
    )

    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    numbered = global_row_numbers(
        c, [F.col("c_acctbal").desc(), F.col("c_custkey").asc()]
    )
    n = numbered.agg(F.count(F.lit(1)).alias("n_all"))
    w_ties = Window.partitionBy("c_acctbal")
    return (
        numbered.crossJoin(F.broadcast(n))
        .select(
            "c_custkey",
            ntile_from_rank("global_rn", "n_all", 4).alias("balance_quartile"),
            F.min("global_rn").over(w_ties).cast("int").alias("balance_rank"),
        )
    )


# --- value window functions: first_value / nth_value / percent_rank ---------
@register(
    "window_value_functions",
    """
    SELECT o_orderkey, o_custkey,
           first_value(o_totalprice) OVER w2 AS first_price,
           nth_value(o_totalprice, 2) OVER w2 AS second_price,
           round(percent_rank() OVER w1, 6) AS pr
    FROM orders
    WINDOW w1 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-addressing window functions over each customer's order history.
    The frame is spelled as explicit ROWS (not the default RANGE) and the
    ordering carries a key tiebreaker — with RANGE, orders sharing a date are
    peers and nth_value becomes engine-order-dependent."""
    o = table(spark, sf_dir, "orders")
    wf = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wr = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(wf).alias("first_price"),
        F.nth_value("o_totalprice", 2).over(wf).alias("second_price"),
        F.round(F.percent_rank().over(wr), 6).alias("pr"),
    )


# --- RANGE frame keyed by time: trailing 30-day spend ------------------------
@register(
    "window_range_30d_spend",
    """
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS spend_30d
    FROM orders
    """,
)
def window_range_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-keyed RANGE frame: each order's trailing-30-day customer spend.
    Spark expresses interval ranges over the epoch-seconds ordering key with
    rangeBetween — peers at the same timestamp are all in-frame on both
    engines (unlike a ROWS spelling). One shuffle on the partition key; the
    in-partition sliding sum is a single sort + linear pass."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("spend_30d"),
    )


# --- decile distribution report over customer lifetime spend -----------------
@register(
    "customer_spend_deciles",
    f"""
    WITH spend AS (
      SELECT o_custkey, {dsum_sql('o_totalprice')} AS total_spend
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT o_custkey, total_spend,
             ntile(10) OVER (ORDER BY total_spend DESC, o_custkey ASC) AS decile
      FROM spend
    )
    SELECT decile,
           COUNT(*) AS n_customers,
           round(MIN(total_spend), 2) AS min_spend,
           round(MAX(total_spend), 2) AS max_spend,
           round(SUM(total_spend), 2) AS decile_total
    FROM ranked
    GROUP BY decile
    """,
)
def customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile distribution report: customers ranked into 10 equal-count
    buckets by lifetime spend (total order pinned by the custkey tiebreak,
    so bucket boundaries are engine-stable), with per-decile count and
    spend range — the concentration chart behind every 'top decile drives
    X%' statement.

    The decile cut runs over customer cardinality (already aggregated, not
    the fact table) — but a builtin ntile is still an unpartitioned window
    (single-partition sort of every customer).  Instead: range-partitioned
    global rank (``global_row_numbers``) + ``ntile_from_rank`` (exact
    SQL-ntile bucket arithmetic from rank and count) — identical buckets,
    oracle keeps NTILE(10), and the plan's only corpus exchange is the
    range partition."""
    from fpl_data_pipeline_spark.plans.scale_primitives import (
        global_row_numbers,
        ntile_from_rank,
    )

    o = table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(dsum("o_totalprice", "total_spend"))
    numbered = global_row_numbers(
        spend, [F.col("total_spend").desc(), F.col("o_custkey").asc()]
    )
    n = numbered.agg(F.count(F.lit(1)).alias("n_all"))
    ranked = numbered.crossJoin(F.broadcast(n)).withColumn(
        "decile", ntile_from_rank("global_rn", "n_all", 10)
    )
    return ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.min("total_spend"), 2).alias("min_spend"),
        F.round(F.max("total_spend"), 2).alias("max_spend"),
        F.round(F.sum("total_spend"), 2).alias("decile_total"),
    )


# --- forecast-evaluation baseline (seasonal naive + MAE/MAPE) ---------------
@register(
    "revenue_forecast_eval",
    """
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    ),
    lagged AS (
      SELECT day, rev,
             LAG(rev, 7) OVER (ORDER BY day ASC) AS f_seasonal,
             LAG(rev, 1) OVER (ORDER BY day ASC) AS f_naive
      FROM daily
    ),
    scored AS (
      SELECT rev,
             abs(rev - f_seasonal) AS ae_s,
             abs(rev - f_naive) AS ae_n,
             CAST(FLOOR(CAST(abs(rev - f_seasonal) AS DOUBLE) / CAST(rev AS DOUBLE)
                        * 1000000 + 0.5) / 1000000 AS DECIMAL(18,6)) AS ape_s
      FROM lagged
      WHERE f_seasonal IS NOT NULL AND f_naive IS NOT NULL
    )
    SELECT COUNT(*) AS n_days,
           CAST(SUM(ae_s) AS DOUBLE) / COUNT(*) AS mae_seasonal7,
           CAST(SUM(ae_n) AS DOUBLE) / COUNT(*) AS mae_naive1,
           CAST(SUM(ape_s) AS DOUBLE) / COUNT(*) AS mape_seasonal7
    FROM scored
    """,
)
def revenue_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline evaluation over the daily revenue series: the
    seasonal-naive predictor (value 7 days ago — the baseline every real
    forecasting model must beat) and the naive-1 predictor, scored by
    MAE/MAPE over all evaluable days. The ops-analytics eval shape: run it
    per release to detect when a model stops beating the baseline.

    The daily series is aggregated FIRST (one shuffle on day; the series
    is tiny relative to the fact table at any scale), so the lag windows
    order a few thousand rows — a global window over an aggregate, not
    over the fact table. Arithmetic is exact end-to-end: daily revenues
    are exact decimals, absolute errors stay decimal, means divide exact
    sums; the one double division (APE) is 6-dp portable-rounded before
    the decimal mean."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    w = Window.orderBy(F.col("day").asc())
    lagged = daily.select(
        "day",
        "rev",
        F.lag("rev", 7).over(w).alias("f_seasonal"),
        F.lag("rev", 1).over(w).alias("f_naive"),
    ).filter(F.col("f_seasonal").isNotNull() & F.col("f_naive").isNotNull())
    ape = (
        F.floor(
            F.abs(F.col("rev") - F.col("f_seasonal")).cast("double")
            / F.col("rev").cast("double")
            * 1000000
            + F.lit(0.5)
        )
        / 1000000
    ).cast("decimal(18,6)")
    scored = lagged.select(
        F.abs(F.col("rev") - F.col("f_seasonal")).alias("ae_s"),
        F.abs(F.col("rev") - F.col("f_naive")).alias("ae_n"),
        ape.alias("ape_s"),
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_days"),
        (F.sum("ae_s").cast("double") / F.count(F.lit(1))).alias("mae_seasonal7"),
        (F.sum("ae_n").cast("double") / F.count(F.lit(1))).alias("mae_naive1"),
        (F.sum("ape_s").cast("double") / F.count(F.lit(1))).alias("mape_seasonal7"),
    )
