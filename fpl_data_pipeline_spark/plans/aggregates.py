"""Aggregation operators (SURVEY.md §2.4): hash aggregates, filtered
aggregates/manual pivot, DISTINCT, COUNT, high-water-mark MAX, plus the
approximate aggregates the 100 TB track adds.

Physical notes: every groupBy below is a partial (map-side) aggregate followed
by one shuffle on the grouping key; sums over doubles use the decimal-exact
convention (functions/exact.py) so results hash-match DuckDB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from fpl_data_pipeline_spark.registry import register
from fpl_data_pipeline_spark.tables import table
from fpl_data_pipeline_spark.functions.exact import (
    dsum,
    dsum_sql,
    revenue_col,
    REVENUE_SQL,
    charge_col,
    CHARGE_SQL,
    psum,
    portable_round,
    portable_round_sql,
)


# --- A1 (+TPC-H Q1 shape): multi-sum hash aggregate (sql_queries.py:129-137)
@register(
    "agg_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           CAST(SUM({REVENUE_SQL}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({CHARGE_SQL}) AS DOUBLE) AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        psum(revenue_col(), "sum_disc_price"),
        psum(charge_col(), "sum_charge"),
        F.count(F.lit(1)).alias("count_order"),
    )


# --- A2: ratio over filtered input with constant divisor (sql_queries.py:160-167)
@register(
    "agg_avg_const_divisor",
    f"""
    WITH ranked AS (
      SELECT period, row_number() OVER (ORDER BY period DESC) AS rn
      FROM (SELECT DISTINCT year(o_orderdate) * 100 + month(o_orderdate) AS period
            FROM orders)
    )
    SELECT o_custkey,
           {portable_round_sql(dsum_sql('o_totalprice') + ' / 4')} AS avg_4_periods
    FROM (SELECT o_custkey, o_totalprice,
                 year(o_orderdate) * 100 + month(o_orderdate) AS period
          FROM orders) f
    JOIN ranked USING (period)
    WHERE rn <= 4
    GROUP BY o_custkey
    """,
)
def agg_avg_const_divisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Reference semantics preserved exactly: divide by constant 4 even when a
    # customer was active in fewer of the last-4 periods.
    from pyspark.sql import Window
    from fpl_data_pipeline_spark.plans.flagship import period_col

    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice", period_col())
    ranked = (
        o.select("period")
        .distinct()
        .withColumn("rn", F.row_number().over(Window.orderBy(F.col("period").desc())))
        .filter(F.col("rn") <= 4)
    )
    return (
        o.join(F.broadcast(ranked), "period")
        .groupBy("o_custkey")
        .agg(portable_round(dsum("o_totalprice") / 4).alias("avg_4_periods"))
    )


# --- A3: filtered aggregate / manual pivot (sql_queries.py:152-159) ---------
@register(
    "agg_filtered_pivot",
    """
    SELECT o_custkey,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
           COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH')   AS n_high,
           MAX(o_totalprice) FILTER (WHERE o_orderstatus = 'F') AS max_finished
    FROM orders
    GROUP BY o_custkey
    """,
)
def agg_filtered_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("n_urgent"),
        F.count(F.when(F.col("o_orderpriority") == "2-HIGH", 1)).alias("n_high"),
        F.max(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))).alias(
            "max_finished"
        ),
    )


# --- A4: 6-sum aggregate + derived sum-of-sums (sql_queries.py:220-232) -----
@register(
    "agg_supplier_stats",
    f"""
    SELECT l_suppkey,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_price,
           {dsum_sql('l_discount')} AS sum_disc,
           {dsum_sql('l_tax')} AS sum_tax,
           COUNT(*) AS n_lines,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           {dsum_sql('l_quantity')} + {dsum_sql('l_extendedprice')} AS total_xi
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def agg_supplier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    out = li.groupBy("l_suppkey").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_price"),
        dsum("l_discount", "sum_disc"),
        dsum("l_tax", "sum_tax"),
        F.count(F.lit(1)).alias("n_lines"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )
    return out.withColumn("total_xi", F.col("sum_qty") + F.col("sum_price"))


# --- A5: DISTINCT (sql_queries.py:138-143) ----------------------------------
@register(
    "distinct_periods",
    """
    SELECT DISTINCT year(o_orderdate) * 100 + month(o_orderdate) AS period
    FROM orders
    """,
)
def distinct_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fpl_data_pipeline_spark.plans.flagship import period_col

    return table(spark, sf_dir, "orders").select(period_col()).distinct()


# --- A6: COUNT + grouped counts (sql_queries.py:195) ------------------------
@register(
    "count_by_status",
    """
    SELECT o_orderstatus, COUNT(*) AS n, COUNT(DISTINCT o_custkey) AS n_custs
    FROM orders GROUP BY o_orderstatus
    """,
)
def count_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("o_custkey").alias("n_custs"),
    )


# --- A7/T7: high-water mark with empty-table default (sql_queries.py:275-276)
@register(
    "high_water_mark",
    """
    SELECT COALESCE(MAX(event_id), 0) AS last_id
    FROM events WHERE event_type = 'purchase'
    """,
)
def high_water_mark(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") == "purchase")
        .agg(F.coalesce(F.max("event_id"), F.lit(0)).alias("last_id"))
    )


# --- scale-track: approximate distinct (sketch-contract oracle) -------------
@register(
    "approx_distinct_customers",
    """
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS exact_custs,
           TRUE AS sketch_ok
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def approx_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ sketch — the 100 TB substitute for COUNT(DISTINCT).

    Sketch values are engine-specific, so the oracle checks the sketch's
    CONTRACT instead: ``sketch_ok`` asserts |approx - exact| <= 5% * exact
    (2.5 sigma at rsd=0.02) Spark-side; the oracle emits the exact count and
    literal TRUE. HLL register merge is max-based, so the approx value is
    deterministic under any partitioning and the boolean is stable. A
    misbehaving sketch flips the boolean and fails the hash."""
    o = table(spark, sf_dir, "orders")
    exact = F.countDistinct("o_custkey")
    approx = F.approx_count_distinct("o_custkey", 0.02)
    return o.groupBy("o_orderstatus").agg(
        exact.alias("exact_custs"),
        (
            F.abs(approx.cast("double") - exact.cast("double"))
            <= F.lit(0.05) * exact.cast("double")
        ).alias("sketch_ok"),
    )


# --- scale-track: quantile sketch (sketch-contract oracle) ------------------
@register(
    "approx_quantiles_price",
    """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
           round(quantile_cont(o_totalprice, 0.95), 6) AS p95,
           TRUE AS p50_in_band,
           TRUE AS p95_in_band
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def approx_quantiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (GK sketch) — the 100 TB substitute for exact
    percentiles — oracle-checked via its contract: scalar columns only (the
    driver's canonicalizer can't sort array cells), exact interpolated
    percentiles (match DuckDB quantile_cont bit-for-bit after 6-dp rounding)
    plus booleans asserting the sketch value lands inside a generous rank
    band (accuracy=10000 guarantees rank error <= n/10000; the band allows
    n/100). The oracle emits the exact values and literal TRUE."""
    o = table(spark, sf_dir, "orders")
    q = F.percentile_approx("o_totalprice", [0.5, 0.95], 10000)
    a50, a95 = F.element_at(q, 1), F.element_at(q, 2)
    pct = lambda p: F.percentile("o_totalprice", F.lit(p))  # noqa: E731
    return o.groupBy("o_orderstatus").agg(
        F.round(pct(0.5), 6).alias("p50"),
        F.round(pct(0.95), 6).alias("p95"),
        a50.between(pct(0.49), pct(0.51)).alias("p50_in_band"),
        a95.between(pct(0.94), pct(0.96)).alias("p95_in_band"),
    )


# --- statistical aggregate catalog ------------------------------------------
@register(
    "stats_agg_lineitem",
    """
    SELECT l_returnflag,
           round(avg(l_quantity), 6) AS avg_qty,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(var_samp(l_quantity), 6) AS var_qty,
           round(corr(l_quantity, l_discount), 6) AS corr_qd,
           round(covar_samp(l_quantity, l_discount), 6) AS covar_qd
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def stats_agg_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/correlation/covariance)
    per group — single-pass numerically-stable accumulators on
    both engines, partial-agg + one shuffle like any hash aggregate. Kept
    on small-magnitude columns (quantity 1-50, discount 0-0.1) and rounded
    to 6 dp so the engines' accumulation-order difference (~1e-12 relative)
    stays below the hash tolerance."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_discount"), 6).alias("corr_qd"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("covar_qd"),
    )


# --- robust outlier gate: median absolute deviation ------------------------
@register(
    "outlier_mad_prices",
    """
    WITH med AS (
      SELECT o_orderstatus, quantile_cont(o_totalprice, 0.5) AS med
      FROM orders GROUP BY o_orderstatus
    ),
    dev AS (
      SELECT o.o_orderstatus, abs(o.o_totalprice - m.med) AS adev, m.med
      FROM orders o JOIN med m ON o.o_orderstatus = m.o_orderstatus
    ),
    mad AS (
      SELECT o_orderstatus, quantile_cont(adev, 0.5) AS mad, MIN(med) AS med
      FROM dev GROUP BY o_orderstatus
    )
    SELECT d.o_orderstatus,
           round(m.med, 6) AS median_price,
           round(m.mad, 6) AS mad_price,
           CAST(SUM(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM dev d JOIN mad m ON d.o_orderstatus = m.o_orderstatus
    GROUP BY d.o_orderstatus, m.med, m.mad
    """,
)
def outlier_mad_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per group: median absolute deviation (the
    estimator that, unlike stddev, one fat-tailed order can't inflate) and
    the count of > 3-MAD orders — the data-quality gate before aggregate
    dashboards. Two exact-percentile passes + one count; the median table
    is group-cardinality, broadcast back both times. The exact percentile
    becomes percentile_approx on the 100 TB path (same plan shape, one pass
    per percentile either way)."""
    o = table(spark, sf_dir, "orders")
    med = o.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("med")
    )
    dev = o.join(F.broadcast(med), "o_orderstatus").select(
        "o_orderstatus", "med", F.abs(F.col("o_totalprice") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("o_orderstatus").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad"), F.min("med").alias("med")
    )
    return (
        dev.drop("med")
        .join(F.broadcast(mad), "o_orderstatus")
        .groupBy("o_orderstatus", "med", "mad")
        .agg(
            F.sum((F.col("adev") > 3 * F.col("mad")).cast("int")).cast("long").alias("n_outliers")
        )
        .select(
            "o_orderstatus",
            F.round("med", 6).alias("median_price"),
            F.round("mad", 6).alias("mad_price"),
            "n_outliers",
        )
    )


# --- KMV (k-minimum-values) distinct sketch: mergeable AND exact-oracled ----
KMV_K = 256


@register(
    "kmv_distinct_union",
    f"""
    WITH tagged AS (
      SELECT DISTINCT event_type, user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               / 4294967296.0 AS u
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    per_type AS (
      SELECT event_type, u FROM (
        SELECT event_type, u,
               row_number() OVER (PARTITION BY event_type ORDER BY u ASC) AS rn
        FROM tagged
      ) WHERE rn <= {KMV_K}
    ),
    merged AS (
      SELECT u FROM (
        SELECT u, row_number() OVER (ORDER BY u ASC) AS rn
        FROM (SELECT DISTINCT u FROM per_type)
      ) WHERE rn <= {KMV_K}
    ),
    est AS (
      -- under-full sketch (< k values) holds the whole key set: exact count
      SELECT CASE WHEN COUNT(*) < {KMV_K} THEN CAST(COUNT(*) AS DOUBLE)
                  ELSE ({KMV_K} - 1) / MAX(u) END AS est_union
      FROM merged
    ),
    exact AS (
      SELECT COUNT(DISTINCT user_id) AS exact_union
      FROM events WHERE event_type IN ('click', 'purchase')
    )
    SELECT {KMV_K} AS k,
           round(e.est_union, 6) AS est_union,
           CAST(x.exact_union AS BIGINT) AS exact_union,
           round(abs(e.est_union - x.exact_union) / x.exact_union, 6) AS rel_err
    FROM est e CROSS JOIN exact x
    """,
)
def kmv_distinct_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct sketch, the mergeable
    set-cardinality estimator: per event type keep the k smallest
    uniform hashes of the key; the UNION's sketch is just the k smallest
    of the concatenated sketches (merge = top-k of a union — associative,
    partition-order-free), and the estimate is (k-1)/theta with theta the
    k-th smallest hash. Unlike HLL registers, every intermediate here is
    a deterministic order statistic of md5 values — so this sketch's
    VALUE (not just its contract) is oracle-checked bit-for-bit, and the
    query itself reports the realized relative error against the exact
    count.

    Scale shape: per-type sketches are top-k aggregates (per-partition
    heaps, k rows to the merge — no full shuffle of the key space); the
    union merge touches 2k rows. At 100 TB per-shard KMV sketches are
    persisted next to each partition and any cross-shard distinct query
    is a k-row merge instead of a COUNT(DISTINCT) shuffle."""
    ev = table(spark, sf_dir, "events")
    u = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .cast("double")
        / F.lit(4294967296.0)
    )
    tagged = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type", "user_id")
        .distinct()
        .select("event_type", u.alias("u"))
    )
    wk = Window.partitionBy("event_type").orderBy(F.asc("u"))
    per_type = (
        tagged.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= KMV_K)
        .select("event_type", "u")
    )
    merged = (
        per_type.select("u")
        .distinct()
        .orderBy(F.asc("u"))
        .limit(KMV_K)
    )
    est = merged.agg(
        F.when(
            F.count(F.lit(1)) < KMV_K, F.count(F.lit(1)).cast("double")
        )
        .otherwise((F.lit(KMV_K) - 1) / F.max("u"))
        .alias("est_union")
    )
    exact = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .agg(F.countDistinct("user_id").alias("exact_union"))
    )
    j = F.broadcast(est).crossJoin(F.broadcast(exact))
    return j.select(
        F.lit(KMV_K).alias("k"),
        F.round("est_union", 6).alias("est_union"),
        F.col("exact_union"),
        F.round(
            F.abs(F.col("est_union") - F.col("exact_union")) / F.col("exact_union"), 6
        ).alias("rel_err"),
    )


# --- ANALYZE-style column statistics (CBO stats collection) -----------------
@register(
    "table_stats_orders",
    """
    WITH a AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(o_orderkey) AS nn_orderkey, COUNT(DISTINCT o_orderkey) AS ndv_orderkey,
             CAST(MIN(o_orderkey) AS VARCHAR) AS min_orderkey, CAST(MAX(o_orderkey) AS VARCHAR) AS max_orderkey,
             COUNT(o_custkey) AS nn_custkey, COUNT(DISTINCT o_custkey) AS ndv_custkey,
             CAST(MIN(o_custkey) AS VARCHAR) AS min_custkey, CAST(MAX(o_custkey) AS VARCHAR) AS max_custkey,
             COUNT(o_orderstatus) AS nn_status, COUNT(DISTINCT o_orderstatus) AS ndv_status,
             MIN(o_orderstatus) AS min_status, MAX(o_orderstatus) AS max_status,
             COUNT(o_totalprice) AS nn_price, COUNT(DISTINCT o_totalprice) AS ndv_price,
             CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS min_price,
             CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS max_price,
             COUNT(o_orderdate) AS nn_date, COUNT(DISTINCT o_orderdate) AS ndv_date,
             strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') AS min_date,
             strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS max_date,
             COUNT(o_orderpriority) AS nn_prio, COUNT(DISTINCT o_orderpriority) AS ndv_prio,
             MIN(o_orderpriority) AS min_prio, MAX(o_orderpriority) AS max_prio
      FROM orders
    )
    SELECT 'o_orderkey' AS col_name, n_rows, n_rows - nn_orderkey AS n_nulls,
           ndv_orderkey AS ndv, min_orderkey AS min_val, max_orderkey AS max_val FROM a
    UNION ALL
    SELECT 'o_custkey', n_rows, n_rows - nn_custkey, ndv_custkey, min_custkey, max_custkey FROM a
    UNION ALL
    SELECT 'o_orderstatus', n_rows, n_rows - nn_status, ndv_status, min_status, max_status FROM a
    UNION ALL
    SELECT 'o_totalprice', n_rows, n_rows - nn_price, ndv_price, min_price, max_price FROM a
    UNION ALL
    SELECT 'o_orderdate', n_rows, n_rows - nn_date, ndv_date, min_date, max_date FROM a
    UNION ALL
    SELECT 'o_orderpriority', n_rows, n_rows - nn_prio, ndv_prio, min_prio, max_prio FROM a
    ORDER BY col_name
    """,
)
def table_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE-equivalent column statistics in ONE scan: per column
    row count, null count, exact NDV, lexical/numeric min and max — the
    stats a cost-based optimizer (and a data-quality monitor) consumes.
    All aggregates fuse into a single hash-aggregate pass over the table
    (Spark expands multiple COUNT(DISTINCT) via one expand + partial aggs);
    the per-column reshape is a zero-shuffle 1-row stack. String renderings
    are pinned (decimal for money, explicit timestamp format) so both
    engines print identical values."""
    from fpl_data_pipeline_spark.operators.dedup import _ensure_parallel

    # Round-11: the sf0.1 orders scan is one split, so the 6-way
    # COUNT(DISTINCT) Expand (7x row multiplication) and every partial agg
    # ran on one task (3.6 of 3.6 stage-seconds single-threaded); the
    # conditional fan-out costs one small exchange of the projected
    # columns and parallelizes the whole pass.
    o = _ensure_parallel(table(spark, sf_dir, "orders"))
    # Round-11: min/max over the two STRING columns used to sit in the same
    # aggregate as the six COUNT(DISTINCT)s — a string aggregation buffer is
    # not hash-aggregable, so EVERY level of the distinct rewrite fell back
    # to SortAggregate and the 7x Expand output (1M rows at sf0.1) was
    # sorted twice (66 stage-CPU-seconds). Splitting the two string min/max
    # pairs into their own buffer-cheap global pass restores HashAggregate
    # for the heavy Expand side; the extra pass scans only the two pruned
    # string columns (columnar read, no Expand, no sort).
    a_num = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            x
            for c, mn, mx in (
                ("o_orderkey", F.min("o_orderkey").cast("string"), F.max("o_orderkey").cast("string")),
                ("o_custkey", F.min("o_custkey").cast("string"), F.max("o_custkey").cast("string")),
                ("o_orderstatus", None, None),
                (
                    "o_totalprice",
                    F.min("o_totalprice").cast("decimal(18,2)").cast("string"),
                    F.max("o_totalprice").cast("decimal(18,2)").cast("string"),
                ),
                (
                    "o_orderdate",
                    F.date_format(F.min("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
                    F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
                ),
                ("o_orderpriority", None, None),
            )
            for x in (
                [
                    F.count(c).alias(f"nn_{c}"),
                    F.countDistinct(c).alias(f"ndv_{c}"),
                ]
                + ([mn.alias(f"min_{c}"), mx.alias(f"max_{c}")] if mn is not None else [])
            )
        ],
    )
    a_str = o.select("o_orderstatus", "o_orderpriority").agg(
        F.min("o_orderstatus").alias("min_o_orderstatus"),
        F.max("o_orderstatus").alias("max_o_orderstatus"),
        F.min("o_orderpriority").alias("min_o_orderpriority"),
        F.max("o_orderpriority").alias("max_o_orderpriority"),
    )
    a = a_num.crossJoin(F.broadcast(a_str))
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    stack_args = ", ".join(
        f"'{c}', n_rows - nn_{c}, ndv_{c}, min_{c}, max_{c}" for c in cols
    )
    return a.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (col_name, n_nulls, ndv, min_val, max_val)",
        "n_rows",
    ).select("col_name", "n_rows", "n_nulls", "ndv", "min_val", "max_val").orderBy(
        "col_name"
    )


# --- mergeable hash-sample quantile sketch ----------------------------------
SAMPLE_K = 256


@register(
    "hash_sample_quantiles",
    f"""
    WITH smp AS (
      SELECT o_totalprice FROM orders
      ORDER BY md5(CAST(o_orderkey AS VARCHAR)) ASC, o_orderkey ASC
      LIMIT {SAMPLE_K}
    ),
    e AS (SELECT quantile_cont(o_totalprice,
            [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs FROM smp),
    x AS (SELECT quantile_cont(o_totalprice,
            [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs FROM orders),
    d AS (SELECT unnest(range(1, 10)) AS i)
    SELECT CAST(d.i * 10 AS BIGINT) AS pct,
           round(e.qs[i], 3) AS sample_est,
           round(x.qs[i], 3) AS exact_value,
           round(abs(e.qs[i] - x.qs[i]), 3) AS abs_err
    FROM d CROSS JOIN e CROSS JOIN x
    ORDER BY pct
    """,
)
def hash_sample_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a MERGEABLE bottom-k hash sample: the
    {SAMPLE_K} rows with the smallest md5(key) are a deterministic uniform
    sample (hash rank is independent of the value), and bottom-k sets merge
    across shards/batches by union + re-take-bottom-k — the same
    mergeability contract as the KMV distinct sketch, here answering
    quantile queries. Output: sampled vs exact deciles with realized error
    (KMV answers 'how many distinct', this answers 'how is it
    distributed' from constant state).

    Scale shape: the sample is a distributed TakeOrdered (per-partition
    bottom-k heaps + driver merge of k rows — no global sort); the exact
    side is the one real percentile pass, present only as the eval
    baseline."""
    o = table(spark, sf_dir, "orders")
    qs = F.array(*[F.lit(i / 10) for i in range(1, 10)])
    smp = (
        o.orderBy(F.md5(F.col("o_orderkey").cast("string")).asc(), F.col("o_orderkey").asc())
        .limit(SAMPLE_K)
        .agg(F.percentile("o_totalprice", qs).alias("eqs"))
    )
    exact = o.agg(F.percentile("o_totalprice", qs).alias("xqs"))
    grid = smp.crossJoin(F.broadcast(exact)).select(
        F.posexplode("eqs").alias("idx", "est"), "xqs"
    )
    return (
        grid.select(
            ((F.col("idx") + 1) * 10).cast("bigint").alias("pct"),
            F.round("est", 3).alias("sample_est"),
            F.round(F.element_at("xqs", F.col("idx") + 1), 3).alias("exact_value"),
            F.round(
                F.abs(F.col("est") - F.element_at("xqs", F.col("idx") + 1)), 3
            ).alias("abs_err"),
        )
        .orderBy("pct")
    )


# --- CMS-based join-cardinality estimation (shuffle-size prediction) --------
JS_D = 4  # sketch rows
JS_W = 1024  # cells per row


@register(
    "cms_join_size_estimate",
    f"""
    WITH keyed AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id),
    exact AS (
      SELECT CAST(SUM(c * c) AS BIGINT) AS exact_rows,
             CAST(MAX(c) AS BIGINT) AS max_key_rows
      FROM keyed
    ),
    cells AS (
      SELECT j,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':' || j), 1, 8))::BIGINT
               % {JS_W} AS cell,
             SUM(c) AS cnt
      FROM keyed CROSS JOIN (SELECT unnest(range({JS_D})) AS j)
      GROUP BY 1, 2
    ),
    per_row AS (SELECT j, CAST(SUM(cnt * cnt) AS BIGINT) AS est FROM cells GROUP BY j),
    sk AS (SELECT MIN(est) AS cms_estimate FROM per_row)
    SELECT e.exact_rows AS exact_selfjoin_rows,
           sk.cms_estimate,
           FLOOR(CAST(sk.cms_estimate AS DOUBLE) / e.exact_rows * 1000000 + 0.5)
             / 1000000 AS overestimate_ratio,
           e.max_key_rows
    FROM exact e CROSS JOIN sk
    """,
)
def cms_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from a count sketch — the planner-side
    use of CMS: the self-join size on a key (= SUM over keys of c^2, the
    F2 moment) predicts the shuffle/output volume of any equi-join on that
    key BEFORE running it; the sketch answer needs only {JS_D}x{JS_W}
    counters per table and merges across shards cell-wise. Estimate =
    min over rows of SUM(cell^2) — one-sided (collisions only inflate),
    so overestimate_ratio >= 1 measures sketch width adequacy; max_key_rows
    flags the skewed-key share of the volume (the salting trigger).

    Built from per-key partial counts like cms_heavy_hitters: cell fan-out
    is per DISTINCT key, and every aggregate is a tiny hash agg."""
    e = table(spark, sf_dir, "events")
    keyed = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    exact = keyed.agg(
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("exact_rows"),
        F.max("c").cast("bigint").alias("max_key_rows"),
    )
    cells = (
        keyed.select(
            "user_id",
            "c",
            F.explode(F.array(*[F.lit(j) for j in range(JS_D)])).alias("j"),
        )
        .withColumn(
            "cell",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("user_id").cast("string"), F.lit(":"), F.col("j")
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(JS_W),
            ),
        )
        .groupBy("j", "cell")
        .agg(F.sum("c").alias("cnt"))
    )
    sk = (
        cells.groupBy("j")
        .agg(F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("est"))
        .agg(F.min("est").alias("cms_estimate"))
    )
    return exact.crossJoin(F.broadcast(sk)).select(
        F.col("exact_rows").alias("exact_selfjoin_rows"),
        "cms_estimate",
        (
            F.floor(
                F.col("cms_estimate").cast("double") / F.col("exact_rows") * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("overestimate_ratio"),
        "max_key_rows",
    )


# --- equi-depth histogram (the CBO stats histogram) -------------------------
HIST_BUCKETS = 32


@register(
    "table_histogram_price",
    f"""
    WITH b AS (
      SELECT list_transform(
               quantile_cont(o_totalprice,
                 list_transform(range(1, {HIST_BUCKETS}), i -> i / {HIST_BUCKETS}.0)),
               q -> FLOOR(q * 1000000 + 0.5) / 1000000) AS bounds
      FROM orders
    ),
    assigned AS (
      SELECT len(list_filter(b.bounds, x -> x < o_totalprice)) + 1 AS bucket,
             o_totalprice
      FROM orders CROSS JOIN b
    )
    SELECT bucket, COUNT(*) AS n_rows,
           CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS DOUBLE) AS lo,
           CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS DOUBLE) AS hi
    FROM assigned
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def table_histogram_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-height) histogram of o_totalprice — the histogram
    half of ANALYZE statistics (table_stats_orders is the scalar half):
    {HIST_BUCKETS} buckets of ~equal row count with realized bounds, the
    selectivity-estimation input for range predicates on skewed columns
    where equal-WIDTH buckets mislead.

    Boundary portability: the quantile interpolation arithmetic can differ
    in the last float bit between engines, so boundaries are 6-dp
    portable-rounded BEFORE assignment; data values are 2-decimal money, so
    a rounded boundary can only coincide with a data value when the
    quantile landed exactly on it — in which case both engines agree
    exactly. Assignment is a broadcast of the {HIST_BUCKETS - 1}-value
    boundary array + a map-side count-of-smaller-bounds; the histogram is
    one hash aggregate."""
    o = table(spark, sf_dir, "orders")
    qs = F.array(*[F.lit(i / HIST_BUCKETS) for i in range(1, HIST_BUCKETS)])
    b = F.broadcast(
        o.agg(
            F.transform(
                F.percentile("o_totalprice", qs),
                lambda q: F.floor(q * 1000000 + F.lit(0.5)) / 1000000,
            ).alias("bounds")
        )
    )
    assigned = o.crossJoin(b).select(
        (
            F.size(F.filter("bounds", lambda x: x < F.col("o_totalprice"))) + 1
        ).alias("bucket"),
        "o_totalprice",
    )
    return (
        assigned.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_totalprice").cast("decimal(18,2)").cast("double").alias("lo"),
            F.max("o_totalprice").cast("decimal(18,2)").cast("double").alias("hi"),
        )
        .orderBy("bucket")
    )


# --- join-key skew diagnosis (strategy picker) ------------------------------
def _skew_sql(tbl: str, col: str) -> str:
    return f"""
    SELECT '{tbl}.{col}' AS join_key,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           COUNT(*) AS n_keys,
           CAST(MAX(c) AS BIGINT) AS max_key_rows,
           round(quantile_cont(c, 0.50), 3) AS p50_key_rows,
           round(quantile_cont(c, 0.99), 3) AS p99_key_rows,
           FLOOR(CAST(MAX(c) AS DOUBLE) / SUM(c) * 1000000 + 0.5) / 1000000
             AS top1_share,
           CASE
             WHEN CAST(MAX(c) AS DOUBLE) / SUM(c) > 0.01
                  OR CAST(MAX(c) AS DOUBLE) / quantile_cont(c, 0.50) > 100
               THEN 'salt_or_aqe_skew_join'
             WHEN COUNT(*) <= 1000 THEN 'broadcast_other_side'
             ELSE 'hash_partition'
           END AS recommended
    FROM (SELECT COUNT(*) AS c FROM {tbl} GROUP BY {col})
    """


@register(
    "join_skew_report",
    " UNION ALL ".join(
        [
            _skew_sql("lineitem", "l_orderkey"),
            _skew_sql("orders", "o_custkey"),
            _skew_sql("events", "user_id"),
        ]
    )
    + " ORDER BY join_key",
)
def join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis across the three hot join columns: key-count
    distribution stats (max / p50 / p99 key cardinality, hottest-key row
    share) plus the strategy a planner should pick — salt/AQE-skew-join
    when one key owns >1% of rows or max/median >100, broadcast when the
    keyed side is tiny, plain hash partitioning otherwise. This is the
    diagnosis that justifies salted_agg_user_activity /
    salted_join_user_spend BEFORE paying their two-stage cost; at 100 TB
    you run it once per table from the same per-key partial counts every
    aggregate already computes (one shuffle per column, aggregate output
    is one row)."""

    def one(tbl: str, col: str) -> DataFrame:
        keyed = table(spark, sf_dir, tbl).groupBy(col).agg(
            F.count(F.lit(1)).alias("c")
        )
        max_c = F.max("c").cast("bigint")
        sum_c = F.sum("c")
        p50 = F.percentile("c", F.lit(0.50))
        share = max_c.cast("double") / sum_c
        return keyed.agg(
            F.lit(f"{tbl}.{col}").alias("join_key"),
            sum_c.cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            max_c.alias("max_key_rows"),
            F.round(p50, 3).alias("p50_key_rows"),
            F.round(F.percentile("c", F.lit(0.99)), 3).alias("p99_key_rows"),
            (F.floor(share * 1000000 + F.lit(0.5)) / 1000000).alias("top1_share"),
            F.when(
                (share > 0.01) | (max_c.cast("double") / p50 > 100),
                "salt_or_aqe_skew_join",
            )
            .when(F.count(F.lit(1)) <= 1000, "broadcast_other_side")
            .otherwise("hash_partition")
            .alias("recommended"),
        )

    return (
        one("lineitem", "l_orderkey")
        .unionAll(one("orders", "o_custkey"))
        .unionAll(one("events", "user_id"))
        .orderBy("join_key")
    )


# --- deterministic ordered-set aggregates (mode / discrete median) ----------
@register(
    "ordered_set_aggs",
    """
    WITH counts AS (
      SELECT c_mktsegment, c_nationkey, COUNT(*) AS cnt
      FROM customer GROUP BY c_mktsegment, c_nationkey
    ),
    modes AS (
      SELECT c_mktsegment, c_nationkey AS mode_nation, cnt AS mode_count
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                     ORDER BY cnt DESC, c_nationkey ASC) AS rn
        FROM counts
      ) WHERE rn = 1
    ),
    meds AS (
      SELECT c_mktsegment,
             CAST(CAST(quantile_disc(c_acctbal, 0.5) AS DECIMAL(12,2)) AS DOUBLE)
               AS median_acctbal
      FROM customer GROUP BY c_mktsegment
    )
    SELECT m.c_mktsegment, m.mode_nation, CAST(m.mode_count AS BIGINT) AS mode_count,
           d.median_acctbal
    FROM modes m JOIN meds d USING (c_mktsegment)
    ORDER BY m.c_mktsegment
    """,
)
def ordered_set_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set aggregates with DETERMINISTIC semantics: per segment,
    the modal nation (most frequent; ties broken by lowest key — Spark's
    built-in mode() picks an ARBITRARY tie winner, so the engine spells
    the tiebreak out as count+rank) and the exact discrete median account
    balance (percentile_disc: an actual data value, lower-of-middle-two —
    matching DuckDB's quantile_disc tie rule, unlike interpolating
    percentile()). The mode is a hash aggregate + a tiny window over the
    per-(segment, nation) count table; the EXACT discrete median needs a
    per-segment sort (row_number to the middle rank) — at 100 TB that is
    the deliberate exact-eval path, with approx_percentile as the
    production fast path (approx_quantiles_price covers the sketch
    contract)."""
    c = table(spark, sf_dir, "customer")
    counts = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("cnt").desc(), F.col("c_nationkey").asc()
    )
    modes = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("c_nationkey").alias("mode_nation"),
            F.col("cnt").cast("bigint").alias("mode_count"),
        )
    )
    # discrete median == lower-of-middle-two == the value at row_number
    # ceil(n/2) in ascending order — an exact data value on both engines
    wv = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    meds = (
        c.select("c_mktsegment", "c_acctbal", "c_custkey")
        .withColumn("rn", F.row_number().over(wv))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("c_mktsegment")))
        .filter(F.col("rn") == F.ceil(F.col("n") / 2))
        .select(
            "c_mktsegment",
            F.col("c_acctbal").cast("decimal(12,2)").cast("double").alias("median_acctbal"),
        )
    )
    return modes.join(meds, "c_mktsegment").orderBy("c_mktsegment")


# --- PSI (population stability index) drift monitor -------------------------
PSI_BUCKETS = 10


@register(
    "psi_price_drift",
    f"""
    WITH days AS (
      SELECT o_totalprice,
             datediff('day', DATE '1970-01-01', o_orderdate) AS day
      FROM orders
    ),
    med AS (SELECT (MIN(day) + MAX(day)) // 2 AS cut FROM days),
    halves AS (
      SELECT o_totalprice,
             CASE WHEN day < med.cut THEN 'ref' ELSE 'cur' END AS half
      FROM days CROSS JOIN med
    ),
    bounds AS (
      SELECT list_transform(
               quantile_cont(o_totalprice,
                 list_transform(range(1, {PSI_BUCKETS}), i -> i / {PSI_BUCKETS}.0)),
               q -> FLOOR(q * 1000000 + 0.5) / 1000000) AS bs
      FROM halves WHERE half = 'ref'
    ),
    assigned AS (
      SELECT half, len(list_filter(b.bs, x -> x < o_totalprice)) + 1 AS bucket
      FROM halves CROSS JOIN bounds b
    ),
    counts AS (
      SELECT bucket,
             SUM(CASE WHEN half = 'ref' THEN 1 ELSE 0 END) AS nr,
             SUM(CASE WHEN half = 'cur' THEN 1 ELSE 0 END) AS nc
      FROM assigned GROUP BY bucket
    ),
    tot AS (SELECT SUM(nr) AS tr, SUM(nc) AS tc FROM counts)
    SELECT c.bucket,
           CAST(c.nr AS BIGINT) AS n_ref,
           CAST(c.nc AS BIGINT) AS n_cur,
           FLOOR((CAST(c.nc AS DOUBLE) / t.tc - CAST(c.nr AS DOUBLE) / t.tr)
                 * ln((CAST(c.nc AS DOUBLE) / t.tc)
                      / (CAST(c.nr AS DOUBLE) / t.tr))
                 * 1000000 + 0.5) / 1000000 AS psi_term
    FROM counts c CROSS JOIN tot t
    ORDER BY c.bucket
    """,
)
def psi_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of the
    order history (date-range midpoint split): equi-depth buckets fixed on the
    REFERENCE half, per-bucket (p_cur - p_ref)·ln(p_cur/p_ref) terms —
    sum > 0.25 is the standard retrain/alert threshold. THE deployment
    drift monitor for any scored feature; here instantiated on price, the
    same shape applies to model scores (quality_model_scores) or token
    counts. Bucket bounds broadcast; assignment map-side; one conditional
    hash aggregate. Per-bucket terms are emitted (not just the sum) so the
    alert can localize WHERE the distribution moved."""
    o = table(spark, sf_dir, "orders").select(
        "o_totalprice",
        F.datediff("o_orderdate", F.lit("1970-01-01")).cast("bigint").alias("day"),
    )
    med = F.broadcast(
        o.agg(F.expr("(min(day) + max(day)) div 2").alias("cut"))
    )
    halves = o.crossJoin(med).select(
        "o_totalprice",
        F.when(F.col("day") < F.col("cut"), "ref").otherwise("cur").alias("half"),
    )
    qs = F.array(*[F.lit(i / PSI_BUCKETS) for i in range(1, PSI_BUCKETS)])
    bounds = F.broadcast(
        halves.filter(F.col("half") == "ref").agg(
            F.transform(
                F.percentile("o_totalprice", qs),
                lambda q: F.floor(q * 1000000 + F.lit(0.5)) / 1000000,
            ).alias("bs")
        )
    )
    assigned = halves.crossJoin(bounds).select(
        "half",
        (F.size(F.filter("bs", lambda x: x < F.col("o_totalprice"))) + 1).alias(
            "bucket"
        ),
    )
    counts = assigned.groupBy("bucket").agg(
        F.sum(F.when(F.col("half") == "ref", 1).otherwise(0)).alias("nr"),
        F.sum(F.when(F.col("half") == "cur", 1).otherwise(0)).alias("nc"),
    )
    tot = F.broadcast(counts.agg(F.sum("nr").alias("tr"), F.sum("nc").alias("tc")))
    pr = F.col("nr").cast("double") / F.col("tr")
    pc = F.col("nc").cast("double") / F.col("tc")
    return (
        counts.crossJoin(tot)
        .select(
            "bucket",
            F.col("nr").cast("bigint").alias("n_ref"),
            F.col("nc").cast("bigint").alias("n_cur"),
            (F.floor((pc - pr) * F.log(pc / pr) * 1000000 + F.lit(0.5)) / 1000000).alias(
                "psi_term"
            ),
        )
        .orderBy("bucket")
    )


# --- trimmed mean (exact rank cuts) ------------------------------------------
# The robust location estimate between mean (outlier-fragile) and median
# (throws away 98% of data): drop the top and bottom 5% BY EXACT RANK and
# average the rest. Rank cuts are exact integers (ceil/floor of n*5%), so
# the kept multiset — and with exact-decimal summation the result — is
# bit-identical on both engines; ties broken by orderkey for a total
# order. One global sort-rank over the measure column (range-partitioned
# at scale), one exact-decimal agg.
TRIM_PCT_NUM, TRIM_PCT_DEN = 5, 100


@register(
    "trimmed_mean_price",
    f"""
    WITH ranked AS (
      SELECT o_totalprice,
             ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS r,
             COUNT(*) OVER () AS n
      FROM orders
    ),
    kept AS (
      SELECT o_totalprice, n FROM ranked
      WHERE r > (n * {TRIM_PCT_NUM}) // {TRIM_PCT_DEN}
        AND r <= n - (n * {TRIM_PCT_NUM}) // {TRIM_PCT_DEN}
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_total,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
             AS trimmed_mean
    FROM kept
    """,
)
def trimmed_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-trimmed mean of order price via exact integer rank cuts — the
    robust-location companion to outlier_mad_prices.

    Rank comes from the range-partitioned global numbering
    (``global_row_numbers``), not ROW_NUMBER over an unpartitioned window:
    the builtin form sorts the whole orders table in ONE partition (one
    core, OOM at cluster scale — measured by the global_row_number probe).
    Here the corpus pays one range exchange; the total count rides a 1-row
    broadcast.  Same kept multiset, same exact-decimal sum, oracle
    unchanged."""
    from fpl_data_pipeline_spark.plans.scale_primitives import global_row_numbers

    o = table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    numbered = global_row_numbers(
        o, [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()]
    ).withColumnRenamed("global_rn", "r")
    tot = numbered.agg(F.count(F.lit(1)).alias("n"))
    cut = F.expr(f"(n * {TRIM_PCT_NUM}) div {TRIM_PCT_DEN}")
    kept = numbered.crossJoin(F.broadcast(tot)).filter(
        (F.col("r") > cut) & (F.col("r") <= F.col("n") - cut)
    )
    return kept.agg(
        F.max("n").cast("long").alias("n_total"),
        F.count(F.lit(1)).alias("n_kept"),
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("trimmed_mean"),
    )


# --- order-to-ship cycle time percentiles ------------------------------------
# The operations metric behind every SLA conversation: days from order to
# line shipment, profiled per order priority as exact discrete p50/p90
# (the ordered_set_aggs rank convention — the value AT rank ceil(p*n), no
# interpolation, engine-identical). One join (lineitem to its order), one
# per-priority rank window over integer day latencies.
@register(
    "order_cycle_time_percentiles",
    """
    WITH lat AS (
      SELECT o.o_orderpriority AS priority,
             CAST(epoch_us(l.l_shipdate) // 86400000000
                  - epoch_us(o.o_orderdate) // 86400000000 AS BIGINT)
               AS days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    ranked AS (
      SELECT priority, days,
             ROW_NUMBER() OVER (PARTITION BY priority ORDER BY days) AS r,
             COUNT(*) OVER (PARTITION BY priority) AS n
      FROM lat
    )
    SELECT priority,
           CAST(MAX(n) AS BIGINT) AS n_lines,
           CAST(MIN(CASE WHEN r >= CAST(CEIL(n * 0.5) AS BIGINT)
                         THEN days END) AS BIGINT) AS p50_days,
           CAST(MIN(CASE WHEN r >= CAST(CEIL(n * 0.9) AS BIGINT)
                         THEN days END) AS BIGINT) AS p90_days,
           CAST(MAX(days) AS BIGINT) AS max_days
    FROM ranked
    GROUP BY priority
    ORDER BY priority
    """,
)
def order_cycle_time_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete p50/p90/max order-to-ship latency in days per order
    priority — the fulfillment SLA profile."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    days = F.expr(
        "unix_micros(cast(l_shipdate as timestamp)) div 86400000000"
        " - unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
    ).cast("long")
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"), days.alias("days")
    )
    w = Window.partitionBy("priority").orderBy("days")
    ranked = lat.select(
        "priority",
        "days",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("priority")).alias("n"),
    )
    pick = lambda p: F.min(  # noqa: E731
        F.when(
            F.col("r") >= F.ceil(F.col("n") * p).cast("long"), F.col("days")
        )
    ).cast("long")
    return (
        ranked.groupBy("priority")
        .agg(
            F.max("n").cast("long").alias("n_lines"),
            pick(0.5).alias("p50_days"),
            pick(0.9).alias("p90_days"),
            F.max("days").cast("long").alias("max_days"),
        )
        .orderBy("priority")
    )


# --- mergeable fixed-width histogram quantile sketch ------------------------
HQ_BIN_W = 2000.0  # price bin width; l_extendedprice spans ~900..105000
HQ_QS = (0.5, 0.9, 0.99)


@register(
    "histogram_quantile_sketch",
    f"""
    WITH bins AS (
      SELECT CAST(floor(l_extendedprice / {HQ_BIN_W}) AS BIGINT) AS bin,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM bins),
    cum AS (
      SELECT bin, cnt,
             COALESCE(CAST(SUM(cnt) OVER (ORDER BY bin ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      AS BIGINT), 0) AS cum_before
      FROM bins
    ),
    qs AS (SELECT UNNEST([{", ".join(str(q) for q in HQ_QS)}]) AS q),
    hit AS (
      SELECT q, bin, cnt, cum_before, n,
             ROW_NUMBER() OVER (PARTITION BY q ORDER BY bin ASC) AS rk
      FROM qs CROSS JOIN cum CROSS JOIN tot
      WHERE cum_before + cnt >= q * n
    ),
    est AS (
      SELECT q,
             floor((bin * {HQ_BIN_W}
                    + {HQ_BIN_W} * (q * n - cum_before) / cnt) * 1000 + 0.5)
               / 1000 AS est_q
      FROM hit WHERE rk = 1
    ),
    ex AS (
      SELECT UNNEST([{", ".join(str(q) for q in HQ_QS)}]) AS q,
             UNNEST(list_transform(
               quantile_cont(l_extendedprice, [{", ".join(str(q) for q in HQ_QS)}]),
               v -> floor(v * 1000 + 0.5) / 1000)) AS exact_q
      FROM lineitem
    )
    SELECT e.q AS q, e.est_q AS est_q, x.exact_q AS exact_q,
           floor(abs(e.est_q - x.exact_q) * 1000 + 0.5) / 1000 AS abs_err
    FROM est e JOIN ex x ON e.q = x.q
    ORDER BY q ASC
    """,
)
def histogram_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles of l_extendedprice from a MERGEABLE fixed-width
    histogram sketch, reported alongside the exact percentile and the
    realized absolute error — the quantile member of the mergeable-sketch
    family (KMV for distinct counts, CMS for frequencies, Bloom for
    membership).

    The sketch is the binned-count relation {{bin -> cnt}}: partials from any
    data split union-and-re-aggregate into the whole-corpus sketch (the
    groupBy IS the merge — map-side partial aggregation makes each executor's
    contribution a local sketch; tests/test_scale_primitives.py proves the
    merge law on disjoint halves).  Estimation interpolates linearly inside
    the bin that crosses the q*n cumulative rank; the cumulative window runs
    over the BOUNDED bin relation (~55 bins at width {HQ_BIN_W}), never the
    corpus, so the whole estimator is one corpus scan + bounded small-data
    math — the shape that replaces an exact global sort at 100 TB.  Error is
    bounded by the bin width; the exact percentile (which DOES pay a
    per-group sort, fine at readout granularity) quantifies it.
    """
    li = table(spark, sf_dir, "lineitem").select("l_extendedprice")
    bins = li.groupBy(
        F.floor(F.col("l_extendedprice") / HQ_BIN_W).cast("long").alias("bin")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.orderBy(F.col("bin").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = bins.withColumn(
        "cum_before", F.coalesce(F.sum("cnt").over(w_cum), F.lit(0))
    )
    tot = bins.agg(F.sum("cnt").alias("n"))
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in HQ_QS])).alias("q")
    )
    hit = (
        qs.crossJoin(cum)
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cum_before") + F.col("cnt") >= F.col("q") * F.col("n"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("q").orderBy(F.col("bin").asc())
            ),
        )
        .filter(F.col("rk") == 1)
    )
    est = hit.select(
        "q",
        (
            F.floor(
                (
                    F.col("bin") * HQ_BIN_W
                    + HQ_BIN_W
                    * (F.col("q") * F.col("n") - F.col("cum_before"))
                    / F.col("cnt")
                )
                * 1000
                + F.lit(0.5)
            )
            / 1000
        ).alias("est_q"),
    )
    # Round-11: one array-percentile aggregate instead of one percentile()
    # per q — each separate aggregate buffered the whole column again (5x
    # the ObjectHashAggregate state for identical per-q values).
    qarr = F.array(*[F.lit(float(q)) for q in HQ_QS])
    exact = li.agg(F.percentile("l_extendedprice", qarr).alias("ps"))
    ex = exact.select(
        F.explode(
            F.zip_with(
                qarr,
                "ps",
                lambda q, v: F.struct(
                    q.alias("q"),
                    (F.floor(v * 1000 + F.lit(0.5)) / 1000).alias("exact_q"),
                ),
            )
        ).alias("s")
    ).select("s.q", "s.exact_q")
    return (
        est.join(ex, "q")
        .select(
            "q",
            "est_q",
            "exact_q",
            (
                F.floor(F.abs(F.col("est_q") - F.col("exact_q")) * 1000 + F.lit(0.5))
                / 1000
            ).alias("abs_err"),
        )
        .orderBy(F.col("q").asc())
    )
