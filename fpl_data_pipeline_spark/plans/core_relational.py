"""Core relational operators: projections, predicates, scalar expressions,
joins, and set operations (SURVEY.md §2.2, §2.3, §2.7, §2.8).

Each query is the Spark-first re-expression of a reference operator (cited
per-query), registered with a DuckDB oracle. Determinism conventions from
fpl_data_pipeline_spark.registry apply throughout.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from fpl_data_pipeline_spark.registry import register
from fpl_data_pipeline_spark.tables import table
from fpl_data_pipeline_spark.functions.exact import dsum, dsum_sql


# --- P1: column projection (reference sql_queries.py:111) -------------------
@register(
    "projection",
    "SELECT c_custkey, c_name, c_acctbal FROM customer",
)
def projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")


# --- P3/P8: derived arithmetic column + round (sql_queries.py:114,163) ------
@register(
    "derived_ratio",
    """
    SELECT p_partkey, p_name,
           FLOOR((p_retailprice / p_size * 10) * 100 + 0.5) / 100 AS value_ratio
    FROM part
    """,
)
def derived_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    # double/int division (identical IEEE ops on both engines) + portable round.
    from fpl_data_pipeline_spark.functions.exact import portable_round

    part = table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        "p_name",
        portable_round(F.col("p_retailprice") / F.col("p_size") * 10).alias("value_ratio"),
    )


# --- P4: NULL-propagating string concat (sql_queries.py:122) ----------------
@register(
    "concat_names",
    """
    SELECT c_custkey, c_name || ' ' || c_mktsegment AS full_label
    FROM customer
    """,
)
def concat_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F.concat is NULL-propagating like Postgres/DuckDB ||  (concat_ws is not).
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit(" "), F.col("c_mktsegment")).alias("full_label"),
    )


# --- P5: dictionary decode (includes.py:36,129 element_type -> position) ----
@register(
    "map_decode",
    """
    SELECT n_nationkey, n_name,
           CASE n_regionkey WHEN 0 THEN 'africa' WHEN 1 THEN 'america'
                WHEN 2 THEN 'asia' WHEN 3 THEN 'europe' WHEN 4 THEN 'mideast'
           END AS region_code
    FROM nation
    """,
)
def map_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    mapping = {0: "africa", 1: "america", 2: "asia", 3: "europe", 4: "mideast"}
    decode = F.element_at(
        F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv]),
        F.col("n_regionkey"),
    )
    return n.select("n_nationkey", "n_name", decode.alias("region_code"))


# --- P6/P7: coalesce + cast shorthand (sql_queries.py:174,163) --------------
@register(
    "coalesce_outer",
    f"""
    SELECT c.c_custkey,
           COALESCE(t.total_spend, 0.0) AS total_spend
    FROM customer c
    LEFT JOIN (
      SELECT o_custkey, {dsum_sql('o_totalprice')} AS total_spend
      FROM orders GROUP BY o_custkey
    ) t ON c.c_custkey = t.o_custkey
    """,
)
def coalesce_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    t = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(dsum("o_totalprice", "total_spend"))
    )
    return (
        c.join(t, c.c_custkey == t.o_custkey, "left")
        .select("c_custkey", F.coalesce("total_spend", F.lit(0.0)).alias("total_spend"))
    )


# --- P9: equality predicate (sql_queries.py:191 `surname = 'Salah'`) --------
@register(
    "filter_equality",
    "SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'",
)
def filter_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pushed to the parquet scan: explain shows PushedFilters [EqualTo(...)].
    c = table(spark, sf_dir, "customer")
    return c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_name")


# --- P10: IS NULL post-join (sql_queries.py:197) ----------------------------
@register(
    "filter_isnull_postjoin",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE o.o_orderkey IS NULL
    """,
)
def filter_isnull_postjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .filter(F.col("o_orderkey").isNull())
        .select("c_custkey", "c_name")
    )


# --- P11/J3: IN-subquery semi-join (sql_queries.py:150) ---------------------
@register(
    "semi_join",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    keys = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return o.join(keys, "o_custkey", "left_semi").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


# --- P13 + JSON: regexp extraction over a JSON string column ---------------
# (reference includes.py:277-280 script-tag extraction; events.props here)
@register(
    "json_extract",
    """
    SELECT event_id,
           CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INTEGER) AS k_value
    FROM events
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("int").alias("k_value"),
    )


# --- J1: broadcast dim decorate (sql_queries.py:125-127) --------------------
@register(
    "dim_decorate",
    """
    SELECT c.c_custkey, c.c_name, n.n_name AS nation_name, r.r_name AS region_name
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def dim_decorate(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )


# --- J2 + A1: multi-way join with aggregation (TPC-H Q5 shape) --------------
# The 100 TB plan: region/nation broadcast; customer⋈orders⋈lineitem⋈supplier
# shuffle on their keys; AQE handles skew. Revenue sum is decimal-exact.
@register(
    "join_multiway_revenue",
    """
    SELECT n.n_name AS nation_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(12,2)) AS DECIMAL(4,2)))
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def join_multiway_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    from fpl_data_pipeline_spark.functions.exact import revenue_col

    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.sum(revenue_col()).cast("double").alias("revenue"))
    )


# --- J4: integrity anti-join, intended semantics (sql_queries.py:194-198) ---
@register(
    "anti_join_orphans",
    """
    SELECT COUNT(*) AS orphan_cnt
    FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def anti_join_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_cnt"))
    )


# --- J5/U1: union-all of two conformed frames (includes.py:285-293) ---------
@register(
    "union_all_frames",
    """
    SELECT c_custkey AS entity_key, c_name AS entity_name, 'customer' AS side
    FROM customer WHERE c_mktsegment = 'MACHINERY'
    UNION ALL
    SELECT s_suppkey AS entity_key, s_name AS entity_name, 'supplier' AS side
    FROM supplier
    """,
)
def union_all_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "MACHINERY")
        .select(
            F.col("c_custkey").alias("entity_key"),
            F.col("c_name").alias("entity_name"),
            F.lit("customer").alias("side"),
        )
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("entity_name"),
        F.lit("supplier").alias("side"),
    )
    return c.unionByName(s)


# --- range predicate + between (incremental hwm shape, includes.py:173-182) -
@register(
    "filter_range_hwm",
    """
    SELECT o_orderkey, o_custkey, o_orderdate
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2024-06-01 00:00:00'
    """,
)
def filter_range_hwm(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The high-water-mark predicate: pushed to parquet (partition pruning on a
    # date-partitioned layout at scale).
    o = table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderdate") >= F.lit("2024-06-01 00:00:00").cast("timestamp")).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )


# --- S7/JSON: schema-on-read parse of a JSON column (from_json) -------------
@register(
    "json_parse_aggregate",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def json_parse_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # from_json with a declared schema (the engine's JSON-landing idiom,
    # reference includes.py json.load + key indexing) then aggregate.
    e = table(spark, sf_dir, "events")
    parsed = e.select(
        "event_type", F.from_json("props", "k INT").alias("p")
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("p.k").alias("sum_k")
    )


# --- S7 via VARIANT: semi-structured decode-once extraction ------------------
@register(
    "json_variant_extract",
    """
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
                THEN 'high' ELSE 'low' END AS k_band
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) IS NOT NULL
    """,
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VARIANT path for semi-structured columns (Spark 4): parse_json
    decodes the JSON text ONCE into the binary variant encoding, and every
    field access (try_variant_get) is a cheap path lookup — at 100 TB this
    replaces per-extraction re-parsing, the dominant cost of JSON-heavy
    scans (same reason the variant type exists in the open table formats).
    Semantically identical to string json_extract; the oracle uses DuckDB's
    JSON functions over the same text."""
    e = table(spark, sf_dir, "events")
    v = e.select(
        "event_id", "event_type", F.parse_json("props").alias("v")
    )
    k = F.try_variant_get("v", "$.k", "int")
    return (
        v.select(
            "event_id",
            "event_type",
            k.alias("k_val"),
            F.when(k >= 50, "high").otherwise("low").alias("k_band"),
        )
        .filter(F.col("k_val").isNotNull())
    )


# --- FULL OUTER join: two-source reconciliation ------------------------------
@register(
    "full_outer_reconciliation",
    f"""
    WITH o AS (
      SELECT year(o_orderdate) * 100 + month(o_orderdate) AS period,
             {dsum_sql('o_totalprice')} AS order_total
      FROM orders GROUP BY 1
    ),
    l AS (
      SELECT year(l_shipdate) * 100 + month(l_shipdate) AS period,
             COUNT(*) AS shipped_lines
      FROM lineitem GROUP BY 1
    )
    SELECT COALESCE(o.period, l.period) AS period,
           COALESCE(o.order_total, 0.0) AS order_total,
           COALESCE(l.shipped_lines, 0) AS shipped_lines,
           (o.period IS NULL OR l.period IS NULL) AS one_sided
    FROM o FULL OUTER JOIN l ON o.period = l.period
    """,
)
def full_outer_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — the reconciliation shape (orders placed vs lines
    shipped per month; months present on only one side surface with a flag
    instead of vanishing). Ship dates lag order dates, so the outer edges
    are genuinely one-sided. Both inputs pre-aggregate to month
    cardinality before the join, so the outer join itself is tiny at any
    data scale — aggregate-then-join, never join-then-aggregate."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    om = o.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("period")
    ).agg(dsum("o_totalprice", "order_total"))
    lm = li.groupBy(
        (F.year("l_shipdate") * 100 + F.month("l_shipdate")).alias("period")
    ).agg(F.count(F.lit(1)).alias("shipped_lines"))
    j = om.alias("o").join(lm.alias("l"), F.col("o.period") == F.col("l.period"), "full_outer")
    return j.select(
        F.coalesce(F.col("o.period"), F.col("l.period")).alias("period"),
        F.coalesce("order_total", F.lit(0.0)).alias("order_total"),
        F.coalesce("shipped_lines", F.lit(0)).alias("shipped_lines"),
        (F.col("o.period").isNull() | F.col("l.period").isNull()).alias("one_sided"),
    )


# --- scalar subquery: share-of-total without a self-join ---------------------
@register(
    "scalar_subquery_share",
    f"""
    SELECT o_orderstatus,
           {dsum_sql('o_totalprice')} AS status_total,
           round({dsum_sql('o_totalprice')}
                 / (SELECT {dsum_sql('o_totalprice')} FROM orders), 9) AS share
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def scalar_subquery_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: each status's share of total revenue. Catalyst plans
    the uncorrelated scalar subquery as its own tiny job whose single value
    broadcasts into the main aggregate — no self-join of the fact table.
    Exact decimal sums make numerator and denominator order-independent, so
    the division is bit-stable on both engines (rounded 9 dp)."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_sq")
    return spark.sql(
        """
        SELECT o_orderstatus,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS status_total,
               round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     / (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                        FROM __orders_sq), 9) AS share
        FROM __orders_sq
        GROUP BY o_orderstatus
        """
    )


# --- GDPR erasure cascade audit (right-to-be-forgotten) ---------------------
@register(
    "gdpr_erasure_audit",
    """
    WITH targets AS (SELECT c_custkey FROM customer WHERE c_custkey % 997 = 0),
    ords AS (
      SELECT o.o_orderkey FROM orders o
      JOIN targets t ON t.c_custkey = o.o_custkey
    ),
    li AS (
      SELECT l.l_orderkey FROM lineitem l
      JOIN ords x ON x.o_orderkey = l.l_orderkey
    ),
    tot AS (SELECT COUNT(*) AS n_li FROM lineitem)
    SELECT (SELECT COUNT(*) FROM targets) AS n_customers_erased,
           (SELECT COUNT(*) FROM ords) AS n_orders_cascaded,
           (SELECT COUNT(*) FROM li) AS n_lineitems_cascaded,
           FLOOR(CAST((SELECT COUNT(*) FROM li) AS DOUBLE)
                 / (SELECT n_li FROM tot) * 1000000 + 0.5) / 1000000
             AS lineitem_row_frac
    """,
)
def gdpr_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade planning: given an erasure cohort (a
    deterministic custkey predicate standing in for the deletion-request
    list), count every row the FK graph drags along — orders, then their
    line items — and the fact-table fraction the cascade rewrites. The
    number a compliance pipeline needs BEFORE running the delete: whether
    to rewrite files in place or tombstone + compact.

    Shape: the cohort broadcasts into a semi-join on orders; the surviving
    order keys broadcast (or shuffle at real scale — AQE decides) into
    lineitem. Counts are side-free aggregates; nothing is deleted."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    targets = c.filter(F.col("c_custkey") % 997 == 0).select("c_custkey")
    ords = o.join(
        F.broadcast(targets), o.o_custkey == targets.c_custkey, "leftsemi"
    ).select("o_orderkey")
    lis = li.join(ords, li.l_orderkey == ords.o_orderkey, "leftsemi")
    nt = targets.agg(F.count(F.lit(1)).alias("n_customers_erased"))
    no = ords.agg(F.count(F.lit(1)).alias("n_orders_cascaded"))
    nl = lis.agg(F.count(F.lit(1)).alias("n_lineitems_cascaded"))
    ntot = li.agg(F.count(F.lit(1)).alias("n_li"))
    return (
        nt.crossJoin(F.broadcast(no))
        .crossJoin(F.broadcast(nl))
        .crossJoin(F.broadcast(ntot))
        .select(
            "n_customers_erased",
            "n_orders_cascaded",
            "n_lineitems_cascaded",
            (
                F.floor(
                    F.col("n_lineitems_cascaded").cast("double")
                    / F.col("n_li")
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("lineitem_row_frac"),
        )
    )
