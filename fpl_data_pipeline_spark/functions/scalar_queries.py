"""Scalar function surface (SURVEY.md §2.8) exercised end-to-end: string,
date/time, and conditional expressions as oracle-checked projections.

The reference's scalar surface is tiny (concat, round, coalesce, cast — all
covered by the core queries); these widen the engine's function catalog to
what an analytics user expects, staying entirely inside whole-stage codegen
(no UDFs: every expression is a JVM built-in on both the Spark and DuckDB
side)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from fpl_data_pipeline_spark.registry import register
from fpl_data_pipeline_spark.tables import table


@register(
    "string_funcs_part",
    """
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           lower(p_type) AS type_l,
           substr(p_name, 1, 12) AS name_12,
           length(p_name) AS name_len,
           replace(p_brand, '#', '-') AS brand_dash,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           reverse(p_brand) AS brand_rev,
           concat_ws('|', p_brand, p_type) AS brand_type,
           CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END AS has_a
    FROM part
    """,
)
def string_funcs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String catalog: upper/lower/substr/length/replace/lpad/reverse/
    concat_ws/LIKE — all codegen'd JVM expressions, no shuffle (pure map)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.substring("p_name", 1, 12).alias("name_12"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("-")).alias("brand_dash"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.reverse("p_brand").alias("brand_rev"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.when(F.col("p_name").like("%a%"), 1).otherwise(0).alias("has_a"),
    )


@register(
    "date_funcs_orders",
    """
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dom,
           quarter(o_orderdate) AS qtr,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_ts,
           date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS days_to_2002
    FROM orders
    """,
)
def date_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time catalog: year/month/day/quarter extraction, month
    truncation, interval arithmetic, day difference. The reference has no
    temporal functions at all (its only time axis is the integer round_gw,
    SURVEY.md §1.2) — this is the engine's real temporal surface."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_ts"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_2002"),
    )


@register(
    "conditional_funcs_lineitem",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity >= 40 THEN 'bulk'
                WHEN l_quantity >= 10 THEN 'mid'
                ELSE 'small' END AS qty_band,
           CASE WHEN l_discount > 0.05 THEN CAST(round(
             CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2)), 3) AS DOUBLE)
           END AS big_discount_amt,
           greatest(l_tax, l_discount) AS max_rate,
           least(l_tax, l_discount) AS min_rate,
           CAST(nullif(l_discount, 0.0) IS NULL AS INT) AS zero_discount
    FROM lineitem
    """,
)
def conditional_funcs_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional catalog: multi-branch CASE, NULL-producing CASE,
    greatest/least, nullif — pure projection, fully codegen'd."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") >= 40, "bulk")
        .when(F.col("l_quantity") >= 10, "mid")
        .otherwise("small")
        .alias("qty_band"),
        F.when(
            F.col("l_discount") > 0.05,
            # exact-decimal product then decimal round: HALF_UP on the exact
            # value in both engines (round(double) half-cases are not)
            F.round(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * F.col("l_discount").cast("decimal(12,2)"),
                3,
            ).cast("double"),
        ).alias("big_discount_amt"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.nullif(F.col("l_discount"), F.lit(0.0)).isNull().cast("int").alias("zero_discount"),
    )


@register(
    "regex_funcs_part",
    """
    SELECT p_partkey,
           regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
           CAST(regexp_matches(p_name, '[0-9]') AS INT) AS has_digit,
           length(regexp_replace(p_name, '[^ ]', '', 'g')) AS n_spaces
    FROM part
    """,
)
def regex_funcs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex catalog: extract / global replace / match-test / occurrence
    count — JVM regexp expressions (the oracle spells global replace with the
    'g' flag; Spark's regexp_replace is global by default)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("no_vowels"),
        F.col("p_name").rlike("[0-9]").cast("int").alias("has_digit"),
        F.length(F.regexp_replace("p_name", "[^ ]", "")).alias("n_spaces"),
    )


@register(
    "math_funcs_lineitem",
    """
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS abs_dev,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           round(sqrt(l_quantity), 9) AS qty_sqrt,
           round(ln(l_extendedprice), 9) AS price_ln,
           round(exp(l_discount), 9) AS disc_exp,
           power(l_quantity, 2) AS qty_sq,
           mod(l_orderkey, 7) AS key_mod7,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem
    """,
)
def math_funcs_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math catalog: abs/ceil/floor/sqrt/ln/exp/power/mod/sign — pure
    codegen'd projections. Transcendentals (ln/exp) are rounded to 9 dp:
    java.lang.Math and libm agree to well under 1e-9 but not to the last
    ulp."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_dev"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.round(F.sqrt("l_quantity"), 9).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 9).alias("price_ln"),
        F.round(F.exp("l_discount"), 9).alias("disc_exp"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )
