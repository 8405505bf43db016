"""Changelog / slowly-changing-dimension operators — the warehouse-maintenance
surface a production analytics engine needs around the reference's upsert
(reference includes.py:154-170 is a plain last-write-wins merge; these extend
it to full CDC semantics with deletes and to SCD Type-2 history tracking).

Both operators derive a DETERMINISTIC changelog from the orders table so the
driver oracle can replay the exact same stream:

- key   = o_custkey
- seq   = (o_orderdate, o_orderkey)  — total order per key
- op    = 'D' when o_orderkey % 97 == 0, 'I' when % 3 == 0, else 'U'

Physical notes (100 TB): both are one window over the changelog partitioned
by key (single shuffle on the key, no skew — custkey is near-uniform) followed
by a broadcast join to the customer dim and a tiny hash aggregate. No
collect, no cross joins; the window is rank-1 pruning (CDC) or lead()
(SCD2), both whole-stage-codegen expressions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from fpl_data_pipeline_spark.registry import register
from fpl_data_pipeline_spark.tables import table
from fpl_data_pipeline_spark.functions.exact import dsum, dsum_sql


_OP_SQL = """
      CASE WHEN o_orderkey % 97 = 0 THEN 'D'
           WHEN o_orderkey % 3 = 0 THEN 'I'
           ELSE 'U' END
"""


def _op_col() -> F.Column:
    return (
        F.when(F.col("o_orderkey") % 97 == 0, F.lit("D"))
        .when(F.col("o_orderkey") % 3 == 0, F.lit("I"))
        .otherwise(F.lit("U"))
    )


def cdc_apply(changelog: DataFrame, key: str, seq_cols: list[str], op: str = "op") -> DataFrame:
    """Engine operator: apply an insert/update/delete changelog to an empty
    state — keep, per key, the row with the highest ``seq_cols``; a key whose
    LAST operation is a delete has no output row.

    This is the debezium/CDC-sink apply shape: the window prunes to rank 1
    per key (one shuffle on the key), then the delete filter drops dead keys.
    Idempotent: re-applying the same changelog yields the same state.
    """
    w = Window.partitionBy(key).orderBy(*[F.col(c).desc() for c in seq_cols])
    return (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col(op) != "D")
        .drop("__rn")
    )


@register(
    "cdc_apply_state",
    f"""
    WITH changelog AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             {_OP_SQL} AS op
      FROM orders
    ),
    latest AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM changelog
    ),
    final AS (SELECT * FROM latest WHERE rn = 1),
    live AS (SELECT * FROM final WHERE op <> 'D'),
    dead AS (SELECT * FROM final WHERE op = 'D')
    SELECT c.c_mktsegment,
           COUNT(l.o_custkey) AS n_live,
           COUNT(d.o_custkey) AS n_deleted,
           {dsum_sql('l.o_totalprice')} AS live_price_sum
    FROM customer c
    LEFT JOIN live l ON l.o_custkey = c.c_custkey
    LEFT JOIN dead d ON d.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def cdc_apply_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog apply: replay orders as a keyed I/U/D stream, keep each
    key's last operation, drop keys whose last op is a delete, then account
    the live/deleted state per market segment.

    Extends the reference's last-write-wins upsert (includes.py:154-170)
    with delete semantics — the missing half of a CDC sink. The window
    shuffles once on o_custkey; customer is the broadcast dim.
    """
    o = table(spark, sf_dir, "orders").withColumn("op", _op_col())
    final = cdc_apply(
        o.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "op"),
        "o_custkey",
        ["o_orderdate", "o_orderkey"],
    )
    # cdc_apply drops deleted keys; recompute rank-1 rows to also count deads
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    last = (
        o.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    live = last.filter(F.col("op") != "D").select(
        F.col("o_custkey").alias("lk"), F.col("o_totalprice").alias("lp")
    )
    dead = last.filter(F.col("op") == "D").select(F.col("o_custkey").alias("dk"))
    c = table(spark, sf_dir, "customer")
    return (
        c.join(live, c.c_custkey == live.lk, "left")
        .join(dead, c.c_custkey == dead.dk, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count("lk").alias("n_live"),
            F.count("dk").alias("n_deleted"),
            dsum("lp", "live_price_sum"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "scd2_customer_history",
    f"""
    WITH versions AS (
      SELECT o_custkey, o_orderkey, o_orderdate AS valid_from, o_totalprice,
             LEAD(o_orderdate) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC) AS valid_to
      FROM orders
    ),
    keyed AS (
      SELECT o_custkey,
             COUNT(*) AS nv,
             MAX(CASE WHEN valid_to IS NULL THEN o_totalprice END) AS current_price,
             SUM(CASE WHEN valid_to = valid_from THEN 1 ELSE 0 END) AS zero_len
      FROM versions
      GROUP BY o_custkey
    )
    SELECT c.c_mktsegment,
           COUNT(k.o_custkey) AS n_keys,
           CAST(COALESCE(SUM(k.nv), 0) AS BIGINT) AS n_versions,
           CAST(COALESCE(MAX(k.nv), 0) AS BIGINT) AS max_versions_per_key,
           CAST(COALESCE(SUM(k.zero_len), 0) AS BIGINT) AS n_zero_length_versions,
           {dsum_sql('k.current_price')} AS current_price_sum
    FROM customer c
    LEFT JOIN keyed k ON k.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build: each order is a new version of its
    customer's profile; versions carry [valid_from, valid_to) intervals via
    lead(), the open interval is the current version. The summary audits the
    history per segment — version counts, the same-timestamp zero-length
    interval edge case (two changes in one grain), and the exact sum of
    current attribute values.

    One window (lead) + one two-level hash aggregate, both shuffling on
    o_custkey / c_mktsegment; customer joins broadcast.
    """
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    versions = o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("valid_from"),
        "o_totalprice",
        F.lead("o_orderdate").over(w).alias("valid_to"),
    )
    keyed = versions.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("nv"),
        F.max(
            F.when(F.col("valid_to").isNull(), F.col("o_totalprice"))
        ).alias("current_price"),
        F.sum(
            F.when(F.col("valid_to") == F.col("valid_from"), 1).otherwise(0)
        ).alias("zero_len"),
    )
    c = table(spark, sf_dir, "customer")
    return (
        c.join(keyed, c.c_custkey == keyed.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count("o_custkey").alias("n_keys"),
            F.coalesce(F.sum("nv"), F.lit(0)).alias("n_versions"),
            F.coalesce(F.max("nv"), F.lit(0)).alias("max_versions_per_key"),
            F.coalesce(F.sum("zero_len"), F.lit(0)).alias("n_zero_length_versions"),
            dsum("current_price", "current_price_sum"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "scd2_asof_snapshot",
    f"""
    WITH versions AS (
      SELECT o_custkey, o_totalprice, o_orderdate AS valid_from,
             LEAD(o_orderdate) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC) AS valid_to
      FROM orders
    ),
    snap AS (
      SELECT o_custkey, o_totalprice
      FROM versions
      WHERE valid_from <= TIMESTAMP '2024-06-30 23:59:59'
        AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-06-30 23:59:59')
    )
    SELECT c.c_mktsegment,
           COUNT(a.o_custkey) AS n_keys_live_asof,
           {dsum_sql('a.o_totalprice')} AS attr_sum_asof
    FROM customer c
    LEFT JOIN snap a ON a.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def scd2_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time reconstruction from the SCD2 history: the state of
    every key AS OF a cut timestamp — the time-travel read that justifies
    keeping Type-2 intervals at all (reproducing a past report, auditing a
    decision input, training-serving skew checks against features as they
    WERE). Exactly one version per key matches the half-open interval
    [valid_from, valid_to) containing the cut. Same single-window +
    broadcast-dim shape as scd2_customer_history."""
    o = table(spark, sf_dir, "orders")
    cut = F.lit("2024-06-30 23:59:59").cast("timestamp")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    versions = o.select(
        "o_custkey",
        "o_totalprice",
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
    )
    asof = versions.filter(
        (F.col("valid_from") <= cut)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > cut))
    ).select(F.col("o_custkey").alias("ak"), F.col("o_totalprice").alias("av"))
    c = table(spark, sf_dir, "customer")
    return (
        c.join(asof, c.c_custkey == asof.ak, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count("ak").alias("n_keys_live_asof"),
            dsum("av", "attr_sum_asof"),
        )
        .orderBy("c_mktsegment")
    )


# --- changelog net-effect compaction ----------------------------------------
# A CDC feed replayed from the beginning is mostly redundant: per key, only
# the NET effect matters downstream (Delta's change-data-feed consumers and
# Kafka compacted topics both rely on this). The net rule, given the first
# and last op in each key's run:
#   first=I, last=D  -> nothing (created and destroyed inside the window)
#   first=I, last!=D -> net INSERT carrying the final values
#   first!=I, last=D -> net DELETE
#   else             -> net UPDATE carrying the final values
# One window per key (first_value/last_value over the same total order the
# CDC apply uses), so compaction costs exactly one shuffle — then the
# summary accounts rows-in vs rows-out: the compaction-ratio sizing number.
@register(
    "cdc_net_effect_summary",
    f"""
    WITH changelog AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             {_OP_SQL} AS op
      FROM orders
    ),
    runs AS (
      SELECT o_custkey,
             FIRST_VALUE(op) OVER w AS first_op,
             LAST_VALUE(op) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_op,
             COUNT(*) OVER w2 AS n_ops,
             ROW_NUMBER() OVER w AS rn
      FROM changelog
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             w2 AS (PARTITION BY o_custkey)
    ),
    per_key AS (
      SELECT o_custkey, first_op, last_op, n_ops
      FROM runs WHERE rn = 1
    ),
    net AS (
      SELECT o_custkey, n_ops,
             CASE WHEN first_op = 'I' AND last_op = 'D' THEN 'elided'
                  WHEN first_op = 'I' THEN 'net_insert'
                  WHEN last_op = 'D' THEN 'net_delete'
                  ELSE 'net_update' END AS net_op
      FROM per_key
    )
    SELECT net_op,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(n_ops) AS BIGINT) AS ops_in,
           CAST(SUM(CASE WHEN net_op = 'elided' THEN 0 ELSE 1 END) AS BIGINT)
             AS ops_out
    FROM net
    GROUP BY net_op
    ORDER BY net_op
    """,
)
def cdc_net_effect_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction accounting for the deterministic orders changelog: per
    net-op class, keys affected, raw ops replayed vs net ops emitted —
    the compaction-ratio input for CDC feed sizing."""
    o = table(spark, sf_dir, "orders").withColumn("op", _op_col())
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    runs = o.select(
        "o_custkey",
        F.first("op").over(w).alias("first_op"),
        F.last("op").over(wfull).alias("last_op"),
        F.count(F.lit(1)).over(Window.partitionBy("o_custkey")).alias("n_ops"),
        F.row_number().over(w).alias("rn"),
    )
    per_key = runs.filter(F.col("rn") == 1)
    net_op = (
        F.when((F.col("first_op") == "I") & (F.col("last_op") == "D"), "elided")
        .when(F.col("first_op") == "I", "net_insert")
        .when(F.col("last_op") == "D", "net_delete")
        .otherwise("net_update")
    )
    net = per_key.select("o_custkey", "n_ops", net_op.alias("net_op"))
    return (
        net.groupBy("net_op")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n_ops").cast("long").alias("ops_in"),
            F.sum(F.when(F.col("net_op") == "elided", 0).otherwise(1))
            .cast("long")
            .alias("ops_out"),
        )
        .orderBy("net_op")
    )


# --- bitemporal as-of reporting ---------------------------------------------
# SCD2 above tracks VALID time (when a fact was true in the world); a
# finance-grade warehouse also tracks TRANSACTION time (when the warehouse
# LEARNED it), because numbers must be reproducible "as reported": last
# month's revenue report must be re-derivable even after late corrections
# restate the underlying orders. The bitemporal read picks, per fact, the
# newest version whose transaction time <= the knowledge date K, then
# aggregates over valid time.
#
# Deterministic version stream: every order has its original version
# (tx = o_orderdate); orders with o_orderkey % 11 = 0 receive a correction
# landing 30 days later that restates the price +10% (3-decimal exact).
# The query reports monthly revenue under two knowledge dates — the live
# edge (all corrections known) vs 45 days before it (recent corrections
# not yet known) — and the restatement delta per month.
BT_CORRECTION_LAG_DAYS = 30
BT_EARLY_OFFSET_DAYS = 45


@register(
    "bitemporal_revenue_asof",
    f"""
    WITH base AS (
      SELECT o_orderkey,
             epoch_us(o_orderdate) // 86400000000 AS valid_day,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price0,
             o_orderkey % 11 = 0 AS corrected
      FROM orders
    ),
    maxd AS (SELECT MAX(valid_day) AS k_late FROM base),
    priced AS (
      SELECT b.o_orderkey, b.valid_day, b.price0, b.corrected,
             b.valid_day + {BT_CORRECTION_LAG_DAYS} AS tx_corr,
             CAST(b.price0 * CAST(1.1 AS DECIMAL(3,1)) AS DECIMAL(19,3))
               AS price1,
             m.k_late, m.k_late - {BT_EARLY_OFFSET_DAYS} AS k_early
      FROM base b CROSS JOIN maxd m
    ),
    resolved AS (
      SELECT valid_day,
             CASE WHEN corrected AND tx_corr <= k_early
                  THEN price1 ELSE CAST(price0 AS DECIMAL(19,3)) END AS p_early,
             CASE WHEN corrected AND tx_corr <= k_late
                  THEN price1 ELSE CAST(price0 AS DECIMAL(19,3)) END AS p_late,
             CASE WHEN corrected AND tx_corr <= k_late
                       AND NOT (corrected AND tx_corr <= k_early)
                  THEN 1 ELSE 0 END AS newly_corrected
      FROM priced
    )
    SELECT CAST(valid_day // 30 AS BIGINT) AS month_bucket,
           CAST(SUM(p_early) AS DOUBLE) AS revenue_asof_early,
           CAST(SUM(p_late) AS DOUBLE) AS revenue_asof_late,
           CAST(SUM(CAST(p_late - p_early AS DECIMAL(19,3))) AS DOUBLE)
             AS restatement,
           CAST(SUM(newly_corrected) AS BIGINT) AS n_restated_orders
    FROM resolved
    GROUP BY 1
    ORDER BY month_bucket
    """,
)
def bitemporal_revenue_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue under two knowledge dates (bitemporal as-of): the
    as-reported-then vs as-known-now numbers and the restatement between
    them. Version selection is a pure CASE over (tx_time <= K) — one scan,
    no join beyond the 1-row max-date broadcast."""
    o = table(spark, sf_dir, "orders")
    day = F.expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
    base = o.select(
        "o_orderkey",
        day.alias("valid_day"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price0"),
        (F.col("o_orderkey") % 11 == 0).alias("corrected"),
    )
    maxd = base.agg(F.max("valid_day").alias("k_late"))
    priced = base.crossJoin(F.broadcast(maxd)).select(
        "valid_day",
        "price0",
        "corrected",
        (F.col("valid_day") + BT_CORRECTION_LAG_DAYS).alias("tx_corr"),
        (F.col("price0") * F.lit("1.1").cast("decimal(3,1)"))
        .cast("decimal(19,3)")
        .alias("price1"),
        "k_late",
        (F.col("k_late") - BT_EARLY_OFFSET_DAYS).alias("k_early"),
    )
    known_early = F.col("corrected") & (F.col("tx_corr") <= F.col("k_early"))
    known_late = F.col("corrected") & (F.col("tx_corr") <= F.col("k_late"))
    resolved = priced.select(
        "valid_day",
        F.when(known_early, F.col("price1"))
        .otherwise(F.col("price0").cast("decimal(19,3)"))
        .alias("p_early"),
        F.when(known_late, F.col("price1"))
        .otherwise(F.col("price0").cast("decimal(19,3)"))
        .alias("p_late"),
        (known_late & ~known_early).cast("int").alias("newly_corrected"),
    )
    return (
        resolved.groupBy(
            F.expr("valid_day div 30").cast("long").alias("month_bucket")
        )
        .agg(
            F.sum("p_early").cast("double").alias("revenue_asof_early"),
            F.sum("p_late").cast("double").alias("revenue_asof_late"),
            F.sum((F.col("p_late") - F.col("p_early")).cast("decimal(19,3)"))
            .cast("double")
            .alias("restatement"),
            F.sum("newly_corrected").cast("long").alias("n_restated_orders"),
        )
        .orderBy("month_bucket")
    )


# --- fact-to-versioned-dimension temporal join -------------------------------
# THE dimensional-correctness join: a fact row must be decorated with the
# dimension attributes that were true AT THE FACT'S EVENT TIME, not
# today's (joining facts to a current-only dim silently rewrites history).
# With the SCD2 history (scd2_customer_history's lead()-closed intervals),
# this is fact JOIN dim ON key AND valid_from <= t < valid_to — a range
# join whose fan-out is bounded by versions-per-key (small by
# construction), so at scale it runs as an equi-join on the key with an
# interval filter, never a blind interval cross. Proof-by-construction
# here: each fact matches EXACTLY ONE version (intervals tile), asserted
# in-query via the match-count histogram.
@register(
    "fact_temporal_dim_join",
    f"""
    WITH changelog AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             {_OP_SQL} AS op
      FROM orders
    ),
    versions AS (
      SELECT o_custkey,
             o_orderdate AS valid_from,
             LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey)
               AS valid_to,
             op AS version_op
      FROM changelog
    ),
    joined AS (
      SELECT f.o_orderkey, f.o_totalprice, v.version_op
      FROM changelog f
      JOIN versions v
        ON v.o_custkey = f.o_custkey
       AND f.o_orderdate >= v.valid_from
       AND (v.valid_to IS NULL OR f.o_orderdate < v.valid_to)
    ),
    match_counts AS (
      SELECT o_orderkey, COUNT(*) AS n_matches FROM joined GROUP BY o_orderkey
    )
    SELECT version_op,
           CAST(COUNT(*) AS BIGINT) AS n_facts,
           {dsum_sql('o_totalprice')} AS revenue,
           (SELECT CAST(MAX(n_matches) AS BIGINT) FROM match_counts)
             AS max_versions_matched
    FROM joined
    GROUP BY version_op
    ORDER BY version_op
    """,
)
def fact_temporal_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decorate each order with the dimension version valid at its order
    date (the orders changelog doubles as the versioned dim — each key's
    versions tile time). Output: revenue per version-op plus the in-query
    proof that every fact matched exactly one version (max matches = 1,
    because same-timestamp versions are closed by the orderkey tiebreak —
    a fact at a version boundary takes the later version's open interval).
    """
    o = table(spark, sf_dir, "orders").withColumn("op", _op_col())
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    versions = o.select(
        F.col("o_custkey").alias("v_key"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.col("op").alias("version_op"),
    )
    joined = o.join(
        versions,
        (o.o_custkey == versions.v_key)
        & (o.o_orderdate >= versions.valid_from)
        & (versions.valid_to.isNull() | (o.o_orderdate < versions.valid_to)),
    )
    max_match = (
        joined.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    from fpl_data_pipeline_spark.functions.exact import dsum

    return (
        joined.groupBy("version_op")
        .agg(
            F.count(F.lit(1)).alias("n_facts"),
            dsum("o_totalprice", "revenue"),
        )
        .withColumn("max_versions_matched", F.lit(int(max_match)).cast("long"))
        .orderBy("version_op")
    )
