"""Incremental view maintenance (IVM) with signed multiplicities.

The reference maintains its fact table incrementally (includes.py:154-170
last-write-wins upsert, the insert_week_* tasks append one week at a time)
but recomputes every aggregate view from scratch on each dashboard hit
(sql_queries.py re-runs the full GROUP BY). At 100 TB that recompute is the
bottleneck: a day's delta is gigabytes while the standing fact is the full
corpus. This module maintains aggregate views ALGEBRAICALLY from deltas —
the DBSP / Materialize / Differential-Dataflow shape (Budiu et al., "DBSP:
Automatic Incremental View Maintenance for Rich Query Languages", VLDB'23)
— expressed as plain DataFrame programs:

- rows carry a signed weight (+1 insert, -1 retraction): a Z-set;
- an aggregate view over (count, sum) is a group-wise linear function, so
  V(base ∪ Δ) = V(base) ⊕ V(Δ), where ⊕ is keyed addition of partials;
- groups whose maintained count reaches 0 vanish from the view.

Scale design: the delta aggregate touches ONLY the delta (map-side partial
agg, one shuffle on the group key, grouped by the same key as the standing
view so the merge join is co-partitioned); the standing view is never
recomputed and the base table is never rescanned. Sums go through the
repo-wide exact-decimal convention (functions/exact.py), so the maintained
sum is bit-identical to a from-scratch recompute — the registered query
proves exactly that: Spark maintains incrementally, the DuckDB oracle
recomputes the final state from scratch, and the driver hash-compares them.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from fpl_data_pipeline_spark.registry import register
from fpl_data_pipeline_spark.tables import table
from fpl_data_pipeline_spark.functions.exact import dsum_sql, money, psum


def zset_agg_view(
    zset: DataFrame,
    keys: list[str],
    weight: str,
    sum_cols: dict[str, str],
) -> DataFrame:
    """Aggregate a signed-multiplicity relation into view partials.

    Returns one row per key group: ``__n`` = sum of weights (the maintained
    COUNT) and, for each ``alias -> money_col``, the exact-decimal sum of
    ``weight * col`` as DECIMAL — kept in decimal so partials merge exactly
    (decimal addition is associative; double addition is not).
    """
    aggs = [F.sum(F.col(weight).cast("long")).alias("__n")]
    for alias, col in sum_cols.items():
        aggs.append(
            F.sum(F.col(weight).cast("decimal(3,0)") * money(col)).alias(alias)
        )
    return zset.groupBy(*keys).agg(*aggs)


def merge_view_delta(
    base_view: DataFrame,
    delta_view: DataFrame,
    keys: list[str],
    sum_aliases: list[str],
) -> DataFrame:
    """⊕: keyed addition of view partials; groups that net to count 0 drop.

    Both sides are outputs of :func:`zset_agg_view` (decimal partials). The
    join is a keyed full-outer — at scale both sides are grouped on ``keys``
    already, so with the view stored bucketed by the same keys this merge is
    co-partitioned (no extra exchange; see sources/bucketing.py for the
    storage contract).
    """
    b = base_view.select(
        *keys,
        F.col("__n").alias("__bn"),
        *[F.col(a).alias(f"__b_{a}") for a in sum_aliases],
    )
    d = delta_view.select(
        *keys,
        F.col("__n").alias("__dn"),
        *[F.col(a).alias(f"__d_{a}") for a in sum_aliases],
    )
    zero = F.lit(0).cast("decimal(20,2)")
    merged = b.join(d, keys, "full_outer").select(
        *keys,
        (F.coalesce("__bn", F.lit(0)) + F.coalesce("__dn", F.lit(0))).alias("__n"),
        *[
            (
                F.coalesce(F.col(f"__b_{a}").cast("decimal(20,2)"), zero)
                + F.coalesce(F.col(f"__d_{a}").cast("decimal(20,2)"), zero)
            ).alias(a)
            for a in sum_aliases
        ],
    )
    return merged.filter(F.col("__n") > 0)


def finalize_view(view: DataFrame, keys: list[str], sum_aliases: list[str]) -> DataFrame:
    """Render maintained partials as the public view schema (doubles)."""
    return view.select(
        *keys,
        F.col("__n").alias("n_rows"),
        *[F.col(a).cast("double").alias(a) for a in sum_aliases],
    )


@register(
    "ivm_delta_view",
    f"""
    WITH live AS (
      SELECT * FROM orders WHERE o_orderkey % 5 = 0 OR o_orderkey % 7 <> 0
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS n_rows,
           {dsum_sql('o.o_totalprice')} AS revenue
    FROM live o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def ivm_delta_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain a join-aggregate view (revenue per market segment) under a
    deterministic changelog WITHOUT rescanning the base table:

    - base      = orders with o_orderkey % 5 <> 0 (the standing fact);
    - inserts   = orders with o_orderkey % 5 = 0   (weight +1);
    - retracts  = base rows with o_orderkey % 7 = 0 (weight -1) — e.g. a
      GDPR erasure or late-arriving correction pulling rows back out.

    Spark computes V(base) once, aggregates ONLY the delta, and merges the
    partials keyed on the segment; the oracle recomputes the net-live set
    from scratch. Hash equality IS the proof that the delta algebra (and the
    exact-decimal merge) reproduces the recompute bit-for-bit.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    keys, sums = ["c_mktsegment"], {"revenue": "o_totalprice"}

    base = o.filter(F.col("o_orderkey") % 5 != 0)
    ins = o.filter(F.col("o_orderkey") % 5 == 0).withColumn("w", F.lit(1))
    dels = base.filter(F.col("o_orderkey") % 7 == 0).withColumn("w", F.lit(-1))
    delta = ins.unionByName(dels)

    decorate = lambda df: df.join(F.broadcast(c), df.o_custkey == c.c_custkey)  # noqa: E731
    base_view = zset_agg_view(decorate(base.withColumn("w", F.lit(1))), keys, "w", sums)
    delta_view = zset_agg_view(decorate(delta), keys, "w", sums)
    merged = merge_view_delta(base_view, delta_view, keys, ["revenue"])
    return finalize_view(merged, keys, ["revenue"]).orderBy("c_mktsegment")
