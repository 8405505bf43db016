"""Round-5 scale-shape fixes: exact ntile/prefix-sum decompositions that
replace unpartitioned windows over unbounded inputs, and the explain-audit
detector that keeps them out (round-4 verdict #3/#4).

The decompositions must be BIT-IDENTICAL to the builtins they replace (the
oracles keep the NTILE()/SUM OVER spelling); the detector must flag the
naive shapes and stay quiet on the partitioned / offset-prefix-sum /
LIMIT-head shapes.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from fpl_data_pipeline_spark.plans.scale_primitives import (  # noqa: E402
    global_prefix_sums,
    global_row_numbers,
    ntile_from_rank,
)


def _plan(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    return df._jdf.queryExecution().explainString(mode)


# --- ntile_from_rank == builtin ntile, including ragged bucket sizes --------


def test_ntile_from_rank_matches_builtin(spark):
    for n, k in [(1, 4), (3, 4), (5, 4), (17, 5), (101, 10), (7, 10), (250, 7)]:
        df = spark.range(1, n + 1).select(
            F.col("id").alias("r"), F.lit(n).alias("n")
        )
        got = dict(
            df.select("r", ntile_from_rank("r", "n", k).alias("t")).collect()
        )
        ref = dict(
            spark.range(1, n + 1)
            .select(
                F.col("id").alias("r"),
                F.ntile(k).over(Window.orderBy("id")).alias("t"),
            )
            .collect()
        )
        assert got == ref, (n, k)


# --- global_prefix_sums == builtin running sum -------------------------------


def test_global_prefix_sums_matches_builtin(spark):
    df = spark.range(1000).select(
        F.col("id").alias("key"), ((F.col("id") * 37) % 11).alias("v")
    )
    got = dict(
        global_prefix_sums(df, [F.col("key").asc()], "v", "cs")
        .select("key", "cs")
        .collect()
    )
    w = Window.orderBy("key").rowsBetween(Window.unboundedPreceding, 0)
    ref = dict(df.select("key", F.sum("v").over(w).alias("cs")).collect())
    assert got == ref


def test_global_run_counts_matches_pandas(spark):
    """Seam-corrected run counting == a sequential scan, over random data
    whose long runs SPAN partition boundaries (the case the seam
    correction exists for), including NULL runs."""
    import random

    from fpl_data_pipeline_spark.plans.scale_primitives import global_run_counts

    rng = random.Random(11)
    for trial in range(3):
        n = 3000
        # few distinct values + sorted-ish keys => runs much longer than
        # n / RANGE_PARTS, so nearly every partition seam splits a run
        vals = [
            rng.choice(["A", "B", None]) if trial == 2 else rng.choice(["A", "B", "C"])
            for _ in range(n)
        ]
        vals.sort(key=lambda v: (v is None, v or ""))  # giant runs
        if trial == 1:
            rng.shuffle(vals)  # short runs
        rows = [(i, vals[i]) for i in range(n)]
        df = spark.createDataFrame(rows, "k long, v string")
        got = global_run_counts(df, [F.col("k")], ["v"]).collect()[0]["v_runs"]
        expect = sum(
            1 for i in range(n) if i == 0 or vals[i] != vals[i - 1]
        )
        assert got == expect, (trial, got, expect)


def test_global_row_numbers_dense_and_ordered(spark):
    df = spark.range(500).select((F.col("id") * 7919 % 500).alias("k"))
    rn = sorted(
        r["global_rn"]
        for r in global_row_numbers(df, [F.col("k").asc()]).collect()
    )
    assert rn == list(range(1, 501))


# --- the audit detector: flags naive shapes, passes sanctioned ones ---------


def test_audit_flags_naive_global_window(spark):
    from explain_audit import unpartitioned_windows

    df = spark.range(100).withColumn("g", F.col("id") % 5)
    naive = df.withColumn("t", F.ntile(4).over(Window.orderBy("id")))
    assert unpartitioned_windows(_plan(naive)) == 1
    naive_cnt = df.withColumn("n", F.count(F.lit(1)).over(Window.partitionBy()))
    assert unpartitioned_windows(_plan(naive_cnt)) == 1


def test_audit_passes_sanctioned_shapes(spark):
    from explain_audit import unpartitioned_windows

    df = spark.range(100).withColumn("g", F.col("id") % 5)
    part = df.withColumn(
        "r", F.row_number().over(Window.partitionBy("g").orderBy("id"))
    )
    assert unpartitioned_windows(_plan(part)) == 0
    head = df.orderBy("id").limit(5).withColumn(
        "r", F.row_number().over(Window.orderBy("id"))
    )
    assert unpartitioned_windows(_plan(head)) == 0
    # the offsets prefix-sum inside global_row_numbers is the third
    # sanctioned shape — the whole decomposition must audit clean
    numbered = global_row_numbers(df, [F.col("id").asc()])
    assert unpartitioned_windows(_plan(numbered)) == 0


def test_migrated_queries_audit_clean(spark):
    """The four round-4-verdict queries + the three round-5 finds carry no
    unpartitioned window over an unbounded input any more."""
    from explain_audit import unpartitioned_windows
    from fpl_data_pipeline_spark.registry import QUERIES, load_all

    load_all()
    sf = "/root/testdata/sf0.001"
    for name in [
        "trimmed_mean_price",
        "customer_spend_deciles",
        "customer_rfm_segments",
        "window_ntile_cume",
        "doc_packing_summary",
        "events_peak_concurrency",
        "sequence_gap_audit",
        "layout_rle_advisor",
        "cf_negative_samples",
        "events_conversion_latency",
        "zipf_alpha_words",
    ]:
        assert unpartitioned_windows(_plan(QUERIES[name](spark, sf))) == 0, name
