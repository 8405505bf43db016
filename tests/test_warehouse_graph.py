"""Semantics invariants for the CDC/SCD2 warehouse operators and the
near-dup-graph analytics (beyond oracle parity): delete semantics and
idempotency of cdc_apply, SCD2 interval integrity, and PageRank/triangle
values on a planted graph with hand-computed ground truth."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"

import pyspark.sql.functions as F

from fpl_data_pipeline_spark.operators.graph import pagerank
from fpl_data_pipeline_spark.plans.changelog import cdc_apply


def _changelog(spark):
    # key 1: U then D (dead); key 2: D then U (resurrected); key 3: U only
    rows = [
        (1, 1, "U", 10.0),
        (1, 2, "D", 0.0),
        (2, 1, "D", 0.0),
        (2, 2, "U", 20.0),
        (3, 1, "U", 30.0),
    ]
    return spark.createDataFrame(rows, "k long, seq long, op string, v double")


def test_cdc_apply_delete_and_resurrect(spark):
    state = cdc_apply(_changelog(spark), "k", ["seq"]).orderBy("k").collect()
    assert [(r.k, r.v) for r in state] == [(2, 20.0), (3, 30.0)]


def test_cdc_apply_idempotent(spark):
    log = _changelog(spark)
    once = cdc_apply(log, "k", ["seq"])
    # re-applying the final state as a fresh all-'U' changelog is a no-op
    again = cdc_apply(once.withColumn("op", F.lit("U")), "k", ["seq"])
    assert sorted((r.k, r.v) for r in again.collect()) == sorted(
        (r.k, r.v) for r in once.collect()
    )


def test_scd2_intervals_partition_time(spark):
    """Every key's SCD2 versions tile time: exactly one open (current)
    version per key, and each closed version's valid_to equals the next
    version's valid_from."""
    from fpl_data_pipeline_spark.tables import table
    from pyspark.sql import Window

    o = table(spark, SF, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    v = o.select(
        "o_custkey",
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.lead("o_orderdate", 1).over(w).alias("next_from"),
    )
    n_keys = o.select("o_custkey").distinct().count()
    n_current = v.filter(F.col("valid_to").isNull()).count()
    assert n_current == n_keys
    torn = v.filter(
        F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("next_from"))
    ).count()
    assert torn == 0


def _planted_edges(spark):
    # triangle 1-2-3 plus pendant 3-4
    return spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "doc_id_a long, doc_id_b long"
    )


def test_pagerank_planted_graph(spark):
    """On the planted graph, node 3 (degree 3) must outrank nodes 1 and 2
    (degree 2), which outrank pendant node 4; ranks sum to ~1."""
    pr = {r.doc_id: r.pr for r in pagerank(_planted_edges(spark)).collect()}
    assert set(pr) == {1, 2, 3, 4}
    assert pr[3] > pr[1] == pr[2] > pr[4]
    assert math.isclose(sum(pr.values()), 1.0, abs_tol=1e-6)


def test_triangle_count_planted_graph(spark, monkeypatch):
    """dupgraph_triangle_stats counts exactly the planted triangle when the
    edge builder is substituted: 1 triangle, wedges C(2,2)+C(2,2)+C(3,2)+
    C(1,2) = 1+1+3+0 = 5, clustering 3*1/5 = 0.6."""
    import fpl_data_pipeline_spark.operators.graph as graph

    monkeypatch.setattr(graph, "_dup_edges", lambda d: _planted_edges(spark))
    row = graph.dupgraph_triangle_stats(spark, SF).collect()[0]
    assert row.n_triangles == 1
    assert row.n_wedges == 5
    assert abs(row.clustering_coeff - 0.6) < 1e-9


def test_pagerank_resumes_from_persisted_ranks(spark, tmp_path):
    """Fault tolerance of the iterative operator: persist the rank vector
    after iteration 1, 'restart', run 2 more iterations from the persisted
    snapshot — final ranks must be bitwise identical to an uninterrupted
    3-iteration run (the portable-rounding convention makes per-iteration
    state exact, so resume cannot drift)."""
    from fpl_data_pipeline_spark.operators.graph import pagerank

    edges = _planted_edges(spark)
    full = {r.doc_id: r.pr for r in pagerank(edges, n_iter=3).collect()}

    snap_path = str(tmp_path / "pr_iter1")
    pagerank(edges, n_iter=1).write.parquet(snap_path)

    # resume: rebuild the iteration inputs, seed from the snapshot
    import pyspark.sql.functions as F

    sym = (
        edges.select(F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst"))
        .unionAll(
            edges.select(F.col("doc_id_b").alias("src"), F.col("doc_id_a").alias("dst"))
        )
        .localCheckpoint()
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nn = sym.select("src").distinct().agg(F.count(F.lit(1)).alias("n"))
    from fpl_data_pipeline_spark.functions.exact import portable_round

    pr = spark.read.parquet(snap_path)
    for _ in range(2):
        contrib = (
            sym.join(pr.withColumnRenamed("doc_id", "src"), "src")
            .join(deg, "src")
            .select(
                "dst",
                portable_round(F.col("pr") / F.col("outdeg"), 12)
                .cast("decimal(28,12)")
                .alias("c"),
            )
        )
        pr = (
            contrib.groupBy("dst")
            .agg(F.sum("c").cast("double").alias("s"))
            .crossJoin(F.broadcast(nn))
            .select(
                F.col("dst").alias("doc_id"),
                portable_round(
                    F.lit(0.15) / F.col("n") + F.lit(0.85) * F.col("s"), 12
                ).alias("pr"),
            )
        )
    resumed = {r.doc_id: r.pr for r in pr.collect()}
    assert resumed == full
