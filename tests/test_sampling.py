"""Invariants for the deterministic sampling/splitting/reshaping operators
(operators/sampling.py) at sf0.001."""

from __future__ import annotations

import pyspark.sql.functions as F

from fpl_data_pipeline_spark.operators.sampling import (
    _bucket,
    sample_hash_bucket,
    split_train_test,
    stratified_sample_counts,
    unpivot_part_measures,
)
from fpl_data_pipeline_spark.tables import table

SF = "/root/testdata/sf0.001"


def test_sample_is_repartition_stable(spark):
    """The content-hash sample must select the same doc_ids regardless of
    physical layout — the core property df.sample(seed=) does NOT have."""
    d = table(spark, SF, "documents")
    base = {r[0] for r in d.filter(_bucket(F.col("doc_id")) < "20").select("doc_id").collect()}
    shuffled = {
        r[0]
        for r in d.repartition(7, "lang")
        .filter(_bucket(F.col("doc_id")) < "20")
        .select("doc_id")
        .collect()
    }
    assert base == shuffled
    assert base == {r[0] for r in sample_hash_bucket(spark, SF).select("doc_id").collect()}


def test_split_covers_all_docs_disjointly(spark):
    d = table(spark, SF, "documents")
    out = {r["split"]: r["n_docs"] for r in split_train_test(spark, SF).collect()}
    assert set(out) == {"train", "test"}
    assert sum(out.values()) == d.count()
    # 80/20 nominal; allow generous tolerance at tiny sf
    frac = out["train"] / sum(out.values())
    assert 0.6 < frac < 0.95


def test_stratified_rates_direction(spark):
    """en is sampled at 1/8, others at 1/2 — sampled share of en must be
    well below its corpus share."""
    d = table(spark, SF, "documents")
    corpus = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    sampled = {r["lang"]: r["n_sampled"] for r in stratified_sample_counts(spark, SF).collect()}
    for lang, n in sampled.items():
        assert n <= corpus[lang]
    en_rate = sampled.get("en", 0) / corpus["en"]
    other = sum(v for k, v in sampled.items() if k != "en") / sum(
        v for k, v in corpus.items() if k != "en"
    )
    assert en_rate < other


def test_unpivot_rowcount_and_roundtrip(spark):
    p = table(spark, SF, "part")
    out = unpivot_part_measures(spark, SF)
    assert out.count() == 2 * p.count()
    sizes = (
        out.filter(F.col("measure") == "p_size")
        .groupBy()
        .agg(F.sum("value").alias("s"))
        .first()["s"]
    )
    assert sizes == p.agg(F.sum(F.col("p_size").cast("double"))).first()[0]
