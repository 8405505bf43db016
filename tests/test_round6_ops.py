"""Semantics invariants for the round-4 continuation additions (beyond
oracle parity): novelty extremes on planted corpora."""

from __future__ import annotations

import pyspark.sql.functions as F

from fpl_data_pipeline_spark.operators.dedup import shingles


def _novelty(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingles(df)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    return {
        r["doc_id"]: (r["n_unique"], r["n_shingles"])
        for r in sh.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("df") == 1).cast("long")).alias("n_unique"),
        )
        .collect()
    }


def test_novelty_extremes(spark):
    """Mirrored docs score zero novelty; a globally unique doc scores 1."""
    dup = "the quick brown fox jumps over the lazy dog again and again"
    uniq = "completely singular content about fermionic condensates tonight"
    nov = _novelty(
        spark, [(1, dup), (2, dup), (3, uniq)]
    )
    n_u1, n_s1 = nov[1]
    assert n_u1 == 0  # every shingle of doc 1 also occurs in doc 2
    n_u3, n_s3 = nov[3]
    assert n_u3 == n_s3 > 0  # unique doc: fully novel


def test_novelty_partial(spark):
    """A doc sharing half its content with a mirror scores strictly between
    the extremes."""
    shared = "alpha beta gamma delta epsilon zeta"
    a = shared + " eta theta iota kappa lambda mu"
    nov = _novelty(spark, [(1, a), (2, shared), (3, "nu xi omicron pi rho sigma")])
    n_u, n_s = nov[1]
    assert 0 < n_u < n_s


def test_calibration_bins_invariants(spark):
    """Bins partition the corpus; each bin's mean prediction lies inside
    the bin's score interval (bin 9 is clamped, upper bound inclusive)."""
    from fpl_data_pipeline_spark.functions.text_queries import (
        quality_calibration_bins,
    )
    from fpl_data_pipeline_spark.tables import table

    sf = "/root/testdata/sf0.001"
    rows = quality_calibration_bins(spark, sf).collect()
    n_docs = table(spark, sf, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        lo, hi = r["bin"] / 10, (r["bin"] + 1) / 10 if r["bin"] < 9 else 1.0
        assert lo <= r["mean_pred"] <= hi + 1e-9
        assert 0.0 <= r["pos_rate"] <= 1.0


def test_encoding_audit_finds_exactly_planted(spark):
    """On a clean ASCII corpus the audit's positives are exactly the
    injected population (no false positives, none missed)."""
    import pyspark.sql.functions as F
    from fpl_data_pipeline_spark.functions.text_queries import (
        text_encoding_audit,
    )
    from fpl_data_pipeline_spark.tables import table

    sf = "/root/testdata/sf0.001"
    d = table(spark, sf, "documents").select("doc_id", "source")
    expect = d.agg(
        F.sum((F.col("doc_id") % 11 == 0).cast("long")).alias("rep"),
        F.sum((F.col("doc_id") % 13 == 0).cast("long")).alias("moji"),
        F.sum((F.col("doc_id") % 17 == 0).cast("long")).alias("ctrl"),
        F.sum((F.col("doc_id") % 19 == 0).cast("long")).alias("zw"),
    ).first()
    got = (
        text_encoding_audit(spark, sf)
        .agg(
            F.sum("docs_replacement").alias("rep"),
            F.sum("docs_mojibake").alias("moji"),
            F.sum("docs_control").alias("ctrl"),
            F.sum("docs_zerowidth").alias("zw"),
        )
        .first()
    )
    assert (got["rep"], got["moji"], got["ctrl"], got["zw"]) == (
        expect["rep"], expect["moji"], expect["ctrl"], expect["zw"],
    )
