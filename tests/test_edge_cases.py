"""Empty-input and degenerate-input behavior of the engine's core operators:
a distributed engine meets empty partitions, empty batches, and key-miss
joins constantly — they must degrade to correct empties, not errors."""

from __future__ import annotations

import pyspark.sql.functions as F

from fpl_data_pipeline_spark.operators.dedup import connected_components
from fpl_data_pipeline_spark.operators.upsert import upsert
from fpl_data_pipeline_spark.sources.incremental_load import (
    high_water_mark,
    select_weeks,
)


def test_upsert_empty_batch_is_noop(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    empty = spark.createDataFrame([], "id long, v string")
    out = upsert(base, empty, keys=["id"])
    assert {tuple(r) for r in out.collect()} == {(1, "a"), (2, "b")}


def test_upsert_into_empty_base(spark):
    base = spark.createDataFrame([], "id long, v string")
    batch = spark.createDataFrame([(1, "a")], "id long, v string")
    out = upsert(base, batch, keys=["id"])
    assert [tuple(r) for r in out.collect()] == [(1, "a")]


def test_high_water_mark_empty_table(spark):
    wk = spark.createDataFrame([], "id int, data_checked boolean")
    assert high_water_mark(wk) == 0


def test_select_weeks_skip_returns_empty(spark):
    src = spark.createDataFrame([(1, 1), (2, 2)], "element_ int, round_gw int")
    assert select_weeks(src, hwm=0, data_flow="Skip").count() == 0


def test_connected_components_no_edges(spark):
    pairs = spark.createDataFrame([], "doc_id_a long, doc_id_b long")
    assert connected_components(pairs).count() == 0


def test_topk_on_empty_filter(spark):
    """TakeOrderedAndProject over an empty relation returns an empty result
    with the right schema (not an error)."""
    df = spark.range(10).filter(F.col("id") < 0)
    out = df.orderBy(F.col("id").desc()).limit(5)
    assert out.count() == 0
    assert out.columns == ["id"]


def test_dedup_operators_on_degenerate_corpora(spark):
    """Empty corpus, empty-text docs, and an all-identical corpus must not
    crash any dedup building block and must produce the obvious results."""
    import pyspark.sql.functions as F

    from fpl_data_pipeline_spark.operators.dedup import (
        capped_shingles,
        minhash_signatures,
        ordered_shingles,
        shingles,
        simhash,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert shingles(empty).count() == 0
    assert capped_shingles(empty).count() == 0
    assert ordered_shingles(empty).count() == 0
    assert minhash_signatures(empty).count() == 0
    assert simhash(empty).count() == 0

    degenerate = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one"), (4, None)], "doc_id long, text string"
    )
    # none of these have a 3-gram; nothing aborts, nothing is emitted
    assert shingles(degenerate).count() == 0
    assert minhash_signatures(degenerate).count() == 0

    same = spark.createDataFrame(
        [(i, "identical text repeated across every document here") for i in range(5)],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(same).collect()
    assert len({tuple(r["sig"]) for r in sigs}) == 1  # one signature class
    sh = {r["doc_id"]: r["simhash"] for r in simhash(same).collect()}
    assert len(set(sh.values())) == 1


def test_corpus_operators_on_degenerate_docs(spark, tmp_path):
    """Corpus-prep queries run over a table containing empty/short docs
    without aborting (regression class: sequence(1,0) descending)."""
    import pyspark.sql.functions as F

    from fpl_data_pipeline_spark.registry import QUERIES, load_all

    load_all()
    docs = spark.createDataFrame(
        [
            (1, "", "en", "src0", 0),
            (2, "one", "en", "src0", 3),
            (3, "two words", "de", "src1", 9),
            (4, "a normal length document with enough words to keep "
                "the quality filters content and the packer busy", "en", "src1", 103),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path)
    docs.write.parquet(f"{sf_dir}/documents.parquet")
    for name in ("quality_repetition_signals", "doc_packing_summary",
                 "quality_filter_funnel", "doc_chunking", "text_top_bigrams",
                 "dedup_winnowing_pairs", "dedup_minhash_portable"):
        out = QUERIES[name](spark, sf_dir)
        out.collect()  # must not raise
    funnel = {r["verdict"]: r["n_docs"]
              for r in QUERIES["quality_filter_funnel"](spark, sf_dir).collect()}
    # empty-text doc never reaches the divide-by-zero rules: caught by too_short
    assert funnel.get("too_short", 0) >= 2
