"""Persisted deploy-state round trip for the incremental dedup families —
the round-8 verdict's task #5.

The registered queries (`emb_incremental_neardup`, `dedup_incremental_batch`)
derive their corpus/batch split from a content hash because a driver query
gets only (spark, sf_dir); a real deployment instead PERSISTS the state
between increments. These tests drive that loop through
operators/incremental_state.py: write batch1's state as the bucketed table,
probe batch2 against the TABLE (not a recomputation), append batch2, and
probe batch3 — batch3's planted near-copy of a batch2 vector must hit,
proving the append really made batch2 part of the corpus.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from fpl_data_pipeline_spark.operators.incremental_state import (
    append_band_state,
    band_state_long,
    probe_band_state,
    probe_fingerprint_state,
    write_band_state,
    write_fingerprint_state,
)
from fpl_data_pipeline_spark.operators.similarity import (
    DIM,
    ND_BAND_CAP,
    lsh_doc_band_keys,
)


def _emb_frame(spark, id_vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in id_vecs],
        "vec_id long, embedding array<float>",
    )


@pytest.fixture()
def three_batches(spark):
    """batch1: 40 spread vectors; batch2: 30 new + one near-copy of a
    batch1 vector (id 1000 ~ id 3); batch3: one near-copy of a BATCH2
    vector (id 2000 ~ id 1005) — visible only if the state append took."""
    rng = np.random.RandomState(23)
    b1 = [(i, rng.randn(DIM) * 3) for i in range(40)]
    b2 = [(1000 + j, rng.randn(DIM) * 3) for j in range(30)]
    b2.append((1099, b1[3][1] + 0.001 * rng.randn(DIM)))
    b3 = [(2000, b2[5][1] + 0.001 * rng.randn(DIM))]
    return (
        _emb_frame(spark, b1),
        _emb_frame(spark, b2),
        _emb_frame(spark, b3),
    )


def test_band_state_two_batch_sequencing(spark, three_batches, tmp_path):
    b1, b2, b3 = three_batches
    tbl = "inc_band_state_t"
    try:
        write_band_state(
            band_state_long(lsh_doc_band_keys(b1)), tbl, str(tmp_path / "state")
        )
        state = spark.table(tbl)

        # probe batch2 against the PERSISTED table: the planted near-copy
        # of batch1's id 3 must surface as a candidate
        cand2 = probe_band_state(state, band_state_long(lsh_doc_band_keys(b2)),
                                 ND_BAND_CAP).collect()
        assert (1099, 3) in {(r["new_id"], r["dup_of"]) for r in cand2}
        # and nothing pairs batch2 against itself (state-only dup_of side)
        assert all(r["dup_of"] < 1000 for r in cand2)

        # accept batch2: fold its keys into the state, then probe batch3 —
        # its near-copy of a BATCH2 vector only hits if the append took
        append_band_state(spark, tbl, band_state_long(lsh_doc_band_keys(b2)))
        state = spark.table(tbl)
        assert state.count() == 2 * (40 + 31)  # 2 bands per vector
        cand3 = probe_band_state(state, band_state_long(lsh_doc_band_keys(b3)),
                                 ND_BAND_CAP).collect()
        assert (2000, 1005) in {(r["new_id"], r["dup_of"]) for r in cand3}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_band_state_probe_reads_state_side_unshuffled(spark, three_batches,
                                                      tmp_path):
    """The layout contract the bucketing exists for: the state-side scan of
    the probe join carries no Exchange (the batch side, being the small
    arriving increment, may shuffle — that's the cheap side by design)."""
    b1, b2, _ = three_batches
    tbl = "inc_band_state_layout_t"
    try:
        write_band_state(
            band_state_long(lsh_doc_band_keys(b1)), tbl, str(tmp_path / "state")
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        cand = probe_band_state(
            spark.table(tbl).filter(F.col("band").isNotNull()),
            band_state_long(lsh_doc_band_keys(b2)),
            ND_BAND_CAP,
        )
        plan = cand._jdf.queryExecution().executedPlan().toString()
        # the dup_of-side state scan must join bucket-aligned: count the
        # shuffle exchanges — batch side + alive pre-pass only, never the
        # full-state side twice
        assert plan.count("Exchange hashpartitioning") <= 2, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS inc_band_state_layout_t")


def test_fingerprint_state_round_trip(spark, tmp_path):
    """Text-side twin: persist batch1's fingerprint set bucketed on fp,
    probe a batch whose first doc duplicates corpus content byte-for-byte
    (after whitespace canonicalization) and whose second doc is new."""
    tbl = "inc_fp_state_t"
    fp_of = lambda c: F.md5(F.lower(F.trim(F.regexp_replace(c, r"\s+", " "))))  # noqa: E731
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "lorem ipsum dolor")],
        "doc_id long, text string",
    ).select("doc_id", fp_of("text").alias("fp"))
    try:
        write_fingerprint_state(corpus.select("fp").distinct(), tbl,
                                str(tmp_path / "fp"))
        batch = spark.createDataFrame(
            [(10, "The  Quick   Brown Fox"), (11, "completely new text")],
            "doc_id long, text string",
        ).select("doc_id", fp_of("text").alias("fp"))
        got = {
            r["doc_id"]: r["status"]
            for r in probe_fingerprint_state(spark.table(tbl), batch).collect()
        }
        assert got == {10: "dup_of_corpus", 11: "new"}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_probe_band_state_drops_overcap_buckets(spark):
    """The alive pre-pass in the shared probe: a (band, k) bucket whose
    corpus membership exceeds the cap is non-discriminative and emits NO
    candidates, while under-cap buckets still probe — the boilerplate
    guard, now pinned on the persisted-shape code path."""
    state = spark.createDataFrame(
        # bucket (0, 'hot') holds 3 corpus vectors; (1, 'cold') holds 2
        [(1, 0, "hot"), (2, 0, "hot"), (3, 0, "hot"), (4, 1, "cold"), (5, 1, "cold")],
        "vec_id long, band int, k string",
    )
    batch = spark.createDataFrame(
        [(100, 0, "hot"), (100, 1, "cold")], "vec_id long, band int, k string"
    )
    got = {
        (r["new_id"], r["dup_of"])
        for r in probe_band_state(state, batch, cap=2).collect()
    }
    # hot bucket (3 > cap) dropped entirely; cold bucket (2 <= cap) probes
    assert got == {(100, 4), (100, 5)}


def test_compact_band_state_preserves_probe_and_shrinks_files(
    spark, three_batches, tmp_path
):
    """The OPTIMIZE step of the loop: after an append leaves two file sets
    per bucket, compaction rewrites to one set — probe results identical,
    layout still bucketed (append after compaction still works), file
    count strictly smaller."""
    import os

    from fpl_data_pipeline_spark.operators.incremental_state import (
        compact_band_state,
    )

    b1, b2, b3 = three_batches
    tbl = "inc_band_state_compact_t"
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")

    def parquet_files(p):
        return sum(
            1
            for root, _, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
        )

    try:
        write_band_state(band_state_long(lsh_doc_band_keys(b1)), tbl, p1)
        append_band_state(spark, tbl, band_state_long(lsh_doc_band_keys(b2)))
        before_files = parquet_files(p1)
        probe = lambda: sorted(  # noqa: E731
            (r["new_id"], r["dup_of"])
            for r in probe_band_state(
                spark.table(tbl), band_state_long(lsh_doc_band_keys(b3)),
                ND_BAND_CAP,
            ).collect()
        )
        want = probe()
        compact_band_state(spark, tbl, p2)
        assert probe() == want
        assert spark.table(tbl).count() == 2 * (40 + 31)
        assert parquet_files(p2) < before_files
        # layout survived: a further append still lands bucketed
        append_band_state(spark, tbl, band_state_long(lsh_doc_band_keys(b3)))
        assert spark.table(tbl).count() == 2 * (40 + 31 + 1)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_streaming_neardup_ingest_two_microbatches(spark, three_batches, tmp_path):
    """The stream-driven deployment loop (streaming/incremental.py::
    run_neardup_ingest): micro-batch 1 (b2's vectors) probes the b1-built
    state and emits the planted b2~b1 candidate; its keys fold into the
    state table, so micro-batch 2 (b3, a near-copy of a B2 vector) hits —
    the two-batch sequencing contract, now across Structured Streaming
    micro-batches with a shared checkpoint."""
    from fpl_data_pipeline_spark.streaming.incremental import run_neardup_ingest

    b1, b2, b3 = three_batches
    tbl = "inc_band_state_stream_t"
    src, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    try:
        write_band_state(
            band_state_long(lsh_doc_band_keys(b1)), tbl, str(tmp_path / "state")
        )
        b2.coalesce(1).write.mode("append").parquet(src)
        run_neardup_ingest(spark, src, tbl, out, ckpt)
        got1 = {
            (r["new_id"], r["dup_of"])
            for r in spark.read.parquet(out + "/batch_id=0").collect()
        }
        assert (1099, 3) in got1
        assert all(d < 1000 for _, d in got1)  # state was b1-only

        b3.coalesce(1).write.mode("append").parquet(src)
        run_neardup_ingest(spark, src, tbl, out, ckpt)  # drains ONLY new files
        later = spark.read.option("basePath", out).parquet(out)
        got2 = {
            (r["new_id"], r["dup_of"])
            for r in later.filter(F.col("batch_id") >= 1).collect()
        }
        assert (2000, 1005) in got2  # b2 is corpus now: the fold took
        # state = bootstrap b1 + folded b2 + folded b3 (every drained
        # micro-batch folds, including the last)
        assert spark.table(tbl).count() == 2 * (40 + 31 + 1)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_minhash_band_state_rides_the_same_story(spark, tmp_path):
    """The text-minhash family's deploy state is the SAME shape: its
    (doc_id, band_id, band_key) band relation is already long-form, so a
    rename feeds it through the shared persist/probe/append path — one
    deploy-state story across text-minhash and embedding-LSH (round-8
    verdict task #5, extended)."""
    from fpl_data_pipeline_spark.operators.dedup import (
        MH_BAND_CAP,
        minhash_signatures,
        N_BANDS,
        ROWS_PER_BAND,
    )

    def band_keys(docs):
        sigs = minhash_signatures(docs)
        return sigs.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.xxhash64(
                                *[
                                    F.element_at("sig", b * ROWS_PER_BAND + r + 1)
                                    for r in range(ROWS_PER_BAND)
                                ]
                            ).alias("k"),
                        )
                        for b in range(N_BANDS)
                    ]
                )
            ).alias("bk"),
        ).select(F.col("doc_id").alias("vec_id"), "bk.band", "bk.k")

    base_text = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [(1, base_text), (2, "completely different words in this second document here")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        # near-copy of doc 1 (one word changed -> most shingle bands match)
        [(100, base_text.replace("lazy", "sleepy")),
         (101, "nothing shares any shingle with the corpus documents at all")],
        "doc_id long, text string",
    )
    tbl = "inc_mh_band_state_t"
    try:
        write_band_state(band_keys(corpus), tbl, str(tmp_path / "mh"))
        got = {
            (r["new_id"], r["dup_of"])
            for r in probe_band_state(
                spark.table(tbl), band_keys(batch), MH_BAND_CAP
            ).collect()
        }
        assert (100, 1) in got
        assert not any(n == 101 for n, _ in got)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


from hypothesis import given, settings, strategies as st  # noqa: E402

_key_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),  # vec_id
        st.integers(min_value=0, max_value=1),   # band
        st.sampled_from(["a", "b", "c", "d"]),   # k
    ),
    min_size=0,
    max_size=25,
    unique=True,
)


@settings(max_examples=8, deadline=None)
@given(state_rows=_key_rows, batch_rows=_key_rows,
       cap=st.integers(min_value=1, max_value=6))
def test_probe_band_state_matches_bruteforce(spark, state_rows, batch_rows, cap):
    """Property: probe_band_state == the brute-force definition — distinct
    (new, dup_of) pairs sharing at least one (band, k) bucket whose STATE
    membership is within the cap — for arbitrary key layouts, including
    empty sides, over-cap buckets and batch ids colliding with state ids."""
    from collections import Counter

    schema = "vec_id long, band int, k string"
    state = spark.createDataFrame(state_rows, schema) if state_rows else \
        spark.createDataFrame([], schema)
    batch = spark.createDataFrame(batch_rows, schema) if batch_rows else \
        spark.createDataFrame([], schema)
    got = {
        (r["new_id"], r["dup_of"])
        for r in probe_band_state(state, batch, cap).collect()
    }
    sizes = Counter((b, k) for _, b, k in state_rows)
    want = {
        (nv, sv)
        for nv, nb, nk in batch_rows
        for sv, sb, sk in state_rows
        if (nb, nk) == (sb, sk) and sizes[(sb, sk)] <= cap
    }
    assert got == want


def test_streaming_ingest_replay_degrades_to_at_least_once_state(
    spark, three_batches, tmp_path
):
    """The documented crash contract of run_neardup_ingest: replaying a
    drained batch (simulated by wiping the checkpoint) re-appends its keys
    — state becomes at-least-once — but candidate EMISSION stays exact:
    the per-batch output is overwritten by batch_id, and probe_band_state
    distincts pairs, so duplicate state rows widen nothing."""
    import shutil

    from fpl_data_pipeline_spark.streaming.incremental import run_neardup_ingest

    b1, b2, _ = three_batches
    tbl = "inc_band_state_replay_t"
    src, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    try:
        write_band_state(
            band_state_long(lsh_doc_band_keys(b1)), tbl, str(tmp_path / "state")
        )
        b2.coalesce(1).write.mode("append").parquet(src)
        run_neardup_ingest(spark, src, tbl, out, ckpt)
        first = {
            (r["new_id"], r["dup_of"])
            for r in spark.read.parquet(out + "/batch_id=0").collect()
        }
        shutil.rmtree(ckpt)  # lose the commit -> full replay on next drain
        run_neardup_ingest(spark, src, tbl, out, ckpt)
        replay = {
            (r["new_id"], r["dup_of"])
            for r in spark.read.parquet(out + "/batch_id=0").collect()
        }
        # state: b1 once + b2 twice (at-least-once, as documented)
        assert spark.table(tbl).count() == 2 * (40 + 31 + 31)
        # emission on replay is exact against the ORIGINAL corpus (the
        # b1-side subset is unchanged) but additionally carries b2~b2
        # pairs, because the replayed batch's own keys are already state
        # — the precise shape of the documented degradation
        assert (1099, 3) in replay
        assert {p for p in replay if p[1] < 1000} == first
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
