"""Semantics invariants for the round-4 operators (beyond oracle parity):
segment boilerplate, dup-graph degrees, MinHash estimate error, Bloom
blocklist, event-type transitions, PQ codebook stats. Planted-input tests
use tiny in-memory documents written to a temp parquet dir shaped like a
sf dir; the rest run at sf0.001.
"""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F
import pytest

from fpl_data_pipeline_spark.functions.corpus_queries import (
    BLOOM_K,
    bloom_blocklist_summary,
)
from fpl_data_pipeline_spark.operators.dedup import (
    SEG_WORDS,
    dedup_segment_boilerplate,
    dupgraph_degree_stats,
    minhash_estimate_error,
)
from fpl_data_pipeline_spark.operators.similarity import (
    PQ_K,
    PQ_SUBSPACES,
    emb_pq_codebook_stats,
    kmeans_embeddings,
)
from fpl_data_pipeline_spark.streaming.event_queries import events_type_transitions
from fpl_data_pipeline_spark.tables import table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def planted_docs_dir(spark, tmp_path_factory):
    """A corpus with a known boilerplate structure: docs 1-3 share an
    identical 8-word footer segment appended to unique bodies (each body is
    exactly one unique segment); doc 4 is fully unique."""
    root = tmp_path_factory.mktemp("r4docs")
    footer = " ".join(["footer"] * SEG_WORDS)
    rows = [
        (1, " ".join([f"a{i}" for i in range(SEG_WORDS)]) + " " + footer, "en", "s", 0),
        (2, " ".join([f"b{i}" for i in range(SEG_WORDS)]) + " " + footer, "en", "s", 0),
        (3, " ".join([f"c{i}" for i in range(SEG_WORDS)]) + " " + footer, "en", "s", 0),
        (4, " ".join([f"d{i}" for i in range(2 * SEG_WORDS)]), "en", "s", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(root / "documents.parquet"))
    yield str(root)
    shutil.rmtree(str(root), ignore_errors=True)


def test_segment_boilerplate_planted(spark, planted_docs_dir):
    rows = {r.doc_id: r for r in dedup_segment_boilerplate(spark, planted_docs_dir).collect()}
    # docs 1-3: two segments each (unique body + shared footer) -> ratio 0.5
    for d in (1, 2, 3):
        assert rows[d].n_segments == 2
        assert rows[d].n_boiler == 1
        assert abs(rows[d].boiler_ratio - 0.5) < 1e-12
    # doc 4: two unique segments -> ratio 0
    assert rows[4].n_boiler == 0
    assert rows[4].boiler_ratio == 0.0


def test_segment_boilerplate_ratio_bounds(spark):
    for r in dedup_segment_boilerplate(spark, SF).collect():
        assert r.n_segments >= 1
        assert 0 <= r.n_boiler <= r.n_segments
        assert abs(r.boiler_ratio - r.n_boiler / r.n_segments) < 1e-12


def test_dupgraph_degree_histogram_is_a_partition_of_nodes(spark):
    rows = dupgraph_degree_stats(spark, SF).collect()
    assert all(r.degree >= 1 for r in rows)
    assert all(r.n_docs >= 1 for r in rows)
    # degrees are distinct and sorted ascending
    degs = [r.degree for r in rows]
    assert degs == sorted(set(degs))
    # handshake check: sum(degree * n_docs) is even (each edge adds 2)
    assert sum(r.degree * r.n_docs for r in rows) % 2 == 0


def test_minhash_estimate_error_bounds(spark):
    rows = minhash_estimate_error(spark, SF).collect()
    assert rows, "LSH should yield candidates on the synthetic corpus"
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert 0.0 <= r.exact_jaccard <= 1.0
        assert abs(r.abs_err - abs(r.est_jaccard - r.exact_jaccard)) < 1e-12


def test_bloom_no_false_negatives_and_fp_accounting(spark):
    r = bloom_blocklist_summary(spark, SF).collect()[0]
    # every true member is flagged (Bloom admits no false negatives), so
    # flagged >= true and the fp split is consistent
    assert r.n_flagged >= r.n_true_members
    assert r.n_false_positives == r.n_flagged - r.n_true_members
    assert 0.0 <= r.fp_rate <= 1.0
    assert r.n_probed > 0


def test_bloom_planted_exact_dup_is_flagged(spark, tmp_path):
    # doc 97 is on the blocklist (97 % 97 == 0); doc 1 is its exact copy and
    # MUST be flagged as a true member; doc 2 is unique text
    rows = [
        (97, "the quick brown fox jumps", "en", "s", 0),
        (1, "the quick brown fox jumps", "en", "s", 0),
        (2, "completely different words here now", "en", "s", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path / "bloomsf"
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    r = bloom_blocklist_summary(spark, str(d)).collect()[0]
    assert r.n_probed == 2
    assert r.n_true_members == 1
    assert r.n_flagged >= 1  # the exact dup cannot be missed


def test_transition_matrix_rows_normalize(spark):
    rows = events_type_transitions(spark, SF).collect()
    by_prev = {}
    for r in rows:
        assert r.n_transitions >= 1
        assert 0.0 < r.p_next <= 1.0
        by_prev.setdefault(r.prev_type, 0.0)
        by_prev[r.prev_type] += r.p_next
    for prev, total in by_prev.items():
        assert abs(total - 1.0) < 1e-9, prev
    # conservation: total transitions = total events - number of users
    e = table(spark, SF, "events")
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    assert sum(r.n_transitions for r in rows) == n_events - n_users


def test_pq_assignment_covers_every_vector_once_per_subspace(spark):
    rows = emb_pq_codebook_stats(spark, SF).collect()
    n_vecs = table(spark, SF, "embeddings").count()
    per_sub = {}
    for r in rows:
        assert 1 <= r.subspace <= PQ_SUBSPACES
        assert 0 <= r.codeword < PQ_K
        assert r.mean_sq_err >= 0.0
        per_sub.setdefault(r.subspace, 0)
        per_sub[r.subspace] += r.n_assigned
    # each subspace assigns every vector exactly once
    assert set(per_sub) == set(range(1, PQ_SUBSPACES + 1))
    assert all(v == n_vecs for v in per_sub.values())


def test_quality_model_partitions_all_docs(spark):
    from fpl_data_pipeline_spark.functions.text_queries import quality_model_scores

    rows = quality_model_scores(spark, SF).collect()
    n_docs = table(spark, SF, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.verdict in ("keep", "review", "drop")
        assert 0.0 <= r.mean_score <= 1.0
        # verdict buckets must be consistent with the mean of their members
        if r.verdict == "keep":
            assert r.mean_score >= 0.6 - 1e-6
        elif r.verdict == "drop":
            assert r.mean_score < 0.45 + 1e-6


def test_bpe_pair_stats_planted(spark, tmp_path):
    # 'aaab' x3 + 'ab' x1: pair 'aa' appears 2 positions/occurrence -> 6;
    # 'ab' appears once in each word -> 3 + 1 = 4
    rows_in = [
        (1, "aaab aaab", "en", "s", 0),
        (2, "aaab ab", "en", "s", 0),
    ]
    df = spark.createDataFrame(
        rows_in, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path / "bpesf"
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    from fpl_data_pipeline_spark.functions.corpus_queries import bpe_pair_stats

    got = {r.pair: r.pair_count for r in bpe_pair_stats(spark, str(d)).collect()}
    assert got == {"aa": 6, "ab": 4}


def test_emb_batch_drift_is_zero_when_cohorts_identical(spark, tmp_path):
    # two identical vectors, one in each cohort (vec_id 10 -> batch, 1 ->
    # corpus): drift must be exactly 0 on every dimension (and +0.0, not -0.0)
    vec = [float(i) / 10 for i in range(64)]
    df = spark.createDataFrame(
        [(1, vec, 0), (10, vec, 1)], "vec_id long, embedding array<float>, label int"
    )
    d = tmp_path / "driftsf"
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    from fpl_data_pipeline_spark.operators.sampling import emb_batch_drift

    rows = emb_batch_drift(spark, str(d)).collect()
    assert len(rows) == 64
    for r in rows:
        assert r.drift == 0.0 and str(r.drift) == "0.0"
        assert r.abs_drift == 0.0
        assert r.corpus_mean == r.batch_mean


def test_session_paths_planted(spark, tmp_path):
    from datetime import datetime, timedelta

    from fpl_data_pipeline_spark.streaming.event_queries import events_session_paths

    # user 1: view>click then (90 min later) view alone; user 2: view>click
    t = lambda m: datetime(2024, 1, 1, 12, 0) + timedelta(minutes=m)  # noqa: E731
    rows = [
        (1, t(0), 1, "view", 0.0, "{}"),
        (2, t(5), 1, "click", 0.0, "{}"),
        (3, t(95), 1, "view", 0.0, "{}"),
        (4, t(0), 2, "view", 0.0, "{}"),
        (5, t(1), 2, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = tmp_path / "pathsf"
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    got = {r.path: (r.n_sessions, r.total_events) for r in events_session_paths(spark, str(d)).collect()}
    assert got == {"view>click": (2, 4), "view": (1, 1)}
