"""Semantics invariants for the round-3 operators (beyond oracle parity):
ANN recall eval, deterministic training-order shuffle, PII scrub, and
per-source token divergence. All at sf0.001."""

from __future__ import annotations

import pyspark.sql.functions as F

from fpl_data_pipeline_spark.functions.corpus_queries import source_token_divergence
from fpl_data_pipeline_spark.functions.text_queries import pii_scrub_summary
from fpl_data_pipeline_spark.operators.sampling import (
    SHUFFLE_EPOCHS,
    SHUFFLE_TAKE,
    training_order_shuffle,
)
from fpl_data_pipeline_spark.operators.similarity import (
    N_RECALL_QUERIES,
    RECALL_K,
    ann_recall_eval,
)
from fpl_data_pipeline_spark.tables import table

SF = "/root/testdata/sf0.001"


def test_ann_recall_bounds_and_consistency(spark):
    rows = ann_recall_eval(spark, SF).collect()
    assert len(rows) == N_RECALL_QUERIES
    for r in rows:
        assert 0 <= r.n_hits <= RECALL_K
        # can't hit more exact neighbors than the bucket offered candidates
        assert r.n_hits <= max(r.n_candidates, 0)
        assert abs(r.recall_at_k - r.n_hits / RECALL_K) < 1e-12


def test_training_shuffle_is_a_permutation_that_varies_by_epoch(spark):
    out = training_order_shuffle(spark, SF).collect()
    by_epoch = {}
    for r in out:
        by_epoch.setdefault(r.epoch, []).append((r.position, r.doc_id))
    assert set(by_epoch) == set(range(1, SHUFFLE_EPOCHS + 1))
    orders = []
    for epoch, picks in by_epoch.items():
        picks.sort()
        assert [p for p, _ in picks] == list(range(1, SHUFFLE_TAKE + 1))
        # no doc appears twice within an epoch
        docs = [d for _, d in picks]
        assert len(set(docs)) == len(docs)
        orders.append(docs)
    # epochs produce genuinely different orders (md5 keys differ per epoch)
    assert orders[0] != orders[1]


def test_training_shuffle_layout_independent(spark):
    from fpl_data_pipeline_spark.operators.sampling import training_order_shuffle_df

    base = {(r.epoch, r.position, r.doc_id) for r in training_order_shuffle(spark, SF).collect()}
    # same result regardless of physical partitioning of the input — the key
    # depends only on (doc_id, epoch). The repartitioned DataFrame is fed
    # DIRECTLY into the operator (not via a temp view the operator ignores).
    docs = table(spark, SF, "documents").repartition(7, "lang")
    alt = {
        (r.epoch, r.position, r.doc_id)
        for r in training_order_shuffle_df(spark, docs).collect()
    }
    assert base == alt


def test_pii_scrub_counts_match_injection_rules(spark):
    d = table(spark, SF, "documents")
    expected = (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("doc_id") % 3 == 0, 1).otherwise(0)).alias("ph"),
            F.sum(F.when(F.col("doc_id") % 5 == 0, 1).otherwise(0)).alias("ip"),
        )
        .collect()
    )
    exp = {r.source: r for r in expected}
    for r in pii_scrub_summary(spark, SF).collect():
        e = exp[r.source]
        assert r.total_emails == e.n  # every doc gets exactly one email
        assert r.total_phones == e.ph
        assert r.total_ips == e.ip
        assert r.docs_with_pii == e.n  # email on every doc => all docs
        assert r.n_docs == e.n


def test_pii_scrub_removes_all_entities(spark):
    """After the scrub, re-scanning the clean text finds zero entities —
    the property that actually matters for a release."""
    from fpl_data_pipeline_spark.functions.text_queries import (
        _PII_EMAIL,
        _PII_IP,
        _PII_PHONE,
    )

    d = table(spark, SF, "documents")
    aug = d.select(
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com"),
        ).alias("t")
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("t", _PII_EMAIL, "<EMAIL>"), _PII_PHONE, "<PHONE>"
        ),
        _PII_IP,
        "<IP>",
    )
    leftover = aug.select(clean.alias("c")).filter(
        F.regexp_count("c", F.lit(_PII_EMAIL)) > 0
    )
    assert leftover.count() == 0


def test_token_divergence_nonnegative_and_complete(spark):
    d = table(spark, SF, "documents")
    n_sources = d.select("source").distinct().count()
    rows = source_token_divergence(spark, SF).collect()
    assert len(rows) == n_sources
    for r in rows:
        # KL >= 0 up to the 9-dp rounding of the accumulated sum
        assert r.kl_divergence >= -1e-9
        assert r.n_tokens >= r.n_distinct_toks > 0


def test_semantic_clusters_invariants(spark):
    from fpl_data_pipeline_spark.operators.similarity import emb_semantic_clusters

    rows = emb_semantic_clusters(spark, SF).collect()
    assert rows, "threshold should produce at least one cluster at sf0.001"
    for r in rows:
        # only docs with at least one near-dup edge enter the graph
        assert r.cluster_size >= 2
        # the canonical representative is the min member == the min-label id
        assert r.representative == r.cluster_id
    # descending size, ties by cluster_id
    sizes = [(r.cluster_size, -r.cluster_id) for r in rows]
    assert sizes == sorted(sizes, reverse=True)


def test_consensus_pairs_vote_semantics(spark):
    from fpl_data_pipeline_spark.operators.dedup import (
        CONSENSUS_MIN_SIGNALS,
        dedup_consensus_pairs,
    )

    rows = dedup_consensus_pairs(spark, SF).collect()
    assert rows, "sf0.001 contains planted dups every family agrees on"
    for r in rows:
        names = r.signals.split(",")
        assert len(names) == r.n_signals
        assert CONSENSUS_MIN_SIGNALS <= r.n_signals <= 3
        assert names == sorted(names)
        assert set(names) <= {"minhash", "ngram", "simhash"}
        assert r.doc_id_a < r.doc_id_b


def test_token_budget_plan_respects_budgets(spark):
    from fpl_data_pipeline_spark.functions.corpus_queries import token_budget_plan

    rows = token_budget_plan(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.tokens_kept <= r.token_budget
        assert 0 < r.utilization <= 1.0
        assert r.docs_kept > 0


def test_ivf_rebalance_accounting(spark):
    from fpl_data_pipeline_spark.operators.similarity import (
        IVF_BATCH_MOD,
        N_CENTROIDS,
        ann_ivf_rebalance,
    )
    from fpl_data_pipeline_spark.tables import table as t

    rows = ann_ivf_rebalance(spark, SF).collect()
    assert len(rows) == N_CENTROIDS
    emb_n = t(spark, SF, "embeddings").count()
    batch_n = t(spark, SF, "embeddings").filter(
        F.col("vec_id") % IVF_BATCH_MOD == IVF_BATCH_MOD - 1
    ).count()
    # every vector (base + batch) lands in exactly one list
    assert sum(r.new_size for r in rows) == emb_n
    assert sum(r.added for r in rows) == batch_n
    for r in rows:
        assert r.new_size == r.base_size + r.added
        assert r.load_factor >= 0


def test_quality_threshold_keep_rate_near_target(spark):
    from fpl_data_pipeline_spark.functions.text_queries import (
        KEEP_RATE,
        quality_threshold_calibration,
    )

    rows = quality_threshold_calibration(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.docs_kept <= r.n_docs
        # realized rate stays near target; ties can only push it ABOVE
        assert r.actual_keep_rate >= KEEP_RATE - 0.05


def test_snapshot_diff_accounting(spark):
    from fpl_data_pipeline_spark.functions.corpus_queries import (
        NEW_DROP_MOD,
        OLD_DROP_MOD,
        corpus_snapshot_diff,
    )

    rows = corpus_snapshot_diff(spark, SF).collect()
    by_status = {}
    for r in rows:
        by_status[r.status] = by_status.get(r.status, 0) + r.n_docs
    d = table(spark, SF, "documents")
    n = d.count()
    n_old = d.filter(F.col("doc_id") % OLD_DROP_MOD != 0).count()
    n_new = d.filter(F.col("doc_id") % NEW_DROP_MOD != 0).count()
    # every doc in either snapshot is accounted exactly once
    assert sum(by_status.values()) == d.filter(
        (F.col("doc_id") % OLD_DROP_MOD != 0) | (F.col("doc_id") % NEW_DROP_MOD != 0)
    ).count()
    assert by_status.get("added", 0) == n_new - d.filter(
        (F.col("doc_id") % OLD_DROP_MOD != 0) & (F.col("doc_id") % NEW_DROP_MOD != 0)
    ).count()
    assert by_status.get("removed", 0) == n_old - d.filter(
        (F.col("doc_id") % OLD_DROP_MOD != 0) & (F.col("doc_id") % NEW_DROP_MOD != 0)
    ).count()
    assert by_status.get("changed", 0) > 0  # the re-crawl rewrite is visible


def test_hybrid_search_rerank_is_subset_of_lexical(spark):
    from fpl_data_pipeline_spark.functions.corpus_queries import (
        HS_FINAL_K,
        HS_TERMS,
        hybrid_search_topk,
    )

    rows = hybrid_search_topk(spark, SF).collect()
    assert len(rows) == HS_FINAL_K
    hit_ids = [r.doc_id for r in rows]
    assert len(set(hit_ids)) == HS_FINAL_K
    # every returned doc actually contains at least one query term
    d = table(spark, SF, "documents")
    matching = {
        r.doc_id
        for r in d.filter(
            F.arrays_overlap(
                F.split(F.lower("text"), " "), F.array(*[F.lit(t) for t in HS_TERMS])
            )
        )
        .select("doc_id")
        .collect()
    }
    assert set(hit_ids) <= matching
    for r in rows:
        assert r.bm25 > 0
        assert -1.0 <= r.cosine <= 1.0


def test_kmv_estimate_within_theory_bounds(spark):
    from fpl_data_pipeline_spark.plans.aggregates import KMV_K, kmv_distinct_union

    r = kmv_distinct_union(spark, SF).first()
    assert r.k == KMV_K
    if r.exact_union <= KMV_K:
        # under-full sketch IS the key set: exact
        assert r.rel_err == 0.0
    else:
        # KMV rsd ~ 1/sqrt(k-2); allow 5 sigma
        assert r.rel_err <= 5.0 / (KMV_K - 2) ** 0.5


def test_leakage_safe_split_never_tears_groups(spark):
    from fpl_data_pipeline_spark.operators.sampling import split_leakage_safe

    rows = split_leakage_safe(spark, SF).collect()
    assert {r.split for r in rows} == {"train", "test"}
    d = table(spark, SF, "documents")
    assert sum(r.n_docs for r in rows) == d.count()
    for r in rows:
        assert r.group_leaky_groups == 0  # by construction
        assert r.naive_leaky_groups >= 0
        assert r.n_groups <= r.n_docs


def test_lang_id_confusion_covers_corpus(spark):
    from fpl_data_pipeline_spark.functions.text_queries import lang_id_confusion

    rows = lang_id_confusion(spark, SF).collect()
    d = table(spark, SF, "documents")
    assert sum(r.n_docs for r in rows) == d.count()
    preds = {r.predicted_lang for r in rows}
    assert preds <= {"en", "es", "de", "fr", "unknown"}


def test_hybrid_search_accepts_injected_query(spark):
    """hybrid_search is a reusable primitive: injecting vec 0's embedding as
    a LITERAL query vector reproduces the registered (oracled) instantiation
    exactly, and a different term set / k runs as a fresh retrieval."""
    from fpl_data_pipeline_spark.functions.corpus_queries import (
        HS_TERMS,
        hybrid_search,
        hybrid_search_topk,
    )

    docs = table(spark, SF, "documents")
    emb = table(spark, SF, "embeddings")
    vec0 = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]

    registered = [
        (r.doc_id, r.bm25, r.cosine) for r in hybrid_search_topk(spark, SF).collect()
    ]
    injected = [
        (r.doc_id, r.bm25, r.cosine)
        for r in hybrid_search(
            spark, docs, emb, HS_TERMS, query_vec=[float(x) for x in vec0]
        ).collect()
    ]
    assert injected == registered

    other = hybrid_search(
        spark, docs, emb, ("filter", "join"), query_vec_id=1, final_k=5
    ).collect()
    assert len(other) == 5
    assert all(-1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9 for r in other)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        hybrid_search(spark, docs, emb, HS_TERMS)


# Genuine sentences (public-domain phrasebook style) — the synthetic corpus
# carries no text<->label signal, so THIS is where classifier accuracy is
# demonstrated. Several rows are deliberately hard for the stopword-marker
# baseline: no exact marker token present, only inflected/substring evidence.
_REAL_SENTENCES = [
    ("en", "the quick brown fox jumps over the lazy dog"),
    ("en", "reading and writing are foundational skills"),
    ("en", "information retrieval systems rank documents"),
    ("es", "el perro corre por el parque cada manana"),
    ("es", "la cancion que escuchamos era una maravilla"),
    ("es", "los estudiantes leen una leccion dificil"),
    ("de", "der schnelle braune fuchs springt und lacht"),
    ("de", "die schule beginnt morgen und endet mittags"),
    ("de", "ein schoenes geschenk ist unterwegs"),
    ("fr", "le chat dort dans le jardin pres des fleurs"),
    ("fr", "les bateaux naviguent sur l'eau calme"),
    ("fr", "il est venu dans la maison avec un gateau"),
]


def test_lang_id_trigram_beats_stopword_baseline_on_real_text(spark):
    """The char-n-gram scorer (registered classifier) must be strictly more
    accurate than the retired stopword-marker baseline on genuine text —
    the measurable upgrade the round-3 verdict asked for."""
    from fpl_data_pipeline_spark.functions.text_queries import (
        predict_lang_markers,
        predict_lang_trigrams,
    )

    df = spark.createDataFrame(_REAL_SENTENCES, "labeled string, text string")
    scored = df.select(
        "labeled",
        predict_lang_trigrams(F.col("text")).alias("trigram"),
        predict_lang_markers(F.col("text")).alias("marker"),
    ).collect()
    n = len(scored)
    acc_trigram = sum(r.trigram == r.labeled for r in scored) / n
    acc_marker = sum(r.marker == r.labeled for r in scored) / n
    assert acc_trigram >= 0.9, [(r.labeled, r.trigram) for r in scored]
    assert acc_trigram > acc_marker
