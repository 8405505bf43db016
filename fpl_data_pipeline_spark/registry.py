"""Query registry: named DataFrame programs + their DuckDB oracle SQL.

Every operator from SURVEY.md §2 claims completion by registering here; the
driver (and tests/test_oracle_parity.py) runs the Spark side and the oracle
side against the same parquet tables and compares row-count + schema +
order-insensitive value hash.

Conventions (SURVEY.md §4.3) that make the hash comparison deterministic:
- every computed column is aliased identically in Spark and SQL;
- every top-k has a total-order tiebreaker (metric DESC, key ASC);
- sums over double columns go through DECIMAL(18,2) (exact, order-independent)
  and are CAST to DOUBLE at the end — bitwise identical in Spark and DuckDB;
- averages/ratios are double divisions of those exact doubles.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a (spark, sf_dir) -> DataFrame program under ``name``.

    ``oracle`` is the equivalent ANSI SQL for DuckDB (tables region nation
    customer supplier part orders lineitem events documents embeddings are
    pre-registered views over the same parquet). Omit it only for genuinely
    non-SQL-expressible ops (the driver then records a rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# The driver's correctness gate checks the FIRST 50 registered queries per
# round. Round-5 window: the continuity anchor first, then EVERY query whose
# physical plan changed this round (the four global-window migrations from
# the round-4 verdict, the five round-5 unpartitioned-window finds, the three
# simhash/char-n-gram conditional-repartition siblings, and the new
# kmeans_portable value-oracle twin) so changed code gets driver-grade proof
# in the round it was changed; the remaining 34 slots rotate oldest-first
# through the never-windowed backlog (81 before this round, 42 after:
# ldiversity_audit,
# events_session_paths, dp_user_bounded_counts, events_attribution_credit,
# events_ab_readout, customer_survival_curve,
# events_*, binary_ingest_arrow, scd2_asof_snapshot, cdc_net_effect_summary,
# bitemporal_revenue_asof, fact_temporal_dim_join, dupgraph_kcore_peel,
# doc_novelty_scores, lm_heldout_perplexity, source_js_matrix,
# datasource_element_week_totals, ivm_delta_view, compaction_plan,
# record_linkage_scores, wordpiece_encode_stats, phrase_search_topdocs,
# geo_proximity_pairs, rollup_routed_revenue, json_dead_letter_summary,
# global_row_number, quality_score_auc, sample_weighted_reservoir,
# chi2_term_class_assoc, curriculum_interleave_stats, pareto_frontier_*,
# quality_score_auc_by_source, sample_weighted_stratified, ks_price_drift,
# events_ab_mannwhitney, nb_lang_train_eval, woe_source_encoding,
# nb_alpha_sweep — rotate these in round 6).
# Every displaced name stays registered at #51+, still exact-parity-checked
# by the tools/parity.py full sweep each session. kmeans_embeddings (no
# oracle by nature) stays OUT of the window; its value proof is now the
# kmeans_portable twin inside it.
DRIVER_WINDOW_PRIORITY = [
    "flagship_customer_activity",
    # plans changed in round 5 -> re-proven under the driver this round
    "trimmed_mean_price",
    "customer_rfm_segments",
    "events_peak_concurrency",
    "events_conversion_latency",
    "cf_negative_samples",
    "sequence_gap_audit",
    "layout_rle_advisor",
    "zipf_alpha_words",
    "customer_spend_deciles",
    "window_ntile_cume",
    "doc_packing_summary",
    "dedup_simhash_portable",
    "dedup_charngram_jaccard",
    "dedup_consensus_pairs",
    "kmeans_portable",
    # never-windowed backlog, oldest registrations first
    "join_skew_report",
    "ordered_set_aggs",
    "psi_price_drift",
    "order_cycle_time_percentiles",
    "histogram_quantile_sketch",
    "asof_join_forward_tolerance",
    "cf_item_similarity",
    "part_supply_hhi",
    "revenue_seasonality_index",
    "cf_holdout_hitrate",
    "revenue_mix_shift",
    "dedup_cross_source_matrix",
    "emb_matryoshka_recall",
    "rag_mmr_rerank",
    "emb_label_outliers",
    "ann_ranking_metrics",
    "emb_covariance_stats",
    "emb_pq_adc_topk",
    "sample_weighted_ares",
    "emb_health_audit",
    "poisson_bootstrap_ci",
    "kfold_group_assignment",
    "source_lexical_diversity",
    "quality_calibration_bins",
    "text_encoding_audit",
    "source_distinctive_terms",
    "quality_threshold_bias",
    # late-round-5 plan changes, windowed in the round they changed:
    # the two-phase salted bottom-k KMV build, the map-side array pair
    # generation in the basket query (ARCHITECTURE.md §7), the
    # xxhash64-keyed prefix-filter pipeline, the long-keyed winnowing
    # fingerprint join (conditional fan-out + 60-bit fp re-keying), the
    # id-only LSH candidate expansion with the band-size cap, and the
    # two-bucket + capped blocking rework of the hashed-vector dedup.
    # events_user_entropy, events_session_paths, dp_user_bounded_counts,
    # ldiversity_audit, dp_noisy_segment_counts, table_content_fingerprints
    # and benford_price_audit rotate to the round-6 backlog in their place
    "events_sliding_distinct_kmv",
    "basket_part_pairs",
    "dedup_prefix_filter_pairs",
    "dedup_winnowing_pairs",
    "text_hash_vector_dups",
    "emb_neardup_pairs",
    "emb_semantic_clusters",
]


def load_all() -> None:
    """Import every module that registers queries (idempotent), then order
    the registry: DRIVER_WINDOW_PRIORITY first, everything else after in
    registration order (dict insertion order is the driver's check order)."""
    from fpl_data_pipeline_spark.plans import (  # noqa: F401
        flagship,
        core_relational,
        aggregates,
        windows,
        topk,
        advanced_relational,
    )
    from fpl_data_pipeline_spark.operators import (  # noqa: F401
        dedup,
        similarity,
        upsert_queries,
        sampling,
    )
    from fpl_data_pipeline_spark.functions import (  # noqa: F401
        text_queries,
        scalar_queries,
        quality,
    )
    from fpl_data_pipeline_spark.streaming import event_queries  # noqa: F401
    from fpl_data_pipeline_spark.operators import multimodal  # noqa: F401
    from fpl_data_pipeline_spark.plans import fpl_queries  # noqa: F401
    from fpl_data_pipeline_spark.plans import changelog  # noqa: F401
    from fpl_data_pipeline_spark.operators import graph  # noqa: F401
    from fpl_data_pipeline_spark.sources import bucketing  # noqa: F401
    from fpl_data_pipeline_spark.functions import corpus_queries  # noqa: F401
    from fpl_data_pipeline_spark.sources import python_datasource  # noqa: F401
    from fpl_data_pipeline_spark.operators import ivm  # noqa: F401
    from fpl_data_pipeline_spark.sources import compaction  # noqa: F401
    from fpl_data_pipeline_spark.operators import fuzzy_join  # noqa: F401
    from fpl_data_pipeline_spark.operators import tokenizer  # noqa: F401
    from fpl_data_pipeline_spark.operators import search_index  # noqa: F401
    from fpl_data_pipeline_spark.operators import geo  # noqa: F401
    from fpl_data_pipeline_spark.plans import rollup_router  # noqa: F401
    from fpl_data_pipeline_spark.sources import ingest  # noqa: F401
    from fpl_data_pipeline_spark.plans import scale_primitives  # noqa: F401
    from fpl_data_pipeline_spark.functions import learned  # noqa: F401

    missing = [n for n in DRIVER_WINDOW_PRIORITY if n not in QUERIES]
    if missing:
        # not assert: stripped under python -O, and this guards the driver's
        # first-50 correctness window naming real queries
        raise RuntimeError(f"DRIVER_WINDOW_PRIORITY names unknown queries: {missing}")
    ordered = DRIVER_WINDOW_PRIORITY + [
        n for n in QUERIES if n not in set(DRIVER_WINDOW_PRIORITY)
    ]
    for d in (QUERIES, ORACLE_SQL):
        snapshot = dict(d)
        d.clear()
        d.update({n: snapshot[n] for n in ordered if n in snapshot})
