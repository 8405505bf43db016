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
# round. Window policy (round-8, encoding the round-7 verdict's task #5):
#
#   1. the continuity anchor (flagship) first;
#   2. then EVERY oracled query whose physical plan or UDF behavior
#      changed this round (the changed-plans-in-window invariant);
#   3. every REMAINING slot goes to the OLDEST-GREEN queries first —
#      staleness = the most recent round whose CORRECTNESS_r0N.json shows
#      the name green — so no cumulative green can age unboundedly (by
#      round 7 some round-1 greens were six rounds stale; under this rule
#      the staleness ceiling is ceil(229 unchanged names / ~40 spare
#      slots) ≈ 6 windows and FALLS as the changed set shrinks). Ties
#      break alphabetically for reproducibility.
#
# The four rows-only-by-design names (dedup_minhash_pairs,
# dedup_simhash_pairs, dedup_clusters, kmeans_embeddings) stay out: a
# driver rows-only check adds nothing over the planted-pair VALUE checks
# in tests/test_cap_guards.py, which pin them to oracle-checked md5 twins.
#
# Round-12 window (anchor + 38 changed + 11 staleness-fillers = 50): the
# round-11 verdict's task #1 — of the ~30 plans round 11 changed, only 3
# got driver-side re-verification (the r11 window froze before most
# optimization commits landed) — plus every plan round 12 itself changed.
# Slots 2-26: the r11 plan-changed set (tokenizer one-pass, weighted pair
# expansion, kmeans/abtt/pca driver fixes, percentile arrays, logreg
# one-pass, CF basket build...). Slots 27-39: the r12 plan-changed set
# (packed+raw-shuffle pair engine and every consumer, shared-words audit,
# cf_holdout broadcast/single-DAG, map-side CDC, shared logreg features,
# the last one-pass tokenizer sites). The 4 rows-only-by-design names
# stay out as always. The 11 filler slots take the 11 alphabetically-
# first of the 16 names still last-green in round 5 (histogram over
# CORRECTNESS_r01-r11: r5 16, r6 38, r7 40, r8 46, r9 47, r10 49,
# r11 50); the 5 remaining r5 names (source_template_spans,
# sources_*, ...) lead the next window's fillers.
DRIVER_WINDOW_PRIORITY = [
    "flagship_customer_activity",
    # --- r11 plan-changed, not driver-re-verified in the r11 window ---
    "dedup_minhash_portable",
    "minhash_estimate_error",
    "dedup_charngram_jaccard",
    "dedup_ngram_jaccard",
    "dedup_consensus_pairs",
    "dedup_containment_pairs",
    "dedup_span_matches",
    "dedup_threshold_sweep",
    "dedup_prefix_filter_pairs",
    "dedup_winnowing_pairs",
    "emb_neardup_pairs",
    "kmeans_portable",
    "semdedup_prune",
    "emb_abtt_query_shift",
    "emb_pca_top_component",
    "logreg_train_weights",
    "logreg_train_eval",
    "percentile_prices_by_flag",
    "text_hash_vector_dups",
    "cf_item_similarity",
    "hybrid_search_topk",
    "quality_repetition_signals",
    "text_quality_scores",
    "source_token_divergence",
    "bpe_pair_stats",
    # --- r12 plan-changed (beyond the overlap above) ---
    "wordpiece_encode_stats",
    "lm_heldout_perplexity",
    "source_js_matrix",
    "quality_threshold_bias",
    "candidate_cap_audit",
    "cf_holdout_hitrate",
    "dedup_cdc_chunks",
    "dedup_clusters_exact",
    "dupgraph_degree_stats",
    "lsh_operating_point",
    "pagerank_dupgraph",
    "dupgraph_triangle_stats",
    "dupgraph_kcore_peel",
    # --- staleness rotation: 11 alphabetically-first last-green-r5 ---
    "part_supply_hhi",
    "poisson_bootstrap_ci",
    "psi_price_drift",
    "quality_calibration_bins",
    "rag_mmr_rerank",
    "revenue_mix_shift",
    "revenue_seasonality_index",
    "sample_weighted_ares",
    "sequence_gap_audit",
    "source_distinctive_terms",
    "source_lexical_diversity",
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
