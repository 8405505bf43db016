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
# Round-10 window (2 changed + anchor + 47 staleness-fillers = 50):
# logreg_train_weights / logreg_train_eval changed — the LR_CKPT_EVERY
# cadence now engages only past LR_STEPS (round-9 ADVICE medium: the old
# guard fired once at t=2 while docstring and this comment claimed it was
# inert), so the registered 3-step plans dropped their lazy checkpoint
# barrier; values are untouched (cadence is plan-only, pinned by the
# on-vs-off twin test) but plan-changed names re-window by policy.
# emb_incremental_neardup is NOT re-windowed: probe_band_state grew a
# broadcast_alive parameter whose default leaves the registered plan
# byte-identical. Zero new names (round-9 verdict task #8). The 47 filler
# slots take the ENTIRE oldest cohort — all 38 names last-green in round
# 3 — plus the 9 alphabetically-first of the 36 last-green in round 4;
# after this window no name's last green is older than round 4
# (recomputed over CORRECTNESS_r01-r09: r3 38, r4 36, r5 38, r6 38,
# r7 40, r8 46, r9 50).
DRIVER_WINDOW_PRIORITY = [
    "flagship_customer_activity",
    # --- plans changed in round 10 -> driver-proven this round ---
    "logreg_train_weights",
    "logreg_train_eval",
    # --- staleness rotation: all 38 last-green-r3 names ---
    "ann_recall_eval",
    "corpus_release_summary",
    "datasource_bootstrap_top_scorers",
    "dedup_incremental_batch",
    "doc_chunking",
    "doc_length_histogram",
    "domain_mixture_weights",
    "emb_dimension_znorm",
    "emb_quantize_stats",
    "events_dau_wau",
    "events_error_spikes",
    "events_funnel",
    "events_gap_percentiles",
    "events_retention_cohorts",
    "events_sliding_windows",
    "events_user_ewma",
    "flagship_sql",
    "fpl_basic_ply_data",
    "fpl_detailed_week",
    "fpl_fuzzy_name_candidates",
    "fpl_stats_key_pass",
    "fpl_stats_shots",
    "fpl_value_per_points",
    "full_outer_reconciliation",
    "incremental_state_merge",
    "json_variant_extract",
    "lang_stats_grouped_map",
    "ltv_cohort_revenue",
    "outlier_mad_prices",
    "pii_scrub_summary",
    "pivot_multi_agg_source_lang",
    "salted_join_user_spend",
    "sample_quality_weighted",
    "scalar_subquery_share",
    "source_token_divergence",
    "tfidf_top_terms",
    "typed_fact_view",
    "upsert_merged_state",
    # --- staleness rotation: the 9 alphabetically-first last-green-r4 ---
    "agg_pricing_summary",
    "ann_ivf_rebalance",
    "binary_ingest_summary",
    "bitext_margin_pairs",
    "bloom_blocklist_summary",
    "bpe_pair_stats",
    "cdc_apply_state",
    "cms_heavy_hitters",
    "cms_join_size_estimate",
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
