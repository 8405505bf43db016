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
# Round-11 window (0 changed + anchor + 49 staleness-fillers = 50): ZERO
# registered plans changed this round — the round-11 work (key-shape
# generalization of the publish/fold/gc protocol, the maintenance-style
# marker, the fp streaming lifecycle) lives entirely in deploy-surface
# functions no registered query calls; probe_band_state and
# probe_fingerprint_state, which registered queries DO call, are
# byte-untouched. Zero new names (carry honestly). The 49 filler slots
# take the ENTIRE oldest cohort — all 27 names last-green in round 4 —
# plus the 22 alphabetically-first of the 38 last-green in round 5; after
# this window no name's last green is older than round 5 (recomputed over
# CORRECTNESS_r01-r10: r4 27, r5 38, r6 38, r7 40, r8 46, r9 47, r10 50).
DRIVER_WINDOW_PRIORITY = [
    "flagship_customer_activity",
    # --- staleness rotation: all 27 last-green-r4 names ---
    "contrastive_hard_negatives",
    "corpus_snapshot_diff",
    "emb_batch_drift",
    "emb_pq_codebook_stats",
    "events_cusum_changepoints",
    "events_type_transitions",
    "events_watermark_lateness",
    "gdpr_erasure_audit",
    "hash_sample_quantiles",
    "kanonymity_audit",
    "kmv_distinct_union",
    "lang_id_confusion",
    "length_bucket_padding",
    "modal_alignment_summary",
    "quality_model_scores",
    "quality_threshold_calibration",
    "revenue_forecast_eval",
    "scd2_customer_history",
    "source_trend_slopes",
    "split_leakage_safe",
    "stratified_neyman_allocation",
    "table_histogram_price",
    "table_stats_orders",
    "token_budget_plan",
    "training_order_shuffle",
    "vocab_oov_rates",
    "zorder_layout_stats",
    # --- staleness rotation: the 22 alphabetically-first last-green-r5 ---
    "ann_ranking_metrics",
    "asof_join_forward_tolerance",
    "basket_part_pairs",
    "cf_holdout_hitrate",
    "cf_negative_samples",
    "customer_rfm_segments",
    "customer_spend_deciles",
    "doc_packing_summary",
    "emb_covariance_stats",
    "emb_health_audit",
    "emb_label_outliers",
    "emb_matryoshka_recall",
    "emb_pq_adc_topk",
    "events_conversion_latency",
    "events_peak_concurrency",
    "events_sliding_distinct_kmv",
    "histogram_quantile_sketch",
    "join_skew_report",
    "kfold_group_assignment",
    "layout_rle_advisor",
    "order_cycle_time_percentiles",
    "ordered_set_aggs",
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
