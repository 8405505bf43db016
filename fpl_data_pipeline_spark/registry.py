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
# Round-9 window (3 changed + anchor + 46 staleness-fillers = 50):
# logreg_train_weights / logreg_train_eval changed (the empty-train-split
# guard on BOTH engine and oracle — the round-8 ADVICE divergence — plus
# the LR_CKPT_EVERY cadence parameter, inert at LR_STEPS=3) and
# emb_incremental_neardup changed (the probe now goes through the
# long-form persisted-state shape of operators/incremental_state.py: one
# (band, k) equi-join for both bands). dedup_incremental_batch was
# refactored onto the same shared probe but its optimized plan is
# byte-identical (verified by plan diff), so it is NOT re-windowed. Zero
# new names this round (verdict task #8: growth <= what tasks #1/#5
# need). The remaining 46 slots drain the staleness tail COMPLETELY: the
# 11 names last-green in round 1, then the 35 last-green in round 2
# (oldest-green-first, ties alphabetical) — after this window no name's
# last green is older than round 3.
DRIVER_WINDOW_PRIORITY = [
    "flagship_customer_activity",
    # --- plans/behavior changed in round 9 -> driver-proven this round ---
    "logreg_train_weights",
    "logreg_train_eval",
    "emb_incremental_neardup",
    # --- staleness rotation: the 11 last-green-r1 names ---
    "topk_order_revenue",
    "topk_part_revenue",
    "topk_supplier_volume",
    "topk_value_ratio",
    "union_all_frames",
    "window_lag_delta",
    "window_moving_sum",
    "window_range_30d_spend",
    "window_rank_per_customer",
    "window_rank_periods",
    "window_value_functions",
    # --- staleness rotation: the 35 last-green-r2 names ---
    "ann_batch_topk",
    "ann_cosine_topk",
    "ann_ivf_probe",
    "ann_lsh_bucketed",
    "approx_distinct_customers",
    "approx_quantiles_price",
    "collect_sorted_orderkeys",
    "conditional_funcs_lineitem",
    "date_funcs_orders",
    "doc_fingerprints",
    "emb_cluster_centroids",
    "emb_vector_stats",
    "events_hourly_stats",
    "events_incremental_rollup",
    "events_session_window",
    "events_sessions",
    "exists_high_value_customers",
    "fk_integrity_summary",
    "gap_fill_monthly_revenue",
    "json_parse_aggregate",
    "math_funcs_lineitem",
    "multimodal_frame_sample",
    "null_profile_orders",
    "pivot_docs_source_lang",
    "pk_uniqueness_summary",
    "profile_documents",
    "quality_filter_funnel",
    "regex_funcs_part",
    "sample_hash_bucket",
    "split_train_test",
    "stratified_sample_counts",
    "string_funcs_part",
    "text_lang_id",
    "text_token_counts",
    "unpivot_part_measures",
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
