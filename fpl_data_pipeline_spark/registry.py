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
# Round-8 changed set (9 changed + 7 new + anchor): semdedup_prune (corpus-scaled k; its
# oracle now derives k via a scalar subquery) and kmeans_portable (the
# shared _kmp_cte_sql seed became an rn-filter); dsir_importance_weights
# (per-doc weight sum in decimal); bpe_train_merges (bpe_round refactor +
# BPE_CKPT_EVERY lineage cadence); dedup_winnowing_pairs (fps lazy pin);
# multimodal_features + binary_ingest_arrow (BMP decoder in the decode
# dispatch); emb_pca_top_component + emb_abtt_query_shift (saturating
# float conversion in the shared power iteration); and the seven NEW names
# (bpe_encode_fertility — the trained-merges encode/fertility readout;
# lsh_operating_point — measured-vs-theory S-curve audit;
# logreg_train_weights / logreg_train_eval — the gradient-trained linear
# quality filter; dedup_cdc_chunks — content-defined chunking, the
# insertion-robust dedup modality; mixture_temperature_plan — the
# alpha=0.5 temperature data-mixing knob; emb_incremental_neardup — the
# batch-vs-state probe, vectors-arrive incremental dedup), keeping the never-windowed backlog at zero. The other
# 33 slots are the alphabetically-first of the 44 queries whose last
# green window is round 1 — the stalest cohort in the registry.
DRIVER_WINDOW_PRIORITY = [
    "flagship_customer_activity",
    # --- plans/behavior changed in round 8 -> driver-proven this round ---
    "semdedup_prune",
    "kmeans_portable",
    "dsir_importance_weights",
    "bpe_train_merges",
    "dedup_winnowing_pairs",
    "multimodal_features",
    "binary_ingest_arrow",
    "emb_pca_top_component",
    "emb_abtt_query_shift",
    # --- new in round 8 ---
    "bpe_encode_fertility",
    "lsh_operating_point",
    "logreg_train_weights",
    "logreg_train_eval",
    "dedup_cdc_chunks",
    "mixture_temperature_plan",
    "emb_incremental_neardup",
    # --- staleness rotation: the 33 oldest greens (all last-green r1) ---
    "agg_avg_const_divisor",
    "agg_filtered_pivot",
    "agg_supplier_stats",
    "anti_join_orphans",
    "asof_join_cogrouped",
    "asof_join_purchase_click",
    "coalesce_outer",
    "concat_names",
    "count_by_status",
    "cube_order_priority_status",
    "derived_ratio",
    "dim_decorate",
    "distinct_periods",
    "except_lapsed_customers",
    "explode_part_words",
    "filter_equality",
    "filter_isnull_postjoin",
    "filter_range_hwm",
    "grouping_sets_lineitem",
    "high_water_mark",
    "intersect_repeat_customers",
    "join_multiway_revenue",
    "json_extract",
    "map_decode",
    "percentile_prices_by_flag",
    "projection",
    "range_join_signup_activity",
    "rollup_lineitem_status",
    "salted_agg_user_activity",
    "semi_join",
    "stats_agg_lineitem",
    "topk_basic",
    "topk_last_3_periods",
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
