"""Constructing a query plan must not execute Spark jobs (round 7).

The eager localCheckpoint pins used to run real jobs — full corpus scans —
the moment a query function was CALLED, which made every plan-only flow
(tools/explain_audit.py, plan reports, oracle-syntax tests) pay execution
cost. The deterministic pins are now lazy (ARCHITECTURE.md §4 addendum);
this guard keeps a refactor from quietly reintroducing construction-time
execution in the non-iterative families.

Two classes are exempt by nature, not by oversight:

- Iterative queries (connected components, PageRank, k-core, k-means):
  their loops run convergence-probe actions during construction — the
  documented, intended shape.
- Pins over EXCHANGE-BEARING subtrees (the groups0 / simhash-chunk /
  hashed-vector / prefix-candidate pins): under AQE, ``toRdd`` — which any
  checkpoint needs — finalizes the adaptive plan by EXECUTING the
  intermediate shuffle stages, so construction runs those jobs whether the
  checkpoint is eager or lazy (lazy still skips the final materialization
  pass). ``.cache()`` would be construction-free but is disqualified:
  Spark's CacheManager keys by logical plan, so repeated invocations of
  the same query (bench reps) would silently reuse the cached relation
  and stop measuring the engine.
"""

from __future__ import annotations

import pytest

from fpl_data_pipeline_spark.registry import QUERIES, load_all

SF_DIR = "/root/testdata/sf0.001"

# Non-iterative queries that carry (or carried) shared-subtree pins — the
# families the round-7 lazy flip covered, plus the audit that fans over all
# of them. The value is each query's table() read count: every
# spark.read.parquet call runs ONE tiny parquet-footer schema-inference job
# (driver metadata, unavoidable without a user-supplied schema), and that
# is the ONLY job construction may run. An eager pipeline materialization
# adds at least one job beyond this budget and fails the assertion.
CONSTRUCTION_LAZY = {
    "emb_neardup_pairs": 1,  # ids pin is scan-only -> nothing to execute
    # round 8: the fps pin (one compute of the md5+window-min stage for
    # the pre-pass's two consumers; 2x at the 10x blowup) sits above
    # _ensure_parallel's conditional repartition, so on a BELOW-PARALLEL
    # input like sf0.001 the lazy checkpoint's toRdd finalizes that
    # exchange (1 job — the exchange-bearing-pin class documented above);
    # on already-parallel inputs the subtree is scan-only and job-free
    "dedup_winnowing_pairs": 2,
    "dedup_span_matches": 1,  # pin-free
    "dedup_segment_boilerplate": 1,  # segs pin is scan-only
    # round 12: the shared doc_words pin (tokenize once for the six
    # document-keyed families) sits above _ensure_parallel's conditional
    # repartition, so on a BELOW-PARALLEL input like sf0.001 the lazy
    # checkpoint's toRdd finalizes that exchange (+1 job — the
    # exchange-bearing-pin class documented above); scan-only elsewhere.
    # Base budget: documents/embeddings/customer/lineitem/orders footers.
    "candidate_cap_audit": 6,
}


def _job_count(spark) -> int:
    """Total Spark jobs submitted so far in this context (monotonic)."""
    return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()


@pytest.mark.parametrize("name", sorted(CONSTRUCTION_LAZY))
def test_plan_construction_runs_no_jobs(spark, name):
    load_all()
    before = _job_count(spark)
    df = QUERIES[name](spark, SF_DIR)
    after = _job_count(spark)
    budget = CONSTRUCTION_LAZY[name]
    assert after - before <= budget, (
        f"{name} executed {after - before} Spark job(s) during plan "
        f"construction (footer-read budget {budget}) — an eager "
        "materialization crept back in"
    )
    # the plan must still be materializable (sanity: schema resolves)
    assert df.schema.fieldNames()
