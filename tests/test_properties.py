"""Property-based spot checks (SURVEY.md §5.2.5, hypothesis):
top-k equals the sorted prefix; upsert is idempotent and key-unique under
arbitrary duplicate batches; union-all row counts are additive.

Examples are kept small/few — each example round-trips through a Spark job.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings, strategies as st

from fpl_data_pipeline_spark.operators.upsert import upsert

SPARK = None


@pytest.fixture(autouse=True, scope="module")
def _bind_spark(spark):
    global SPARK
    SPARK = spark
    yield


rows = st.lists(
    st.tuples(st.integers(0, 20), st.integers(-1000, 1000)), min_size=1, max_size=30
)


@settings(max_examples=8, deadline=None)
@given(data=rows, k=st.integers(1, 10))
def test_topk_is_sorted_prefix(data, k):
    df = SPARK.createDataFrame(data, ["id", "metric"])
    got = [
        (r["id"], r["metric"])
        for r in df.orderBy(F.col("metric").desc(), F.col("id").asc()).limit(k).collect()
    ]
    expected = sorted(data, key=lambda t: (-t[1], t[0]))[:k]
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(base=rows, batch=rows)
def test_upsert_idempotent_and_key_unique(base, batch):
    base_df = SPARK.createDataFrame(base, ["k", "v"]).dropDuplicates(["k"])
    batch_df = SPARK.createDataFrame(batch, ["k", "v"])
    once = upsert(base_df, batch_df, ["k"])
    twice = upsert(once, batch_df, ["k"])
    st1 = {r["k"]: r["v"] for r in once.collect()}
    st2 = {r["k"]: r["v"] for r in twice.collect()}
    assert st1 == st2  # idempotency
    assert once.count() == len(st1)  # key-uniqueness
    # every batch key present; batch value wins over base
    batch_keys = {k for k, _ in batch}
    assert batch_keys <= set(st1)


@settings(max_examples=8, deadline=None)
@given(a=rows, b=rows)
def test_union_all_additivity(a, b):
    da = SPARK.createDataFrame(a, ["id", "v"])
    db = SPARK.createDataFrame(b, ["id", "v"])
    assert da.unionByName(db).count() == len(a) + len(b)
