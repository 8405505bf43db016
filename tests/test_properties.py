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


edge_lists = st.lists(
    st.tuples(st.integers(1, 12), st.integers(1, 12)).filter(lambda t: t[0] != t[1]),
    min_size=1,
    max_size=15,
)


@settings(max_examples=6, deadline=None)
@given(edges=edge_lists)
def test_connected_components_matches_union_find(edges):
    """Distributed min-label propagation == driver-side union-find reference
    on arbitrary graphs (operators/dedup.py::connected_components)."""
    from fpl_data_pipeline_spark.operators.dedup import connected_components

    pairs = SPARK.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "doc_id_a long, doc_id_b long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs, 30).collect()}

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}
    assert got == expected


words = st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=3).map("".join)
docs_text = st.lists(words, min_size=0, max_size=25).map(" ".join)


@settings(max_examples=6, deadline=None)
@given(shared=st.lists(words, min_size=6, max_size=10).map(" ".join),
       pre=docs_text, post=docs_text)
def test_winnowing_guarantee_property(shared, pre, post):
    """Any two docs sharing a run of >= WINNOW_W + 2 tokens share a
    fingerprint, for arbitrary surrounding text."""
    from pyspark.sql import Window as W

    from fpl_data_pipeline_spark.operators.dedup import WINNOW_W, ordered_shingles

    d1 = f"{pre} {shared} {post}".strip()
    d2 = f"{post} {shared} {pre}".strip()
    docs = SPARK.createDataFrame([(1, d1), (2, d2)], "doc_id long, text string")
    hashed = ordered_shingles(docs).select(
        "doc_id", "pos", F.substring(F.md5("shingle"), 1, 16).alias("h")
    )
    w = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, WINNOW_W - 1)
    fps: dict[int, set] = {1: set(), 2: set()}
    for r in hashed.select("doc_id", F.min("h").over(w).alias("fp")).distinct().collect():
        fps[r["doc_id"]].add(r["fp"])
    assert fps[1] & fps[2]


@settings(max_examples=6, deadline=None)
@given(ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True))
def test_hash_split_disjoint_exhaustive_stable(ids):
    """Content-hash train/test split: disjoint, exhaustive, and stable under
    repartitioning, for arbitrary key sets (operators/sampling.py)."""
    df = SPARK.createDataFrame([(i,) for i in ids], "doc_id long")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = F.when(bucket < "cc", "train").otherwise("test")
    one = {r["doc_id"]: r["s"] for r in df.select("doc_id", split.alias("s")).collect()}
    two = {
        r["doc_id"]: r["s"]
        for r in df.repartition(7).select("doc_id", split.alias("s")).collect()
    }
    assert one == two  # repartition-stable
    assert set(one) == set(ids)  # exhaustive


@settings(max_examples=6, deadline=None)
@given(
    log=st.lists(
        st.tuples(
            st.integers(0, 6),  # key
            st.integers(0, 50),  # seq
            st.sampled_from(["I", "U", "D"]),
            st.integers(-100, 100),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_cdc_apply_matches_sequential_replay(log):
    """cdc_apply == a sequential dict replay of the changelog (ties on
    (key, seq) broken by value column descending per the rank order —
    avoid ties by deduping (key, seq) first)."""
    from fpl_data_pipeline_spark.plans.changelog import cdc_apply

    seen = {}
    for k, seq, op, v in log:
        seen[(k, seq)] = (op, v)  # last write per (key, seq) wins in input
    replay = {}
    for (k, seq) in sorted(seen):
        op, v = seen[(k, seq)]
        if op == "D":
            replay.pop(k, None)
            replay[k] = None  # dead until a later seq resurrects
        else:
            replay[k] = v
    expected = {k: v for k, v in replay.items() if v is not None}

    rows = [(k, s, op, v) for (k, s), (op, v) in seen.items()]
    df = SPARK.createDataFrame(rows, "k long, seq long, op string, v long")
    got = {r.k: r.v for r in cdc_apply(df, "k", ["seq"]).collect()}
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=4), min_size=1, max_size=40
    )
)
def test_cms_point_estimates_never_underestimate(words):
    """For arbitrary word multisets, every CMS cell-min >= the true count
    (one-sidedness is structural, not data-dependent)."""
    from collections import Counter

    from fpl_data_pipeline_spark.functions.text_queries import CMS_D, CMS_W

    true = Counter(words)
    import hashlib

    cells = Counter()
    for w, c in true.items():
        for j in range(CMS_D):
            h = int(hashlib.md5(f"{w}:{j}".encode()).hexdigest()[:8], 16) % CMS_W
            cells[(j, h)] += c
    for w, c in true.items():
        est = min(
            cells[(j, int(hashlib.md5(f"{w}:{j}".encode()).hexdigest()[:8], 16) % CMS_W)]
            for j in range(CMS_D)
        )
        assert est >= c


@settings(max_examples=8, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 1023), st.integers(0, 1023)), min_size=1, max_size=20
    )
)
def test_zorder_key_preserves_locality_bound(pts):
    """Morton keys of points equal on their top b bits in BOTH dims agree
    on their top 2b z-bits (the data-skipping property)."""
    from fpl_data_pipeline_spark.sources.bucketing import Z_BITS

    def morton(x, y):
        z = 0
        for i in range(Z_BITS):
            z |= ((x >> i) & 1) << (2 * i + 1)
            z |= ((y >> i) & 1) << (2 * i)
        return z

    b = 3
    for (x1, y1) in pts:
        for (x2, y2) in pts:
            if (x1 >> (Z_BITS - b)) == (x2 >> (Z_BITS - b)) and (
                y1 >> (Z_BITS - b)
            ) == (y2 >> (Z_BITS - b)):
                assert morton(x1, y1) >> (2 * (Z_BITS - b)) == morton(x2, y2) >> (
                    2 * (Z_BITS - b)
                )


@settings(max_examples=5, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=5, max_size=12),
        min_size=2,
        max_size=8,
    )
)
def test_prefix_filter_candidates_complete(docs):
    """PPJoin completeness as a law: for arbitrary small corpora, EVERY pair
    with exact shingle-Jaccard >= T appears in the prefix-filtered candidate
    set (the planted test checks one corpus; this checks the rule)."""
    from fpl_data_pipeline_spark.operators.dedup import (
        PF_DEN,
        PF_NUM,
        _ngram_jaccard_pairs,
        prefix_candidate_pairs,
    )

    rows = [
        (i, " ".join(ws), "en", "s", 0) for i, ws in enumerate(docs)
    ]
    d = SPARK.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    t = PF_NUM / PF_DEN
    truth = {
        (r.doc_id_a, r.doc_id_b)
        for r in _ngram_jaccard_pairs(d).collect()
        if r.jaccard >= t
    }
    cand = {(r.da, r.db) for r in prefix_candidate_pairs(d).collect()}
    assert truth <= cand


# --- IVM delta algebra: maintain == recompute under arbitrary deltas --------
zset_rows = st.lists(
    st.tuples(
        st.integers(0, 4),            # group key
        st.integers(0, 999),          # 2-decimal cents measure
    ),
    min_size=0,
    max_size=25,
)


@settings(max_examples=8, deadline=None)
@given(base=zset_rows, ins=zset_rows)
def test_ivm_maintain_equals_recompute_random(base, ins):
    """For random base sets and random insert deltas plus a retraction of
    every 3rd base row, the maintained view equals the from-scratch
    recompute exactly (the Z-set linearity law behind ivm_delta_view)."""
    from fpl_data_pipeline_spark.operators.ivm import (
        finalize_view,
        merge_view_delta,
        zset_agg_view,
    )

    def mk(rows, w):
        if not rows:
            return SPARK.createDataFrame(
                [], "k long, cents long, w int"
            )
        return SPARK.createDataFrame(
            [(k, c, w) for k, c in rows], "k long, cents long, w int"
        )

    base_df = mk(base, 1).withColumn("m", F.col("cents") / 100.0)
    ins_df = mk(ins, 1).withColumn("m", F.col("cents") / 100.0)
    dels = base[::3]
    dels_df = mk(dels, -1).withColumn("m", F.col("cents") / 100.0)
    delta = ins_df.unionByName(dels_df)

    keys, sums = ["k"], {"s": "m"}
    maintained = finalize_view(
        merge_view_delta(
            zset_agg_view(base_df, keys, "w", sums),
            zset_agg_view(delta, keys, "w", sums),
            keys,
            ["s"],
        ),
        keys,
        ["s"],
    )
    # net multiset: base minus one copy of each retracted row plus inserts
    from collections import Counter

    net = Counter(base)
    for r in dels:
        net[r] -= 1
    net += Counter(ins)
    net_rows = [t for t, n in net.items() for _ in range(n)]
    recomputed = finalize_view(
        zset_agg_view(mk(net_rows, 1).withColumn("m", F.col("cents") / 100.0), keys, "w", sums),
        keys,
        ["s"],
    )
    got = sorted(tuple(r) for r in maintained.collect())
    want = sorted(tuple(r) for r in recomputed.collect())
    assert got == want


# --- scale primitives: property laws -----------------------------------------

rank_rows = st.lists(
    st.tuples(st.integers(0, 10_000), st.integers(-50, 50)),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@settings(max_examples=6, deadline=None)
@given(data=rank_rows, n_parts=st.integers(1, 8))
def test_property_global_row_numbers_is_total_rank(data, n_parts):
    """For arbitrary (key, value) rows and any range-partition count, the
    distributed numbering equals the rank in the Python-sorted order."""
    from fpl_data_pipeline_spark.plans.scale_primitives import global_row_numbers

    df = SPARK.createDataFrame(data, "k long, v long").repartition(5)
    out = global_row_numbers(
        df, [F.col("v").desc(), F.col("k").asc()], n_parts=n_parts
    )
    got = {r["k"]: r["global_rn"] for r in out.collect()}
    expect = {
        k: i + 1
        for i, (k, _) in enumerate(sorted(data, key=lambda t: (-t[1], t[0])))
    }
    assert got == expect


auc_rows = st.lists(
    st.tuples(st.integers(0, 1), st.integers(0, 6)),
    min_size=2,
    max_size=40,
).filter(lambda rs: {p for p, _ in rs} == {0, 1})  # both classes present


@settings(max_examples=8, deadline=None)
@given(pairs=auc_rows)
def test_property_auc_equals_pairwise(pairs):
    """Distributed Mann-Whitney AUC equals brute-force pairwise
    P(s_pos > s_neg) + 0.5 P(=) for arbitrary tied integer scores."""
    from fpl_data_pipeline_spark.plans.scale_primitives import mann_whitney_auc

    df = SPARK.createDataFrame(
        [(p, float(s)) for p, s in pairs], "pos int, score_q double"
    )
    auc = mann_whitney_auc(df).collect()[0]["auc"]
    pos = [s for p, s in pairs if p == 1]
    neg = [s for p, s in pairs if p == 0]
    brute = sum(
        1.0 if sp > sn else (0.5 if sp == sn else 0.0) for sp in pos for sn in neg
    ) / (len(pos) * len(neg))
    assert abs(auc - brute) < 1e-12
