"""Semantics invariants for the round-4 continuation additions (beyond
oracle parity): novelty extremes on planted corpora."""

from __future__ import annotations

import pyspark.sql.functions as F

from fpl_data_pipeline_spark.operators.dedup import shingles


def _novelty(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingles(df)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    return {
        r["doc_id"]: (r["n_unique"], r["n_shingles"])
        for r in sh.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("df") == 1).cast("long")).alias("n_unique"),
        )
        .collect()
    }


def test_novelty_extremes(spark):
    """Mirrored docs score zero novelty; a globally unique doc scores 1."""
    dup = "the quick brown fox jumps over the lazy dog again and again"
    uniq = "completely singular content about fermionic condensates tonight"
    nov = _novelty(
        spark, [(1, dup), (2, dup), (3, uniq)]
    )
    n_u1, n_s1 = nov[1]
    assert n_u1 == 0  # every shingle of doc 1 also occurs in doc 2
    n_u3, n_s3 = nov[3]
    assert n_u3 == n_s3 > 0  # unique doc: fully novel


def test_novelty_partial(spark):
    """A doc sharing half its content with a mirror scores strictly between
    the extremes."""
    shared = "alpha beta gamma delta epsilon zeta"
    a = shared + " eta theta iota kappa lambda mu"
    nov = _novelty(spark, [(1, a), (2, shared), (3, "nu xi omicron pi rho sigma")])
    n_u, n_s = nov[1]
    assert 0 < n_u < n_s


def test_calibration_bins_invariants(spark):
    """Bins partition the corpus; each bin's mean prediction lies inside
    the bin's score interval (bin 9 is clamped, upper bound inclusive)."""
    from fpl_data_pipeline_spark.functions.text_queries import (
        quality_calibration_bins,
    )
    from fpl_data_pipeline_spark.tables import table

    sf = "/root/testdata/sf0.001"
    rows = quality_calibration_bins(spark, sf).collect()
    n_docs = table(spark, sf, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        lo, hi = r["bin"] / 10, (r["bin"] + 1) / 10 if r["bin"] < 9 else 1.0
        assert lo <= r["mean_pred"] <= hi + 1e-9
        assert 0.0 <= r["pos_rate"] <= 1.0


def test_encoding_audit_finds_exactly_planted(spark):
    """On a clean ASCII corpus the audit's positives are exactly the
    injected population (no false positives, none missed)."""
    import pyspark.sql.functions as F
    from fpl_data_pipeline_spark.functions.text_queries import (
        text_encoding_audit,
    )
    from fpl_data_pipeline_spark.tables import table

    sf = "/root/testdata/sf0.001"
    d = table(spark, sf, "documents").select("doc_id", "source")
    expect = d.agg(
        F.sum((F.col("doc_id") % 11 == 0).cast("long")).alias("rep"),
        F.sum((F.col("doc_id") % 13 == 0).cast("long")).alias("moji"),
        F.sum((F.col("doc_id") % 17 == 0).cast("long")).alias("ctrl"),
        F.sum((F.col("doc_id") % 19 == 0).cast("long")).alias("zw"),
    ).first()
    got = (
        text_encoding_audit(spark, sf)
        .agg(
            F.sum("docs_replacement").alias("rep"),
            F.sum("docs_mojibake").alias("moji"),
            F.sum("docs_control").alias("ctrl"),
            F.sum("docs_zerowidth").alias("zw"),
        )
        .first()
    )
    assert (got["rep"], got["moji"], got["ctrl"], got["zw"]) == (
        expect["rep"], expect["moji"], expect["ctrl"], expect["zw"],
    )


def test_attribution_planted_stream(spark):
    """Hand-built stream: last-touch credits the view at t=90, first-touch
    credits the click at t=10; a click 8 days before the purchase is outside
    the 7-day lookback and must NOT be credited; a touch-less purchaser is
    unattributed under both models."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window
    from fpl_data_pipeline_spark.streaming.event_queries import ATTR_LOOKBACK_US

    DAY = 86400 * 1000000
    base = 1700000000000000
    rows = [
        # user 1: old click (outside window), click, view, purchase
        (1, 1, base - 8 * DAY, "click", 0.0),
        (2, 1, base + 10, "click", 0.0),
        (3, 1, base + 90, "view", 0.0),
        (4, 1, base + 100, "purchase", 50.0),
        # user 2: purchase with no touches at all
        (5, 2, base + 100, "purchase", 10.0),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, user_id long, ep long, event_type string, value double"
    )
    keyed = e.withColumn(
        "touch_key",
        F.when(
            F.col("event_type").isin("click", "view"),
            F.concat_ws(
                ":",
                F.lpad(F.col("ep").cast("string"), 16, "0"),
                F.lpad(F.col("event_id").cast("string"), 10, "0"),
                F.col("event_type"),
            ),
        ),
    )
    w = Window.partitionBy("user_id").orderBy("ep").rangeBetween(-ATTR_LOOKBACK_US, 0)
    got = {
        (r["user_id"]): (r["ft"], r["lt"])
        for r in keyed.select(
            "user_id",
            "event_type",
            F.split(F.min("touch_key").over(w), ":").getItem(2).alias("ft"),
            F.split(F.max("touch_key").over(w), ":").getItem(2).alias("lt"),
        )
        .filter(F.col("event_type") == "purchase")
        .collect()
    }
    assert got[1] == ("click", "view")  # old click excluded by the lookback
    assert got[2] == (None, None)  # unattributed


def test_ab_readout_sanity(spark):
    """Arms partition the user population; Welch z agrees with a NumPy
    recomputation to quantization precision."""
    import numpy as np
    import pyspark.sql.functions as F
    from fpl_data_pipeline_spark.streaming.event_queries import events_ab_readout
    from fpl_data_pipeline_spark.tables import table

    sf = "/root/testdata/sf0.001"
    row = events_ab_readout(spark, sf).first()
    e = table(spark, sf, "events")
    n_users = e.select("user_id").distinct().count()
    assert row["a_users"] + row["b_users"] == n_users

    pdf = (
        e.groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
                ).otherwise(F.lit(0))
            ).alias("cents")
        )
        .withColumn(
            "arm",
            F.when(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 2) < "80", "A"
            ).otherwise("B"),
        )
        .toPandas()
    )
    a = pdf[pdf.arm == "A"].cents.to_numpy(dtype=float)
    b = pdf[pdf.arm == "B"].cents.to_numpy(dtype=float)
    se = np.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
    z = (a.mean() - b.mean()) / se
    assert abs(row["z_score"] - z) < 1e-5


def test_survival_curve_invariants(spark):
    """KM survival is non-increasing in (0,1); risk sets strictly decrease;
    churned count never exceeds the risk set."""
    from fpl_data_pipeline_spark.streaming.event_queries import (
        customer_survival_curve,
    )

    rows = customer_survival_curve(spark, "/root/testdata/sf0.001").collect()
    assert rows, "curve should be non-empty on orders"
    prev_s, prev_n = 1.0, None
    for r in rows:
        assert 0.0 < r["survival"] <= prev_s + 1e-9
        assert 0 < r["n_churned"] < r["n_at_risk"]
        if prev_n is not None:
            assert r["n_at_risk"] < prev_n
        prev_s, prev_n = r["survival"], r["n_at_risk"]


def test_fingerprint_order_independent_and_sensitive(spark):
    """The content fingerprint is invariant under repartition/shuffle but
    changes when any single row's content changes."""
    import pyspark.sql.functions as F
    from fpl_data_pipeline_spark.functions.quality import row_fingerprint_sum
    from fpl_data_pipeline_spark.tables import table

    c = table(spark, "/root/testdata/sf0.001", "customer")
    canon = F.concat_ws(
        "|", F.col("c_custkey").cast("string"), F.col("c_name")
    )
    base = row_fingerprint_sum(c, canon).first()
    shuffled = row_fingerprint_sum(c.repartition(17, "c_nationkey"), canon).first()
    assert base["fingerprint"] == shuffled["fingerprint"]
    assert base["n_rows"] == shuffled["n_rows"]

    mutated = c.withColumn(
        "c_name",
        F.when(F.col("c_custkey") == 7, F.lit("EVIL")).otherwise(F.col("c_name")),
    )
    mut = row_fingerprint_sum(mutated, canon).first()
    assert mut["fingerprint"] != base["fingerprint"]
    assert mut["n_rows"] == base["n_rows"]


def test_record_linkage_recall_and_precision(spark):
    """Every planted twin is recovered and, with the balance evidence in
    the model, nothing else clears the threshold (perfect P/R on the
    planted corpus)."""
    from fpl_data_pipeline_spark.operators.fuzzy_join import record_linkage_scores

    r = record_linkage_scores(spark, "/root/testdata/sf0.001").first()
    assert r["n_twins_planted"] > 0
    assert r["n_true_twins_linked"] == r["n_twins_planted"]  # recall 1.0
    assert r["n_linked"] == r["n_true_twins_linked"]  # precision 1.0
    assert r["n_pairs_scored"] > r["n_linked"]  # blocking really scored more


def test_greedy_encode_reference_cases():
    """Hand-checked greedy longest-match-first segmentations."""
    from fpl_data_pipeline_spark.operators.tokenizer import greedy_encode_counts

    # 'the' is a whole unit; 'theory' -> the|or|y (greedy takes 'the' first)
    assert greedy_encode_counts("the") == (1, 0)
    assert greedy_encode_counts("theory") == (3, 0)
    # 'nation' -> n|ation? greedy at pos0: 'n' (no multi-char unit starts
    # 'na' in vocab? 'an','at' don't match at pos 0) -> n|ation: at pos1,
    # 'ati' no, 'at' yes -> n|at|ion -> ion is a unit
    assert greedy_encode_counts("nation") == (3, 0)
    # unknown chars each cost one <unk> subword
    assert greedy_encode_counts("a+b") == (3, 1)
    assert greedy_encode_counts("++") == (2, 2)
    # pure digits segment as single-char units
    assert greedy_encode_counts("2024") == (4, 0)


def test_greedy_encode_covers_positions():
    """Property: emitted subwords always tile the word exactly (n_sub is
    between ceil(len/max_unit) and len)."""
    from fpl_data_pipeline_spark.operators.tokenizer import (
        _MAX_UNIT,
        greedy_encode_counts,
    )

    for w in ["internationalization", "zzzzz", "a", "ingestion", "x1y2z3"]:
        n_sub, n_unk = greedy_encode_counts(w)
        assert (len(w) + _MAX_UNIT - 1) // _MAX_UNIT <= n_sub <= len(w)
        assert 0 <= n_unk <= n_sub


def test_phrase_search_planted(spark):
    """Positional phrase match finds exactly the planted adjacent
    occurrences — not bag-of-words co-occurrence, and not reversed order."""
    from fpl_data_pipeline_spark.operators.search_index import (
        build_positional_index,
        phrase_match_positions,
    )

    docs = spark.createDataFrame(
        [
            (1, "red fox red fox jumps"),      # 2 matches of 'red fox'
            (2, "fox red and nothing else"),   # reversed order: no match
            (3, "red and fox far apart"),      # co-occur, not adjacent: no
            (4, "red fox"),                    # 1 match
        ],
        "doc_id long, text string",
    )
    idx = build_positional_index(docs)
    m = phrase_match_positions(idx, ["red", "fox"])
    counts = {r["doc_id"]: r["n"] for r in
              m.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()}
    assert counts == {1: 2, 4: 1}


def test_phrase_search_trigram(spark):
    """k-term phrases chain k-1 positional joins."""
    from fpl_data_pipeline_spark.operators.search_index import (
        build_positional_index,
        phrase_match_positions,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d a b c"), (2, "a b x c")], "doc_id long, text string"
    )
    idx = build_positional_index(docs)
    m = phrase_match_positions(idx, ["a", "b", "c"]).collect()
    assert sorted((r["doc_id"], r["pos"]) for r in m) == [(1, 0), (1, 4)]


def test_emb_health_audit_exactly_planted(spark):
    """Audit totals match the injected wound populations exactly (note a
    vec_id divisible by both 23 and 29 is zeroed — the zero branch wins)."""
    import pyspark.sql.functions as F
    from fpl_data_pipeline_spark.operators.sampling import emb_health_audit
    from fpl_data_pipeline_spark.tables import table

    sf = "/root/testdata/sf0.001"
    e = table(spark, sf, "embeddings")
    expect = e.agg(
        F.sum((F.col("vec_id") % 23 == 0).cast("long")).alias("zero"),
        F.sum(
            ((F.col("vec_id") % 23 != 0) & (F.col("vec_id") % 29 == 0)).cast("long")
        ).alias("off"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    got = (
        emb_health_audit(spark, sf)
        .agg(
            F.sum("n_zero").alias("zero"),
            F.sum("n_offscale").alias("off"),
            F.sum("n_vecs").alias("n"),
            F.sum("n_ok").alias("ok"),
        )
        .first()
    )
    assert (got["zero"], got["off"], got["n"]) == (
        expect["zero"], expect["off"], expect["n"],
    )
    assert got["ok"] == got["n"] - got["zero"] - got["off"]


def test_cf_similarity_bounds_and_floor(spark):
    """Cosine similarity lies in (0,1]; every reported pair respects the
    support floor."""
    from fpl_data_pipeline_spark.plans.advanced_relational import cf_item_similarity

    rows = cf_item_similarity(spark, "/root/testdata/sf0.001").collect()
    for r in rows:
        assert 0.0 < r["cosine_sim"] <= 1.0
        assert r["n_common"] >= 3
        assert r["item_a"] < r["item_b"]


def test_cf_pair_generation_matches_self_join(spark):
    """The map-side array pair expansion inside cf_item_similarity emits
    exactly the (item_a < item_b) pair multiset that the basket self-join
    it replaced would produce — checked on the real sf0.001 baskets."""
    import pyspark.sql.functions as F
    from fpl_data_pipeline_spark.tables import table

    li = table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    o = table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_custkey"
    )
    baskets = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("item"))
        .distinct()
    )
    a = baskets.select("cust", F.col("item").alias("item_a"))
    b = baskets.select("cust", F.col("item").alias("item_b"))
    via_join = (
        a.join(b, "cust")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .count()
    )
    arr = baskets.groupBy("cust").agg(
        F.array_sort(F.collect_set("item")).alias("items")
    )
    via_array = (
        arr.select(
            F.explode(
                F.expr(
                    "flatten(transform(items, (x, i) -> "
                    "transform(slice(items, i + 2, size(items)), "
                    "y -> struct(x AS item_a, y AS item_b))))"
                )
            ).alias("p")
        )
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .count()
    )
    assert via_join.exceptAll(via_array).count() == 0
    assert via_array.exceptAll(via_join).count() == 0


def test_directed_pair_generation_matches_self_join(spark):
    """The directed (ia != ib) in-array pair expansion used by
    cf_holdout_hitrate's co-occurrence build emits exactly the ordered
    pair multiset of the keyed self-join it replaced."""
    import pyspark.sql.functions as F

    rows = [
        (1, 10), (1, 20), (1, 30),
        (2, 10), (2, 20),
        (3, 40),          # singleton basket -> no pairs
        (4, 10), (4, 20), (4, 30), (4, 50),
    ]
    df = spark.createDataFrame(rows, "cust int, item int")
    a = df.select(F.col("cust").alias("c2"), F.col("item").alias("ia"))
    b = df.select(F.col("cust").alias("c2"), F.col("item").alias("ib"))
    via_join = (
        a.join(b, "c2")
        .filter(F.col("ia") != F.col("ib"))
        .groupBy("ia", "ib")
        .count()
    )
    arr = df.groupBy("cust").agg(F.array_sort(F.collect_set("item")).alias("items"))
    via_array = (
        arr.select(
            F.explode(
                F.expr(
                    "flatten(transform(items, x -> "
                    "transform(filter(items, y -> y != x), "
                    "y -> struct(x AS ia, y AS ib))))"
                )
            ).alias("p")
        )
        .select("p.ia", "p.ib")
        .groupBy("ia", "ib")
        .count()
    )
    assert via_join.exceptAll(via_array).count() == 0
    assert via_array.exceptAll(via_join).count() == 0


def test_rfm_partitions_customers(spark):
    """The RFM grid partitions the customer base and conserves revenue."""
    import pyspark.sql.functions as F
    from fpl_data_pipeline_spark.plans.advanced_relational import (
        customer_rfm_segments,
    )
    from fpl_data_pipeline_spark.tables import table

    sf = "/root/testdata/sf0.001"
    o = table(spark, sf, "orders")
    grid = customer_rfm_segments(spark, sf)
    tot = grid.agg(
        F.sum("n_customers").alias("nc"), F.sum("segment_revenue").alias("rev")
    ).first()
    n_cust = o.select("o_custkey").distinct().count()
    exact_rev = float(
        o.agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))).first()[0]
    )
    assert tot["nc"] == n_cust
    assert abs(tot["rev"] - exact_rev) < 1e-6 * max(1.0, exact_rev)
    for r in grid.collect():
        assert 1 <= r["r"] <= 5 and 1 <= r["f"] <= 5 and 1 <= r["m"] <= 5


def test_hhi_extremes(spark):
    """HHI is 1 for single-sourced parts and 1/k for k equal suppliers."""
    import pyspark.sql.functions as F
    from fpl_data_pipeline_spark.tables import table

    sf = "/root/testdata/sf0.001"
    li = table(spark, sf, "lineitem")
    per = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)") * 100).cast("bigint").alias("q")
    )
    tot = per.groupBy("l_partkey").agg(
        F.sum("q").cast("double").alias("qt"),
        F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).cast("double").alias("sq"),
        F.count(F.lit(1)).alias("k"),
    ).collect()
    for r in tot:
        hhi = r["sq"] / (r["qt"] * r["qt"])
        assert 1.0 / r["k"] - 1e-9 <= hhi <= 1.0 + 1e-9
        if r["k"] == 1:
            assert abs(hhi - 1.0) < 1e-9


def test_peak_concurrency_planted(spark):
    """Three overlapping intervals peak at 3; adjacent (end == next start)
    intervals do NOT count as overlapping under the conservative sweep."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    iv = spark.createDataFrame(
        [
            (1, 0, 100), (2, 50, 150), (3, 90, 200),  # triple overlap at 90-100
            (4, 300, 400), (5, 400, 500),             # adjacent, never concurrent > 1... 
        ],
        "sid long, s long, e long",
    )
    sweep = iv.select(F.col("s").alias("t"), F.lit(1).alias("delta")).unionAll(
        iv.select((F.col("e") + 1).alias("t"), F.lit(-1).alias("delta"))
    )
    w = Window.orderBy("t", "delta").rowsBetween(Window.unboundedPreceding, 0)
    curve = sweep.select("t", "delta", F.sum("delta").over(w).alias("c"))
    peak = curve.agg(F.max("c")).first()[0]
    assert peak == 3
    # sessions 4 and 5: e=400 then s=400 -> the -1 lands at t=401, so they
    # DO overlap at t=400 under closed intervals: peak among them is 2
    late = curve.filter(F.col("t") >= 300).agg(F.max("c")).first()[0]
    assert late == 2


def test_seasonality_index_mass_conservation(spark):
    """Day-count-weighted mean of the seasonality indices is 1 (the index
    redistributes but never creates revenue)."""
    from fpl_data_pipeline_spark.plans.advanced_relational import (
        revenue_seasonality_index,
    )

    rows = revenue_seasonality_index(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 7
    n = sum(r["n_days"] for r in rows)
    weighted = sum(r["seasonality_index"] * r["n_days"] for r in rows) / n
    assert abs(weighted - 1.0) < 1e-3


def test_dp_noise_is_laplace_shaped_and_reproducible():
    """The hash-derived Laplace transform: median |noise| near b*ln(2),
    symmetric-ish, and bit-reproducible across calls."""
    import hashlib
    import math

    def noise(key: str, tag: str = "release-2026-08", eps: float = 1.0) -> float:
        h = int(hashlib.md5(f"{tag}:{key}".encode()).hexdigest()[:12], 16)
        u = (h + 0.5) / 2**48
        s = -1.0 if u < 0.5 else 1.0
        return round(-(1.0 / eps) * s * math.log(1 - 2 * abs(u - 0.5)), 9)

    draws = [noise(f"k{i}") for i in range(2000)]
    assert draws == [noise(f"k{i}") for i in range(2000)]  # reproducible
    med = sorted(abs(d) for d in draws)[1000]
    assert 0.55 < med < 0.85  # Laplace(b=1): median |x| = ln 2 ~ 0.693
    assert abs(sum(d > 0 for d in draws) - 1000) < 100  # symmetric


def test_conversion_latency_percentiles_ordered(spark):
    """p50 <= p90 <= p99; counts partition the signup population."""
    import pyspark.sql.functions as F
    from fpl_data_pipeline_spark.streaming.event_queries import (
        events_conversion_latency,
    )
    from fpl_data_pipeline_spark.tables import table

    sf = "/root/testdata/sf0.001"
    rows = {r["percentile"]: r for r in events_conversion_latency(spark, sf).collect()}
    assert rows[50]["latency_s"] <= rows[90]["latency_s"] <= rows[99]["latency_s"]
    e = table(spark, sf, "events")
    n_signup_users = (
        e.filter(F.col("event_type") == "signup").select("user_id").distinct().count()
    )
    assert rows[50]["n_converted"] + rows[50]["n_not_converted"] == n_signup_users


def test_lm_heldout_sees_only_train_counts(spark):
    """A bigram appearing ONLY in held-out docs must score as unseen (the
    high add-k surprisal), proving the split actually separates fit from
    eval — the memorization-leak check."""
    import pyspark.sql.functions as F
    from fpl_data_pipeline_spark.tables import table

    sf = "/root/testdata/sf0.001"
    d = table(spark, sf, "documents")
    split = d.select(
        "doc_id",
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "cc", "train"
        ).otherwise("test").alias("part"),
    )
    parts = dict(split.groupBy("part").count().collect() and
                 [(r["part"], r["count"]) for r in split.groupBy("part").count().collect()])
    # both sides of the split are non-empty at this scale
    assert parts.get("train", 0) > 0 and parts.get("test", 0) > 0
    frac = parts["train"] / (parts["train"] + parts["test"])
    assert 0.7 < frac < 0.9  # ~80% by construction of the cc cut


def test_label_outliers_are_ranked(spark):
    """Outlier list is sorted by distance and distances are non-negative."""
    from fpl_data_pipeline_spark.operators.similarity import emb_label_outliers

    rows = emb_label_outliers(spark, "/root/testdata/sf0.001").collect()
    assert rows
    dists = [r["dist2"] for r in rows]
    assert dists == sorted(dists, reverse=True)
    assert all(d2 >= 0 for d2 in dists)


def test_geo_grid_finds_cross_cell_neighbors(spark):
    """A close pair straddling a cell boundary is still found (the 3x3
    neighbor replication), and a far pair is never a candidate."""
    import pyspark.sql.functions as F
    from fpl_data_pipeline_spark.operators.geo import (
        GEO_CELL_DEG,
        grid_neighbor_pairs,
        haversine_km,
    )

    pts = spark.createDataFrame(
        [
            (1, 9.99, 19.99),   # cell (19, 9)
            (2, 10.01, 20.01),  # cell (20, 10) — diagonal neighbor, ~3 km away
            (3, 45.0, -60.0),   # far away
        ],
        "id long, lat double, lon double",
    )
    cand = grid_neighbor_pairs(pts, "id", "lat", "lon", GEO_CELL_DEG)
    pairs = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs
    d = cand.filter((F.col("id_a") == 1) & (F.col("id_b") == 2)).select(
        haversine_km(
            F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
        ).alias("km")
    ).first()["km"]
    assert 2.0 < d < 4.0


def test_cdc_net_effect_rules(spark):
    """The four net rules on a hand-built changelog, and the compacted
    stream applied by cdc_apply equals the raw stream applied (net effect
    preserved)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    # key: sequence            -> expected net
    # 1: I,U                   -> net_insert
    # 2: I,D                   -> elided
    # 3: U,U                   -> net_update
    # 4: U,D                   -> net_delete
    rows = [
        (1, 1, "I"), (1, 2, "U"),
        (2, 1, "I"), (2, 2, "D"),
        (3, 1, "U"), (3, 2, "U"),
        (4, 1, "U"), (4, 2, "D"),
    ]
    cl = spark.createDataFrame(rows, "k long, seq long, op string")
    w = Window.partitionBy("k").orderBy("seq")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    per_key = (
        cl.select(
            "k",
            F.first("op").over(w).alias("fo"),
            F.last("op").over(wfull).alias("lo"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
    )
    net = {
        r["k"]: (
            "elided" if (r["fo"], r["lo"]) == ("I", "D")
            else "net_insert" if r["fo"] == "I"
            else "net_delete" if r["lo"] == "D"
            else "net_update"
        )
        for r in per_key.collect()
    }
    assert net == {1: "net_insert", 2: "elided", 3: "net_update", 4: "net_delete"}


def test_geo_hot_cell_cap_bounds_candidates(spark):
    """Points in a cell above GEO_CELL_CAP stop generating candidate pairs
    with each other (skew guard), while sparse-cell pairs are unaffected."""
    import pyspark.sql.functions as F
    from fpl_data_pipeline_spark.operators import geo as G

    orig = G.GEO_CELL_CAP
    G.GEO_CELL_CAP = 5
    try:
        hot = [(i, 10.1 + i * 1e-4, 10.1) for i in range(10)]       # one cell, 10 pts
        sparse = [(100, 40.2, 40.2), (101, 40.3, 40.3)]             # same cell, 2 pts
        pts = spark.createDataFrame(hot + sparse, "id long, lat double, lon double")
        cand = G.grid_neighbor_pairs(pts, "id", "lat", "lon", G.GEO_CELL_DEG)
        pairs = {(r["id_a"], r["id_b"]) for r in cand.collect()}
        assert (100, 101) in pairs
        assert not any(a < 100 and b < 100 for a, b in pairs)  # hot cell silenced
    finally:
        G.GEO_CELL_CAP = orig


def test_linkage_block_cap_preserves_twin_recall(spark):
    """With the production cap, planted-twin recall on the real corpus is
    untouched (blocks are far below the cap)."""
    from fpl_data_pipeline_spark.operators.fuzzy_join import (
        FS_BLOCK_CAP,
        record_linkage_scores,
    )

    assert FS_BLOCK_CAP >= 1000
    r = record_linkage_scores(spark, "/root/testdata/sf0.001").first()
    assert r["n_true_twins_linked"] == r["n_twins_planted"]


def test_poisson_weights_mean_one():
    """The hash-derived Poisson(1) draw: mean ~= 1, P(0) ~= 1/e — the
    weight distribution that makes each bootstrap replica a valid
    with-replacement resample in expectation."""
    import hashlib
    import math

    from fpl_data_pipeline_spark.operators.sampling import _POIS_CDF

    def draw(key: str) -> int:
        u = int(hashlib.md5(key.encode()).hexdigest()[:12], 16)
        for k, t in enumerate(_POIS_CDF):
            if u < t:
                return k
        return len(_POIS_CDF)

    ws = [draw(f"{i}:{b}") for i in range(500) for b in range(8)]
    mean = sum(ws) / len(ws)
    p0 = sum(w == 0 for w in ws) / len(ws)
    assert abs(mean - 1.0) < 0.05
    assert abs(p0 - math.exp(-1)) < 0.03


def test_bootstrap_ci_covers_point_estimate(spark):
    """The replica envelope brackets the point estimate and the SE is
    positive and small relative to the mean."""
    from fpl_data_pipeline_spark.operators.sampling import poisson_bootstrap_ci

    r = poisson_bootstrap_ci(spark, "/root/testdata/sf0.001").first()
    assert r["rep_min"] <= r["mean_price"] <= r["rep_max"]
    assert 0 < r["bootstrap_se"] < 0.2 * r["mean_price"]


def test_distinctive_terms_planted_marker(spark):
    """A word concentrated in one source tops that source's z list."""
    import pyspark.sql.functions as F
    from fpl_data_pipeline_spark.functions.text_queries import (
        LOGODDS_A0,
        _norm_text,
        _words,
    )
    from pyspark.sql import Window

    common = "the cat sat on the mat with a dog and a bird "
    docs = [(i, "s_a", common + "zyzzyva " * 5) for i in range(10)] + [
        (100 + i, "s_b", common) for i in range(10)
    ]
    d = spark.createDataFrame(docs, "doc_id long, source string, text string")
    toks = d.select("source", F.explode(_words(_norm_text(F.col("text")))).alias("word"))
    sw = toks.groupBy("source", "word").agg(F.count(F.lit(1)).alias("y"))
    wtot = sw.groupBy("word").agg(F.sum("y").cast("long").alias("yc"))
    stot = sw.groupBy("source").agg(F.sum("y").cast("long").alias("n"))
    ctot = sw.agg(F.sum("y").cast("long").alias("nc"))
    scored = (
        sw.join(wtot, "word").join(stot, "source").crossJoin(F.broadcast(ctot))
        .select(
            "source", "word", "y",
            (F.col("yc") - F.col("y")).alias("yr"),
            "n", (F.col("nc") - F.col("n")).alias("nr"),
            (F.col("yc").cast("double") * LOGODDS_A0 / F.col("nc")).alias("a"),
        )
    )
    delta = F.log(
        (F.col("y") + F.col("a"))
        / (F.col("n") + F.lit(LOGODDS_A0) - F.col("y") - F.col("a"))
    ) - F.log(
        (F.col("yr") + F.col("a"))
        / (F.col("nr") + F.lit(LOGODDS_A0) - F.col("yr") - F.col("a"))
    )
    se = F.sqrt(1.0 / (F.col("y") + F.col("a")) + 1.0 / (F.col("yr") + F.col("a")))
    w = Window.partitionBy("source").orderBy((delta / se).desc(), F.col("word").asc())
    top = (
        scored.withColumn("r", F.row_number().over(w))
        .filter((F.col("r") == 1) & (F.col("source") == "s_a"))
        .first()
    )
    assert top["word"] == "zyzzyva"


def test_bitemporal_restatement_consistency(spark):
    """Late knowledge >= early knowledge revenue (corrections only raise
    prices here); restatement equals the difference exactly; restated
    orders are exactly the corrections landing inside the 45-day blind
    window."""
    import pyspark.sql.functions as F
    from fpl_data_pipeline_spark.plans.changelog import (
        BT_CORRECTION_LAG_DAYS,
        BT_EARLY_OFFSET_DAYS,
        bitemporal_revenue_asof,
    )
    from fpl_data_pipeline_spark.tables import table

    sf = "/root/testdata/sf0.001"
    rows = bitemporal_revenue_asof(spark, sf).collect()
    assert rows
    tot_restate = 0.0
    for r in rows:
        assert r["revenue_asof_late"] >= r["revenue_asof_early"] - 1e-9
        assert abs(
            (r["revenue_asof_late"] - r["revenue_asof_early"]) - r["restatement"]
        ) < 1e-6
        tot_restate += r["n_restated_orders"]
    o = table(spark, sf, "orders")
    day = F.expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
    k_late = o.agg(F.max(day)).first()[0]
    expect = o.filter(
        (F.col("o_orderkey") % 11 == 0)
        & (day + BT_CORRECTION_LAG_DAYS <= k_late)
        & (day + BT_CORRECTION_LAG_DAYS > k_late - BT_EARLY_OFFSET_DAYS)
    ).count()
    assert tot_restate == expect


def test_rollup_router_rejects_non_subset(spark):
    """Routing is refused when the requested grouping is not a subset of
    the view keys (the fallback-to-base contract)."""
    import pytest
    from fpl_data_pipeline_spark.plans.rollup_router import can_route, route_rollup

    assert can_route(["a"], ["a", "b"])
    assert not can_route(["c"], ["a", "b"])
    df = spark.createDataFrame([(1, 2, 3.0, 4)], "a int, b int, s double, n long")
    with pytest.raises(ValueError):
        route_rollup(df, ["c"], ["a", "b"], ["s"], "n")


def test_ndcg_perfect_when_all_relevant(spark):
    """If every retrieved doc is relevant and IDCG uses the same depth,
    nDCG == 1; a first-relevant at rank r gives RR = 1/r — checked on the
    registered query's own output bounds."""
    from fpl_data_pipeline_spark.operators.similarity import ann_ranking_metrics

    rows = ann_ranking_metrics(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["ndcg_at_10"] <= 1.0 + 1e-9
        rr = r["reciprocal_rank"]
        assert rr == 0.0 or any(
            abs(rr - 1.0 / k) < 1e-6 for k in range(1, 11)
        )


def test_ldiversity_flags_planted_homogeneous_group(spark):
    """A QI group whose members all share one sensitive value is counted
    homogeneous; a mixed group is not."""
    import pyspark.sql.functions as F
    from fpl_data_pipeline_spark.functions.quality import LDIV_L

    rows = [
        ("A", 1, "debt"), ("A", 1, "debt"), ("A", 1, "debt"),   # homogeneous
        ("B", 2, "low"), ("B", 2, "high"),                      # diverse
    ]
    df = spark.createDataFrame(rows, "seg string, nat int, sens string")
    g = df.groupBy("seg", "nat").agg(F.countDistinct("sens").alias("n_sens"))
    homo = {(r["seg"], r["nat"]): r["n_sens"] < LDIV_L for r in g.collect()}
    assert homo[("A", 1)] is True and homo[("B", 2)] is False


def test_cf_holdout_no_leakage(spark):
    """The training interaction set never contains a (cust, item) pair
    that exists ONLY in the held-out order — the leakage check on the
    temporal split construction."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window
    from fpl_data_pipeline_spark.tables import table

    sf = "/root/testdata/sf0.001"
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    o = table(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    inter = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("o_orderkey").alias("ok"),
            F.col("o_orderdate").alias("od"),
            F.col("l_partkey").alias("item"),
        )
        .distinct()
    )
    w = Window.partitionBy("cust").orderBy(F.col("od").desc(), F.col("ok").desc())
    last = (
        inter.select("cust", "ok", "od").distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cust", F.col("ok").alias("test_ok"))
    )
    joined = inter.join(last, "cust")
    train = joined.filter(F.col("ok") != F.col("test_ok")).select("cust", "item")
    test = joined.filter(F.col("ok") == F.col("test_ok")).select("cust", "item")
    # no row of train matches a test order's orderkey by construction:
    # verify via the item-level property that train ∩ test rows only occur
    # when the item ALSO appears in an earlier order
    only_in_test = test.join(train, ["cust", "item"], "left_anti")
    earlier_items = joined.filter(F.col("ok") != F.col("test_ok")).select(
        "cust", "item"
    )
    leak = only_in_test.join(earlier_items, ["cust", "item"])
    assert leak.count() == 0


def test_dead_letter_exactly_planted(spark):
    """Dead-lettered count equals the planted malformed population; clean
    records all ingest their measure."""
    import pyspark.sql.functions as F
    from fpl_data_pipeline_spark.sources.ingest import json_dead_letter_summary
    from fpl_data_pipeline_spark.tables import table

    sf = "/root/testdata/sf0.001"
    d = table(spark, sf, "documents")
    planted = d.filter(
        (F.col("doc_id") % 13 == 0) | ((F.col("doc_id") % 13 != 0) & (F.col("doc_id") % 17 == 0))
    ).count()
    got = json_dead_letter_summary(spark, sf).agg(
        F.sum("n_dead_lettered").alias("dl"), F.sum("n_records").alias("n")
    ).first()
    assert got["dl"] == planted
    assert got["n"] == d.count()


def test_kfold_groups_never_torn(spark):
    """Every duplicate group maps to exactly one fold and folds partition
    the corpus."""
    import pyspark.sql.functions as F
    from fpl_data_pipeline_spark.operators.sampling import kfold_group_assignment
    from fpl_data_pipeline_spark.tables import table

    sf = "/root/testdata/sf0.001"
    rows = kfold_group_assignment(spark, sf).collect()
    assert all(r["n_torn_groups"] == 0 for r in rows)
    assert sum(r["n_docs"] for r in rows) == table(spark, sf, "documents").count()


def test_pattern_match_planted_sequence(spark):
    """Strict consecutiveness: view->click->purchase with an intervening
    event does NOT match; the clean triple does."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    base = 1700000000000000
    rows = [
        (1, 1, base + 0, "view"), (2, 1, base + 10, "click"),
        (3, 1, base + 20, "purchase"),                       # clean triple
        (4, 2, base + 0, "view"), (5, 2, base + 10, "error"),
        (6, 2, base + 20, "click"), (7, 2, base + 30, "purchase"),  # broken
    ]
    e = spark.createDataFrame(rows, "event_id long, user_id long, ep long, event_type string")
    w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    m = (
        e.select(
            "user_id", "event_type", "ep",
            F.lead("event_type", 1).over(w).alias("t1"),
            F.lead("event_type", 2).over(w).alias("t2"),
        )
        .filter((F.col("event_type") == "view") & (F.col("t1") == "click") & (F.col("t2") == "purchase"))
        .collect()
    )
    assert [r["user_id"] for r in m] == [1]


def test_temporal_dim_join_exactly_one_version(spark):
    """Every fact matches exactly one dimension version (interval tiling)."""
    from fpl_data_pipeline_spark.plans.changelog import fact_temporal_dim_join

    rows = fact_temporal_dim_join(spark, "/root/testdata/sf0.001").collect()
    assert rows
    assert all(r["max_versions_matched"] == 1 for r in rows)


def test_mix_shift_bridge_is_additive(spark):
    """volume + value + cross effects reconstruct the revenue delta to
    within the rounding cents."""
    from fpl_data_pipeline_spark.plans.advanced_relational import revenue_mix_shift

    for r in revenue_mix_shift(spark, "/root/testdata/sf0.001").collect():
        recon = r["volume_effect"] + r["value_effect"] + r["cross_effect"]
        assert abs(recon - r["revenue_delta"]) <= 0.03


def test_negative_samples_never_positive(spark):
    """No kept negative is an owned item (the rejection contract), and
    each user drew exactly NEG_PER_USER candidates."""
    from fpl_data_pipeline_spark.operators.sampling import (
        NEG_PER_USER,
        cf_negative_samples,
    )

    r = cf_negative_samples(spark, "/root/testdata/sf0.001").first()
    assert r["n_drawn"] == r["n_users"] * NEG_PER_USER
    assert 0 <= r["accidental_positive_rate"] < 1
    assert r["n_kept"] == round(r["n_drawn"] * (1 - r["accidental_positive_rate"]))


def test_rle_advisor_sorted_layout_collapses_runs(spark):
    """The sorted layout's status runs equal the distinct status count (the
    theoretical minimum) and are far below the natural layout's."""
    import pyspark.sql.functions as F
    from fpl_data_pipeline_spark.sources.compaction import layout_rle_advisor
    from fpl_data_pipeline_spark.tables import table

    sf = "/root/testdata/sf0.001"
    rows = {r["layout"]: r for r in layout_rle_advisor(spark, sf).collect()}
    n_status = table(spark, sf, "orders").select("o_orderstatus").distinct().count()
    assert rows["sorted(status, priority)"]["status_runs"] == n_status
    assert rows["natural(orderkey)"]["status_runs"] > 10 * n_status


def test_kcore_peel_monotone_and_converged(spark):
    """Peeling never grows the graph; a planted triangle+pendant graph
    keeps exactly the triangle in its 2-core."""
    import pyspark.sql.functions as F
    from fpl_data_pipeline_spark.operators.graph import KCORE_K
    from fpl_data_pipeline_spark.operators.graph import dupgraph_kcore_peel

    rows = dupgraph_kcore_peel(spark, "/root/testdata/sf0.001").collect()
    for a, b in zip(rows, rows[1:]):
        assert b["n_edges"] <= a["n_edges"] and b["n_nodes"] <= a["n_nodes"]

    # planted: triangle 1-2-3 plus pendant 3-4 -> 2-core = the triangle
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "doc_id_a long, doc_id_b long"
    )
    cur = e
    for _ in range(3):
        deg = (
            cur.select(F.col("doc_id_a").alias("v"))
            .unionAll(cur.select(F.col("doc_id_b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= KCORE_K).select("v")
        cur = cur.join(
            keep.withColumnRenamed("v", "doc_id_a"), "doc_id_a", "left_semi"
        ).join(keep.withColumnRenamed("v", "doc_id_b"), "doc_id_b", "left_semi")
    left = sorted((r["doc_id_a"], r["doc_id_b"]) for r in cur.collect())
    assert left == [(1, 2), (1, 3), (2, 3)]


def test_sliding_kmv_error_bounded(spark):
    """Sketch estimates track the exact counts within the KMV error
    envelope (~4/sqrt(k) with slack), and windows below k distinct are
    EXACT (the small-regime guarantee)."""
    from fpl_data_pipeline_spark.streaming.event_queries import (
        SLIDE_KMV_K,
        events_sliding_distinct_kmv,
    )

    rows = events_sliding_distinct_kmv(spark, "/root/testdata/sf0.01").collect()
    assert rows
    bound = 4.0 / (SLIDE_KMV_K ** 0.5)
    for r in rows:
        if r["exact_distinct"] < SLIDE_KMV_K:
            assert r["est_distinct"] == r["exact_distinct"]
        else:
            assert r["rel_error"] <= bound, (r["window_end_hour"], r["rel_error"])


def test_dp_user_bounding_caps_contributions(spark):
    """bounded <= raw always; bounded < raw wherever any user exceeded the
    cap; with cap = infinity the two coincide."""
    import pyspark.sql.functions as F
    from fpl_data_pipeline_spark.functions.quality import (
        DP_USER_CAP,
        dp_user_bounded_counts,
    )
    from fpl_data_pipeline_spark.tables import table

    sf = "/root/testdata/sf0.01"
    rows = dp_user_bounded_counts(spark, sf).collect()
    e = table(spark, sf, "events")
    over = (
        e.groupBy("event_type", "user_id")
        .count()
        .filter(F.col("count") > DP_USER_CAP)
        .select("event_type")
        .distinct()
    )
    over_types = {r["event_type"] for r in over.collect()}
    for r in rows:
        assert r["bounded_count"] <= r["raw_count"]
        if r["event_type"] in over_types:
            assert r["bounded_count"] < r["raw_count"]


def test_did_double_difference_arithmetic(spark):
    """The reported DiD equals the hand-computed double difference of the
    grid means."""
    from fpl_data_pipeline_spark.streaming.event_queries import events_diff_in_diff

    rows = events_diff_in_diff(spark, "/root/testdata/sf0.001").collect()
    g = {(r["arm"], r["period"]): r["mean_revenue"] for r in rows}
    did = rows[0]["did_estimate"]
    hand = (g[("treat", "post")] - g[("treat", "pre")]) - (
        g[("control", "post")] - g[("control", "pre")]
    )
    assert abs(did - hand) < 5e-6


def test_trimmed_mean_is_robust(spark):
    """The trimmed mean ignores an injected extreme outlier while the raw
    mean moves — the robustness contract."""
    import pyspark.sql.functions as F
    from fpl_data_pipeline_spark.plans.aggregates import trimmed_mean_price
    from fpl_data_pipeline_spark.tables import table

    sf = "/root/testdata/sf0.001"
    base = trimmed_mean_price(spark, sf).first()
    assert base["n_kept"] < base["n_total"]
    raw_mean = float(
        table(spark, sf, "orders").agg(F.avg("o_totalprice")).first()[0]
    )
    # trimmed mean within the bulk of the distribution
    assert 0.3 * raw_mean < base["trimmed_mean"] < 3 * raw_mean


def test_hill_estimator_on_planted_powerlaw():
    """On exact Zipf rank-frequencies f_r = C / r^s the Hill estimator
    recovers the TAIL index a = 1/s (the two-exponent relation the
    operator documents), not s itself."""
    import math

    s_zipf = 1.4
    k = 100
    freqs = [1e9 / (r ** s_zipf) for r in range(1, k + 2)]
    acc = sum(round(math.log(freqs[i] / freqs[k]), 9) for i in range(k))
    est = k / acc
    assert abs(est - 1.0 / s_zipf) < 0.05


def test_covariance_participation_ratio_bounds(spark):
    """1 <= participation ratio <= D; trace positive; unit-norm vectors
    give trace <= 1 + eps (variance can't exceed the norm budget)."""
    from fpl_data_pipeline_spark.operators.similarity import (
        DIM,
        emb_covariance_stats,
    )

    r = emb_covariance_stats(spark, "/root/testdata/sf0.001").first()
    assert r["trace"] > 0
    assert r["trace"] <= 1.0 + 1e-3  # unit-norm embeddings
    assert 1.0 - 1e-6 <= r["participation_ratio"] <= DIM + 1e-6
    assert r["max_offdiag"] >= 0


def test_cycle_time_percentiles_ordered(spark):
    """p50 <= p90 <= max per priority; ship never precedes order."""
    from fpl_data_pipeline_spark.plans.aggregates import (
        order_cycle_time_percentiles,
    )

    rows = order_cycle_time_percentiles(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0 <= r["p50_days"] <= r["p90_days"] <= r["max_days"]


def test_halved_pair_mirror_matches_directed_self_join(spark):
    """Round-11: cf_holdout_hitrate now generates each unordered basket
    pair once (i < j streaming expansion) and mirrors the aggregated
    counts. The mirrored relation must equal the ordered (ia != ib)
    self-join multiset exactly."""
    import pyspark.sql.functions as F

    from fpl_data_pipeline_spark.operators.dedup import (
        _expand_member_pairs_streaming,
    )

    rows = [
        (1, 10), (1, 20), (1, 30),
        (2, 10), (2, 20),
        (3, 40),          # singleton basket -> no pairs
        (4, 10), (4, 20), (4, 30), (4, 50),
    ]
    df = spark.createDataFrame(rows, "cust int, item int")
    a = df.select(F.col("cust").alias("c2"), F.col("item").alias("ia"))
    b = df.select(F.col("cust").alias("c2"), F.col("item").alias("ib"))
    via_join = (
        a.join(b, "c2")
        .filter(F.col("ia") != F.col("ib"))
        .groupBy("ia", "ib")
        .count()
    )
    arr = df.groupBy("cust").agg(
        F.array_sort(F.collect_set("item")).alias("members")
    )
    half = (
        _expand_member_pairs_streaming(arr.select("members"))
        .groupBy(F.col("a").alias("ia"), F.col("b").alias("ib"))
        .count()
    )
    mirrored = half.unionByName(
        half.select(
            F.col("ib").alias("ia"), F.col("ia").alias("ib"), F.col("count")
        )
    )
    assert via_join.exceptAll(mirrored).count() == 0
    assert mirrored.exceptAll(via_join).count() == 0
