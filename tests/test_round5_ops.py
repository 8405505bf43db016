"""Semantics invariants for the round-4 late additions (beyond oracle
parity): CMS one-sided error, bitext margin on planted translations, exact
span certification on planted shared substrings, binary fixture integrity."""

from __future__ import annotations

import hashlib

import pandas as pd
import pyspark.sql.functions as F

from fpl_data_pipeline_spark.operators.dedup import SPAN_N, span_matches
from fpl_data_pipeline_spark.operators.similarity import DIM, bitext_margin

SF = "/root/testdata/sf0.001"


def test_cms_error_is_one_sided(spark):
    """CMS never underestimates: for EVERY word (not just the reported
    top-20), min-of-cells >= exact count."""
    from fpl_data_pipeline_spark.functions.text_queries import (
        CMS_D,
        CMS_W,
        _norm_text,
        _words,
    )
    from fpl_data_pipeline_spark.tables import table

    d = table(spark, SF, "documents")
    words = d.select(F.explode(_words(_norm_text(F.col("text")))).alias("word"))
    exact = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    hashed = exact.select(
        "word",
        "cnt",
        F.explode(F.array(*[F.lit(j) for j in range(CMS_D)])).alias("j"),
    ).withColumn(
        "cell",
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat("word", F.lit(":"), "j")), 1, 8), 16, 10
            ).cast("long"),
            F.lit(CMS_W),
        ),
    )
    cells = hashed.groupBy("j", "cell").agg(F.sum("cnt").alias("cc"))
    under = (
        hashed.join(cells, ["j", "cell"])
        .groupBy("word")
        .agg(F.max("cnt").alias("cnt"), F.min("cc").alias("est"))
        .filter(F.col("est") < F.col("cnt"))
        .count()
    )
    assert under == 0


def test_bitext_margin_planted_translation(spark):
    """A target vector identical to a source vector must be that source's
    best pair with cosine 1.0, and must outrank a hub-like target that is
    moderately close to everything."""
    base = [[float((i * 7 + j * 3) % 11 - 5) for j in range(DIM)] for i in range(6)]
    src = spark.createDataFrame(
        [(i, base[i]) for i in range(3)], "src_id long, sv array<double>"
    )
    # tgt 10 == src 0 exactly; tgt 11/12 are other vectors
    tgt = spark.createDataFrame(
        [(10, base[0]), (11, base[4]), (12, base[5])],
        "tgt_id long, tv array<double>",
    )
    out = bitext_margin(src, tgt, k=2).toPandas()
    best = out[out.src_id == 0].sort_values("margin", ascending=False).iloc[0]
    assert best.tgt_id == 10
    assert abs(best.cos9 - 1.0) < 1e-9


def test_span_matches_certifies_planted_run(spark):
    """Two docs sharing exactly a 12-token run (surrounded by unique
    tokens) must report span_tokens == 12; a pair sharing only scattered
    single 5-grams reports exactly SPAN_N tokens."""
    run = " ".join(f"shared{i}" for i in range(12))
    gram = " ".join(f"lone{i}" for i in range(SPAN_N))
    rows = [
        (1, " ".join(f"a{i}" for i in range(8)) + " " + run + " " + " ".join(f"z{i}" for i in range(8)), "en", "s", 0),
        (2, " ".join(f"b{i}" for i in range(8)) + " " + run + " " + " ".join(f"y{i}" for i in range(8)), "en", "s", 0),
        (3, gram + " " + " ".join(f"c{i}" for i in range(20)), "en", "s", 0),
        (4, gram + " " + " ".join(f"d{i}" for i in range(20)), "en", "s", 0),
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {(r.doc_id_a, r.doc_id_b): r.span_tokens for r in span_matches(d).collect()}
    assert out[(1, 2)] == 12
    assert out[(3, 4)] == SPAN_N


def test_binary_fixtures_byte_stable():
    """Committed .bin assets match the committed expected.parquet ground
    truth (guards fixture drift without Spark)."""
    import os

    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")
    exp = pd.read_parquet(os.path.join(root, "binary_assets_expected", "expected.parquet"))
    assert len(exp) == 12
    for r in exp.itertuples():
        with open(os.path.join(root, "binary_assets", r.name), "rb") as f:
            p = f.read()
        assert len(p) == r.byte_len
        assert hashlib.sha256(p).hexdigest() == r.sha256
        assert sum(p) == r.byte_sum


def test_threshold_sweep_monotone(spark):
    """Cumulative threshold counts are non-increasing and bounded by the
    candidate total."""
    from fpl_data_pipeline_spark.operators.dedup import dedup_threshold_sweep

    r = dedup_threshold_sweep(spark, SF).collect()[0]
    seq = [r.n_candidates, r.n_ge_50, r.n_ge_60, r.n_ge_70, r.n_ge_80, r.n_ge_90]
    assert all(a >= b for a, b in zip(seq, seq[1:]))
    assert seq[0] > 0


def test_vocab_oov_planted(spark, monkeypatch, tmp_path):
    """With a planted corpus where 'rare' appears once and VOCAB_K covers
    all but that word, the OOV rate counts exactly the rare tokens."""
    import fpl_data_pipeline_spark.functions.text_queries as tq

    rows = [
        (1, "common common common rare", "en", "sA", 0),
        (2, "common common", "en", "sB", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    p = str(tmp_path / "documents.parquet")
    df.write.mode("overwrite").parquet(p)
    monkeypatch.setattr(tq, "VOCAB_K", 1)
    out = {r.source: r for r in tq.vocab_oov_rates(spark, str(tmp_path)).collect()}
    assert out["sA"].n_oov == 1 and out["sA"].n_tokens == 4
    assert out["sB"].n_oov == 0


def test_bigram_surprisal_uniform_text_is_zero(spark, tmp_path):
    """A corpus that is one deterministic word sequence repeated makes every
    bigram fully predictable from its context -> surprisal exactly 0."""
    from fpl_data_pipeline_spark.functions.text_queries import (
        quality_bigram_surprisal,
    )

    rows = [(i, "alpha beta gamma delta", "en", "s", 0) for i in range(4)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = quality_bigram_surprisal(spark, str(tmp_path)).collect()
    assert len(out) == 4
    for r in out:
        assert r.n_bigrams == 3
        assert abs(r.avg_surprisal) < 1e-12


def test_zorder_key_interleaves_bits(spark):
    """zorder_key(px, py) must equal the hand-computed Morton interleave."""
    from fpl_data_pipeline_spark.sources.bucketing import Z_BITS, zorder_key

    def morton(x, y):
        z = 0
        for i in range(Z_BITS):
            z |= ((x >> i) & 1) << (2 * i + 1)
            z |= ((y >> i) & 1) << (2 * i)
        return z

    rows = [(x, y) for x in (0, 1, 5, 513, 1023) for y in (0, 2, 7, 1023)]
    df = spark.createDataFrame(rows, "px long, py long")
    out = df.select(
        "px", "py", zorder_key(F.col("px"), F.col("py")).alias("z")
    ).collect()
    for r in out:
        assert r.z == morton(r.px, r.py), (r.px, r.py)


def test_zorder_bounds_both_dims(spark):
    """The z-layout must bound the day span far below the custkey-sorted
    layout's (which is ~the full range), at comparable span area."""
    from fpl_data_pipeline_spark.sources.bucketing import zorder_layout_stats

    out = {r.layout: r for r in zorder_layout_stats(spark, SF).collect()}
    z, lin = out["zorder"], out["custkey_sort"]
    assert z.avg_day_span_frac < lin.avg_day_span_frac / 2
    assert z.avg_cust_span_frac < 0.5


def test_prefix_filter_complete_at_threshold(spark):
    """Prefix filtering must find EVERY pair with Jaccard >= T that the
    exhaustive all-shared-shingle join finds, while generating strictly
    fewer candidate pairs on a corpus with a common (high-df) head."""
    from fpl_data_pipeline_spark.operators.dedup import (
        PF_DEN,
        PF_NUM,
        _ngram_jaccard_pairs,
        prefix_filter_pairs,
        shingles,
    )

    common = " ".join(f"c{i}" for i in range(12))  # shared head, high df
    rows = []
    for i in range(8):
        uniq = " ".join(f"u{i}_{j}" for j in range(3))
        rows.append((i, common + " " + uniq, "en", "s", 0))
    # a planted true near-dup pair above T: docs 100/101 differ in one word
    body = " ".join(f"w{j}" for j in range(30))
    rows.append((100, body, "en", "s", 0))
    rows.append((101, body + " tail", "en", "s", 0))
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    t = PF_NUM / PF_DEN
    truth = {
        (r.doc_id_a, r.doc_id_b)
        for r in _ngram_jaccard_pairs(d).filter(F.col("jaccard") >= t).collect()
    }
    found = {
        (r.doc_id_a, r.doc_id_b) for r in prefix_filter_pairs(d).collect()
    }
    assert truth and truth <= found and (100, 101) in found

    # candidate reduction: prefix join input rows << full shingle join input
    sh = shingles(d)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    full_join_rows = freq.agg(
        F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("s")
    ).first()["s"]
    from pyspark.sql import Window

    wdoc = Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("shingle").asc())
    ranked = (
        sh.join(freq, "shingle")
        .withColumn("r", F.row_number().over(wdoc))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    )
    prefix = ranked.filter(
        F.col("r") <= F.col("n") - F.expr(f"({PF_NUM} * n + {PF_DEN - 1}) div {PF_DEN}") + 1
    )
    pfreq = prefix.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    prefix_join_rows = pfreq.agg(
        F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("s")
    ).first()["s"]
    assert prefix_join_rows < full_join_rows / 3


def test_table_stats_match_direct_counts(spark):
    from fpl_data_pipeline_spark.plans.aggregates import table_stats_orders
    from fpl_data_pipeline_spark.tables import table

    o = table(spark, SF, "orders")
    stats = {r.col_name: r for r in table_stats_orders(spark, SF).collect()}
    assert stats["o_orderkey"].n_rows == o.count()
    assert stats["o_orderkey"].ndv == o.select("o_orderkey").distinct().count()
    assert stats["o_orderkey"].n_nulls == 0
    assert int(stats["o_custkey"].max_val) == o.agg(F.max("o_custkey")).first()[0]


def test_hash_sample_quantiles_bounded_error(spark):
    """Decile estimates from the 256-row hash sample stay within a loose
    DKW-style bound of the exact deciles (relative to the price range)."""
    from fpl_data_pipeline_spark.plans.aggregates import hash_sample_quantiles
    from fpl_data_pipeline_spark.tables import table

    o = table(spark, SF, "orders")
    rng = o.agg((F.max("o_totalprice") - F.min("o_totalprice")).alias("r")).first().r
    rows = hash_sample_quantiles(spark, SF).collect()
    assert [r.pct for r in rows] == [10, 20, 30, 40, 50, 60, 70, 80, 90]
    for r in rows:
        assert r.abs_err <= 0.25 * rng


def test_watermark_lateness_invariants(spark):
    from fpl_data_pipeline_spark.streaming.event_queries import (
        events_watermark_lateness,
    )

    r = events_watermark_lateness(spark, SF).collect()[0]
    assert 0 <= r.p50_late_s <= r.p90_late_s <= r.p99_late_s <= r.max_late_s
    assert 0.0 <= r.frac_late_over_30s <= 1.0


def test_cms_join_size_one_sided_and_exact_matches_join(spark):
    """The sketch never underestimates, and the 'exact' side really is the
    self-join cardinality."""
    from fpl_data_pipeline_spark.plans.aggregates import cms_join_size_estimate
    from fpl_data_pipeline_spark.tables import table

    r = cms_join_size_estimate(spark, SF).collect()[0]
    assert r.cms_estimate >= r.exact_selfjoin_rows
    assert r.overestimate_ratio >= 1.0
    e = table(spark, SF, "events").select("user_id", "event_id")
    true_join = (
        e.alias("a").join(e.alias("b"), "user_id").count()
    )
    assert r.exact_selfjoin_rows == true_join


def test_histogram_equidepth_and_covers_all_rows(spark):
    from fpl_data_pipeline_spark.plans.aggregates import (
        HIST_BUCKETS,
        table_histogram_price,
    )
    from fpl_data_pipeline_spark.tables import table

    rows = table_histogram_price(spark, SF).collect()
    total = table(spark, SF, "orders").count()
    assert sum(r.n_rows for r in rows) == total
    # equi-depth: every bucket within 3x of the ideal height (ties can
    # shift rows between adjacent buckets, perfect equality isn't expected)
    ideal = total / HIST_BUCKETS
    assert all(r.n_rows < 3 * ideal for r in rows)
    # bounds are ordered and non-overlapping
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo


def test_kanonymity_planted_violation(spark, tmp_path):
    """A combo with 2 rows (< k=5) must be flagged with exactly its rows
    counted for suppression."""
    from fpl_data_pipeline_spark.functions.quality import kanonymity_audit

    rows = [(i, f"c{i}", 1, 0.0, "SEG_A") for i in range(10)] + [
        (100, "x", 2, 0.0, "SEG_B"),
        (101, "y", 2, 0.0, "SEG_B"),
    ]
    df = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    r = kanonymity_audit(spark, str(tmp_path)).collect()[0]
    assert r.n_combos == 2
    assert r.n_violating_combos == 1
    assert r.n_rows_to_suppress == 2
    assert r.min_group_size == 2


def test_forecast_eval_perfect_weekly_season(spark, tmp_path):
    """Orders whose daily revenue repeats with period 7 make the seasonal
    predictor exact (MAE 0) while naive-1 errs."""
    import datetime

    from fpl_data_pipeline_spark.plans.windows import revenue_forecast_eval

    rows = []
    base = datetime.datetime(2024, 1, 1)
    for d in range(28):
        rev = float(100 + 50 * (d % 7))
        rows.append((d, 1, "O", rev, base + datetime.timedelta(days=d), "P"))
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = revenue_forecast_eval(spark, str(tmp_path)).collect()[0]
    assert r.n_days == 21
    assert r.mae_seasonal7 == 0.0
    assert r.mae_naive1 > 0


def test_cusum_peaks_at_planted_level_shift(spark, tmp_path):
    """Daily counts 10x5 then 20x5: |CUSUM| of deviations from the global
    mean (15) peaks on the last low day."""
    import datetime

    from fpl_data_pipeline_spark.streaming.event_queries import (
        events_cusum_changepoints,
    )

    rows = []
    base = datetime.datetime(2024, 3, 1)
    eid = 0
    for d in range(10):
        n = 10 if d < 5 else 20
        for i in range(n):
            rows.append((eid, base + datetime.timedelta(days=d, seconds=i), 1, "t", 0.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    top = events_cusum_changepoints(spark, str(tmp_path)).collect()[0]
    assert top.day == base + datetime.timedelta(days=4)
    assert top.cusum == -25.0


def test_trend_slope_exact_on_planted_line(spark, tmp_path):
    """Docs arranged so source 'lin' has counts y = 2 + 3x over x=0..4:
    slope exactly 3, r2 exactly 1."""
    from fpl_data_pipeline_spark.functions.corpus_queries import (
        source_trend_slopes,
    )

    rows = []
    did = 0
    # x = doc_id % 30; place doc_ids so each doc lands on the wanted slot
    for x in range(5):
        for _ in range(2 + 3 * x):
            rows.append((x + 30 * did, "t", "en", "lin", 1))
            did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    r = source_trend_slopes(spark, str(tmp_path)).collect()[0]
    assert r.source == "lin" and r.n_points == 5
    assert r.slope == 3.0
    assert r.r2 == 1.0


def test_hard_negatives_exclude_same_label(spark):
    from fpl_data_pipeline_spark.operators.similarity import (
        HN_K,
        contrastive_hard_negatives,
    )
    from fpl_data_pipeline_spark.tables import table

    out = contrastive_hard_negatives(spark, SF).collect()
    e = {r.vec_id: r.label for r in table(spark, SF, "embeddings").collect()}
    assert len(out) == 8 * HN_K
    for r in out:
        assert e[r.anchor_id] != e[r.neg_id]
        assert 1 <= r.rank <= HN_K


def test_gdpr_cascade_counts_consistent(spark):
    """Cascade counts equal direct recomputation, and every cascaded order
    belongs to an erased customer."""
    from fpl_data_pipeline_spark.plans.core_relational import gdpr_erasure_audit
    from fpl_data_pipeline_spark.tables import table

    r = gdpr_erasure_audit(spark, SF).collect()[0]
    c = table(spark, SF, "customer")
    o = table(spark, SF, "orders")
    t = {x.c_custkey for x in c.filter(F.col("c_custkey") % 997 == 0).collect()}
    direct_orders = o.filter(o.o_custkey.isin(t)).count() if t else 0
    assert r.n_customers_erased == len(t)
    assert r.n_orders_cascaded == direct_orders
    assert r.n_lineitems_cascaded >= r.n_orders_cascaded or r.n_orders_cascaded == 0


def test_neyman_allocation_optimality_shape(spark):
    """Allocation shares sum to ~1 and each stratum's share is proportional
    to nh*sigma (checked against a direct recomputation)."""
    from fpl_data_pipeline_spark.operators.sampling import (
        NEYMAN_BUDGET,
        stratified_neyman_allocation,
    )

    rows = stratified_neyman_allocation(spark, SF).collect()
    assert abs(sum(r.alloc_share for r in rows) - 1.0) < 1e-3
    total = sum(r.alloc_rows for r in rows)
    assert abs(total - NEYMAN_BUDGET) <= len(rows)  # per-stratum rounding
    for r in rows:
        assert r.sigma >= 0 and r.alloc_rows >= 0


def test_intradoc_segments_planted_repeat(spark, tmp_path):
    """'x y x y x y' with 2-word segments = 3 segments, 2 duplicates."""
    from fpl_data_pipeline_spark.operators.dedup import dedup_intradoc_segments

    rows = [
        (1, "x y x y x y", "en", "s", 0),
        (2, "a b c d e f", "en", "s", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in dedup_intradoc_segments(spark, str(tmp_path)).collect()}
    assert out[1].n_segments == 3 and out[1].n_dup_segments == 2
    assert out[2].n_dup_segments == 0


def test_length_bucketing_reduces_padding(spark):
    from fpl_data_pipeline_spark.operators.sampling import length_bucket_padding

    out = {r.strategy: r for r in length_bucket_padding(spark, SF).collect()}
    a, b = out["arrival_order"], out["length_bucketed"]
    assert a.real_tokens == b.real_tokens  # same corpus, both strategies
    assert b.padding_tokens < a.padding_tokens
    assert 0 <= b.waste_frac < a.waste_frac <= 1


def test_scd2_asof_exactly_one_version_per_key(spark):
    """The as-of filter selects exactly one version per key that existed at
    the cut (interval tiling guarantees it)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from fpl_data_pipeline_spark.tables import table

    cut = F.lit("2024-06-30 23:59:59").cast("timestamp")
    o = table(spark, SF, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    v = o.select(
        "o_custkey",
        F.col("o_orderdate").alias("vf"),
        F.lead("o_orderdate").over(w).alias("vt"),
    )
    hit = v.filter((F.col("vf") <= cut) & (F.col("vt").isNull() | (F.col("vt") > cut)))
    dup_keys = hit.groupBy("o_custkey").count().filter(F.col("count") > 1).count()
    assert dup_keys == 0
    keys_started = v.filter(F.col("vf") <= cut).select("o_custkey").distinct().count()
    assert hit.count() == keys_started


def test_join_skew_report_flags_planted_hot_key(spark, tmp_path):
    """A synthetic events table where one user owns 20% of rows must be
    recommended for salting."""
    import datetime

    from fpl_data_pipeline_spark.plans.aggregates import join_skew_report

    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base, 999, "t", 0.0, "{}") for i in range(200)] + [
        (1000 + i, base, i, "t", 0.0, "{}") for i in range(800)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    # reuse real lineitem/orders for the other two rows
    for t in ("lineitem", "orders"):
        spark.read.parquet(f"{SF}/{t}.parquet").write.mode("overwrite").parquet(
            str(tmp_path / f"{t}.parquet")
        )
    rep = {r.join_key: r for r in join_skew_report(spark, str(tmp_path)).collect()}
    assert rep["events.user_id"].recommended == "salt_or_aqe_skew_join"
    assert rep["events.user_id"].top1_share >= 0.19


def test_threshold_bias_planted_skewed_sources(spark, tmp_path):
    """Source 'lo' (short, punct-heavy docs) scores low and is wiped out by
    the global cut; 'hi' passes fully. The normalized rule keeps ~half of
    EACH — the bias the audit must surface."""
    from fpl_data_pipeline_spark.functions.quality import quality_threshold_bias

    rows = []
    for i in range(10):
        rows.append((i, "!!! ??? ...", "en", "lo", 0))  # short + punct -> 0.0
        rows.append(
            (100 + i, " ".join(f"w{i}x{j}" for j in range(30)), "en", "hi", 0)
        )  # long, clean -> 1.0
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.source: r for r in quality_threshold_bias(spark, str(tmp_path)).collect()}
    assert out["lo"].global_keep_frac == 0.0
    assert out["hi"].global_keep_frac == 1.0
    assert abs(out["lo"].norm_keep_frac - 0.5) <= 0.1
    assert abs(out["hi"].norm_keep_frac - 0.5) <= 0.1
    assert out["lo"].bias_vs_overall < 0 < out["hi"].bias_vs_overall


def test_zorder_write_prunes_files_on_both_dims(spark, tmp_path):
    """STORAGE proof for the z-order layout (zorder_layout_stats measures
    the abstract spans): write orders twice — range-partitioned by the
    Morton key vs by custkey alone — then, from the parquet footers'
    min/max stats alone, count which files a two-sided predicate could
    skip. The z-layout must let a day-range predicate skip most files;
    the custkey sort must force reading ~all of them."""
    import pyarrow.parquet as pq
    import glob
    import os

    from fpl_data_pipeline_spark.sources.bucketing import Z_BITS, zorder_key
    from fpl_data_pipeline_spark.tables import table

    o = table(spark, SF, "orders")
    day = F.datediff("o_orderdate", F.lit("1970-01-01")).cast("bigint")
    b = F.broadcast(
        o.agg(
            F.max("o_custkey").alias("mc"),
            F.min(day).alias("mind"),
            F.max(day).alias("maxd"),
        )
    )
    px = F.expr(f"(o_custkey * {2 ** Z_BITS}) div (mc + 1)")
    py = F.expr(f"((day - mind) * {2 ** Z_BITS}) div (maxd - mind + 1)")
    keyed = (
        o.withColumn("day", day)
        .crossJoin(b)
        .withColumn("zv", zorder_key(px, py))
        .select("o_orderkey", "o_custkey", "day", "zv")
    )
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "lin")
    keyed.repartitionByRange(64, "zv").sortWithinPartitions("zv").write.parquet(zdir)
    keyed.repartitionByRange(64, "o_custkey").sortWithinPartitions(
        "o_custkey"
    ).write.parquet(ldir)

    lo, hi = keyed.agg(F.min("day"), F.max("day")).first()
    qlo = lo + (hi - lo) * 45 // 100
    qhi = lo + (hi - lo) * 55 // 100  # a ~10%-wide day-range predicate

    def files_touched(d):
        touched = total = 0
        for f in glob.glob(os.path.join(d, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            fmin = min(
                md.row_group(i).column(2).statistics.min for i in range(md.num_row_groups)
            )
            fmax = max(
                md.row_group(i).column(2).statistics.max for i in range(md.num_row_groups)
            )
            total += 1
            if fmax >= qlo and fmin <= qhi:
                touched += 1
        return touched, total

    zt, ztot = files_touched(zdir)
    lt, ltot = files_touched(ldir)
    assert ztot >= 32 and ltot >= 32
    # custkey layout: the day range hits essentially every file
    assert lt >= ltot - 2
    # z layout: most files are skippable from footer stats alone (finite
    # file count means boundary files straddle grid cells, so the bound is
    # a comfortable half, not the asymptotic strip fraction)
    assert zt <= ztot // 2


def test_sequence_gap_audit_planted(spark, tmp_path):
    """ids 0..9 with 7 missing and 3 duplicated: 1 missing, 1 dup, max_gap 2."""
    import datetime

    from fpl_data_pipeline_spark.functions.quality import sequence_gap_audit

    base = datetime.datetime(2024, 1, 1)
    ids = [0, 1, 2, 3, 3, 4, 5, 6, 8, 9]  # 7 missing; 3 twice
    rows = [(i, base, 1, "t", 0.0, "{}") for i in ids]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = sequence_gap_audit(spark, str(tmp_path)).collect()[0]
    assert r.n_rows == 10
    assert r.n_duplicate_ids == 1
    assert r.n_missing_ids == 1
    assert r.max_gap == 2
    assert r.n_gap_runs == 1


def test_cross_source_matrix_planted_mirror(spark, tmp_path):
    """Source 'mir' mirrors 3 of 'orig's docs: the (mir, orig) cell counts
    exactly those pairs; a within-source re-crawl lands on the diagonal."""
    from fpl_data_pipeline_spark.operators.dedup import dedup_cross_source_matrix

    rows = []
    for i in range(3):
        body = f"shared body number {i} with words"
        rows.append((i, body, "en", "orig", 0))
        rows.append((100 + i, body, "en", "mir", 0))
    rows.append((200, "recrawl text", "en", "orig", 0))
    rows.append((201, "recrawl text", "en", "orig", 0))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        (r.source_a, r.source_b): r.n_dup_pairs
        for r in dedup_cross_source_matrix(spark, str(tmp_path)).collect()
    }
    assert out[("mir", "orig")] == 3
    assert out[("orig", "orig")] == 1


def test_matryoshka_full_prefix_is_perfect_recall(spark, monkeypatch):
    """When the 'truncated' prefix is the FULL dimension, both rankings are
    identical and recall@k must be exactly 1 for every query."""
    import fpl_data_pipeline_spark.operators.similarity as sim

    monkeypatch.setattr(sim, "MRL_PREFIX_DIM", sim.DIM)
    out = sim.emb_matryoshka_recall(spark, SF).collect()
    assert len(out) == sim.MRL_QUERIES
    for r in out:
        assert r.n_overlap == sim.MRL_K


def test_mmr_prefers_diverse_over_duplicate(spark, tmp_path):
    """Candidate A' is an exact duplicate of top hit A; B is less relevant
    but diverse. Pure relevance ranks (A, A', B); MMR must rank (A, B, A')."""
    from fpl_data_pipeline_spark.operators.similarity import DIM, rag_mmr_rerank

    def vec(*comps):
        v = [0.0] * DIM
        for i, x in comps:
            v[i] = x
        return v

    rows = [
        (0, vec((0, 1.0)), 0),                     # query
        (1, vec((0, 0.9), (1, 0.436)), 0),         # A
        (2, vec((0, 0.9), (1, 0.436)), 0),         # A' == A
        (3, vec((0, 0.8), (1, -0.6)), 0),          # B: diverse, rel 0.8
        (4, vec((3, 1.0)), 0),                     # filler, rel 0
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = [r.vec_id for r in rag_mmr_rerank(spark, str(tmp_path)).collect()]
    assert out == [1, 3, 2]


def test_user_entropy_extremes(spark, tmp_path):
    """A single-type user scores exactly 0; a uniform-4-type user scores
    ln(4) (within the 6-dp term rounding)."""
    import datetime
    import math

    from fpl_data_pipeline_spark.streaming.event_queries import events_user_entropy

    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base, 1, "only", 0.0, "{}") for i in range(8)]
    rows += [(100 + i, base, 2, f"t{i % 4}", 0.0, "{}") for i in range(8)]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.user_id: r for r in events_user_entropy(spark, str(tmp_path)).collect()}
    assert out[1].entropy_nats == 0.0 and out[1].n_types == 1
    assert abs(out[2].entropy_nats - math.log(4)) < 1e-5


def test_lexical_diversity_extremes(spark, tmp_path):
    """All-distinct tokens -> TTR 1, Simpson 0; all-same token -> TTR ~0,
    Simpson 1."""
    from fpl_data_pipeline_spark.functions.text_queries import (
        source_lexical_diversity,
    )

    rows = [
        (1, " ".join(f"w{i}" for i in range(20)), "en", "rich", 0),
        (2, " ".join(["same"] * 20), "en", "flat", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.source: r for r in source_lexical_diversity(spark, str(tmp_path)).collect()}
    assert out["rich"].type_token_ratio == 1.0 and out["rich"].simpson_index == 0.0
    assert out["flat"].n_types == 1 and out["flat"].simpson_index == 1.0


def test_psi_terms_nonneg_sum_and_identical_halves_zero(spark, tmp_path):
    """PSI over two IDENTICAL half-distributions is exactly 0 per bucket;
    on real data the term sum is finite and every bucket has ref mass
    (bounds come from the ref half)."""
    import datetime

    from fpl_data_pipeline_spark.plans.aggregates import psi_price_drift

    # planted: same price distribution in both halves -> all psi_terms == 0
    rows = []
    for half, day0 in (("a", 0), ("b", 1000)):
        for i in range(200):
            rows.append(
                (
                    len(rows),
                    1,
                    "O",
                    float(100 + (i % 50)),
                    datetime.datetime(2024, 1, 1)
                    + datetime.timedelta(days=day0 + (i % 10)),
                    "P",
                )
            )
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = psi_price_drift(spark, str(tmp_path)).collect()
    assert all(r.psi_term == 0.0 for r in out)
    assert sum(r.n_ref for r in out) == 200 and sum(r.n_cur for r in out) == 200

    real = psi_price_drift(spark, SF).collect()
    assert all(r.n_ref > 0 for r in real)
    assert abs(sum(r.psi_term for r in real)) < 10  # finite, no inf/nan


def test_benford_freqs_sum_to_one(spark):
    from fpl_data_pipeline_spark.functions.quality import benford_price_audit

    rows = benford_price_audit(spark, SF).collect()
    assert {r.first_digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.observed_freq for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.benford_freq for r in rows) - 1.0) < 1e-3


def test_ares_weights_bias_selection(spark, tmp_path):
    """With 200 light docs (w=1) and 20 heavy docs (w=10000), the A-ES
    top-20 must be dominated by heavy docs, and re-running reproduces the
    identical sample (determinism)."""
    import fpl_data_pipeline_spark.operators.sampling as sam

    rows = [(i, "x", "en", "light", 1) for i in range(200)]
    rows += [(1000 + i, "x", "en", "heavy", 10000) for i in range(20)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    s1 = [r.doc_id for r in sam.sample_weighted_ares(spark, str(tmp_path)).collect()]
    s2 = [r.doc_id for r in sam.sample_weighted_ares(spark, str(tmp_path)).collect()]
    assert s1 == s2
    n_heavy = sum(1 for i in s1 if i >= 1000)
    assert n_heavy >= 15
