"""Cluster-scale primitives that replace single-partition global operations.

Three classic 100 TB trouble spots get scale-safe re-expressions here, plus a
distributed classifier-evaluation statistic:

- **Global row numbering** (`global_row_number`): the naive
  ``row_number() OVER (ORDER BY ...)`` with no PARTITION BY collapses the
  whole relation into ONE task — the canonical Spark scale bug.  The
  scalable plan is the TeraSort shape: range-partition on the sort key,
  number rows locally per partition, then add per-partition offsets
  (a prefix sum over the tiny partition-count relation, broadcast back).
  One range exchange, no global sort on a single executor.
- **ROC AUC** (`quality_score_auc`): rank-based AUC also looks like a global
  sort.  Quantizing the score to fixed precision first bounds the distinct
  score values (<= 10^4 at 4 dp) regardless of corpus size, so the rank
  cumulation runs over a bounded aggregate — the corpus itself is touched
  only by one hash aggregation.  The Mann-Whitney U statistic is kept in
  exact integer arithmetic (doubled to absorb the tie half-credit) so the
  result is bit-identical across engines and row orders.
- **Weighted sampling without replacement** (`sample_weighted_reservoir`):
  the A-ES / exponential-jumps scheme (Efraimidis & Spirakis 2006) as a pure
  projection + top-k: key_i = ln(u_i) / w_i with u_i a deterministic
  md5-derived uniform — the top-k rows by key are exactly a weighted sample
  without replacement.  No shuffle except the TakeOrdered; reproducible on
  any engine with md5 (oracle-checkable), stable under repartitioning.
- **Chi-square term-class association** (`chi2_term_class_assoc`): the
  feature-selection scan that finds vocabulary most associated with a class
  label (here: language).  Inverted-index shape — explode distinct doc
  terms, three hash aggregations for the 2x2 contingency marginals, exact
  integer cross-products inside the chi^2 formula, top-k readout.

The reference has no distributed surface for any of these (its single Pandas
process sorts in memory, `includes.py` throughout); these are the shapes the
same computations must take on a cluster.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from fpl_data_pipeline_spark.registry import register
from fpl_data_pipeline_spark.tables import table

# --- global row numbering without a single-partition window -----------------

RANGE_PARTS = 32  # number of range partitions for the global numbering
RN_STRIDE = 997  # emit every 997th row so the readout stays small while the
# filter's survivors depend on EVERY partition offset being correct


@register(
    "global_row_number",
    f"""
    WITH numbered AS (
      SELECT o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC)
               AS global_rn
      FROM orders
    )
    SELECT o_orderkey, o_totalprice, global_rn
    FROM numbered
    WHERE (global_rn - 1) % {RN_STRIDE} = 0
    ORDER BY global_rn ASC
    """,
)
def global_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank every order globally by (o_totalprice DESC, o_orderkey ASC)
    WITHOUT the single-partition global window.

    Plan: ``repartitionByRange`` on the sort key (non-overlapping, ordered
    ranges — partition i's keys all sort before partition i+1's), local
    ``row_number`` within each range partition, then global_rn = local rank +
    the sum of row counts of all earlier partitions.  The offset relation has
    one row per partition (32 here, a few thousand on a cluster), so its
    prefix-sum window and the broadcast join back are both negligible; the
    corpus pays exactly one range exchange.

    The locally-numbered frame is localCheckpoint()ed before being consumed
    by both the count branch and the join branch: partition ids must come
    from the SAME physical exchange in both uses (range-boundary sampling is
    not guaranteed identical across re-executions; on a cluster this pin is
    the same checkpoint-or-ReusedExchange discipline any two-pass numbering
    needs).

    The emitted stride rows make the check sensitive to every offset: a
    wrong count in any partition shifts all later global_rn values off the
    stride.  Reference has no ranking surface at all (single-process pandas
    sorts, includes.py); this is the cluster-correct shape of ROW_NUMBER
    OVER (ORDER BY ...).
    """
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    numbered = global_row_numbers(
        o, [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()]
    )
    return (
        numbered.select("o_orderkey", "o_totalprice", "global_rn")
        .filter((F.col("global_rn") - F.lit(1)) % RN_STRIDE == 0)
        .orderBy(F.col("global_rn").asc())
    )


def global_row_numbers(df: DataFrame, sort_cols, n_parts: int = RANGE_PARTS) -> DataFrame:
    """Append ``global_rn`` = 1-based rank of each row under ``sort_cols``
    (a list of Column sort expressions forming a total order) using the
    range-partition + local-number + offset scheme described above.  The
    result is layout-independent: any repartitioning of ``df`` yields the
    same numbering because the range exchange re-sorts on content."""
    ranged = df.repartitionByRange(n_parts, *sort_cols).withColumn(
        "pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("pid").orderBy(*sort_cols)
    local = ranged.withColumn("lrn", F.row_number().over(w_local)).localCheckpoint()
    counts = local.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    # prefix sum over <= n_parts rows — the window's single partition holds
    # the partition-count relation, not the corpus
    w_off = Window.orderBy(F.col("pid").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "pid", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off")
    )
    return (
        local.join(F.broadcast(offsets), "pid")
        .withColumn("global_rn", (F.col("off") + F.col("lrn")).cast("long"))
        .drop("pid", "lrn", "off")
    )


def global_prefix_sums(
    df: DataFrame, sort_cols, value_col: str, out_col: str = "prefix_sum",
    n_parts: int = RANGE_PARTS,
) -> DataFrame:
    """Append ``out_col`` = running SUM(value_col) over the global order
    ``sort_cols`` — the prefix-sum sibling of ``global_row_numbers``, same
    scheme: range partition (one corpus exchange), local cumulative sum per
    range partition, then add the broadcast prefix of per-partition totals
    (<= n_parts rows).  This is how cumulative sums survive cluster scale;
    the builtin ``SUM OVER (ORDER BY ...)`` with no PARTITION BY is a
    single-partition sort of the whole input.

    Rows tied on ``sort_cols`` receive the running sum in an arbitrary
    order among themselves (same as the builtin); callers needing
    row-deterministic intermediates must pass a total order."""
    ranged = df.repartitionByRange(n_parts, *sort_cols).withColumn(
        "pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("pid")
        .orderBy(*sort_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.withColumn("lcs", F.sum(value_col).over(w_local)).localCheckpoint()
    totals = local.groupBy("pid").agg(F.sum(value_col).alias("tot"))
    w_off = Window.orderBy(F.col("pid").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "pid", F.coalesce(F.sum("tot").over(w_off), F.lit(0)).alias("off")
    )
    return (
        local.join(F.broadcast(offsets), "pid")
        .withColumn(out_col, F.col("off") + F.col("lcs"))
        .drop("pid", "lcs", "off")
    )


def global_run_counts(
    df: DataFrame, sort_cols, value_cols: list, n_parts: int = RANGE_PARTS
) -> DataFrame:
    """One row with ``<col>_runs`` = number of maximal equal-value runs of
    each value column under the global order ``sort_cols`` — the RLE-length
    statistic — without a single-partition sort.

    Scheme: range partition on the sort key, count run boundaries WITHIN
    each ordered partition (row 1 of a partition always counts), then
    subtract the partition seams that are not real boundaries (partition
    p's first value null-safe-equals p-1's last value) via a <= n_parts-row
    edge relation.  Runs are additive across ordered ranges, so the
    correction is exact.  Null-safe throughout (a run of NULLs counts as
    one run).  ``sort_cols`` must be plain ascending columns (they feed a
    struct ordering for min_by/max_by)."""
    ranged = (
        df.repartitionByRange(n_parts, *sort_cols)
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()  # pin pids across the boundary + edge branches
    )
    w = Window.partitionBy("pid").orderBy(*sort_cols)
    rn = F.row_number().over(w)
    inner = ranged.select(
        *[
            ((rn == 1) | ~F.col(c).eqNullSafe(F.lag(c).over(w)))
            .cast("long")
            .alias(f"b_{c}")
            for c in value_cols
        ]
    ).agg(*[F.sum(f"b_{c}").alias(f"b_{c}") for c in value_cols])
    ord_key = F.struct(*sort_cols)
    edges = ranged.groupBy("pid").agg(
        *[
            agg
            for c in value_cols
            for agg in (
                F.min_by(c, ord_key).alias(f"first_{c}"),
                F.max_by(c, ord_key).alias(f"last_{c}"),
            )
        ]
    )
    w_e = Window.orderBy(F.col("pid").asc())
    rn_e = F.row_number().over(w_e)
    # the rn_e > 1 guard matters when the first partition's first value is
    # NULL: eqNullSafe(NULL, lag=NULL-for-no-predecessor) would be true
    seams = edges.select(
        *[
            (
                (rn_e > 1)
                & F.col(f"first_{c}").eqNullSafe(F.lag(f"last_{c}").over(w_e))
            )
            .cast("long")
            .alias(f"d_{c}")
            for c in value_cols
        ]
    ).agg(
        *[F.coalesce(F.sum(f"d_{c}"), F.lit(0)).alias(f"d_{c}") for c in value_cols]
    )
    return inner.crossJoin(F.broadcast(seams)).select(
        *[(F.col(f"b_{c}") - F.col(f"d_{c}")).alias(f"{c}_runs") for c in value_cols]
    )


def ntile_from_rank(rank_col, n_col, k: int):
    """SQL-standard ``NTILE(k)`` computed from a 1-based gap-free global rank
    (``global_row_numbers`` output) and the total row count — bucket sizes
    differ by at most one, LARGER BUCKETS FIRST, exactly Spark's and DuckDB's
    builtin ntile.  This is how a global ntile survives cluster scale: the
    builtin form is an unpartitioned window (single-partition sort, one core,
    OOM at 10^8+ rows — measured by the global_row_number probe,
    BENCH_NOTES.md round 4); this form rides the range-partitioned rank, so
    the oracle SQL keeps ``NTILE()`` while the Spark plan never global-sorts.

    With base = n div k and rem = n mod k, the first ``rem`` buckets hold
    base+1 rows: rows ranked <= rem*(base+1) land in bucket
    ceil(r / (base+1)); the rest land base-per-bucket after them.  When
    base = 0 (n < k) the threshold equals n, so the otherwise-branch (an
    integer division by base = 0 -> NULL in Spark SQL) is unreachable.
    """
    r, n = F.col(rank_col) if isinstance(rank_col, str) else rank_col, (
        F.col(n_col) if isinstance(n_col, str) else n_col
    )
    nl = n.cast("long")
    rem = nl % k
    # exact integer division: (n - n%k) is a multiple of k, and the double
    # quotient of integers < 2^52 is exact (row counts never approach that)
    base = ((nl - rem) / k).cast("long")
    threshold = rem * (base + 1)
    in_big = ((r - 1) / (base + 1)).cast("long") + 1
    in_small = rem + ((r - threshold - 1) / base).cast("long") + 1
    return F.when(r <= threshold, in_big).otherwise(in_small).cast("int")


# --- distributed ROC AUC over a quantized score -----------------------------

_AUC_STOP = "'the','and','of','to','in','is','that','it','for','on'"


@register(
    "quality_score_auc",
    f"""
    WITH scored AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
             floor(
               CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                    x -> x IN ({_AUC_STOP}))) AS DOUBLE)
               / NULLIF(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                        x -> x <> '')), 0)
               * 10000 + 0.5) / 10000 AS score_q
      FROM documents
    ),
    by_score AS (
      SELECT score_q,
             CAST(SUM(pos) AS BIGINT) AS p,
             CAST(SUM(1 - pos) AS BIGINT) AS n
      FROM scored
      WHERE score_q IS NOT NULL
      GROUP BY score_q
    ),
    cum AS (
      SELECT score_q, p, n,
             COALESCE(SUM(n) OVER (ORDER BY score_q ASC
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS cneg_below
      FROM by_score
    )
    SELECT CAST(SUM(p * (2 * cneg_below + n)) AS DOUBLE)
             / (2.0 * SUM(p) * SUM(n)) AS auc,
           CAST(SUM(p) AS BIGINT) AS n_pos,
           CAST(SUM(n) AS BIGINT) AS n_neg,
           COUNT(*) AS n_distinct_scores
    FROM cum
    """,
)
def quality_score_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of the English-stopword-density score as a detector for
    lang='en' — the evaluation every learned quality/language classifier in
    a data pipeline needs, computed without a global sort.

    AUC = P(score_pos > score_neg) + 0.5 * P(score_pos = score_neg) is the
    normalized Mann-Whitney U.  The scalable decomposition: quantize the
    score to 4 dp (bounding distinct values at 10^4 independent of corpus
    size), hash-aggregate (pos, neg) counts per distinct score — the only
    pass over the corpus — then a cumulative window over the BOUNDED
    aggregate: U = sum_s p_s * (cneg_below(s) + n_s / 2).  Doubling keeps U
    in exact integers (tie half-credit absorbed), so the final division is
    one double op on exact operands — order-independent and bit-identical
    in DuckDB.

    Quantization uses floor(x*1e4+0.5)/1e4, the repo's portable-rounding
    convention (Spark HALF_UP vs DuckDB HALF_EVEN on doubles differ at the
    .5 boundary; floor(+0.5) is identical everywhere).
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        (F.col("lang") == "en").cast("int").alias("pos"),
        F.split(F.lower("text"), r"[^a-z]+").alias("w"),
    )
    scored = toks.select(
        "pos",
        (
            F.floor(
                F.expr(f"size(filter(w, x -> x IN ({_AUC_STOP})))").cast("double")
                / F.nullif(F.expr("size(filter(w, x -> x <> ''))"), F.lit(0))
                * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("score_q"),
    )
    return mann_whitney_auc(scored)


def mann_whitney_auc(scored: DataFrame) -> DataFrame:
    """AUC from a (pos: 0/1, score_q: quantized double) frame via the
    integer-exact Mann-Whitney decomposition described above.  One hash
    aggregation over the input; the cumulative window runs over the bounded
    distinct-score aggregate only."""
    by_score = scored.filter(F.col("score_q").isNotNull()).groupBy("score_q").agg(
        F.sum("pos").alias("p"), F.sum(F.lit(1) - F.col("pos")).alias("n")
    )
    w_cum = Window.orderBy(F.col("score_q").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = by_score.withColumn(
        "cneg_below", F.coalesce(F.sum("n").over(w_cum), F.lit(0))
    )
    return cum.agg(
        (
            F.sum(F.col("p") * (2 * F.col("cneg_below") + F.col("n"))).cast("double")
            / (F.lit(2.0) * F.sum("p") * F.sum("n"))
        ).alias("auc"),
        F.sum("p").alias("n_pos"),
        F.sum("n").alias("n_neg"),
        F.count(F.lit(1)).alias("n_distinct_scores"),
    )


# --- weighted sampling without replacement (Efraimidis-Spirakis) ------------

RESERVOIR_K = 20


@register(
    "sample_weighted_reservoir",
    f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             floor(
               ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   + 1) / 4294967296.0)
               / n_chars * 1000000000 + 0.5) / 1000000000 AS es_key
      FROM documents
    )
    SELECT doc_id, n_chars, es_key
    FROM keyed
    ORDER BY es_key DESC, doc_id ASC
    LIMIT {RESERVOIR_K}
    """,
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample WITHOUT replacement, size k=20, weight = n_chars —
    the Efraimidis-Spirakis A-ES scheme as a pure projection + top-k.

    Each doc gets key = ln(u) / w with u an md5-derived deterministic
    uniform in (0, 1]; the k largest keys are distributed exactly as a
    sequential weighted draw without replacement (ES 2006, via the
    u^(1/w) formulation — ln(u)/w ranks identically and avoids pow).
    Heavier docs get keys closer to 0, so they win proportionally more.

    Scale shape: no shuffle at all until the TakeOrderedAndProject — each
    partition keeps its local top-k, the driver merges k*parts candidate
    rows.  Deterministic (md5 of doc_id), so the sample is reproducible
    across engines and stable under repartitioning — same contract as the
    rest of the sampling suite (operators/sampling.py module docstring).
    ln() is quantized at 9 dp via the portable floor(+0.5) convention
    before ranking so a last-ulp libm difference between engines cannot
    flip the selection order.
    """
    d = table(spark, sf_dir, "documents")
    return weighted_reservoir(d, "doc_id", "n_chars", RESERVOIR_K)


def weighted_reservoir(
    df: DataFrame, id_col: str, weight_col: str, k: int
) -> DataFrame:
    """A-ES weighted sample without replacement: top-k rows by the
    deterministic key ln(md5-uniform(id)) / weight (quantized at 9 dp)."""
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        + 1
    ) / F.lit(4294967296.0)
    keyed = df.select(
        id_col,
        weight_col,
        (
            F.floor(F.log(u) / F.col(weight_col) * 1000000000 + F.lit(0.5))
            / 1000000000
        ).alias("es_key"),
    )
    return keyed.orderBy(F.col("es_key").desc(), F.col(id_col).asc()).limit(k)


# --- chi-square term-class association (feature selection) ------------------

CHI2_MIN_DF = 5  # ignore terms in fewer docs — unstable 2x2 tables
CHI2_TOP = 15


@register(
    "chi2_term_class_assoc",
    f"""
    WITH doc_terms AS (
      SELECT DISTINCT doc_id, lang, term FROM (
        SELECT doc_id, lang,
               UNNEST(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                  x -> length(x) >= 3)) AS term
        FROM documents
      )
    ),
    term_lang AS (
      SELECT term, lang, COUNT(*) AS a FROM doc_terms GROUP BY term, lang
    ),
    term_tot AS (
      SELECT term, COUNT(*) AS df_t FROM doc_terms GROUP BY term
    ),
    lang_tot AS (
      SELECT lang, COUNT(DISTINCT doc_id) AS n_l FROM doc_terms GROUP BY lang
    ),
    corpus AS (SELECT COUNT(DISTINCT doc_id) AS n FROM doc_terms),
    cells AS (
      SELECT tl.term, tl.lang, tl.a,
             tt.df_t - tl.a AS b,
             lt.n_l - tl.a AS c,
             corpus.n - tt.df_t - (lt.n_l - tl.a) AS d,
             corpus.n AS n
      FROM term_lang tl
      JOIN term_tot tt ON tl.term = tt.term
      JOIN lang_tot lt ON tl.lang = lt.lang
      CROSS JOIN corpus
      WHERE tt.df_t >= {CHI2_MIN_DF}
    )
    SELECT lang, term,
           CASE WHEN (a + b) * (c + d) * (a + c) * (b + d) = 0 THEN 0.0
                ELSE floor(CAST(n AS DOUBLE) * (a * d - b * c) * (a * d - b * c)
                           / ((a + b) * (c + d) * (a + c) * (b + d))
                           * 10000 + 0.5) / 10000 END AS chi2_q,
           a, b, c, d
    FROM cells
    ORDER BY chi2_q DESC, lang ASC, term ASC
    LIMIT {CHI2_TOP}
    """,
)
def chi2_term_class_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary most associated with a language class by chi-square on the
    2x2 (term present/absent x lang/other) contingency table — the classic
    feature-selection scan a corpus curator runs to find class-marker terms
    (and, in a training pipeline, to catch label leakage: a term with an
    absurd chi2 against a 'quality' label is usually an artifact).

    Inverted-index shape: explode DISTINCT (doc, term) pairs (linear in
    corpus token count), then the 2x2 marginals are three hash aggregations
    — (term, lang), (term), (lang) — joined back; the lang marginal and the
    corpus total are broadcast (5 rows / 1 row).  chi2's cross-products are
    exact integer arithmetic cast to double only for the final quotient, so
    the statistic is order-independent; the 4 dp portable quantization pins
    the top-k ordering across engines.

    a = docs in lang containing term, b = other-lang docs containing term,
    c = lang docs without term, d = other-lang docs without term.
    chi2 = n * (ad - bc)^2 / ((a+b)(c+d)(a+c)(b+d)).
    """
    d = table(spark, sf_dir, "documents")
    doc_terms = (
        d.select(
            "doc_id",
            "lang",
            F.explode(
                F.expr("filter(split(lower(text), '[^a-z]+'), x -> length(x) >= 3)")
            ).alias("term"),
        )
        .distinct()
    )
    return chi2_assoc(doc_terms, CHI2_MIN_DF, CHI2_TOP)


def chi2_assoc(doc_terms: DataFrame, min_df: int, top: int) -> DataFrame:
    """Chi-square 2x2 association of each (term, lang) pair from a distinct
    (doc_id, lang, term) presence frame; top rows by quantized chi2."""
    term_lang = doc_terms.groupBy("term", "lang").agg(F.count(F.lit(1)).alias("a"))
    term_tot = doc_terms.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    lang_tot = doc_terms.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n_l")
    )
    corpus = doc_terms.agg(F.countDistinct("doc_id").alias("n"))
    cells = (
        term_lang.join(term_tot, "term")
        .filter(F.col("df_t") >= min_df)
        .join(F.broadcast(lang_tot), "lang")
        .crossJoin(F.broadcast(corpus))
        .select(
            "term",
            "lang",
            "a",
            (F.col("df_t") - F.col("a")).alias("b"),
            (F.col("n_l") - F.col("a")).alias("c"),
            (F.col("n") - F.col("df_t") - (F.col("n_l") - F.col("a"))).alias("d"),
            "n",
        )
    )
    ad_bc = F.col("a") * F.col("d") - F.col("b") * F.col("c")
    denom = (
        (F.col("a") + F.col("b"))
        * (F.col("c") + F.col("d"))
        * (F.col("a") + F.col("c"))
        * (F.col("b") + F.col("d"))
    )
    return (
        cells.select(
            "lang",
            "term",
            # a term in every doc (or every doc of one class) zeroes a
            # marginal: chi2 is 0 by convention (no discrimination), and the
            # guard keeps ANSI mode from raising DIVIDE_BY_ZERO
            F.when(denom == 0, F.lit(0.0))
            .otherwise(
                F.floor(
                    F.col("n").cast("double") * ad_bc * ad_bc / denom * 10000
                    + F.lit(0.5)
                )
                / 10000
            )
            .alias("chi2_q"),
            "a",
            "b",
            "c",
            "d",
        )
        .orderBy(F.col("chi2_q").desc(), F.col("lang").asc(), F.col("term").asc())
        .limit(top)
    )


# --- curriculum interleaving: training-order mixing audit -------------------


@register(
    "curriculum_interleave_stats",
    """
    WITH base AS (SELECT doc_id, source, n_chars FROM documents),
    naive AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (ORDER BY source ASC, n_chars ASC, doc_id ASC)
               AS pos
      FROM base
    ),
    per_src AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars ASC, doc_id ASC) AS srn
      FROM base
    ),
    inter AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (ORDER BY srn ASC, source ASC, doc_id ASC)
               AS pos
      FROM per_src
    ),
    both_ord AS (
      SELECT 'concat' AS ordering, doc_id, source, pos FROM naive
      UNION ALL
      SELECT 'interleaved' AS ordering, doc_id, source, pos FROM inter
    ),
    adj AS (
      SELECT x.ordering,
             CAST(SUM(CASE WHEN x.source = y.source THEN 1 ELSE 0 END)
                  AS BIGINT) AS same_adj,
             COUNT(*) + 1 AS n_docs
      FROM both_ord x
      JOIN both_ord y
        ON x.ordering = y.ordering AND y.pos = x.pos + 1
      GROUP BY x.ordering
    )
    SELECT ordering,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_docs - same_adj AS BIGINT) AS n_runs,
           floor(CAST(n_docs AS DOUBLE) / (n_docs - same_adj) * 1000000 + 0.5)
             / 1000000 AS avg_run_q,
           same_adj
    FROM adj
    ORDER BY ordering ASC
    """,
)
def curriculum_interleave_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-order mixing audit: compare the pathological-but-common
    source-CONCATENATED order (training files appended corpus by corpus —
    every source is one giant same-source run, so the model sees a long
    domain block then never again) against a round-robin CURRICULUM
    INTERLEAVE (per-source difficulty rank first, source second — documents
    climb the difficulty score while sources alternate).  Reports run
    statistics per ordering: a same-source adjacency count, the number of
    maximal same-source runs it implies (n_runs = n_docs - same_adjacent),
    and the average run length — interleaving must push avg_run toward 1.

    Scale shape: both orderings are positioned by `global_row_numbers`
    (range-partition numbering — no single-partition sort), and the run
    statistics come from an ADJACENCY EQUI-JOIN (pos = pos+1) + hash agg
    instead of a global lag window, so every step is shuffle-bounded; the
    per-source difficulty rank is an ordinary partitioned window.  This is
    the data-ordering stage of an LLM training pipeline (mixing audit)
    expressed with the engine's own primitives.
    """
    d = table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    naive = global_row_numbers(
        d, [F.col("source").asc(), F.col("n_chars").asc(), F.col("doc_id").asc()]
    ).select("doc_id", "source", F.col("global_rn").alias("pos"))
    per_src = d.withColumn(
        "srn",
        F.row_number().over(
            Window.partitionBy("source").orderBy(
                F.col("n_chars").asc(), F.col("doc_id").asc()
            )
        ),
    )
    inter = global_row_numbers(
        per_src, [F.col("srn").asc(), F.col("source").asc(), F.col("doc_id").asc()]
    ).select("doc_id", "source", F.col("global_rn").alias("pos"))
    both = naive.select(F.lit("concat").alias("ordering"), "doc_id", "source", "pos").unionAll(
        inter.select(F.lit("interleaved").alias("ordering"), "doc_id", "source", "pos")
    )
    x = both.alias("x")
    y = both.alias("y")
    adj = (
        x.join(
            y,
            (F.col("x.ordering") == F.col("y.ordering"))
            & (F.col("y.pos") == F.col("x.pos") + 1),
        )
        .groupBy(F.col("x.ordering").alias("ordering"))
        .agg(
            F.sum((F.col("x.source") == F.col("y.source")).cast("long")).alias(
                "same_adj"
            ),
            (F.count(F.lit(1)) + 1).alias("n_docs"),
        )
    )
    return adj.select(
        "ordering",
        F.col("n_docs").cast("long").alias("n_docs"),
        (F.col("n_docs") - F.col("same_adj")).cast("long").alias("n_runs"),
        (
            F.floor(
                F.col("n_docs").cast("double")
                / (F.col("n_docs") - F.col("same_adj"))
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("avg_run_q"),
        "same_adj",
    ).orderBy(F.col("ordering").asc())


# --- Pareto frontier (skyline) without a single-partition scan --------------


@register(
    "pareto_frontier_lineitem",
    """
    WITH pts AS (
      SELECT DISTINCT l_extendedprice AS price, l_quantity AS qty
      FROM lineitem
    ),
    scan AS (
      SELECT price, qty,
             MAX(qty) OVER (ORDER BY price ASC, qty DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS prev_max
      FROM pts
    )
    SELECT price, qty
    FROM scan
    WHERE prev_max IS NULL OR qty > prev_max
    ORDER BY price ASC
    """,
)
def pareto_frontier_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query: the Pareto-optimal (minimize price, maximize quantity)
    line items — no other point is at most as expensive AND at least as
    large.  The multi-objective 'best trade-offs' query (cheapest way to buy
    each volume tier) that a plain ORDER BY cannot answer.

    Scale shape: after dedup, a point survives iff its qty exceeds the max
    qty of every point sorted before it under (price ASC, qty DESC) — a
    running-max scan.  The naive form is one global window (single
    partition); here the scan decomposes exactly like global_row_numbers:
    range-partition on the sort key, LOCAL running max inside each
    partition, per-partition max qty rolled into a prefix max over the
    32-row partition relation (broadcast back), survivor test
    qty > greatest(local_prev_max, prefix_max_of_earlier_partitions).
    Skylines compose associatively, so the merge is exact; the corpus pays
    one range exchange, the cross-partition state is one number per
    partition.  The oracle replays the same running-max algorithm (the
    NOT EXISTS dominance form is O(n^2) — wrong at any scale).
    """
    li = table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_extendedprice").alias("price"), F.col("l_quantity").alias("qty")
    ).distinct()
    return pareto_frontier(pts, "price", "qty").orderBy(F.col("price").asc())


def pareto_frontier(pts: DataFrame, min_col: str, max_col: str) -> DataFrame:
    """Skyline of deduplicated (min_col, max_col) points via the
    range-partitioned running-max decomposition described above."""
    ranged = pts.repartitionByRange(
        RANGE_PARTS, F.col(min_col).asc(), F.col(max_col).desc()
    ).withColumn("pid", F.spark_partition_id())
    w_local = Window.partitionBy("pid").orderBy(
        F.col(min_col).asc(), F.col(max_col).desc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    local = ranged.withColumn(
        "local_prev", F.max(max_col).over(w_local)
    ).localCheckpoint()
    part_max = local.groupBy("pid").agg(F.max(max_col).alias("pmax"))
    w_prefix = Window.orderBy(F.col("pid").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = part_max.select(
        "pid", F.max("pmax").over(w_prefix).alias("prefix_max")
    )
    return (
        local.join(F.broadcast(prefix), "pid")
        .withColumn(
            "prev_max",
            F.greatest(
                F.coalesce(F.col("local_prev"), F.lit(float("-inf"))),
                F.coalesce(F.col("prefix_max"), F.lit(float("-inf"))),
            ),
        )
        .filter(F.col(max_col) > F.col("prev_max"))
        .select(min_col, max_col)
    )


# --- per-slice AUC: model quality by data segment ---------------------------


@register(
    "quality_score_auc_by_source",
    f"""
    WITH scored AS (
      SELECT source,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
             floor(
               CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                    x -> x IN ({_AUC_STOP}))) AS DOUBLE)
               / NULLIF(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                        x -> x <> '')), 0)
               * 10000 + 0.5) / 10000 AS score_q
      FROM documents
    ),
    by_score AS (
      SELECT source, score_q,
             CAST(SUM(pos) AS BIGINT) AS p,
             CAST(SUM(1 - pos) AS BIGINT) AS n
      FROM scored
      WHERE score_q IS NOT NULL
      GROUP BY source, score_q
    ),
    cum AS (
      SELECT source, score_q, p, n,
             COALESCE(SUM(n) OVER (PARTITION BY source ORDER BY score_q ASC
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS cneg_below
      FROM by_score
    )
    SELECT source,
           CASE WHEN SUM(p) = 0 OR SUM(n) = 0 THEN NULL
                ELSE CAST(SUM(p * (2 * cneg_below + n)) AS DOUBLE)
                     / (2.0 * SUM(p) * SUM(n)) END AS auc,
           CAST(SUM(p) AS BIGINT) AS n_pos,
           CAST(SUM(n) AS BIGINT) AS n_neg
    FROM cum
    GROUP BY source
    ORDER BY source ASC
    """,
)
def quality_score_auc_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SLICE model evaluation: the stopword-density English detector's
    AUC computed separately for every ingest source — the slice analysis
    that catches a classifier which looks fine in aggregate but fails on
    one feed (the per-segment twin of `quality_score_auc`; same
    quantized-score Mann-Whitney decomposition).

    Scale shape is BETTER than the global AUC: the cumulative window is
    PARTITIONED BY source, so even the bounded rank cumulation
    parallelizes across slices; one-class slices (no positives or no
    negatives) report NULL AUC rather than dividing by zero.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        (F.col("lang") == "en").cast("int").alias("pos"),
        F.split(F.lower("text"), r"[^a-z]+").alias("w"),
    )
    scored = toks.select(
        "source",
        "pos",
        (
            F.floor(
                F.expr(f"size(filter(w, x -> x IN ({_AUC_STOP})))").cast("double")
                / F.nullif(F.expr("size(filter(w, x -> x <> ''))"), F.lit(0))
                * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("score_q"),
    )
    by_score = (
        scored.filter(F.col("score_q").isNotNull())
        .groupBy("source", "score_q")
        .agg(F.sum("pos").alias("p"), F.sum(F.lit(1) - F.col("pos")).alias("n"))
    )
    w_cum = (
        Window.partitionBy("source")
        .orderBy(F.col("score_q").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = by_score.withColumn(
        "cneg_below", F.coalesce(F.sum("n").over(w_cum), F.lit(0))
    )
    return (
        cum.groupBy("source")
        .agg(
            F.when(
                (F.sum("p") == 0) | (F.sum("n") == 0), F.lit(None).cast("double")
            )
            .otherwise(
                F.sum(F.col("p") * (2 * F.col("cneg_below") + F.col("n"))).cast(
                    "double"
                )
                / (F.lit(2.0) * F.sum("p") * F.sum("n"))
            )
            .alias("auc"),
            F.sum("p").alias("n_pos"),
            F.sum("n").alias("n_neg"),
        )
        .orderBy(F.col("source").asc())
    )


# --- stratified weighted reservoir ------------------------------------------

STRAT_RES_K = 5  # sample size per stratum


@register(
    "sample_weighted_stratified",
    f"""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             floor(
               ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   + 1) / 4294967296.0)
               / n_chars * 1000000000 + 0.5) / 1000000000 AS es_key,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY floor(
                 ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                     + 1) / 4294967296.0)
                 / n_chars * 1000000000 + 0.5) / 1000000000 DESC,
               doc_id ASC) AS rk
      FROM documents
    )
    SELECT lang, doc_id, n_chars, es_key
    FROM keyed
    WHERE rk <= {STRAT_RES_K}
    ORDER BY lang ASC, es_key DESC, doc_id ASC
    """,
)
def sample_weighted_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-STRATUM weighted sampling without replacement: the top
    {STRAT_RES_K} Efraimidis-Spirakis keys inside each language — the
    stratified variant of `sample_weighted_reservoir` (guaranteed k rows
    per stratum, e.g. per-language eval sets drawn proportional to length).

    Scale shape: even better than the global reservoir — the top-k is a
    window PARTITIONED BY the stratum, so selection parallelizes across
    strata with no global TakeOrdered at all; keys are the same 9-dp
    quantized deterministic md5-derived ln(u)/w, so the draw is
    reproducible and layout-independent."""
    d = table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        + 1
    ) / F.lit(4294967296.0)
    keyed = d.select(
        "doc_id",
        "lang",
        "n_chars",
        (
            F.floor(F.log(u) / F.col("n_chars") * 1000000000 + F.lit(0.5))
            / 1000000000
        ).alias("es_key"),
    )
    rk = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            F.col("es_key").desc(), F.col("doc_id").asc()
        )
    )
    return (
        keyed.withColumn("rk", rk)
        .filter(F.col("rk") <= STRAT_RES_K)
        .select("lang", "doc_id", "n_chars", "es_key")
        .orderBy(F.col("lang").asc(), F.col("es_key").desc(), F.col("doc_id").asc())
    )


# --- two-sample KS drift test (nonparametric sibling of PSI) ----------------


@register(
    "ks_price_drift",
    """
    WITH halves AS (
      SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'ref' ELSE 'cur' END AS cohort,
             floor(o_totalprice / 100.0) * 100.0 AS price_q
      FROM orders
    ),
    counts AS (
      SELECT price_q,
             CAST(SUM(CASE WHEN cohort = 'ref' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_ref,
             CAST(SUM(CASE WHEN cohort = 'cur' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cur
      FROM halves GROUP BY price_q
    ),
    tot AS (
      SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
             CAST(SUM(n_cur) AS BIGINT) AS t_cur
      FROM counts
    ),
    cum AS (
      SELECT price_q,
             CAST(SUM(n_ref) OVER (ORDER BY price_q ASC) AS BIGINT) AS c_ref,
             CAST(SUM(n_cur) OVER (ORDER BY price_q ASC) AS BIGINT) AS c_cur
      FROM counts
    )
    SELECT floor(MAX(abs(CAST(c_ref AS DOUBLE) / t_ref
                         - CAST(c_cur AS DOUBLE) / t_cur)) * 1000000 + 0.5)
             / 1000000 AS ks_stat_q,
           CAST(MAX(t_ref) AS BIGINT) AS n_ref,
           CAST(MAX(t_cur) AS BIGINT) AS n_cur,
           COUNT(*) AS n_support_points
    FROM cum CROSS JOIN tot
    """,
)
def ks_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between the even- and
    odd-orderkey halves of the order-price distribution: the max absolute
    CDF gap — the NONPARAMETRIC drift alarm (binning-free in spirit) next
    to `psi_price_drift`'s binned PSI: KS reacts to any shape change, PSI
    localizes which bucket moved.

    Scale shape: the same bounded-cumulation trick as quality_score_auc —
    prices quantized to $100 steps bound the support (~1050 points at any
    corpus size), so the corpus pays one 2-cell hash agg and the CDF
    windows run over the bounded support relation only.  CDF ratios are
    single double divisions of exact integers; the max is over the bounded
    support; 6-dp portable quantization pins the result.
    """
    o = table(spark, sf_dir, "orders")
    halves = o.select(
        F.when(F.col("o_orderkey") % 2 == 0, "ref").otherwise("cur").alias("cohort"),
        (F.floor(F.col("o_totalprice") / 100.0) * 100.0).alias("price_q"),
    )
    counts = halves.groupBy("price_q").agg(
        F.sum((F.col("cohort") == "ref").cast("long")).alias("n_ref"),
        F.sum((F.col("cohort") == "cur").cast("long")).alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    w_cdf = Window.orderBy(F.col("price_q").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = counts.select(
        "price_q",
        F.sum("n_ref").over(w_cdf).alias("c_ref"),
        F.sum("n_cur").over(w_cdf).alias("c_cur"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            (
                F.floor(
                    F.max(
                        F.abs(
                            F.col("c_ref").cast("double") / F.col("t_ref")
                            - F.col("c_cur").cast("double") / F.col("t_cur")
                        )
                    )
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("ks_stat_q"),
            F.max("t_ref").cast("long").alias("n_ref"),
            F.max("t_cur").cast("long").alias("n_cur"),
            F.count(F.lit(1)).alias("n_support_points"),
        )
    )


# --- rank-based A/B readout (Mann-Whitney U over per-user revenue) ----------


@register(
    "events_ab_mannwhitney",
    """
    WITH rev AS (
      SELECT user_id,
             CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 2) < '80'
                  THEN 1 ELSE 0 END AS pos,
             floor(SUM(CASE WHEN event_type = 'purchase' THEN value
                            ELSE 0 END) * 100 + 0.5) / 100 AS rev_q
      FROM events GROUP BY user_id
    ),
    by_score AS (
      SELECT rev_q,
             CAST(SUM(pos) AS BIGINT) AS p,
             CAST(SUM(1 - pos) AS BIGINT) AS n
      FROM rev GROUP BY rev_q
    ),
    cum AS (
      SELECT rev_q, p, n,
             COALESCE(SUM(n) OVER (ORDER BY rev_q ASC
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS cneg_below
      FROM by_score
    ),
    stats AS (
      SELECT CAST(SUM(p * (2 * cneg_below + n)) AS BIGINT) AS u2,
             CAST(SUM(p) AS BIGINT) AS na,
             CAST(SUM(n) AS BIGINT) AS nb
      FROM cum
    )
    SELECT floor(u2 / 2.0 * 1000000 + 0.5) / 1000000 AS u_stat,
           floor(CAST(u2 AS DOUBLE) / (2.0 * na * nb) * 1000000 + 0.5)
             / 1000000 AS auc_q,
           floor((u2 / 2.0 - na * nb / 2.0)
                 / sqrt(CAST(na AS DOUBLE) * nb * (na + nb + 1) / 12.0)
                 * 1000000 + 0.5) / 1000000 AS z_q,
           na AS n_arm_a, nb AS n_arm_b
    FROM stats
    """,
)
def events_ab_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based A/B readout: Mann-Whitney U over per-user purchase
    revenue between the md5-hash arms (same assignment as
    `events_ab_readout`) — the ROBUST companion to that query's Welch z:
    rank statistics ignore the heavy right tail that dominates revenue
    means, so a few whale users cannot fake or mask a treatment effect.
    Reports U, the rank-biserial AUC (P(rev_A > rev_B) + tie credit), and
    the normal-approximation z (tie-uncorrected; conservative).

    Scale shape: per-user aggregation (hash agg), then the identical
    quantized-score Mann-Whitney decomposition as quality_score_auc —
    revenue quantized to cents bounds the support; U kept doubled in exact
    integers; no global rank sort anywhere.
    """
    from fpl_data_pipeline_spark.tables import events_table

    e = events_table(spark, sf_dir)
    rev = e.groupBy("user_id").agg(
        (
            F.floor(
                F.sum(
                    F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                        0.0
                    )
                )
                * 100
                + F.lit(0.5)
            )
            / 100
        ).alias("rev_q")
    ).select(
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 2) < "80", 1
        )
        .otherwise(0)
        .alias("pos"),
        "rev_q",
    )
    by_score = rev.groupBy("rev_q").agg(
        F.sum("pos").alias("p"), F.sum(F.lit(1) - F.col("pos")).alias("n")
    )
    w_cum = Window.orderBy(F.col("rev_q").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = by_score.withColumn(
        "cneg_below", F.coalesce(F.sum("n").over(w_cum), F.lit(0))
    )
    stats = cum.agg(
        F.sum(F.col("p") * (2 * F.col("cneg_below") + F.col("n"))).alias("u2"),
        F.sum("p").alias("na"),
        F.sum("n").alias("nb"),
    )
    q6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return stats.select(
        q6(F.col("u2") / 2.0).alias("u_stat"),
        q6(F.col("u2").cast("double") / (2.0 * F.col("na") * F.col("nb"))).alias(
            "auc_q"
        ),
        q6(
            (F.col("u2") / 2.0 - F.col("na") * F.col("nb") / 2.0)
            / F.sqrt(
                F.col("na").cast("double")
                * F.col("nb")
                * (F.col("na") + F.col("nb") + 1)
                / 12.0
            )
        ).alias("z_q"),
        F.col("na").alias("n_arm_a"),
        F.col("nb").alias("n_arm_b"),
    )


# --- grouped skyline: Pareto frontier per partition key ---------------------


@register(
    "pareto_frontier_by_brand",
    """
    WITH pts AS (
      SELECT DISTINCT p_brand, p_retailprice AS price, p_size AS sz
      FROM part
    ),
    scan AS (
      SELECT p_brand, price, sz,
             MAX(sz) OVER (PARTITION BY p_brand
                           ORDER BY price ASC, sz DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS prev_max
      FROM pts
    )
    SELECT p_brand, price, sz
    FROM scan
    WHERE prev_max IS NULL OR sz > prev_max
    ORDER BY p_brand ASC, price ASC
    """,
)
def pareto_frontier_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP skyline: each brand's Pareto-optimal (cheapest price,
    largest size) parts — the grouped variant of `pareto_frontier_lineitem`
    (per-category best-trade-off catalogs).  With a grouping key the
    running-max scan needs NO cross-partition merge at all: the window is
    PARTITIONED BY brand, so every group's skyline computes independently
    after one hash exchange on the key — strictly simpler than the global
    skyline, and the shape to prefer whenever a natural partition key
    exists."""
    p = table(spark, sf_dir, "part")
    pts = p.select(
        "p_brand", F.col("p_retailprice").alias("price"), F.col("p_size").alias("sz")
    ).distinct()
    w = (
        Window.partitionBy("p_brand")
        .orderBy(F.col("price").asc(), F.col("sz").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        pts.withColumn("prev_max", F.max("sz").over(w))
        .filter(F.col("prev_max").isNull() | (F.col("sz") > F.col("prev_max")))
        .select("p_brand", "price", "sz")
        .orderBy(F.col("p_brand").asc(), F.col("price").asc())
    )
