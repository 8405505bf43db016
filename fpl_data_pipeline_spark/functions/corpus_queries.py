"""Corpus-preparation operators for LLM training-data pipelines, beyond the
basic text catalog (functions/text_queries.py): repetition-based quality
signals (the Gopher/MassiveText rules adapted to line-less word streams),
context-window packing, TF-IDF term scoring, and benchmark-contamination
measurement. All pure built-in expressions — one explode + hash aggregates,
no UDFs; every query oracle-checked against DuckDB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from fpl_data_pipeline_spark.functions.text_queries import doc_bigrams
from fpl_data_pipeline_spark.operators.dedup import _ensure_parallel, shingles
from fpl_data_pipeline_spark.registry import register
from fpl_data_pipeline_spark.tables import table

_NORM = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
_WORDS_SQL = f"list_filter(string_split({_NORM}, ' '), w -> w <> '')"


def _toks(df: DataFrame) -> DataFrame:
    return df.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower("text"), r"\s+"),
                lambda w: w != "",
            )
        ).alias("tok"),
    )


# --- repetition signals (Gopher quality rules, §MassiveText C.2 analog) -----
def _max_multiplicity(arr):
    """Largest multiplicity of any element of ``arr`` (array<string>,
    NULL-free by construction), computed MAP-SIDE: sort the array, then one
    aggregate pass tracks the longest equal-element run. O(n log n) CPU per
    row instead of a corpus-wide (doc, gram) shuffle."""
    srt = F.sort_array(arr)

    def _step(acc, x):
        run = (
            F.when(acc["prev"].eqNullSafe(x), acc["run"] + 1)
            .otherwise(F.lit(1))
            .cast("long")
        )
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(
        srt,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        _step,
        lambda acc: acc["best"],
    )


@register(
    "quality_repetition_signals",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_WORDS_SQL}) AS tok FROM documents
    ),
    wc AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS DOUBLE) / SUM(c) AS distinct_ratio,
             CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_word_frac
      FROM wc GROUP BY doc_id
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(ws), 1)),
                                   i -> ws[i] || ' ' || ws[i+1])) AS bigram
      FROM (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents)
    ),
    bgc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram),
    bg_doc AS (
      SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_bigram_frac
      FROM bgc GROUP BY doc_id
    )
    SELECT p.doc_id, p.n_tokens, p.distinct_ratio, p.top_word_frac,
           b.top_bigram_frac
    FROM per_doc p LEFT JOIN bg_doc b ON p.doc_id = b.doc_id
    """,
)
def quality_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals — the filters that catch boilerplate
    and degenerate (stuck-token) documents before training: distinct-token
    ratio, most-frequent-word fraction, most-frequent-bigram fraction.

    Round-11 shape (guide §2.4, first-principles): every output is a
    per-document statistic, so NO shuffle is fundamentally required — the
    old two-explode + four-hash-aggregate + join plan (6 exchanges, the
    whole token stream shuffled twice) is replaced by map-side array
    expressions over the projected word list: n_tokens = size(ws),
    distinct_ratio via array_distinct, top fractions via the sorted-run
    maximum (_max_multiplicity). Fractions stay exact int/int double
    divisions; a doc with no tokens emits no row (the old wc relation was
    empty for it) and a doc with <2 words gets a NULL bigram fraction (the
    old left join's missing row). At 100 TB the shuffle-bytes term of this
    query is now ZERO — it scans, computes, and emits."""
    d = table(spark, sf_dir, "documents")
    words = _ensure_parallel(d).select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), r"\s+"),
            lambda w: w != "",
        ).alias("ws"),
    )
    bigrams = F.when(
        F.size("ws") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("ws") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(F.col("ws"), i), F.element_at(F.col("ws"), i + 1)
            ),
        ),
    )
    staged = words.filter(F.size("ws") >= 1).select(
        "doc_id", "ws", bigrams.alias("bg")
    )
    return staged.select(
        "doc_id",
        F.size("ws").cast("long").alias("n_tokens"),
        (
            F.size(F.array_distinct("ws")).cast("double")
            / F.size("ws").cast("long")
        ).alias("distinct_ratio"),
        (_max_multiplicity(F.col("ws")).cast("double") / F.size("ws").cast("long")).alias(
            "top_word_frac"
        ),
        F.when(
            F.col("bg").isNotNull(),
            _max_multiplicity(F.col("bg")).cast("double") / F.size("bg").cast("long"),
        ).alias("top_bigram_frac"),
    )


# --- context-window packing (concat-and-chunk) ------------------------------
SEQ_LEN = 2048


@register(
    "doc_packing_summary",
    f"""
    WITH toks AS (
      SELECT doc_id, len({_WORDS_SQL}) AS n_tokens FROM documents
    ),
    packed AS (
      SELECT doc_id, n_tokens,
             CAST((SUM(n_tokens) OVER (ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING) - n_tokens)
                  // {SEQ_LEN} AS BIGINT) AS seq_id
      FROM toks
    )
    SELECT seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM packed
    GROUP BY seq_id
    """,
)
def doc_packing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing: documents in doc_id order are assigned to
    fixed-budget context windows (seq_id = floor(cumulative tokens before me
    / SEQ_LEN)) — the standard sequence-packing step between corpus and
    training loader. The summary proves assignment + budget accounting.

    The running token total comes from ``global_prefix_sums`` (range
    partition + local cumsum + broadcast per-partition offsets), not a
    ``SUM OVER (ORDER BY doc_id)`` unpartitioned window — the builtin form
    is a single-partition sort of the whole corpus."""
    d = table(spark, sf_dir, "documents")
    ntok = d.select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.lower("text"), r"\s+"),
                lambda w: w != "",
            )
        ).alias("n_tokens"),
    )
    from fpl_data_pipeline_spark.plans.scale_primitives import global_prefix_sums

    packed = global_prefix_sums(
        ntok, [F.col("doc_id").asc()], "n_tokens", "cum_tokens"
    ).withColumn(
        "seq_id", F.floor((F.col("cum_tokens") - F.col("n_tokens")) / SEQ_LEN)
    )
    return packed.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# --- TF-IDF: most distinctive term per document -----------------------------
@register(
    "tfidf_top_terms",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_WORDS_SQL}) AS tok FROM documents
    ),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
    df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
      FROM tf JOIN df USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok AS top_term, tfidf FROM (
      SELECT doc_id, tok, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, tok ASC) AS rn
      FROM scored
    ) WHERE rn = 1
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most distinctive term per document by TF-IDF — the classic relevance
    scorer as a corpus operator: token counts (one shuffle on (doc, tok)),
    document frequencies (one shuffle on tok, broadcast back), argmax per
    doc. ln() rounded to 6 dp (libm vs JVM last-ulp) with a total-order
    tiebreak so the argmax is engine-stable."""
    d = table(spark, sf_dir, "documents")
    tf = _toks(d).groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.count()  # O(1) driver scalar, embedded as a literal
    scored = tf.join(df_, "tok").select(
        "doc_id",
        "tok",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("tok").alias("top_term"), "tfidf")
    )


# --- benchmark-contamination measurement ------------------------------------
CONTAM_NGRAM = 8
BENCH_MOD = 97  # docs with doc_id % 97 == 0 stand in for the eval benchmark


@register(
    "contamination_overlap",
    f"""
    WITH grams AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(ws) - {CONTAM_NGRAM - 2}, 1)),
               i -> list_aggregate(ws[i:i+{CONTAM_NGRAM - 1}], 'string_agg', ' ')
             ))) AS g
      FROM (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents)
      WHERE len(ws) >= {CONTAM_NGRAM}
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % {BENCH_MOD} = 0),
    corpus AS (SELECT doc_id, g FROM grams WHERE doc_id % {BENCH_MOD} <> 0),
    hits AS (
      SELECT DISTINCT c.doc_id FROM corpus c JOIN bench b ON c.g = b.g
    ),
    eligible AS (
      SELECT COUNT(DISTINCT doc_id) AS n_docs FROM corpus
    )
    SELECT (SELECT COUNT(*) FROM hits) AS n_contaminated,
           n_docs AS n_eligible,
           CAST((SELECT COUNT(*) FROM hits) AS DOUBLE) / n_docs
             AS contamination_rate
    FROM eligible
    """,
)
def contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: fraction of corpus documents sharing
    at least one 8-gram with the held-out benchmark slice (doc_id % 97 == 0
    as the stand-in eval set). The decontamination step every training
    pipeline runs before a data release. Candidate generation is a semi-join
    on the shingle key (benchmark gram set is small -> broadcast at any
    corpus size); never n^2."""
    d = table(spark, sf_dir, "documents")
    grams = shingles(d, n=CONTAM_NGRAM)
    bench = (
        grams.filter(F.col("doc_id") % BENCH_MOD == 0).select("shingle").distinct()
    )
    corpus = grams.filter(F.col("doc_id") % BENCH_MOD != 0)
    hits = corpus.join(F.broadcast(bench), "shingle").select("doc_id").distinct()
    eligible = corpus.select("doc_id").distinct()
    return eligible.agg(F.count(F.lit(1)).alias("n_eligible")).crossJoin(
        hits.agg(F.count(F.lit(1)).alias("n_contaminated"))
    ).select(
        "n_contaminated",
        F.col("n_eligible"),
        (F.col("n_contaminated").cast("double") / F.col("n_eligible")).alias(
            "contamination_rate"
        ),
    )


# --- C4-style filter funnel: first-failing-rule attribution ------------------
_STOP = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


@register(
    "quality_filter_funnel",
    f"""
    WITH feat AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len({_WORDS_SQL}) AS n_tokens,
             len(list_filter({_WORDS_SQL}, w -> w IN {_STOP!r})) AS n_stop,
             len(regexp_extract_all(text, '[0-9]')) AS n_digits,
             len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS n_punct
      FROM documents
    ),
    wc AS (
      SELECT doc_id, MAX(c) AS max_wc, SUM(c) AS sum_wc FROM (
        SELECT doc_id, tok, COUNT(*) AS c
        FROM (SELECT doc_id, unnest({_WORDS_SQL}) AS tok FROM documents)
        GROUP BY doc_id, tok
      ) GROUP BY doc_id
    ),
    labeled AS (
      SELECT f.doc_id,
             CASE
               WHEN f.n_tokens < 10 THEN 'too_short'
               WHEN CAST(f.n_stop AS DOUBLE) / f.n_tokens NOT BETWEEN 0.05 AND 0.6
                 THEN 'stopword_band'
               WHEN CAST(f.n_punct AS DOUBLE) / f.n_chars >= 0.1 THEN 'high_punct'
               WHEN CAST(f.n_digits AS DOUBLE) / f.n_chars >= 0.2 THEN 'high_digit'
               WHEN CAST(w.max_wc AS DOUBLE) / w.sum_wc > 0.2 THEN 'repetitive'
               ELSE 'kept'
             END AS verdict
      FROM feat f JOIN wc w ON f.doc_id = w.doc_id
    )
    SELECT verdict, COUNT(*) AS n_docs
    FROM labeled
    GROUP BY verdict
    """,
)
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style pre-training filter funnel: every document is
    attributed to its FIRST failing rule (too short -> stopword band ->
    punctuation -> digits -> repetition) or 'kept' — the go/no-go summary a
    data pipeline emits before a training run. Two aggregates (doc features
    + word-frequency stats) joined on doc_id; one scan each; all fractions
    exact int/int doubles."""
    d = table(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(F.lower("text"), r"\s+"),
        lambda w: w != "",
    )
    feat = d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(ws).alias("n_tokens"),
        F.size(F.filter(ws, lambda w: w.isin(*_STOP))).alias("n_stop"),
        F.regexp_count("text", F.lit("[0-9]")).alias("n_digits"),
        F.regexp_count("text", F.lit("[^a-zA-Z0-9 ]")).alias("n_punct"),
    )
    wc = (
        _toks(d)
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_wc"), F.sum("c").alias("sum_wc"))
    )
    stop_r = F.col("n_stop").cast("double") / F.col("n_tokens")
    verdict = (
        F.when(F.col("n_tokens") < 10, "too_short")
        .when((stop_r < 0.05) | (stop_r > 0.6), "stopword_band")
        .when(F.col("n_punct").cast("double") / F.col("n_chars") >= 0.1, "high_punct")
        .when(F.col("n_digits").cast("double") / F.col("n_chars") >= 0.2, "high_digit")
        .when(F.col("max_wc").cast("double") / F.col("sum_wc") > 0.2, "repetitive")
        .otherwise("kept")
    )
    return (
        feat.join(wc, "doc_id")
        .select(verdict.alias("verdict"))
        .groupBy("verdict")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --- document chunking for retrieval ingestion (Python UDTF surface) --------
CHUNK_TOKENS = 32


@register(
    "doc_chunking",
    f"""
    WITH words AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
    chunks AS (
      SELECT doc_id,
             unnest(range(0, CAST(ceil(len(ws) / {CHUNK_TOKENS}.0) AS INT))) AS chunk_idx,
             ws
      FROM words
    )
    SELECT doc_id,
           CAST(chunk_idx AS INT) AS chunk_idx,
           list_aggregate(ws[chunk_idx * {CHUNK_TOKENS} + 1 : (chunk_idx + 1) * {CHUNK_TOKENS}],
                          'string_agg', ' ') AS chunk,
           CAST(len(ws[chunk_idx * {CHUNK_TOKENS} + 1 : (chunk_idx + 1) * {CHUNK_TOKENS}]) AS INT)
             AS n_tokens
    FROM chunks
    """,
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-budget document chunking (the RAG/embedding-ingestion splitter)
    implemented as a Python UDTF — the one row-expanding UDF shape the rest
    of the engine doesn't exercise (scalar pandas UDF, mapInPandas, cogrouped
    applyInPandas, applyInPandasWithState are covered elsewhere). The UDTF
    runs LATERAL per document, so chunk expansion happens map-side before
    any shuffle — the same placement rule as frame sampling. Oracle replays
    the chunking with list slicing in SQL."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, chunk_idx: int, chunk: string, n_tokens: int", useArrow=True)
    class ChunkDoc:
        def eval(self, doc_id, text):
            if text is None:
                return
            toks = [w for w in text.strip().lower().split() if w]
            for i in range(0, len(toks), CHUNK_TOKENS):
                c = toks[i : i + CHUNK_TOKENS]
                yield doc_id, i // CHUNK_TOKENS, " ".join(c), len(c)

    spark.udtf.register("chunk_doc", ChunkDoc)
    d = table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("__docs_for_chunking")
    return spark.sql(
        "SELECT c.* FROM __docs_for_chunking d, LATERAL chunk_doc(d.doc_id, d.text) c"
    )


# --- unigram-LM surprisal scoring (perplexity-proxy quality filter) ---------
@register(
    "quality_unigram_surprisal",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_WORDS_SQL}) AS tok FROM documents
    ),
    freq AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    total AS (SELECT SUM(c) AS n FROM freq),
    scored AS (
      SELECT t.doc_id, ln(CAST(n AS DOUBLE) / c) AS surprisal
      FROM toks t JOIN freq USING (tok) CROSS JOIN total
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           round(SUM(surprisal) / COUNT(*), 6) AS avg_surprisal
    FROM scored
    GROUP BY doc_id
    """,
)
def quality_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring (the CCNet-style LM filter with a
    unigram LM trained on the corpus itself): per-token surprisal
    -ln p(tok) from corpus frequencies, averaged per document. Documents
    full of corpus-typical words score low; gibberish and boilerplate-free
    outliers score high — the cheap first-pass proxy before a real LM pass.
    Two shuffles (corpus freq on tok, per-doc mean on doc_id); the token
    count (a bigint ratio inside ln) is identical on both engines and the
    final mean is rounded past last-ulp libm noise.

    Note the SUM(surprisal) accumulation: doubles, order-dependent at
    ~1e-15 relative — absorbed by the 6-dp rounding (values are O(1-10))."""
    d = table(spark, sf_dir, "documents")
    toks = _toks(d)
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = int(freq.agg(F.sum("c")).first()[0])  # one scalar to the driver
    scored = toks.join(freq, "tok").select(
        "doc_id", F.log(F.lit(float(total)) / F.col("c")).alias("surprisal")
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.sum("surprisal") / F.count(F.lit(1)), 6).alias("avg_surprisal"),
    )


# --- incremental snapshot dedup: new batch vs existing corpus ---------------
SNAPSHOT_MOD = 5  # docs with doc_id % 5 < 4 stand in for the existing corpus


@register(
    "dedup_incremental_batch",
    f"""
    WITH fp AS (
      SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
      FROM documents
    ),
    existing AS (SELECT DISTINCT fp FROM fp WHERE doc_id % {SNAPSHOT_MOD} < {SNAPSHOT_MOD - 1}),
    batch AS (SELECT doc_id, fp FROM fp WHERE doc_id % {SNAPSHOT_MOD} = {SNAPSHOT_MOD - 1}),
    labeled AS (
      SELECT b.doc_id,
             CASE WHEN e.fp IS NOT NULL THEN 'dup_of_corpus' ELSE 'new' END AS status
      FROM batch b LEFT JOIN existing e ON b.fp = e.fp
    )
    SELECT status, COUNT(*) AS n_docs
    FROM labeled
    GROUP BY status
    """,
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: an incoming batch (stand-in: doc_id %
    5 == 4) is checked against the EXISTING corpus's fingerprint set with
    one join — never rescanning the corpus pair space. This is how a 100 TB
    pipeline dedups daily increments: the fingerprint table is the persisted
    state (operators/incremental_state.py: write_fingerprint_state buckets
    it on fp), the batch joins against it in O(batch) via the shared
    probe_fingerprint_state operator, and only 'new' docs proceed to the
    expensive near-dup stages (the persisted round trip is
    tests/test_incremental_state.py's two-batch sequencing scenario)."""
    from fpl_data_pipeline_spark.operators.incremental_state import (
        probe_fingerprint_state,
    )

    d = table(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))).alias("fp"),
    )
    existing = (
        fp.filter(F.col("doc_id") % SNAPSHOT_MOD < SNAPSHOT_MOD - 1)
        .select("fp")
        .distinct()
    )
    batch = fp.filter(F.col("doc_id") % SNAPSHOT_MOD == SNAPSHOT_MOD - 1)
    labeled = probe_fingerprint_state(existing, batch)
    return labeled.groupBy("status").agg(F.count(F.lit(1)).alias("n_docs"))


# --- doc-length histogram (profiling) ---------------------------------------
@register(
    "doc_length_histogram",
    """
    SELECT CAST(least(n_chars // 100, 9) AS INT) AS bucket,
           COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY bucket
    """,
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram (100-char buckets, top-coded at 900+) —
    the profiling chart every corpus audit starts with; a pure
    bucket-projection + count shuffle."""
    d = table(spark, sf_dir, "documents")
    bucket = F.least(F.floor(F.col("n_chars") / 100), F.lit(9)).cast("int")
    return d.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


# --- grouped-map applyInPandas (per-language batch statistics) --------------
@register(
    "lang_stats_grouped_map",
    """
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           round(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS mean_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang
    """,
)
def lang_stats_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: each language's documents arrive as ONE
    pandas DataFrame and a vectorized summary comes back — the escape hatch
    for per-group logic Spark expressions can't say (sklearn fits, scipy
    tests, custom models per group). Completes the pandas API matrix
    (scalar pandas UDF / mapInPandas / cogrouped / WithState / UDTF are
    exercised elsewhere). Here the body is arithmetic the oracle replays,
    so the Arrow round-trip itself is value-checked. Scale: one shuffle on
    the group key; each group must fit one executor's memory — the operator
    contract for grouped-map everywhere."""
    import pandas as pd

    def stats(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = pdf["n_chars"].astype("int64")
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "n_docs": [len(pdf)],
                "total_chars": [int(n.sum())],
                "mean_chars": [round(int(n.sum()) / len(pdf), 6)],
                "min_chars": [int(n.min())],
                "max_chars": [int(n.max())],
            }
        )

    d = table(spark, sf_dir, "documents")
    return d.select("lang", "n_chars").groupBy("lang").applyInPandas(
        stats,
        "lang string, n_docs long, total_chars long, mean_chars double, "
        "min_chars long, max_chars long",
    )


# --- the corpus-release pipeline in one plan --------------------------------
@register(
    "corpus_release_summary",
    f"""
    WITH feat AS (
      SELECT doc_id, text,
             length(text) AS n_chars,
             len({_WORDS_SQL}) AS n_tokens,
             len(list_filter({_WORDS_SQL}, w -> w IN {_STOP!r})) AS n_stop,
             len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS n_punct
      FROM documents
    ),
    kept AS (
      SELECT doc_id, text, n_tokens FROM feat
      WHERE n_tokens >= 10
        AND CAST(n_stop AS DOUBLE) / n_tokens BETWEEN 0.05 AND 0.6
        AND CAST(n_punct AS DOUBLE) / n_chars < 0.1
    ),
    deduped AS (
      SELECT MIN(doc_id) AS doc_id, MAX(n_tokens) AS n_tokens
      FROM (SELECT doc_id, n_tokens,
                   md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
            FROM kept)
      GROUP BY fp
    ),
    split AS (
      SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                  THEN 'train' ELSE 'test' END AS split,
             n_tokens
      FROM deduped
    )
    SELECT split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(CEIL(CAST(SUM(n_tokens) AS DOUBLE) / {SEQ_LEN}) AS BIGINT) AS n_sequences
    FROM split
    GROUP BY split
    """,
)
def corpus_release_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data release pipeline as ONE logical plan: quality
    filters (C4 rules) -> exact dedup (md5 fingerprint, canonical keeper)
    -> deterministic content-hash train/test split -> per-split document,
    token and packed-sequence accounting. This is the go/no-go report a
    data release ships with; every stage is the oracle-checked operator
    registered individually elsewhere, composed here to prove the stages
    actually pipeline (Catalyst fuses the filter into the scan, the dedup
    and split share one shuffle chain). Near-dup stages slot in between
    dedup and split at scale (see dedup_apply_summary)."""
    d = table(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(F.lower("text"), r"\s+"),
        lambda w: w != "",
    )
    feat = d.select(
        "doc_id",
        "text",
        F.length("text").alias("n_chars"),
        F.size(ws).alias("n_tokens"),
        F.size(F.filter(ws, lambda w: w.isin(*_STOP))).alias("n_stop"),
        F.regexp_count("text", F.lit("[^a-zA-Z0-9 ]")).alias("n_punct"),
    )
    stop_r = F.col("n_stop").cast("double") / F.col("n_tokens")
    kept = feat.filter(
        (F.col("n_tokens") >= 10)
        & (stop_r >= 0.05)
        & (stop_r <= 0.6)
        & (F.col("n_punct").cast("double") / F.col("n_chars") < 0.1)
    )
    deduped = (
        kept.select(
            "doc_id",
            "n_tokens",
            F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))).alias("fp"),
        )
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.max("n_tokens").alias("n_tokens"))
    )
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "cc", "train"
    ).otherwise("test")
    return (
        deduped.select(split.alias("split"), "n_tokens")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.ceil(F.sum("n_tokens").cast("double") / SEQ_LEN).alias("n_sequences"),
        )
    )


# --- per-source unigram-distribution divergence (domain-drift detector) -----
@register(
    "source_token_divergence",
    f"""
    WITH toks AS (
      SELECT source, unnest({_WORDS_SQL}) AS tok FROM documents
    ),
    src AS (
      SELECT source, tok, COUNT(*) AS c_s FROM toks GROUP BY source, tok
    ),
    src_tot AS (
      SELECT source, SUM(c_s) AS n_s, COUNT(*) AS n_distinct_toks
      FROM src GROUP BY source
    ),
    corpus AS (SELECT tok, SUM(c_s) AS c FROM src GROUP BY tok),
    corpus_tot AS (SELECT SUM(c) AS n FROM corpus),
    terms AS (
      SELECT s.source,
             (CAST(s.c_s AS DOUBLE) / CAST(t.n_s AS DOUBLE))
               * ln((CAST(s.c_s AS DOUBLE) / CAST(t.n_s AS DOUBLE))
                    / (CAST(g.c AS DOUBLE) / CAST(ct.n AS DOUBLE))) AS term
      FROM src s
      JOIN src_tot t USING (source)
      JOIN corpus g USING (tok)
      CROSS JOIN corpus_tot ct
    )
    SELECT t.source,
           CAST(t.n_s AS BIGINT) AS n_tokens,
           t.n_distinct_toks,
           round(SUM(term), 9) AS kl_divergence
    FROM terms JOIN src_tot t USING (source)
    GROUP BY t.source, t.n_s, t.n_distinct_toks
    """,
)
def source_token_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-drift detector: KL(source ‖ corpus) over unigram
    distributions — the monitoring op a training-data pipeline runs per
    ingest source to catch a crawler or feed whose language suddenly
    shifts (spam floods, encoding breakage, topic drift). Every token the
    source emits appears in the corpus distribution by construction, so
    the divergence is always finite.

    Scale shape: one explode + two hash aggregations (source×tok, then
    tok), a bigint-keyed join of per-source counts against corpus counts,
    and a per-source sum — all map-side-combinable; the corpus total is a
    broadcast scalar. Double KL terms accumulate order-dependently at
    ~1e-15 relative; the 9-dp round on O(0.01-1) values absorbs it
    (the surprisal query's proven idiom)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(
            F.filter(
                F.split(F.lower("text"), r"\s+"),
                lambda w: w != "",
            )
        ).alias("tok"),
    )
    # round-11 pin: ``src`` feeds FOUR consumers (src_tot, corpus — and
    # through them corpus_tot — plus the terms join), so without pinning the
    # tokenize-explode + (source, tok) aggregation compiled and ran once per
    # consumer (5 parquet scans of documents in the r11 before-plan). The
    # pinned relation is vocabulary-sized per source — far smaller than the
    # token stream it replaces.
    src = (
        toks.groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c_s"))
        .localCheckpoint(eager=False)
    )
    src_tot = src.groupBy("source").agg(
        F.sum("c_s").alias("n_s"), F.count(F.lit(1)).alias("n_distinct_toks")
    )
    corpus = src.groupBy("tok").agg(F.sum("c_s").alias("c"))
    corpus_tot = corpus.agg(F.sum("c").alias("n"))
    p = F.col("c_s").cast("double") / F.col("n_s").cast("double")
    q = F.col("c").cast("double") / F.col("n").cast("double")
    terms = (
        src.join(F.broadcast(src_tot), "source")
        .join(corpus, "tok")
        .crossJoin(F.broadcast(corpus_tot))
        .select("source", (p * F.log(p / q)).alias("term"))
    )
    return (
        terms.groupBy("source")
        .agg(F.round(F.sum("term"), 9).alias("kl_divergence"))
        .join(F.broadcast(src_tot), "source")
        .select(
            "source",
            F.col("n_s").alias("n_tokens"),
            "n_distinct_toks",
            "kl_divergence",
        )
    )


# --- token-budget curriculum plan (mixing planner) --------------------------
TOKEN_BUDGET = 20_000  # total training-token budget for the plan


@register(
    "token_budget_plan",
    f"""
    WITH doc_toks AS (
      SELECT doc_id, source, len({_WORDS_SQL}) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR) || ':curriculum') AS pick_key
      FROM documents
    ),
    shares AS (
      SELECT source, COUNT(*) AS n_docs FROM doc_toks GROUP BY source
    ),
    tot AS (SELECT COUNT(*) AS n_sources FROM shares),
    budgets AS (
      SELECT s.source,
             CAST(floor({TOKEN_BUDGET} * (1.0 / t.n_sources) + 0.5) AS BIGINT)
               AS token_budget
      FROM shares s CROSS JOIN tot t
    ),
    ordered AS (
      SELECT d.doc_id, d.source, d.n_tokens, b.token_budget,
             SUM(d.n_tokens) OVER (
               PARTITION BY d.source
               ORDER BY d.pick_key ASC, d.doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_tokens
      FROM doc_toks d JOIN budgets b USING (source)
    ),
    kept AS (SELECT * FROM ordered WHERE cum_tokens <= token_budget)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS docs_kept,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept,
           CAST(MIN(token_budget) AS BIGINT) AS token_budget,
           CAST(SUM(n_tokens) AS DOUBLE) / MIN(token_budget) AS utilization
    FROM kept
    GROUP BY source
    """,
)
def token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixing planner: split a global training-token budget across sources
    (uniform target mix here — any weight vector slots in, cf.
    domain_mixture_weights), then deterministically select documents per
    source — hash-shuffled order, greedy running-token cutoff — until each
    source's budget is exhausted. The output is the per-source audit line a
    release pipeline stores with the mix: docs/tokens kept, budget,
    utilization.

    Scale shape: one token-count scan, a broadcast per-source budget map,
    and ONE window (partitioned by source, ordered by the content hash) for
    the running cumsum — no driver loops, no global sort; at 100 TB the
    window shuffles once on source (salt hot sources into sub-partitions
    and cap per-salt budget for extreme skew)."""
    d = table(spark, sf_dir, "documents")
    doc_toks = d.select(
        "doc_id",
        "source",
        F.size(
            F.filter(
                F.split(F.lower("text"), r"\s+"),
                lambda w: w != "",
            )
        ).alias("n_tokens"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":curriculum"))).alias(
            "pick_key"
        ),
    )
    shares = doc_toks.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = shares.agg(F.count(F.lit(1)).alias("n_sources"))
    budgets = shares.crossJoin(F.broadcast(tot)).select(
        "source",
        F.floor(
            F.lit(float(TOKEN_BUDGET)) * (F.lit(1.0) / F.col("n_sources")) + F.lit(0.5)
        )
        .cast("long")
        .alias("token_budget"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.asc("pick_key"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ordered = doc_toks.join(F.broadcast(budgets), "source").withColumn(
        "cum_tokens", F.sum("n_tokens").over(w)
    )
    kept = ordered.filter(F.col("cum_tokens") <= F.col("token_budget"))
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs_kept"),
        F.sum("n_tokens").alias("tokens_kept"),
        F.min("token_budget").alias("token_budget"),
        (F.sum("n_tokens").cast("double") / F.min("token_budget")).alias("utilization"),
    )


# --- corpus snapshot diff (release-to-release accounting) -------------------
# Stand-in snapshots derived deterministically from one table: the "old"
# release drops doc_id % 11 == 0, the "new" release drops doc_id % 13 == 0
# and rewrites the text of doc_id % 17 == 0 (an upstream re-crawl).
OLD_DROP_MOD = 11
NEW_DROP_MOD = 13
REWRITE_MOD = 17


@register(
    "corpus_snapshot_diff",
    f"""
    WITH old_snap AS (
      SELECT doc_id, source,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
      FROM documents WHERE doc_id % {OLD_DROP_MOD} <> 0
    ),
    new_snap AS (
      SELECT doc_id, source,
             md5(lower(trim(regexp_replace(
               CASE WHEN doc_id % {REWRITE_MOD} = 0
                    THEN text || ' recrawled' ELSE text END,
               '\\s+', ' ', 'g')))) AS fp
      FROM documents WHERE doc_id % {NEW_DROP_MOD} <> 0
    ),
    joined AS (
      SELECT COALESCE(o.source, n.source) AS source,
             CASE
               WHEN o.doc_id IS NULL THEN 'added'
               WHEN n.doc_id IS NULL THEN 'removed'
               WHEN o.fp = n.fp THEN 'unchanged'
               ELSE 'changed'
             END AS status
      FROM old_snap o FULL OUTER JOIN new_snap n ON o.doc_id = n.doc_id
    )
    SELECT source, status, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM joined
    GROUP BY source, status
    """,
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-to-release corpus accounting: full-outer join of two
    snapshots on doc_id, per-doc status from presence + content
    fingerprint (added / removed / changed / unchanged), rolled up per
    source — the diff table a release pipeline publishes with every new
    corpus version so consumers see churn before retraining.

    Scale shape: one shuffle on doc_id for the full-outer join (at 100 TB
    both snapshots are bucketed on doc_id — sources/bucketing.py — making
    the diff co-located and shuffle-free) and one hash aggregate on
    (source, status); fingerprints are computed scan-side."""
    d = table(spark, sf_dir, "documents")
    fp = lambda c: F.md5(F.lower(F.trim(F.regexp_replace(c, r"\s+", " "))))  # noqa: E731
    old_snap = d.filter(F.col("doc_id") % OLD_DROP_MOD != 0).select(
        F.col("doc_id").alias("o_id"),
        F.col("source").alias("o_source"),
        fp(F.col("text")).alias("o_fp"),
    )
    new_text = F.when(
        F.col("doc_id") % REWRITE_MOD == 0, F.concat(F.col("text"), F.lit(" recrawled"))
    ).otherwise(F.col("text"))
    new_snap = d.filter(F.col("doc_id") % NEW_DROP_MOD != 0).select(
        F.col("doc_id").alias("n_id"),
        F.col("source").alias("n_source"),
        fp(new_text).alias("n_fp"),
    )
    joined = old_snap.join(new_snap, old_snap.o_id == new_snap.n_id, "full_outer")
    status = (
        F.when(F.col("o_id").isNull(), "added")
        .when(F.col("n_id").isNull(), "removed")
        .when(F.col("o_fp") == F.col("n_fp"), "unchanged")
        .otherwise("changed")
    )
    return (
        joined.select(
            F.coalesce("o_source", "n_source").alias("source"), status.alias("status")
        )
        .groupBy("source", "status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --- hybrid retrieval: BM25 lexical candidates + embedding cosine rerank ----
HS_TERMS = ("spark", "window", "merge")  # the tokenized keyword query
HS_K1 = 1.2
HS_B = 0.75
HS_LEX_TOPN = 20
HS_FINAL_K = 10
_HS_TERMS_SQL = "(" + ", ".join(f"'{t}'" for t in HS_TERMS) + ")"
_HS_DOT = (
    "list_reduce(list_transform(range(1, 65), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (x, y) -> x + y)"
)


@register(
    "hybrid_search_topk",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_WORDS_SQL}) AS tok FROM documents
    ),
    dls AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS total_toks FROM dls
    ),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM toks
      WHERE tok IN {_HS_TERMS_SQL}
      GROUP BY doc_id, tok
    ),
    df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    scored AS (
      SELECT t.doc_id,
             ln((CAST(s.n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
               * (t.tf * ({HS_K1} + 1.0))
               / (t.tf + {HS_K1} * (1.0 - {HS_B}
                    + {HS_B} * d.dl
                        / (CAST(s.total_toks AS DOUBLE) / s.n_docs))) AS term_score
      FROM tf t
      JOIN df USING (tok)
      JOIN dls d ON d.doc_id = t.doc_id
      CROSS JOIN stats s
    ),
    bm25 AS (
      SELECT doc_id, round(SUM(term_score), 6) AS bm25
      FROM scored GROUP BY doc_id
    ),
    lex AS (
      SELECT doc_id, bm25 FROM (
        SELECT doc_id, bm25,
               row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rn
        FROM bm25
      ) WHERE rn <= {HS_LEX_TOPN}
    ),
    qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0)
    SELECT l.doc_id, l.bm25,
           {_HS_DOT.format(a='e.embedding', b='qv.q')}
             / (sqrt({_HS_DOT.format(a='e.embedding', b='e.embedding')})
                * sqrt({_HS_DOT.format(a='qv.q', b='qv.q')})) AS cosine
    FROM lex l
    JOIN embeddings e ON e.vec_id = l.doc_id
    CROSS JOIN qv
    ORDER BY cosine DESC, l.doc_id ASC
    LIMIT {HS_FINAL_K}
    """,
)
def hybrid_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval, the RAG-serving shape — the ORACLED INSTANTIATION
    of :func:`hybrid_search` (terms = HS_TERMS, query vector = embedding of
    vec 0; a real serving path injects the user's tokenized query and the
    encoder's output vector instead)."""
    return hybrid_search(
        spark,
        table(spark, sf_dir, "documents"),
        table(spark, sf_dir, "embeddings"),
        HS_TERMS,
        query_vec_id=0,
    )


def hybrid_search(
    spark: SparkSession,
    docs: DataFrame,
    emb: DataFrame,
    terms,
    query_vec=None,
    *,
    query_vec_id=None,
    k1: float = HS_K1,
    b: float = HS_B,
    lex_topn: int = HS_LEX_TOPN,
    final_k: int = HS_FINAL_K,
) -> DataFrame:
    """Reusable hybrid-retrieval primitive: BM25 keyword scoring
    (corpus-derived idf, length-normalized tf) over ``docs`` selects the
    lexical top-``lex_topn``, then the ``emb`` embedding column reranks
    those candidates by cosine against the query vector. Only the
    candidates' vectors are ever scored, which is the point: lexical
    recall at scan cost, semantic precision at k-vector cost.

    The query is INJECTED: ``terms`` is the tokenized keyword query, and
    the query embedding is either ``query_vec`` (a Python list of floats —
    the encoder output) or ``query_vec_id`` (lookup into ``emb``).

    Scale shape: tf/df/doclen are hash aggregates over one tokenized scan;
    corpus stats broadcast as a 1-row scalar; the rerank joins a TOP-N row
    set (broadcast) against the 1:1 embeddings table — no corpus-wide
    vector math. BM25 term sums are rounded 6dp (surprisal's proven idiom)
    so double accumulation order cannot flip the candidate cut."""
    if (query_vec is None) == (query_vec_id is None):
        raise ValueError("provide exactly one of query_vec / query_vec_id")
    # dedupe the injected keyword list (the old groupBy(doc_id, tok) shape
    # collapsed duplicates implicitly; the per-term columns below must not
    # double-count one)
    terms = list(dict.fromkeys(terms))
    toks = _toks(docs)
    # Round-11 single-pass BM25 (guide §2.3/§2.4): the old shape tokenized
    # the corpus FOUR times (dls, stats-via-dls, tf, and scored's dls join —
    # 6 parquet scans in the r11 before-plan) and paid a (doc, term) shuffle
    # plus a df shuffle plus a dls join. The keyword query is a SMALL FIXED
    # list, so per-doc length and one conditional count per term fit in ONE
    # groupBy(doc_id) over one tokenized scan; corpus stats and per-term
    # document frequencies then come from one scalar aggregation of that
    # per-doc frame (broadcast back as a 1-row cross join). Per-term scores
    # are the same expressions over the same integers, summed in fixed term
    # order instead of arbitrary row order — inside the 6-dp round that
    # already absorbs double accumulation-order noise (a term with tf = 0
    # contributes exactly +0.0: idf > 0 always, 0/(0 + k1·norm) = +0.0).
    # Docs matching no term are filtered out, mirroring the old inner tf
    # relation; docs with no tokens never appear, as before.
    per_doc = (
        toks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("dl"),
            *[
                F.sum(F.when(F.col("tok") == t, 1).otherwise(0)).alias(f"tf_{i}")
                for i in range(len(terms))
                for t in [terms[i]]
            ],
        )
        # feeds the scalar stats agg AND the scoring pass below
        .localCheckpoint(eager=False)
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_toks"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    avgdl = F.col("total_toks").cast("double") / F.col("n_docs")

    def _term_score(i: int):
        tf = F.col(f"tf_{i}")
        idf = F.log(
            (F.col("n_docs").cast("double") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
            + F.lit(1.0)
        )
        return (
            idf
            * (tf * F.lit(k1 + 1.0))
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl))
        )

    any_term = None
    for i in range(len(terms)):
        c = F.col(f"tf_{i}") > 0
        any_term = c if any_term is None else (any_term | c)
    bm25 = (
        per_doc.crossJoin(F.broadcast(stats))
        .filter(any_term)
        .select(
            "doc_id",
            F.round(
                sum((_term_score(i) for i in range(len(terms))), F.lit(0.0)), 6
            ).alias("bm25"),
        )
    )
    # TakeOrderedAndProject, not a global row_number window: per-partition
    # heaps + a k-row driver merge, no single-task global sort at scale
    lex = bm25.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()).limit(lex_topn)
    if query_vec is not None:
        qv = spark.createDataFrame(
            [([float(x) for x in query_vec],)], "q array<double>"
        )
    else:
        qv = emb.filter(F.col("vec_id") == query_vec_id).select(
            F.col("embedding").alias("q")
        )

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    j = (
        F.broadcast(lex)
        .join(emb, F.col("vec_id") == F.col("doc_id"))
        .crossJoin(F.broadcast(qv))
    )
    cos = _dot("embedding", "q") / (
        F.sqrt(_dot("embedding", "embedding")) * F.sqrt(_dot("q", "q"))
    )
    return (
        j.select("doc_id", "bm25", cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("doc_id").asc())
        .limit(final_k)
    )


# --- Bloom-filter blocklist membership (round 4) ----------------------------
BLOOM_BITS = 4096  # m: filter width in bits
BLOOM_K = 4  # k: hash functions per element


def _bloom_pos_sql(expr: str, j: int) -> str:
    """DuckDB: j-th Bloom bit position of a fingerprint string."""
    return f"(('0x' || substr(md5({expr} || ':{j}'), 1, 8))::BIGINT % {BLOOM_BITS})"


def _bloom_pos(col, j: int):
    """Spark twin of _bloom_pos_sql (same md5-substring hash family)."""
    return (
        F.conv(F.substring(F.md5(F.concat(col, F.lit(f":{j}"))), 1, 8), 16, 10)
        .cast("long")
        % BLOOM_BITS
    )


@register(
    "bloom_blocklist_summary",
    f"""
    WITH fps AS (
      SELECT doc_id, md5({_NORM}) AS fp FROM documents
    ),
    block AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 97 = 0),
    bits AS (
      SELECT DISTINCT pos FROM (
        {' UNION ALL '.join(f'SELECT {_bloom_pos_sql("fp", j)} AS pos FROM block' for j in range(BLOOM_K))}
      )
    ),
    corpus AS (SELECT doc_id, fp FROM fps WHERE doc_id % 97 <> 0),
    probes AS (
      {' UNION ALL '.join(f'SELECT doc_id, {_bloom_pos_sql("fp", j)} AS pos FROM corpus' for j in range(BLOOM_K))}
    ),
    hits AS (
      SELECT p.doc_id, COUNT(*) AS n_hit
      FROM probes p JOIN bits b USING (pos)
      GROUP BY p.doc_id
    ),
    flagged AS (SELECT doc_id FROM hits WHERE n_hit = {BLOOM_K}),
    truth AS (
      SELECT DISTINCT c.doc_id
      FROM corpus c JOIN block b ON c.fp = b.fp
    )
    SELECT (SELECT COUNT(*) FROM corpus) AS n_probed,
           (SELECT COUNT(*) FROM flagged) AS n_flagged,
           (SELECT COUNT(*) FROM truth) AS n_true_members,
           (SELECT COUNT(*) FROM flagged) - (SELECT COUNT(*) FROM truth)
             AS n_false_positives,
           CAST((SELECT COUNT(*) FROM flagged) - (SELECT COUNT(*) FROM truth)
                AS DOUBLE)
             / (SELECT COUNT(*) FROM corpus) AS fp_rate
    """,
)
def bloom_blocklist_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter blocklist screening — the constant-space way a 100 TB
    pipeline drops blocklisted documents (eval-set members, DMCA'd pages,
    prior-release dups) without joining against the full blocklist: the
    blocklist's fingerprints are folded into an m=4096-bit / k=4 filter,
    every corpus document probes its k bit positions, and a document is
    flagged only when ALL k bits are set. Reports the realized
    false-positive rate against exact membership (the filter admits no
    false negatives by construction — every true member is flagged).

    Here the filter's set-bit SET is materialized as a tiny relation and the
    probe is a k-row equi-join + count(k) gate, which keeps every stage an
    oracle-checkable relational op; a production deployment folds `bits`
    into a broadcast bitmap (same positions, same verdicts). Flagged docs
    whose fingerprint is NOT in the blocklist are the measured fp_rate —
    the quantity that sizes m for a real release.
    """
    d = table(spark, sf_dir, "documents")
    fps = d.select(
        "doc_id", F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))).alias("fp")
    ).localCheckpoint()
    block = fps.filter(F.col("doc_id") % 97 == 0).select("fp").distinct()
    corpus = fps.filter(F.col("doc_id") % 97 != 0)
    bits = None
    for j in range(BLOOM_K):
        p = block.select(_bloom_pos(F.col("fp"), j).alias("pos"))
        bits = p if bits is None else bits.unionAll(p)
    bits = bits.distinct()
    probes = None
    for j in range(BLOOM_K):
        p = corpus.select("doc_id", _bloom_pos(F.col("fp"), j).alias("pos"))
        probes = p if probes is None else probes.unionAll(p)
    flagged = (
        probes.join(F.broadcast(bits), "pos")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .filter(F.col("n_hit") == BLOOM_K)
        .select("doc_id")
    )
    truth = corpus.join(F.broadcast(block), "fp").select("doc_id").distinct()
    # singleton aggregates composed in-plan (no driver-side counts): each is
    # one row, so the crossJoins broadcast scalars — same shape as the
    # oracle's scalar subqueries
    return (
        corpus.agg(F.count(F.lit(1)).alias("n_probed"))
        .crossJoin(flagged.agg(F.count(F.lit(1)).alias("n_flagged")))
        .crossJoin(truth.agg(F.count(F.lit(1)).alias("n_true_members")))
        .select(
            "n_probed",
            "n_flagged",
            "n_true_members",
            (F.col("n_flagged") - F.col("n_true_members")).alias("n_false_positives"),
            (
                (F.col("n_flagged") - F.col("n_true_members")).cast("double")
                / F.col("n_probed")
            ).alias("fp_rate"),
        )
    )


# --- BPE merge-candidate statistics (round 4) -------------------------------
@register(
    "bpe_pair_stats",
    f"""
    WITH toks AS (
      SELECT unnest({_WORDS_SQL}) AS word FROM documents
    ),
    vocab AS (SELECT word, COUNT(*) AS freq FROM toks GROUP BY word),
    pairs AS (
      SELECT substr(word, i, 2) AS pair, freq
      FROM vocab, unnest(range(1, length(word))) AS t(i)
      WHERE length(word) >= 2
    )
    SELECT pair,
           CAST(SUM(freq) AS BIGINT) AS pair_count,
           CAST(COUNT(*) AS BIGINT) AS n_vocab_positions
    FROM pairs
    GROUP BY pair
    ORDER BY pair_count DESC, pair ASC
    LIMIT 20
    """,
)
def bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The counting core of BPE tokenizer training, step 1: corpus-weighted
    frequency of every adjacent symbol pair, highest first — the next merge
    a BPE trainer would make. Computed the way tokenizer training actually
    scales: the corpus collapses to a (word, freq) vocabulary FIRST (one
    hash agg — vocabulary is tiny relative to the corpus), then pairs are
    generated per distinct word and weighted by freq, so the pair explode
    costs O(|vocab| x word_len), not O(corpus tokens). Position multiplicity
    counts ('aaa' contributes 'aa' twice per occurrence), matching the BPE
    definition; n_vocab_positions rides along as the distinct-position
    count.
    """
    d = table(spark, sf_dir, "documents")
    toks = _toks(d).select(F.col("tok").alias("word"))
    vocab = toks.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    # positional (non-distinct) adjacent pairs; sequence(1, 0) is DESCENDING
    # in Spark, so short words are CASE-guarded out (same hazard as shingles)
    pair_arr = F.when(
        F.length("word") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length("word") - 1),
            lambda i: F.col("word").substr(i, F.lit(2)),
        ),
    )
    pairs = vocab.select(F.explode(pair_arr).alias("pair"), "freq")
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("freq").alias("pair_count"),
            F.count(F.lit(1)).alias("n_vocab_positions"),
        )
        .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
        .limit(20)
    )


# --- per-source volume trend (exact closed-form OLS) ------------------------
@register(
    "source_trend_slopes",
    """
    WITH base AS (
      SELECT source, (doc_id % 30) AS x
      FROM documents
    ),
    counts AS (SELECT source, x, COUNT(*) AS y FROM base GROUP BY source, x),
    moments AS (
      SELECT source,
             COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM counts GROUP BY source
    )
    SELECT source, n AS n_points,
           FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (n * sxx - sx * sx) * 1000000 + 0.5) / 1000000 AS slope,
           FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                 * CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE))
                 * 1000000 + 0.5) / 1000000 AS r2
    FROM moments
    ORDER BY source
    """,
)
def source_trend_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ingest-volume trend: closed-form OLS slope + r^2 of doc
    count over a rolling 30-slot time proxy (doc_id % 30 — the synthetic
    corpus has no ingest date; swap the x expression for
    datediff(ingest_day, min_day) on real data; the estimator is
    unchanged). A source whose slope turns negative is drying up; r^2
    near 0 says the volume is noise, not trend — the feed-health monitor
    next to source_token_divergence's CONTENT drift.

    Exactness: every OLS moment (Σx, Σy, Σxy, Σx², Σy²) is an integer sum
    — bitwise identical on both engines — and the only floating point is
    the final slope/r² division, 6-dp portable-rounded. One two-key hash
    aggregate + one per-source aggregate; no windows, no driver math."""
    d = table(spark, sf_dir, "documents")
    counts = (
        d.select("source", (F.col("doc_id") % 30).alias("x"))
        .groupBy("source", "x")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    m = counts.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    a = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    b = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    c = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    q6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return (
        m.select(
            "source",
            F.col("n").alias("n_points"),
            q6(a.cast("double") / b).alias("slope"),
            q6(a.cast("double") * a.cast("double") / (b.cast("double") * c.cast("double"))).alias("r2"),
        )
        .orderBy("source")
    )


# --- per-document n-gram novelty: the data-valuation signal ------------------
# "How much of this document's content exists nowhere else in the corpus?"
# is the selection signal data-pruning work ranks training documents by
# (high-novelty docs carry information the model sees nowhere else; zero-
# novelty docs are pure boilerplate/mirrors). Novelty(doc) = fraction of its
# DISTINCT word-3-gram shingles whose corpus document-frequency is 1. Exact,
# corpus-relative, and cheap: one shingle explode (shared shape with the
# dedup family), one df hash-agg, one per-doc hash-agg — NO pair join at
# all, so unlike the Jaccard family it needs no df cap to stay linear.
@register(
    "doc_novelty_scores",
    """
    WITH norm AS (
      SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
      FROM documents
    ),
    words AS (SELECT doc_id, string_split(t, ' ') AS ws FROM norm),
    grams AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(ws) - 1, 1)),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS gs
      FROM words
    ),
    exploded AS (SELECT doc_id, unnest(gs) AS shingle FROM grams),
    freq AS (SELECT shingle, COUNT(*) AS df FROM exploded GROUP BY shingle),
    per_doc AS (
      SELECT e.doc_id,
             COUNT(*) AS n_shingles,
             SUM(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS n_unique
      FROM exploded e JOIN freq f USING (shingle)
      GROUP BY e.doc_id
    ),
    scored AS (
      SELECT d.source, p.n_shingles, p.n_unique,
             CAST(FLOOR(CAST(p.n_unique AS DOUBLE) / p.n_shingles * 1000000
                        + 0.5) AS BIGINT) AS nov6
      FROM per_doc p JOIN documents d USING (doc_id)
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(nov6) AS DOUBLE) / COUNT(*) / 1000000 AS avg_novelty,
           CAST(SUM(CASE WHEN n_unique = n_shingles THEN 1 ELSE 0 END)
             AS BIGINT) AS n_fully_novel,
           CAST(SUM(CASE WHEN n_unique = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_novel
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
)
def doc_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source novelty profile: mean share of corpus-unique 3-gram
    shingles per document, plus the fully-novel and zero-novel (pure
    boilerplate) document counts — the corpus-curation ranking signal.

    Portability: per-doc novelty is quantized to integer micro-units
    (floor(x*1e6+0.5) -> BIGINT) so the per-source mean is a ratio of exact
    integers on both engines — no double-accumulation order anywhere."""
    d = table(spark, sf_dir, "documents")
    sh = shingles(d)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        sh.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("df") == 1).cast("long")).alias("n_unique"),
        )
    )
    scored = per_doc.join(d.select("doc_id", "source"), "doc_id").withColumn(
        "nov6",
        F.floor(
            F.col("n_unique").cast("double") / F.col("n_shingles") * 1000000
            + F.lit(0.5)
        ).cast("long"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.sum("nov6").cast("double") / F.count(F.lit(1)) / F.lit(1000000)
            ).alias("avg_novelty"),
            F.sum((F.col("n_unique") == F.col("n_shingles")).cast("long")).alias(
                "n_fully_novel"
            ),
            F.sum((F.col("n_unique") == 0).cast("long")).alias("n_zero_novel"),
        )
        .orderBy("source")
    )


# --- held-out LM perplexity: train/eval split hygiene -----------------------
# quality_bigram_surprisal scores the corpus with a model fitted on the
# SAME corpus — fine for relative filtering, but a real LM quality gate
# must evaluate on text the model never counted, or memorized boilerplate
# looks like fluency. This query does the split properly: the bigram model
# (add-k smoothed, k=1/2) is fitted ONLY on the md5-bucket train 80%, and
# perplexity is measured ONLY on the held-out 20% — the hash split is the
# same repartition-stable one split_train_test uses, so train/test
# membership is reproducible anywhere. Surprisal terms are 9-dp-rounded
# lns summed in exact decimal (the KL convention); the model join is a
# plain equi-join on the bigram (no broadcast assumption: the count table
# scales with train vocab).
LM_ADDK_NUM, LM_ADDK_DEN = 1, 2  # add-k with k = 1/2, exact rational


@register(
    "lm_heldout_perplexity",
    f"""
    WITH split AS (
      SELECT doc_id, source,
             list_filter(string_split(
               lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '),
               w -> w <> '') AS ws,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                  THEN 'train' ELSE 'test' END AS part
      FROM documents
    ),
    train_bi AS (
      SELECT w1, w2, COUNT(*) AS c12 FROM (
        SELECT unnest(list_transform(range(1, greatest(len(ws), 1)),
                                     i -> {{'w1': ws[i], 'w2': ws[i+1]}})) AS u
        FROM split WHERE part = 'train'
      ) t, LATERAL (SELECT u.w1 AS w1, u.w2 AS w2) x
      GROUP BY w1, w2
    ),
    train_uni AS (
      SELECT w1, SUM(c12) AS c1 FROM train_bi GROUP BY w1
    ),
    vocab AS (SELECT COUNT(*) AS v FROM (SELECT DISTINCT w1 FROM train_bi)),
    test_bi AS (
      SELECT source, u.w1 AS w1, u.w2 AS w2 FROM (
        SELECT source,
               unnest(list_transform(range(1, greatest(len(ws), 1)),
                                     i -> {{'w1': ws[i], 'w2': ws[i+1]}})) AS u
        FROM split WHERE part = 'test'
      ) t
    ),
    scored AS (
      SELECT s.source,
             CASE WHEN b.c12 IS NULL AND u.c1 IS NULL THEN 1 ELSE 0 END AS oov,
             CAST(FLOOR(-ln(
               (COALESCE(b.c12, 0) + CAST({LM_ADDK_NUM} AS DOUBLE) / {LM_ADDK_DEN})
               / (COALESCE(u.c1, 0)
                  + CAST({LM_ADDK_NUM} AS DOUBLE) / {LM_ADDK_DEN} * (SELECT v FROM vocab))
             ) * 1000000000 + 0.5) AS DECIMAL(28,0)) AS s9
      FROM test_bi s
      LEFT JOIN train_bi b ON b.w1 = s.w1 AND b.w2 = s.w2
      LEFT JOIN train_uni u ON u.w1 = s.w1
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_test_bigrams,
           CAST(SUM(CASE WHEN oov = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov_history,
           FLOOR(CAST(SUM(s9) AS DOUBLE) / 1000000000 / COUNT(*) * 1000000
                 + 0.5) / 1000000 AS avg_surprisal
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
)
def lm_heldout_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out bigram-LM surprisal per source: model counts fitted on the
    80% hash-split train docs only, evaluated on the 20% held-out docs with
    add-1/2 smoothing over the train vocabulary."""
    d = table(spark, sf_dir, "documents")
    ws = _words_col(F.col("text"))
    split = d.select(
        "doc_id",
        "source",
        ws.alias("ws"),
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "cc", "train"
        ).otherwise("test").alias("part"),
    )
    bigrams = F.when(
        F.size("ws") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("ws") - 1),
            lambda i: F.struct(
                F.element_at(F.col("ws"), i).alias("w1"),
                F.element_at(F.col("ws"), i + 1).alias("w2"),
            ),
        ),
    )
    train_bi = (
        split.filter(F.col("part") == "train")
        .select(F.explode(bigrams).alias("u"))
        .select(F.col("u.w1").alias("w1"), F.col("u.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    train_uni = train_bi.groupBy("w1").agg(F.sum("c12").alias("c1"))
    v = train_bi.select("w1").distinct().count()
    test_bi = (
        split.filter(F.col("part") == "test")
        .select("source", F.explode(bigrams).alias("u"))
        .select("source", F.col("u.w1").alias("w1"), F.col("u.w2").alias("w2"))
    )
    k = float(LM_ADDK_NUM) / LM_ADDK_DEN
    prob = (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(k)) / (
        F.coalesce(F.col("c1"), F.lit(0)) + F.lit(k) * F.lit(float(v))
    )
    s9 = F.floor(-F.log(prob) * 1000000000 + F.lit(0.5)).cast("decimal(28,0)")
    scored = (
        test_bi.join(train_bi, ["w1", "w2"], "left")
        .join(train_uni, "w1", "left")
        .select(
            "source",
            (F.col("c12").isNull() & F.col("c1").isNull()).cast("int").alias("oov"),
            s9.alias("s9"),
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_test_bigrams"),
            F.sum((F.col("oov") == 1).cast("long")).alias("n_oov_history"),
            (
                F.floor(
                    F.sum("s9").cast("double") / 1000000000 / F.count(F.lit(1))
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("avg_surprisal"),
        )
        .orderBy("source")
    )


def _words_col(col):
    """normalized word array (module-local mirror of the dedup helper).

    Round-12: delegates to the one-pass tokenizer (dedup._norm_words) —
    token-identical to the collapse-then-split it mirrored (round-11
    A/B-verified corpus-wide), one regex pass per doc."""
    from fpl_data_pipeline_spark.operators.dedup import _norm_words

    return _norm_words(col)


# --- source-pair Jensen-Shannon matrix (feed-sibling detector) --------------


@register(
    "source_js_matrix",
    f"""
    WITH toks AS (
      SELECT source, unnest({_WORDS_SQL}) AS tok FROM documents
    ),
    src AS (
      SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY source, tok
    ),
    tot AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM src GROUP BY source
    ),
    srcs AS (SELECT DISTINCT source FROM src),
    d AS (
      SELECT s1.source AS a, s2.source AS b,
             SUM((CAST(s1.c AS DOUBLE) / t1.n)
                 * ln(2.0 * (CAST(s1.c AS DOUBLE) / t1.n)
                      / ((CAST(s1.c AS DOUBLE) / t1.n)
                         + COALESCE(CAST(sq.c AS DOUBLE) / t2.n, 0.0)))) AS dk
      FROM src s1
      JOIN tot t1 ON t1.source = s1.source
      CROSS JOIN srcs s2
      JOIN tot t2 ON t2.source = s2.source
      LEFT JOIN src sq ON sq.source = s2.source AND sq.tok = s1.tok
      WHERE s2.source <> s1.source
      GROUP BY s1.source, s2.source
    )
    SELECT x.a AS source_a, x.b AS source_b,
           round(0.5 * (x.dk + y.dk), 9) AS js_q
    FROM d x JOIN d y ON y.a = x.b AND y.b = x.a
    WHERE x.a < x.b
    ORDER BY js_q ASC, source_a ASC, source_b ASC
    """,
)
def source_js_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between every two sources' unigram
    distributions — the feed-SIBLING detector: a near-zero pair means two
    ingestion sources serve the same content population (mirror, aggregator,
    rebrand) and should share one dedup/quota budget; `source_token_divergence`
    scores each source against the corpus, `dedup_cross_source_matrix` counts
    literal shared documents — this finds sources that are statistically the
    same feed even with zero exact duplicates.

    JS(A,B) = 0.5*KL(A||M) + 0.5*KL(B||M), M the midpoint mixture; computed
    as two directed left-join sums (terms absent from the owning side
    contribute zero by construction).  Scale shape: one (source, tok) hash
    agg over the corpus; the pair fan-out is |sources|-bounded (8 here —
    a broadcast dim), so the joins grow linearly with vocabulary, never with
    pairs x corpus.  Same 9-dp summation convention as the KL query
    (driver-green empirically; terms are O(p*ln) magnitudes).
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(_words_col(F.col("text"))).alias("tok"))
    src = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    tot = src.groupBy("source").agg(F.sum("c").alias("n"))
    srcs = src.select("source").distinct().withColumnRenamed("source", "b_source")
    s1 = (
        src.join(tot, "source")
        .withColumnRenamed("source", "a_source")
        .withColumnRenamed("c", "c_a")
        .withColumnRenamed("n", "n_a")
    )
    sq = (
        src.withColumnRenamed("source", "q_source")
        .withColumnRenamed("tok", "q_tok")
        .withColumnRenamed("c", "c_b")
    )
    t2 = tot.withColumnRenamed("source", "t2_source").withColumnRenamed("n", "n_b")
    joined = (
        s1.crossJoin(F.broadcast(srcs))
        .filter(F.col("b_source") != F.col("a_source"))
        .join(F.broadcast(t2), F.col("t2_source") == F.col("b_source"))
        .join(
            sq,
            (F.col("q_source") == F.col("b_source")) & (F.col("q_tok") == F.col("tok")),
            "left",
        )
    )
    p = F.col("c_a").cast("double") / F.col("n_a")
    q = F.coalesce(F.col("c_b").cast("double") / F.col("n_b"), F.lit(0.0))
    dsum = joined.groupBy(
        F.col("a_source").alias("a"), F.col("b_source").alias("b")
    ).agg(F.sum(p * F.log(2.0 * p / (p + q))).alias("dk"))
    x = dsum.alias("x")
    y = dsum.alias("y")
    return (
        x.join(y, (F.col("y.a") == F.col("x.b")) & (F.col("y.b") == F.col("x.a")))
        .filter(F.col("x.a") < F.col("x.b"))
        .select(
            F.col("x.a").alias("source_a"),
            F.col("x.b").alias("source_b"),
            F.round(0.5 * (F.col("x.dk") + F.col("y.dk")), 9).alias("js_q"),
        )
        .orderBy(F.col("js_q").asc(), F.col("source_a").asc(), F.col("source_b").asc())
    )


# --- DSIR: data selection via importance resampling --------------------------
# Xie et al. '23 ("Data Selection for Language Models via Importance
# Resampling"): fit two bag-of-hashed-ngrams language models — one on a
# TARGET domain, one on the RAW pool — and weight every raw document by its
# log likelihood ratio; resampling by that weight shifts the pool's mixture
# toward the target domain without a trained classifier. Here the target
# selector is the corpus's English slice (lang = 'en') — in production it
# is an injected predicate or a separate high-quality corpus, exactly like
# hybrid_search's injected query.
#
# Scale shape: two corpus passes (the algorithm's own fit/score split) —
# pass 1 tokenizes + hashes and reduces to the B-row bucket table (map-side
# partial agg; B = 1024 fixed), pass 2 re-tokenizes and joins the B-row
# log-ratio table BY BROADCAST onto per-doc bucket counts. No data-sized
# relation is ever joined to another data-sized relation except the final
# doc_id-keyed weight attach.
#
# Portability: bucket counts are exact integers; each bucket's add-1
# log-ratio is quantized to integer micro-nats (floor(x*1e6+0.5) — the
# established ln() 6-dp idiom) BEFORE the per-doc sum, so document weights
# are exact integer sums, order-independent on both engines.
DSIR_B = 1024  # hashed feature buckets (fixed key space, md5-portable)


@register(
    "dsir_importance_weights",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_WORDS_SQL}) AS tok FROM documents
    ),
    feat AS (
      SELECT t.doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT % {DSIR_B} AS bucket
      FROM toks t
    ),
    bucket_counts AS (
      SELECT f.bucket,
             COUNT(*) AS n_raw,
             CAST(SUM(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_tgt
      FROM feat f JOIN documents d USING (doc_id)
      GROUP BY f.bucket
    ),
    tot AS (
      SELECT CAST(SUM(n_raw) AS BIGINT) AS t_raw, CAST(SUM(n_tgt) AS BIGINT) AS t_tgt
      FROM bucket_counts
    ),
    lr AS (
      SELECT bucket,
             CAST(floor((ln((n_tgt + 1.0) / (t_tgt + {DSIR_B}))
                         - ln((n_raw + 1.0) / (t_raw + {DSIR_B}))) * 1000000 + 0.5)
                  AS BIGINT) AS lr6
      FROM bucket_counts, tot
    ),
    docfeat AS (SELECT doc_id, bucket, COUNT(*) AS n FROM feat GROUP BY 1, 2),
    docw AS (
      SELECT df.doc_id, CAST(SUM(df.n * lr.lr6) AS BIGINT) AS w6
      FROM docfeat df JOIN lr USING (bucket) GROUP BY df.doc_id
    ),
    scored AS (
      SELECT d.doc_id, d.source, COALESCE(w.w6, 0) AS w6
      FROM documents d LEFT JOIN docw w USING (doc_id)
    ),
    corpus AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS nn, CAST(SUM(w6) AS HUGEINT) AS ss
      FROM scored
    ),
    flagged AS (
      SELECT source,
             CASE WHEN CAST(w6 AS HUGEINT) * nn > ss THEN 1 ELSE 0 END AS sel,
             w6
      FROM scored, corpus
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(sel) AS BIGINT) AS n_selected,
           round(CAST(SUM(sel) AS DOUBLE) / COUNT(*), 6) AS sel_rate,
           round(CAST(SUM(w6) AS DOUBLE) / COUNT(*) / 1000000, 6) AS mean_logw
    FROM flagged
    GROUP BY source
    ORDER BY source
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source DSIR readout: how much of each ingest source the
    importance-resampling gate would keep (selected = log weight strictly
    above the corpus mean — the relative cut that resampling top-weight
    mass induces) and the source's mean log importance weight in nats —
    the corpus-mixing diagnostic that tells you which feeds move the pool
    toward the target domain before any resampling runs."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower("text"), r"\s+"),
                lambda w: w != "",
            )
        ).alias("tok"),
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"), F.lit(DSIR_B)
    )
    feat = toks.select("doc_id", "lang", bucket.alias("bucket"))
    bucket_counts = (
        feat.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_tgt"),
        )
        # B-row model table feeding BOTH the totals and the log-ratio
        # projection — pinned here (not at lr) so the pass-1 tokenization
        # runs exactly once, not once per consumer
        .localCheckpoint(eager=False)
    )
    tot = bucket_counts.agg(
        F.sum("n_raw").alias("t_raw"), F.sum("n_tgt").alias("t_tgt")
    )
    lr6 = F.floor(
        (
            F.log((F.col("n_tgt") + 1.0) / (F.col("t_tgt") + DSIR_B))
            - F.log((F.col("n_raw") + 1.0) / (F.col("t_raw") + DSIR_B))
        )
        * 1000000
        + F.lit(0.5)
    ).cast("long")
    lr = bucket_counts.crossJoin(F.broadcast(tot)).select("bucket", lr6.alias("lr6"))
    docfeat = feat.groupBy("doc_id", "bucket").agg(F.count(F.lit(1)).alias("n"))
    docw = (
        docfeat.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        # per-doc sum in DECIMAL, like the corpus-level aggregate below: a
        # LongType sum would wrap silently at ~2^63 micro-nats (a
        # multi-hundred-billion-token doc) while the oracle sums in
        # HUGEINT; the final long cast keeps the downstream schema and
        # fails loudly (ANSI) instead of diverging quietly
        .agg(
            F.sum((F.col("n") * F.col("lr6")).cast("decimal(28,0)"))
            .cast("long")
            .alias("w6")
        )
    )
    scored = (
        d.select("doc_id", "source")
        .join(docw, "doc_id", "left")
        .select("source", F.coalesce(F.col("w6"), F.lit(0)).alias("w6"))
        .localCheckpoint(eager=False)  # feeds the totals AND the readout
    )
    # selection gate: strictly above the corpus-mean weight — exact-integer
    # comparison w6 * N > S (decimal(38,0) so doc counts beyond 2^63/w6
    # cannot overflow), so the cut is engine-identical with no division
    # sum in DECIMAL from the start — aggregating in LongType and casting
    # after would overflow around 1e8 docs x 1e10-micro-nat weights, the
    # very scale the exact w*N > S comparison exists for
    corpus = scored.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("nn"),
        F.sum(F.col("w6").cast("decimal(28,0)")).alias("ss"),
    )
    sel = F.when(
        F.col("w6").cast("decimal(28,0)") * F.col("nn") > F.col("ss"), 1
    ).otherwise(0)
    return (
        scored.crossJoin(F.broadcast(corpus))
        .select("source", "w6", sel.alias("sel"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("sel").alias("n_selected"),
            F.round(F.sum("sel").cast("double") / F.count(F.lit(1)), 6).alias(
                "sel_rate"
            ),
            F.round(
                F.sum(F.col("w6").cast("decimal(28,0)")).cast("double")
                / F.count(F.lit(1))
                / 1000000,
                6,
            ).alias("mean_logw"),
        )
        .orderBy("source")
    )
