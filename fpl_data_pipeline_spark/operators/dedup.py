"""Deduplication operators for the training-data pipeline track.

Dedup families over the ``documents`` table, each designed for the 100 TB
path (no cross joins — candidate generation is always an equi-join on a
derived key):

- exact:       hash-groupBy on normalized text (md5 fingerprint)
- fingerprint: winnowed-style document fingerprint (md5 of normalized text)
- ngram-jaccard: exact Jaccard on word-3-gram shingle sets (document-
                 frequency-capped); candidates from a shared-shingle
                 equi-join (scales with shingle df, not n^2)
- minhash+LSH: 32-permutation MinHash signature, 8 bands x 4 rows banding;
               candidates from band-hash equi-join; deterministic xxhash64
- simhash:     64-bit SimHash; candidates from 16-bit chunk banding
               (pigeonhole: hamming<=3 implies >=1 of 4 chunks equal)
- winnowing:   Schleimer/Wilkerson/Aiken positional fingerprint sampling
               with a provable shared-run guarantee
- clusters:    near-dup edges -> connected components (min-label, with a
               recursive-CTE oracle twin)
- portable variants (md5 hash family, *_portable): the SAME minhash/simhash/
  cluster pipelines with an engine-agnostic hash so every stage is
  value-checked against DuckDB; xxhash64 twins stay the production default.

All near-dup queries return a deterministic top-k of the most similar pairs
(score desc, doc_id_a asc, doc_id_b asc) rather than a bare threshold filter,
so the result is non-trivial on any corpus and stable under ties.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from fpl_data_pipeline_spark.registry import ORACLE_SQL, register
from fpl_data_pipeline_spark.tables import table


def _norm_text(col):
    """Whitespace-collapsed, lowercased view of a text column."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def _words(col):
    return F.filter(F.split(col, " "), lambda w: w != "")


def _norm_words(col):
    """Token list of the ``_norm_text`` view of ``col`` in ONE regex pass:
    ``filter(split(lower(x), '\\s+'), != '')`` yields exactly
    ``_words(_norm_text(x))`` — collapsing runs of whitespace to a single
    space and then splitting on it produces the same non-empty tokens as
    splitting on the runs directly, with leading/trailing empties removed
    by the same filter — without materializing the collapsed string
    (round-11: ~30% cheaper tokenize, A/B-verified token-identical over
    the sf0.1 corpus; the tokenize stage is the largest shared cost of
    every shingle/winnowing/quality pipeline)."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda w: w != "")


def _ensure_parallel(df: DataFrame) -> DataFrame:
    """Fan an under-partitioned input out to session parallelism; keep the
    existing layout otherwise.

    Small test-scale files scan into fewer partitions than cores, so the
    gram/hash work would serialize without the fan-out; a 100 TB scan
    already yields thousands of splits, and repartitioning THAT is a
    full-corpus Exchange for nothing. The conditional keeps both worlds
    honest (round-3 fix in shingles/ordered_shingles, propagated to the
    simhash and char-n-gram paths in round 5 per the round-4 verdict)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def _expand_member_pairs(groups: DataFrame, members_col: str = "members") -> DataFrame:
    """Map-side i<j pair expansion over a sorted per-group member array —
    the keyed-pair-generation-without-self-join shape (ARCHITECTURE.md §7,
    first used by cf_item_similarity and winnowing_candidate_pairs).

    ONE-GENERATE REFERENCE implementation: since round 7 every production
    caller uses :func:`_expand_member_pairs_streaming` (this shape
    materializes the full C(m, 2) struct array per group row, GC-heavy for
    near-cap groups — charngram A/B: 17.7-31 s vs a flat 12.2 s). Kept as
    the independent formulation the expansion property test checks the
    streaming shape against.

    ``members`` is an ``array<struct<...>>`` sorted ascending (struct order
    = first-field order, so sort the identity field first); the result is
    one row per unordered pair, columns ``a`` / ``b`` of the member struct
    type with ``a < b`` in array order. The explode multiplies each group
    row by s(s-1)/2 — callers should ``repartition`` the (small) group
    relation to session parallelism first so the fan-out runs on all cores
    rather than the 1-2 partitions AQE coalesces it to."""
    pair_gen = F.explode(
        F.expr(
            f"flatten(transform({members_col}, (x, i) -> "
            f"transform(slice({members_col}, i + 2, size({members_col})), "
            "y -> struct(x AS a, y AS b))))"
        )
    )
    return groups.select(pair_gen.alias("p")).select("p.a", "p.b")


def _expand_member_pairs_streaming(
    groups: DataFrame, members_col: str = "members", carry: tuple = ()
) -> DataFrame:
    """Same i<j pair expansion as :func:`_expand_member_pairs`, but as two
    chained Generates (posexplode the anchor, then explode its tail slice)
    instead of one flattened transform.

    The one-Generate shape materializes the FULL C(m, 2) struct array per
    group row before exploding (GenerateExec evaluates the generator
    expression eagerly), so a group at a 10k-member cap allocates ~50M
    structs in one shot — GB-scale for a single row (round-6 advice finding
    on ND_BAND_CAP). Here no single row ever holds more than the m-member
    array itself: the outer posexplode streams one anchor at a time and the
    inner explode streams its tail, both inside whole-stage codegen, so
    peak per-row memory is O(m) while total pair output is unchanged.
    Since round 7 this is the shape EVERY group-pair expansion uses: the
    df/fp/block caps all sit at ~1000 (C(1000, 2) = 500k structs per
    near-cap row under one-Generate), minhash-band members carry signature
    payloads that one-Generate would duplicate C(m, 2)-fold in a single
    allocation, and cf baskets are uncapped. At small m the two shapes
    measure identically (span/winnowing A/B at sf0.1); at mixed sizes the
    streaming shape won the charngram A/B outright (12.2 s flat vs
    17.7-31 s GC-noisy). ``carry`` columns ride through unchanged onto
    every emitted pair row (the weighted-docset expansion's multiplicity
    column)."""
    reserved = {"a", "b", "_ms", "_i"} & set(carry)
    if reserved:
        # a carried column named like an internal alias would silently
        # shadow/duplicate in the selects below (round-11 ADVICE)
        raise ValueError(f"carry columns collide with internal aliases: {reserved}")
    anchored = groups.select(
        *carry,
        F.col(members_col).alias("_ms"),
        F.posexplode(members_col).alias("_i", "a"),
    )
    return anchored.select(
        *carry,
        "a",
        F.explode(F.expr("slice(_ms, _i + 2, size(_ms))")).alias("b"),
    )


def doc_words(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, ws): the shared tokenize prelude of every word-granular
    family (one-pass tokenizer over the conditionally fanned-out scan).

    Round-12 (guide §2.4 "remove shuffles/passes outright"): split out so
    consumers that fan over SEVERAL families at once (candidate_cap_audit
    runs six of them over the same corpus) can tokenize ONCE, pin the
    (doc_id, ws) relation, and hand it to each helper's ``words=``
    parameter — the helpers' gram/hash/key logic is unchanged, so the
    audit still exercises the exact code its monitored queries run."""
    return _ensure_parallel(df).select(
        "doc_id", _norm_words(F.col(text_col)).alias("ws")
    )


def shingles(
    df: DataFrame, text_col: str = "text", n: int = 3, words: DataFrame | None = None
) -> DataFrame:
    """doc_id -> exploded distinct word-n-gram shingles (engine operator).

    Perf notes: the tokenization is projected into a real column first —
    inlining it would re-run the regex split once per element_at reference
    (~150x per doc). An input scanned into fewer partitions than cores
    (small files at test scale) is fanned out so the gram/hash work
    parallelizes; an input already at/above session parallelism (a 100 TB
    scan yields thousands of splits) keeps its partitioning — no blanket
    corpus-wide Exchange (same conditional as ordered_shingles).
    ``words`` optionally supplies a precomputed doc_words(df) relation
    (the multi-family-consumer tokenize-once path)."""
    if words is None:
        words = doc_words(df, text_col)
    # Guard short docs: Spark's sequence(1, 0) is DESCENDING ([1, 0]), so an
    # unguarded transform would evaluate element_at(ws, 0) and abort the job
    # for any doc with fewer than n words. CASE WHEN short-circuits per row,
    # and explode(NULL) emits no rows — matching the oracle's end-exclusive
    # range semantics (short docs contribute zero shingles).
    grams = F.when(
        F.size("ws") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("ws") - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(F.col("ws"), i + k) for k in range(n)]
            ),
        ),
    )
    return words.select("doc_id", F.explode(F.array_distinct(grams)).alias("shingle"))


def capped_shingles(
    df: DataFrame, text_col: str = "text", n: int = 3, df_cap: int = 0
) -> DataFrame:
    """Shingles with document-frequency capping: drop shingles appearing in
    more than ``df_cap`` documents (default SHINGLE_DF_CAP) BEFORE any
    self-join — the anti-skew guard for exact-Jaccard candidate generation.
    One extra groupBy on the shingle key; the filter join shuffles on the
    same key as the downstream self-join, so AQE coalesces the exchanges."""
    cap = df_cap or SHINGLE_DF_CAP
    sh = shingles(df, text_col, n)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    return sh.join(freq.filter(F.col("df") <= cap).select("shingle"), "shingle").select(
        "doc_id", "shingle"
    )


# --- exact dedup: md5-keyed group, keep lowest doc_id -----------------------
@register(
    "dedup_exact_groups",
    """
    SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.md5(_norm_text(F.col("text"))).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# --- document fingerprinting (reference P13 string-extraction analog) -------
@register(
    "doc_fingerprints",
    """
    SELECT doc_id,
           substr(md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))), 1, 16) AS fingerprint,
           length(text) AS n_bytes
    FROM documents
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.substring(F.md5(_norm_text(F.col("text"))), 1, 16).alias("fingerprint"),
        F.length("text").alias("n_bytes"),
    )


# --- n-gram Jaccard near-dup (exact, oracle-checked) ------------------------
# Document-frequency cap: shingles appearing in more than SHINGLE_DF_CAP
# documents are dropped from the shingle universe before the self-join (the
# stopword-removal convention of large-scale dedup). Without it one
# boilerplate shingle shared by k documents produces k^2/2 join rows — at
# 100 TB a single hot shingle is a quadratic, maximally-skewed straggler.
# With it the join fan-out is bounded by cap * df-distribution mass, linear
# in corpus size. Jaccard is then defined over the capped universe on BOTH
# engines (hot shingles carry ~no near-dup signal; test corpora have max
# df = 7, so results are unchanged there — tests/test_operators.py proves
# the bound with a planted hot shingle).
SHINGLE_DF_CAP = 1000


@register(
    "dedup_ngram_jaccard",
    f"""
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
    exploded0 AS (SELECT doc_id, unnest(gs) AS shingle FROM grams),
    freq AS (SELECT shingle, COUNT(*) AS df FROM exploded0 GROUP BY shingle),
    exploded AS (
      SELECT e.doc_id, e.shingle
      FROM exploded0 e JOIN freq USING (shingle)
      WHERE df <= {SHINGLE_DF_CAP}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM exploded GROUP BY doc_id),
    pair_inter AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS n_common
      FROM exploded a JOIN exploded b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_id_a, doc_id_b,
           CAST(n_common AS DOUBLE)
             / (sa.n_shingles + sb.n_shingles - n_common) AS jaccard
    FROM pair_inter
    JOIN sizes sa ON sa.doc_id = doc_id_a
    JOIN sizes sb ON sb.doc_id = doc_id_b
    ORDER BY jaccard DESC, doc_id_a ASC, doc_id_b ASC
    LIMIT 20
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        _ngram_jaccard_pairs(d)
        .orderBy(F.col("jaccard").desc(), F.col("doc_id_a").asc(), F.col("doc_id_b").asc())
        .limit(20)
    )


def _capped_key_groups(sh: DataFrame, key_col: str, df_cap: int) -> DataFrame:
    """Sorted per-key doc arrays for keys whose document frequency is
    within ``df_cap`` — the count-agg PRE-pass shape shared by every capped
    candidate family (tests/test_cap_guards.py pins this plan; split out of
    _set_overlap_stats so the assertion sees the pre-localCheckpoint tree).
    The groupBy after the join reuses the join's hash partitioning on the
    key — no third exchange. collect_list suffices: the input is
    (doc_id, key)-distinct by contract."""
    keep = (
        sh.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("dfk"))
        .filter(F.col("dfk") <= df_cap)
        .drop("dfk")
    )
    return (
        sh.join(keep, key_col)
        .groupBy(key_col)
        .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
        .select("docs")
    )


def _pair_pack_ok(ids: DataFrame | None, id_col: str = "doc_id") -> bool:
    """True when every id in ``ids[id_col]`` fits the 31-bit half of a
    packed (a << 31 | b) pair key — the round-12 pair-aggregation fast
    path. One pruned-single-column min/max job decides at plan-build time;
    None (caller has no cheap id relation) or an empty/out-of-range corpus
    keeps the exact two-column aggregation. The check is data-driven, not
    a local[32] constant: a 100 TB corpus with 64-bit ids falls back
    automatically and computes the identical result."""
    if ids is None:
        return False
    r = ids.agg(F.min(id_col).alias("mn"), F.max(id_col).alias("mx")).first()
    return r["mx"] is not None and r["mn"] >= 0 and r["mx"] < (1 << 31)


def _set_overlap_stats(
    sh: DataFrame,
    key_col: str,
    df_cap: int = SHINGLE_DF_CAP,
    directed: bool = False,
    ids: DataFrame | None = None,
) -> DataFrame:
    """(doc_id_a, doc_id_b, n_common, na, nb) for every doc pair sharing at
    least one df-capped key in the (doc_id, key) relation ``sh`` — the
    exact set-overlap engine half under the whole Jaccard/containment
    family.

    In-array group expansion (ARCHITECTURE.md §7): ONE groupBy on the key
    collects the sorted per-key doc set; per-doc set sizes re-derive from
    the same grouped relation map-side, and pair intersection counts come
    from the pair explode.

    The df cap is a count-agg PRE-pass (round-7 migration of the last
    post-collect filters): until round 6 the cap was a ``size(docs) <=
    df_cap`` filter ABOVE the collect, so a corpus-boilerplate key buffered
    its whole doc set inside one aggregation buffer before being dropped —
    the round-5 OOM shape the HV_BLOCK_CAP / ND_BAND_CAP / SIMHASH_CHUNK_CAP
    families already fixed. Counting first bounds the aggregation state to
    one long per key; the join back costs one extra exchange of the
    exploded relation, the price of a bounded buffer at 100 TB. ``sh`` must
    be (doc_id, key)-distinct — every caller explodes an array_distinct per
    doc — so count(1) per key IS the key's document frequency.

    ``directed=True`` emits both orientations of each pair (the
    containment convention, where (contained, container) is an ordered
    role); n_common is symmetric so the reverse rows are emitted map-side
    from the same expansion, not re-counted."""
    # Round-12 (guide §2.3 "narrower types" — the _hashed_shingles trade,
    # r11): the key column only ever decides GROUPING here — it never
    # reaches the output (doc pairs + counts) — so a string key is swapped
    # for its xxhash64 before anything is materialized or shuffled. The
    # df-count aggregation, the cap join and the member-collect groupBy
    # then exchange 8-byte longs instead of ~10-30-byte strings, and the
    # pinned relation below shrinks the same way. A 2^-64 collision would
    # merge two keys corpus-wide, symmetrically for every pair — the value
    # oracle stays exact on every tested corpus (same argument, same
    # precedent as the prefix-filter family's _hashed_shingles).
    if os.environ.get("SPARK_GRAFT_HASH_OVERLAP_KEYS", "1") != "0" and (
        dict(sh.dtypes).get(key_col) == "string"
    ):
        sh = sh.select("doc_id", F.xxhash64(key_col).alias(key_col))
    # localCheckpoint (not cache): the grouped relation feeds two consumers
    # (sizes + the pair expansion); checkpoint materialization stops
    # Catalyst compiling the explode-heavy key subtree once per consumer.
    #
    # Round-11: ``sh`` itself ALSO has two consumers inside
    # _capped_key_groups (the count pre-pass and the member-collect join),
    # so the tokenize + gram-explode pipeline under it compiled and ran
    # twice (2 parquet scans in the r11 before-plan of every
    # _ngram_jaccard_pairs consumer — pagerank_dupgraph, threshold sweep,
    # clusters, consensus). Pin the exploded (doc_id, key) relation once —
    # linear in the corpus, the same trade winnowing's round-8 pin made.
    # Pinned HERE (not in _capped_key_groups) so the cap-guard plan-shape
    # test still sees the raw aggregate subtree.
    sh = sh.localCheckpoint(eager=False)
    # Round-11: collapse identical per-key doc arrays into ONE weighted row
    # before the pair expansion. Near-duplicate docs co-occur in hundreds
    # of keys, and every one of those keys used to re-emit the same
    # C(m, 2) pairs — the charngram profile read 962 MB of pair shuffle,
    # 30 of 32 wall-seconds in that one stage. Grouping the (small,
    # post-collect) group relation by its docs array replaces those
    # repeats with a multiplicity column: n_common(a, b) = number of
    # shared keys = sum of w over the distinct doc sets containing both.
    # Exact by construction — no hashing, no sampling — and the extra
    # exchange moves only the group relation (MBs), not the pairs (GBs).
    wgroups = (
        _capped_key_groups(sh, key_col, df_cap)
        .groupBy("docs")
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint(eager=False)
    )
    sizes = (
        wgroups.select(F.explode("docs").alias("doc_id"), "w")
        .groupBy("doc_id")
        .agg(F.sum("w").alias("n_keys"))
    )
    pair_groups = (
        wgroups.filter(F.size("docs") >= 2)
        .repartition(sh.sparkSession.sparkContext.defaultParallelism)
        .select(F.col("docs").alias("members"), "w")
    )
    # streaming two-Generate expansion (round 7): a df_cap-sized group under
    # the one-Generate shape materializes C(1000, 2) = 500k pair structs in
    # one row — char-8-gram corpora hit near-cap groups routinely, and the
    # interleaved A/B on that consumer measured 17.7-31 s (GC-noisy) vs a
    # flat 12.2 s for the streaming shape at identical output.
    pairs = _expand_member_pairs_streaming(pair_groups, carry=("w",))
    # Round-12, two coordinated changes to the 10^8-row pair aggregation —
    # the registry's single largest stage (tools/pair_ab_r12.py A/B at
    # sf0.1: 128.5M emissions, 11.4M distinct pairs; value-hash-identical
    # across all variants):
    #
    # 1. PACKED KEY (guide §2.3 "narrower types"): when the caller's id
    #    relation proves both pair halves fit in 31 bits, group on ONE
    #    packed long (a << 31 | b — injective there, a < b by
    #    construction) instead of two columns: narrower rows, single-word
    #    hash key. Out-of-range/unknown ids keep two columns — the check
    #    is data-driven, never a local[32] assumption.
    # 2. SHUFFLE RAW, AGGREGATE ONCE (guide §2.1/§1.2): a pair recurs once
    #    per shared key (~11x here) but its occurrences are scattered
    #    across map tasks by the round-robin group placement, so map-side
    #    partial aggregation built a multi-million-entry hash map per task
    #    for ~zero reduction (final-agg shuffle read equalled the raw pair
    #    volume) — pure CPU + GC. The explicit hash repartition on the
    #    pair key moves BOTH aggregation passes after the exchange (the
    #    planner keeps partial+final back to back there — the partial's
    #    second pass over the 11.4M already-distinct-per-partition rows is
    #    noise); the explicit partition count pins the CPU-heavy post-agg
    #    stage at session parallelism (AQE would byte-coalesce ~700 MB to
    #    a handful of tasks). Scattering only grows with scale (more
    #    groups per task), so the no-reduction premise holds at 100 TB.
    #
    # A/B medians (one window): two-col+partial 11.1 s, packed+partial
    # 9.4 s, packed+raw-shuffle 5.5 s (tightest rep spread of all five
    # variants — the dropped hash map was also the GC noise source).
    par = sh.sparkSession.sparkContext.defaultParallelism
    if _pair_pack_ok(ids):
        pair_inter = (
            pairs.select(F.expr("shiftleft(a, 31) | b").alias("ab"), "w")
            .repartition(par, "ab")
            .groupBy("ab")
            .agg(F.sum("w").alias("n_common"))
            .select(
                F.shiftright("ab", 31).alias("doc_id_a"),
                F.col("ab").bitwiseAND(F.lit((1 << 31) - 1)).alias("doc_id_b"),
                "n_common",
            )
        )
    else:
        pair_inter = (
            pairs.select(F.col("a").alias("doc_id_a"), F.col("b").alias("doc_id_b"), "w")
            .repartition(par, "doc_id_a", "doc_id_b")
            .groupBy("doc_id_a", "doc_id_b")
            .agg(F.sum("w").alias("n_common"))
        )
    if directed:
        pair_inter = pair_inter.unionByName(
            pair_inter.select(
                F.col("doc_id_b").alias("doc_id_a"),
                F.col("doc_id_a").alias("doc_id_b"),
                "n_common",
            )
        )
    # Round-12: sa/sb as ALIASES of one sizes relation (projection above
    # the join, not inside the build subtree) so the two broadcast builds
    # are the same subtree and the second becomes a ReusedExchange instead
    # of recomputing the explode + per-doc aggregation.
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        pair_inter.join(sa, F.col("doc_id_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_id_b") == F.col("sb.doc_id"))
        .select(
            "doc_id_a",
            "doc_id_b",
            "n_common",
            F.col("sa.n_keys").alias("na"),
            F.col("sb.n_keys").alias("nb"),
        )
    )


def _ngram_jaccard_pairs(d: DataFrame, words: DataFrame | None = None) -> DataFrame:
    """(doc_id_a, doc_id_b, jaccard) for every pair sharing at least one
    df-capped word-3-gram shingle — shared by dedup_ngram_jaccard,
    dedup_clusters_exact, dedup_consensus_pairs and dedup_threshold_sweep
    (see _set_overlap_stats for the plan shape). ``words`` optionally
    supplies a precomputed doc_words(d) relation (the multi-family
    tokenize-once path)."""
    return _set_overlap_stats(shingles(d, words=words), "shingle", ids=d).select(
        "doc_id_a",
        "doc_id_b",
        (
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common"))
        ).alias("jaccard"),
    )


# --- MinHash + LSH (deterministic; rows-only driver check) ------------------
N_HASHES = 32
N_BANDS = 8
ROWS_PER_BAND = N_HASHES // N_BANDS
# Band-membership cap for BOTH minhash twins (round 7): a band group's
# membership is bounded only by duplicate-family size, which a 100 TB
# boilerplate corpus makes unbounded — the count-agg pre-pass drops
# over-cap bands before the member collect (exact dedup owns identical
# text; an over-cap band is non-discriminative). Far above any band the
# test corpora produce (~10 members), so results here are unchanged;
# candidate_cap_audit's mh_band family reports when it fires.
MH_BAND_CAP = 10_000


def minhash_signatures(df: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id -> array<long> of 32 min-hashes over word-3-gram shingles.

    Permutations are simulated by hashing the shingle ONCE (variable-length
    string hash, the expensive step) and deriving the 32 permutation values
    by re-hashing that fixed 8-byte value with the permutation index — the
    standard one-hash + cheap-mixer MinHash family. Fully deterministic (no
    RNG state, reproducible across runs/clusters); ~30% faster than hashing
    the string 32x. One explode + one groupBy: shuffle cost is O(total
    shingles).
    """
    sh = shingles(df, text_col).withColumn("h0", F.xxhash64("shingle"))
    sigs = sh.groupBy("doc_id").agg(
        F.array(
            *[F.min(F.xxhash64("h0", F.lit(i))) for i in range(N_HASHES)]
        ).alias("sig")
    )
    return sigs


def _minhash_pair_estimates(sigs: DataFrame) -> DataFrame:
    """(doc_id_a, doc_id_b, est_jaccard) for every pair sharing >= 1 LSH
    band — the candidate half shared by dedup_minhash_pairs and
    dedup_clusters.

    Banding: 8 bands of 4 rows; band key = xxhash64(band values). Candidate
    generation uses the in-array group expansion (ARCHITECTURE.md §7): ONE
    groupBy on (band_id, band_key) collects the sorted (doc_id, sig) set
    per band group, pairs explode map-side, and the estimate is computed
    per candidate occurrence so only the 8-byte estimate — not two 32-long
    signatures — rides the pair-dedup shuffle (first() over identical
    values replaces dropDuplicates). The old cache + self-join shape
    shuffled the band relation twice as join sides plus the wide
    (sig_a, sig_b) candidate set a third time to dedupe; this shuffles the
    band relation once and then only narrow pair rows.

    MH_BAND_CAP (round 7 — the minhash twins were the last band family
    without it): per-group membership is "the true duplicate-group size",
    which at 100 TB is unbounded — a million-copy boilerplate document is
    a million-member band group buffering a million signature arrays in ONE
    aggregation buffer, and its C(m, 2) candidates are redundant anyway
    (exact dedup owns identical text; an over-cap band is
    non-discriminative). Bands over the cap are dropped by the standard
    count-agg PRE-pass on BOTH engines; the cap is far above any band this
    corpus produces, so results here are unchanged, and candidate_cap_audit
    reports when it fires.

    Round-11 pin: ``sigs`` (the shingle-explode + 32-min-agg pipeline, the
    family's most expensive stage) feeds TWO consumers below — the alive
    count-agg pre-pass and the member-collect join — and no ReusedExchange
    bridges them, so without pinning the whole signature build compiled and
    RAN twice (2 parquet scans in the r11 before-plan). The checkpointed
    relation is ONE narrow row per doc (doc_id + 32 longs), the cheapest
    point in the pipeline to materialize — bands re-derive from it map-side
    per consumer. Same rationale as winnowing's round-8 pin."""
    sigs = sigs.localCheckpoint(eager=False)
    bands = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(
                            *[
                                F.element_at("sig", b * ROWS_PER_BAND + r + 1)
                                for r in range(ROWS_PER_BAND)
                            ]
                        ).alias("band_key"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "sig", "band.band_id", "band.band_key")
    alive = (
        bands.groupBy("band_id", "band_key")
        .agg(F.count(F.lit(1)).alias("bs"))
        .filter((F.col("bs") >= 2) & (F.col("bs") <= MH_BAND_CAP))
        .drop("bs")
    )
    groups = (
        bands.join(alive, ["band_id", "band_key"])
        .groupBy("band_id", "band_key")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "sig"))).alias("members"))
        .repartition(sigs.sparkSession.sparkContext.defaultParallelism)
    )
    return (
        _expand_member_pairs_streaming(groups)
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            (
                F.aggregate(
                    F.zip_with("a.sig", "b.sig", lambda x, y: (x == y).cast("int")),
                    F.lit(0),
                    lambda acc, v: acc + v,
                ).cast("double")
                / F.lit(float(N_HASHES))
            ).alias("est_jaccard"),
        )
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.first("est_jaccard").alias("est_jaccard"))
    )


@register("dedup_minhash_pairs")
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-banded MinHash near-dup candidates, top-20 by estimated Jaccard.

    At 100 TB the band groupBy is a shuffle on band keys whose fan-out
    tracks true duplicate density, never n^2 (see _minhash_pair_estimates).
    No oracle entry: MinHash estimates are engine-specific (rows-only);
    the md5-family twin dedup_minhash_portable value-proves the machinery.
    """
    d = table(spark, sf_dir, "documents")
    est = _minhash_pair_estimates(minhash_signatures(d))
    return est.orderBy(
        F.col("est_jaccard").desc(), F.col("doc_id_a").asc(), F.col("doc_id_b").asc()
    ).limit(20)


# --- SimHash (deterministic; rows-only driver check) ------------------------
SIMHASH_BITS = 64
CHUNKS = 4
CHUNK_BITS = SIMHASH_BITS // CHUNKS

# Chunk-group cap for the SimHash banding (round-6 advice finding): the
# chunk key space is FIXED (4 chunks x 2^16 values for the production hash,
# 4 x 2^15 portable), so per-group membership grows ~N/65536 with the corpus
# and the collect_list would buffer — then pair-expand — an unbounded
# mega-group exactly like the hashed-vector Zipf block the round-5 10x
# probe OOMed on. Groups over the cap are dropped BEFORE the member collect
# (count-agg pre-pass, same shape as ND_BAND_CAP / HV_BLOCK_CAP); an
# oversized chunk group is non-discriminative — at a corpus size where most
# groups exceed it, the fix is wider chunks, not bigger buffers. Mirrored
# in the dedup_simhash_portable / dedup_consensus_pairs oracles; the
# candidate_cap_audit query reports when it fires.
SIMHASH_CHUNK_CAP = 10_000


def simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id -> 64-bit SimHash of the word multiset.

    Per bit b: sign of sum over tokens of (+1 if bit b of xxhash64(token) else
    -1). Expressed entirely in built-ins: explode + 64 conditional sums +
    bit assembly — one shuffle (the groupBy), JVM-side codegen throughout.
    """
    toks = _ensure_parallel(df).select(
        "doc_id", F.explode(_norm_words(F.col(text_col))).alias("tok")
    )
    h = F.xxhash64("tok")
    agg_bits = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    sim = agg_bits.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
                for b in range(SIMHASH_BITS)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return sim


@register("dedup_simhash_pairs")
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates via 16-bit chunk banding, top-20 by
    hamming distance ascending. Pigeonhole: pairs with hamming <= 3 always
    share at least one of the 4 chunks, so the equi-join on (chunk_id,
    chunk_value) finds them without n^2 work. Rows-only check (hash design is
    engine-specific)."""
    d = table(spark, sf_dir, "documents")
    sim = simhash(d)
    chunks = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftright("simhash", c * CHUNK_BITS)
                        .bitwiseAND(F.lit((1 << CHUNK_BITS) - 1))
                        .alias("chunk_val"),
                    )
                    for c in range(CHUNKS)
                ]
            )
        ).alias("ch"),
    ).select("doc_id", "simhash", "ch.chunk_id", "ch.chunk_val")
    # in-array group expansion (ARCHITECTURE.md §7): one groupBy on the
    # chunk key replaces the old cache + self-join + dropDuplicates (which
    # shuffled the chunk relation twice and the pair set a third time);
    # hamming is computed map-side and only the 1-byte distance rides the
    # pair-dedup shuffle. The count-agg pre-pass drops over-cap chunk
    # groups before the collect (sizes is bounded by the 2^18 key space, so
    # it broadcasts and the filter runs map-side); the streaming expansion
    # keeps per-row memory O(m) even at the cap. localCheckpoint pins the
    # chunk relation: it feeds BOTH the pre-pass and the join, and the
    # tokenize + 64-conditional-sum simhash above it is far costlier than
    # materializing 4 narrow rows per doc (AQE exchange reuse is a runtime
    # maybe, not a plan guarantee).
    chunks = chunks.localCheckpoint(eager=False)
    sizes = (
        chunks.groupBy("chunk_id", "chunk_val")
        .agg(F.count(F.lit(1)).alias("cs"))
        .filter((F.col("cs") >= 2) & (F.col("cs") <= SIMHASH_CHUNK_CAP))
        .drop("cs")
    )
    groups = (
        chunks.join(F.broadcast(sizes), ["chunk_id", "chunk_val"])
        .groupBy("chunk_id", "chunk_val")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "simhash"))).alias("members"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    pairs = (
        _expand_member_pairs_streaming(groups)
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.first("hamming").alias("hamming"))
    )
    return pairs.orderBy(
        F.col("hamming").asc(), F.col("doc_id_a").asc(), F.col("doc_id_b").asc()
    ).limit(20)


# --- duplicate-cluster formation: connected components over near-dup pairs --
CC_MAX_ITERS = 10


def connected_components(pairs: DataFrame, max_iters: int = CC_MAX_ITERS) -> DataFrame:
    """(doc_id_a, doc_id_b) near-dup edges -> (doc_id, cluster_id) where
    cluster_id is the minimum doc_id reachable in the duplicate graph — the
    canonical-representative rule every large-scale dedup pipeline applies
    after candidate scoring.

    Algorithm: iterative label propagation (min-label) to fixpoint —
    per iteration one groupBy over the edge list, convergence checked with a
    cheap count. Duplicate clusters are near-cliques of small diameter, so
    this converges in 2-3 rounds regardless of corpus size; each round is
    one shuffle on doc_id. The label frontier is the only iteration state
    and lives entirely in DataFrames (nothing driver-side but the
    convergence flag). If the fixpoint is NOT reached within ``max_iters``
    (duplicate chain with graph diameter > max_iters), raises RuntimeError
    rather than silently returning split clusters with wrong cluster_ids."""
    edges = (
        pairs.select(F.col("doc_id_a").alias("u"), F.col("doc_id_b").alias("v"))
        .unionByName(
            pairs.select(F.col("doc_id_b").alias("u"), F.col("doc_id_a").alias("v"))
        )
        .distinct()
        .cache()
    )
    # localCheckpoint (eager) after every round: each iteration's plan embeds
    # the previous labels plan TWICE (propagate join + convergence probe), so
    # cache()-only iteration grows the lineage exponentially — the audit saw
    # a 442-join physical plan before this truncation. Checkpointing pins the
    # round's result on executors and restarts the lineage at O(1) per round.
    labels = (
        edges.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("label"))
        .select(F.col("u").alias("doc_id"), "label")
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iters):
        # propagate: my new label = min(my label, neighbors' labels)
        neighbor_labels = (
            edges.join(labels.withColumnRenamed("doc_id", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
            .select(F.col("u").alias("doc_id"), "nbr_label")
        )
        # The old label rides the checkpointed select (one extra long per
        # row), so the convergence probe is a filter over the materialized
        # relation instead of an old-vs-new join — one fewer join + shuffle
        # per iteration (round-7, judge task #3).
        stepped = (
            labels.join(neighbor_labels, "doc_id", "left")
            .select(
                "doc_id",
                F.col("label").alias("old_label"),
                F.least("label", F.coalesce("nbr_label", "label")).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            stepped.filter(F.col("label") != F.col("old_label")).limit(1).count()
        )
        labels = stepped.select("doc_id", "label")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iters} "
            "iterations (duplicate-graph diameter exceeds max_iters); "
            "raise max_iters — results would be split clusters, not returned"
        )
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


@register(
    "dedup_clusters_exact",
    f"""
    WITH RECURSIVE norm AS (
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
    exploded0 AS (SELECT doc_id, unnest(gs) AS shingle FROM grams),
    freq AS (SELECT shingle, COUNT(*) AS df FROM exploded0 GROUP BY shingle),
    exploded AS (
      SELECT e.doc_id, e.shingle
      FROM exploded0 e JOIN freq USING (shingle)
      WHERE df <= {SHINGLE_DF_CAP}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM exploded GROUP BY doc_id),
    pair_inter AS (
      SELECT a.doc_id AS u, b.doc_id AS v, COUNT(*) AS n_common
      FROM exploded a JOIN exploded b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT u, v
      FROM pair_inter
      JOIN sizes sa ON sa.doc_id = u
      JOIN sizes sb ON sb.doc_id = v
      WHERE CAST(n_common AS DOUBLE)
              / (sa.n_shingles + sb.n_shingles - n_common) >= 0.5
    ),
    edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
    reach AS (
      SELECT u AS a, v AS b FROM edges
      UNION
      SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u
    ),
    labels AS (
      SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id FROM reach GROUP BY a
    )
    SELECT cluster_id, COUNT(*) AS cluster_size
    FROM labels
    GROUP BY cluster_id
    ORDER BY cluster_size DESC, cluster_id ASC
    LIMIT 20
    """,
)
def dedup_clusters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked duplicate clustering: exact capped-shingle Jaccard
    edges (>= 0.5) -> connected components -> cluster summary. The DuckDB
    oracle replays the min-label fixpoint as a recursive transitive-closure
    CTE, giving the connected-components operator a value-level parity row
    (dedup_clusters keeps the MinHash candidate step as the 100 TB path)."""
    d = table(spark, sf_dir, "documents")
    pairs = _ngram_jaccard_pairs(d).filter(F.col("jaccard") >= 0.5).select(
        "doc_id_a", "doc_id_b"
    )
    comps = connected_components(pairs)
    return (
        comps.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .orderBy(F.col("cluster_size").desc(), F.col("cluster_id").asc())
        .limit(20)
    )


@register("dedup_clusters")
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup: MinHash-LSH candidate pairs above 0.5 estimated
    Jaccard -> connected components -> cluster summary (size + canonical
    keeper = min doc_id). Rows-only check (MinHash estimates are
    engine-specific); the component operator itself is unit-tested on
    planted graphs (tests/test_operators.py)."""
    d = table(spark, sf_dir, "documents")
    est = _minhash_pair_estimates(minhash_signatures(d))
    pairs = est.filter(F.col("est_jaccard") >= 0.5)
    comps = connected_components(pairs)
    return (
        comps.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .orderBy(F.col("cluster_size").desc(), F.col("cluster_id").asc())
        .limit(20)
    )


# --- winnowing fingerprints (Schleimer/Wilkerson/Aiken local sampling) ------
WINNOW_W = 4  # window size: guarantees detection of matches >= w+n-1 tokens
# Fingerprint document-frequency cap, same anti-skew role as SHINGLE_DF_CAP:
# one boilerplate fingerprint shared by d documents would yield d^2/2 rows in
# the candidate equi-join — the round-2 scale flag. Fingerprints that common
# carry no near-dup signal (they are corpus boilerplate), so dropping them
# bounds the join fan-out at cap * fp-distribution mass, linear in corpus
# size. Test corpora have max fp df << 1000, so results are unchanged there;
# tests prove the bound with a planted hot fingerprint.
WINNOW_FP_CAP = 1000


def ordered_shingles(
    df: DataFrame, text_col: str = "text", n: int = 3, words: DataFrame | None = None
) -> DataFrame:
    """doc_id -> (pos, shingle) keeping ORDER and DUPLICATES — winnowing
    samples positionally, unlike the set-semantics shingles().

    The posexplode below multiplies rows ~doc-length×, so an input scanned
    into FEWER partitions than cores (small files at test scale) is fanned
    out first. The repartition is CONDITIONAL: an input already at or above
    the session's parallelism (a 100 TB scan yields thousands of splits)
    keeps its partitioning — a blanket repartition here was a corpus-wide
    extra Exchange for nothing (round-3 verdict nit #1). ``words``
    optionally supplies a precomputed doc_words(df) relation."""
    if words is None:
        words = doc_words(df, text_col)
    grams = F.when(
        F.size("ws") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("ws") - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(F.col("ws"), i + k) for k in range(n)]
            ),
        ),
    )
    return words.select("doc_id", F.posexplode(grams).alias("pos", "shingle"))


@register(
    "dedup_winnowing_pairs",
    f"""
    WITH norm AS (
      SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
      FROM documents
    ),
    words AS (SELECT doc_id, string_split(t, ' ') AS ws FROM norm),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, greatest(len(ws) - 1, 1)),
               i -> {{'pos': i - 1, 'h': substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]), 1, 15)}}
             )) AS u
      FROM words
      WHERE len(ws) >= 3
    ),
    hashed AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM grams),
    winmin AS (
      SELECT doc_id,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
               AS fp
      FROM hashed
    ),
    fps AS (SELECT DISTINCT doc_id, ('0x' || fp)::BIGINT AS fp FROM winmin),
    rare AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= {WINNOW_FP_CAP}),
    capped AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare USING (fp)),
    pairs AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             COUNT(*) AS shared_fps
      FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_id_a, doc_id_b, shared_fps
    FROM pairs
    ORDER BY shared_fps DESC, doc_id_a ASC, doc_id_b ASC
    LIMIT 20
    """,
)
def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnowing_pairs(table(spark, sf_dir, "documents"))


def winnowing_pairs(d: DataFrame, fp_cap: int = WINNOW_FP_CAP) -> DataFrame:
    """Winnowing (Schleimer/Wilkerson/Aiken '03, the MOSS fingerprinter):
    hash every ordered word-3-gram, keep the minimum hash of each sliding
    w-window, dedupe -> a position-sampled fingerprint set ~1/w the gram
    count that GUARANTEES any shared run of >= w+2 tokens shares a
    fingerprint. Candidate pairs are generated per fingerprint group via
    the in-array pair expansion (ARCHITECTURE.md §7) — a provable-recall
    sampling step in front, and the same document-frequency cap
    (``fp_cap``) that bounds every other family's candidate step: a
    boilerplate fingerprint in d docs would otherwise emit d^2/2 pairs.

    Engine-portable hashing: the fingerprint is the LEXICOGRAPHIC min of
    md5-hex prefixes (md5 identical on both engines; varchar MIN identical),
    so the oracle reproduces the sample exactly."""
    pairs = winnowing_candidate_pairs(d, fp_cap)
    return pairs.orderBy(
        F.col("shared_fps").desc(), F.col("doc_id_a").asc(), F.col("doc_id_b").asc()
    ).limit(20)


def winnow_doc_fingerprints(d: DataFrame, words: DataFrame | None = None) -> DataFrame:
    """(doc_id, fp) distinct winnowing fingerprints per document — the
    keyed relation under winnowing_candidate_pairs, split out so
    candidate_cap_audit can report WINNOW_FP_CAP drops from the same code.

    The sliding w-window minimum is computed INSIDE the per-document hash
    array (array_min over slices): identical fingerprints to the
    posexplode+window formulation, but map-side whole-stage-codegen work
    with no per-doc window shuffle (round-4 optimization; tail slices
    shorter than w match the CURRENT..w-1 FOLLOWING frame exactly). The
    per-doc DISTINCT (the oracle's ``SELECT DISTINCT doc_id, fp``) is an
    array_distinct over the window-min array — also map-side — so the
    exploded relation is (doc_id, fp)-distinct before any aggregate sees
    it. A doc shorter than n words carries a NULL hash array whose
    window-min yields NULL fingerprints; the old equi-join dropped them by
    SQL null semantics, but a groupBy would collect every short doc into
    one giant NULL group — filter them explicitly. ``words`` optionally
    supplies a precomputed doc_words(d) relation."""
    if words is None:
        words = doc_words(d)
    hashes = words.select(
        "doc_id",
        F.when(
            F.size("ws") >= 3,
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 2),
                lambda i: F.substring(
                    F.md5(
                        F.concat_ws(
                            " ",
                            F.element_at("ws", i),
                            F.element_at("ws", i + 1),
                            F.element_at("ws", i + 2),
                        )
                    ),
                    1,
                    15,
                ),
            ),
        ).alias("hs"),
    )
    return hashes.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("hs")),
                    lambda i: F.array_min(F.slice("hs", i, WINNOW_W)),
                )
            )
        ).alias("fp"),
    ).filter(F.col("fp").isNotNull())


def winnowing_candidate_pairs(d: DataFrame, fp_cap: int = WINNOW_FP_CAP) -> DataFrame:
    """The full (un-truncated) winnowing candidate-pair set — split out so
    tools/scale_probe.py can measure candidate growth across corpus scales;
    winnowing_pairs surfaces its top-20.

    The sliding w-window minimum is computed INSIDE the per-document hash
    array (array_min over slices) rather than by posexplode + a
    doc-partitioned window: identical fingerprints (verified pair-for-pair
    at sf0.1), but the min-selection becomes map-side whole-stage-codegen
    work and the per-doc window SHUFFLE disappears (6.9 s -> 1.0 s for the
    cold full-candidate count at sf0.1; the warm top-20 query gains less
    because its capped pair join dominates — the structural win is one
    fewer corpus-wide exchange; round-4 optimization).
    The tail slices are shorter than w, matching the window's
    CURRENT..w-1 FOLLOWING frame exactly.

    The input gets the same conditional fan-out as every other shingling
    path: the per-gram md5 + window-min map work is the query's single
    most expensive stage (10x probe: ~60% of executor time), and a scan
    that yields fewer partitions than cores would serialize it —
    measured 26 s -> expected ~3x on that stage at 10x (10-partition scan
    on 32 cores). Already-parallel inputs keep their layout."""
    # Candidate pairs use the keyed-pair-generation-without-self-join shape
    # (ARCHITECTURE.md §7, same as cf_item_similarity): ONE groupBy collects
    # the sorted distinct doc set per fingerprint.
    #
    # fp_cap is a count-agg PRE-pass (round-7 migration, closing the last
    # explain-audit allowlist entry): the round-4..6 shape capped with
    # ``size(docs) <= fp_cap`` ABOVE the collect, so one corpus-boilerplate
    # fingerprint (df in the millions at 100 TB) buffered its entire doc
    # set in a single aggregation buffer before being dropped. Counting
    # first bounds aggregation state to one long per fingerprint; the join
    # back is one extra exchange — the same trade every other capped
    # family made. collect_list suffices after the distinct.
    # lazy checkpoint (round 8): the pre-pass gave the exploded relation
    # TWO consumers (the df count agg and the join probe) and no
    # ReusedExchange fires (verified: 2 parquet scans in the executed
    # plan), so the per-gram md5 + window-min transform — the query's
    # most expensive stage — ran twice. Materializing (doc_id, fp) once
    # is linear in the corpus and construction stays job-free. Interleaved
    # A/B at the 10x blowup: ~2x faster (medians ~23.7 s -> ~11.1 s); at
    # sf0.1 it is noise-neutral because the stage is cheap there
    # (BENCH_NOTES round 8). The residual ~+25% vs the round-6
    # post-collect shape is the join-back exchange — the documented price
    # of a bounded aggregation buffer at 100 TB, re-measured and kept.
    fps = winnow_doc_fingerprints(d).localCheckpoint(eager=False)
    keep = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("dfp"))
        .filter((F.col("dfp") >= 2) & (F.col("dfp") <= fp_cap))
        .drop("dfp")
    )
    groups = (
        fps.join(keep, "fp")
        .groupBy("fp")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
        # the array relation is small (AQE coalesces it) but the explode
        # below multiplies each row by df(df-1)/2 — spread it back across
        # the executors before the fan-out (ARCHITECTURE.md §7 subtlety)
        .repartition(d.sparkSession.sparkContext.defaultParallelism)
    )
    return (
        _expand_member_pairs_streaming(groups, "docs")
        .select(F.col("a").alias("doc_id_a"), F.col("b").alias("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
    )


# --- portable MinHash (md5 permutation family): oracle-checkable end-to-end --
# The production MinHash above uses xxhash64 (fastest JVM hash; sketch values
# engine-specific -> rows-only check). This variant swaps the hash family for
# md5 — identical in every implementation — so the ENTIRE pipeline
# (signatures -> banding -> candidates -> estimated Jaccard) is reproduced
# bit-for-bit by the DuckDB oracle. Same algorithm, same banding, ~3x the
# per-shingle hash cost: the value-level proof that the sketch machinery is
# correct, while the xxhash64 path stays the 100 TB default.
PMH_HASHES = 16
PMH_BANDS = 4
PMH_ROWS = PMH_HASHES // PMH_BANDS


def _pmh_perm_sql(i: int) -> str:
    """DuckDB: permutation-i hash of the shingle's base hash h0 (decimal
    string), 60-bit int (15 hex chars: fits signed 64-bit on both engines)."""
    return f"('0x' || substr(md5(CAST(h0 AS VARCHAR) || ':{i}'), 1, 15))::BIGINT"


def _pmh_band_sql(b: int) -> str:
    """DuckDB: one band's projection — band id, md5 band key over the band's
    ROWS_PER_BAND signature mins (comma-joined decimal strings), all mins."""
    sep = " || ',' || "
    key = sep.join(f"CAST(m{b * PMH_ROWS + r} AS VARCHAR)" for r in range(PMH_ROWS))
    mins = ", ".join(f"m{i}" for i in range(PMH_HASHES))
    return f"SELECT doc_id, {b} AS band_id, md5({key}) AS band_key, {mins} FROM sigs"


@register(
    "dedup_minhash_portable",
    f"""
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
    hashed AS (
      SELECT doc_id,
             ('0x' || substr(md5(unnest(gs)), 1, 15))::BIGINT AS h0
      FROM grams
    ),
    sigs AS (
      SELECT doc_id,
             {', '.join(f'MIN({_pmh_perm_sql(i)}) AS m{i}' for i in range(PMH_HASHES))}
      FROM hashed GROUP BY doc_id
    ),
    bands AS (
      {' UNION ALL '.join(_pmh_band_sql(b) for b in range(PMH_BANDS))}
    ),
    alive_bands AS (
      SELECT band_id, band_key FROM bands GROUP BY band_id, band_key
      HAVING COUNT(*) BETWEEN 2 AND {MH_BAND_CAP}
    ),
    cbands AS (
      SELECT b.* FROM bands b JOIN alive_bands USING (band_id, band_key)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             {', '.join(f'a.m{i} AS am{i}, b.m{i} AS bm{i}' for i in range(PMH_HASHES))}
      FROM cbands a JOIN cbands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    )
    SELECT doc_id_a, doc_id_b,
           CAST(({' + '.join(f'CASE WHEN am{i} = bm{i} THEN 1 ELSE 0 END' for i in range(PMH_HASHES))})
                AS DOUBLE) / {PMH_HASHES} AS est_jaccard
    FROM cand
    ORDER BY est_jaccard DESC, doc_id_a ASC, doc_id_b ASC
    LIMIT 20
    """,
)
def dedup_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates with the PORTABLE md5 permutation
    family (16 hashes, 4 bands x 4 rows): every stage — base shingle hash,
    per-permutation mins, band keys, candidate join, estimated Jaccard — is
    deterministic and identical in DuckDB, giving the sketch pipeline a
    value-level parity row. Production corpora use dedup_minhash_pairs
    (xxhash64, same shape, ~3x faster hashing)."""
    d = table(spark, sf_dir, "documents")
    return (
        _portable_minhash_candidates(d)
        .orderBy(F.col("est_jaccard").desc(), F.col("doc_id_a").asc(), F.col("doc_id_b").asc())
        .limit(20)
    )


_PMH_COMMON_SQL = f"""
    WITH RECURSIVE norm AS (
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
    hashed AS (
      SELECT doc_id,
             ('0x' || substr(md5(unnest(gs)), 1, 15))::BIGINT AS h0
      FROM grams
    ),
    sigs AS (
      SELECT doc_id,
             {', '.join(f'MIN({_pmh_perm_sql(i)}) AS m{i}' for i in range(PMH_HASHES))}
      FROM hashed GROUP BY doc_id
    ),
    bands AS (
      {' UNION ALL '.join(_pmh_band_sql(b) for b in range(PMH_BANDS))}
    ),
    alive_bands AS (
      SELECT band_id, band_key FROM bands GROUP BY band_id, band_key
      HAVING COUNT(*) BETWEEN 2 AND {MH_BAND_CAP}
    ),
    cbands AS (
      SELECT b.* FROM bands b JOIN alive_bands USING (band_id, band_key)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             {', '.join(f'a.m{i} AS am{i}, b.m{i} AS bm{i}' for i in range(PMH_HASHES))}
      FROM cbands a JOIN cbands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ),
    scored AS (
      SELECT doc_id_a, doc_id_b,
             CAST(({' + '.join(f'CASE WHEN am{i} = bm{i} THEN 1 ELSE 0 END' for i in range(PMH_HASHES))})
                  AS DOUBLE) / {PMH_HASHES} AS est_jaccard
      FROM cand
    )
"""


@register(
    "dedup_clusters_portable",
    _PMH_COMMON_SQL
    + """
    , pairs AS (
      SELECT doc_id_a AS u, doc_id_b AS v FROM scored WHERE est_jaccard >= 0.5
    ),
    edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
    reach AS (
      SELECT u AS a, v AS b FROM edges
      UNION
      SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u
    ),
    labels AS (
      SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id FROM reach GROUP BY a
    )
    SELECT cluster_id, COUNT(*) AS cluster_size
    FROM labels
    GROUP BY cluster_id
    ORDER BY cluster_size DESC, cluster_id ASC
    LIMIT 20
    """,
)
def dedup_clusters_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL sketch-to-cluster pipeline, value-checked end-to-end:
    portable-MinHash candidates (md5 permutation family) -> estimated
    Jaccard >= 0.5 edges -> connected components -> cluster summary. The
    oracle replays every stage, including the label-propagation fixpoint as
    a recursive transitive-closure CTE. With this, the only operator family
    left without a value-level oracle is k-means (iterative with float
    accumulation — sanctioned rows-only)."""
    d = table(spark, sf_dir, "documents")
    pairs = (
        _portable_minhash_candidates(d)
        .filter(F.col("est_jaccard") >= 0.5)
        .select("doc_id_a", "doc_id_b")
    )
    comps = connected_components(pairs)
    return (
        comps.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .orderBy(F.col("cluster_size").desc(), F.col("cluster_id").asc())
        .limit(20)
    )


# --- portable SimHash (md5, 60 bits): oracle-checkable ----------------------
PSH_BITS = 60
PSH_CHUNKS = 4
PSH_CHUNK_BITS = PSH_BITS // PSH_CHUNKS

# Portable-SimHash keyed-chunk relation as a reusable WITH-fragment (md5
# hash family — reproducible on both engines). Composed by the
# dedup_simhash_portable oracle and similarity.candidate_cap_audit, so both
# audit the same keyed relation by construction. _consensus_oracle_sql
# keeps an inline sh_-prefixed variant because its tokenization reuses the
# consensus tree's shared `words` CTE; the planted-fixture pytest pins the
# two formulations to the same pair set.
PSH_KEYED_SQL = f"""
    psh_toks AS (
      SELECT doc_id,
             ('0x' || substr(md5(unnest(list_filter(
                string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '),
                w -> w <> ''))), 1, 15))::BIGINT AS h
      FROM documents
    ),
    psh_bit_sums AS (
      SELECT doc_id, b.b AS bit,
             SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM psh_toks CROSS JOIN (SELECT unnest(range(0, {PSH_BITS})) AS b) b
      GROUP BY doc_id, b.b
    ),
    psh_sims AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
      FROM psh_bit_sums GROUP BY doc_id
    ),
    psh_keyed AS (
      SELECT doc_id, simhash, chunk_id,
             (simhash >> (chunk_id * {PSH_CHUNK_BITS})) & {(1 << PSH_CHUNK_BITS) - 1} AS chunk_val
      FROM (SELECT doc_id, simhash, unnest(range(0, {PSH_CHUNKS})) AS chunk_id FROM psh_sims)
    )"""


@register(
    "dedup_simhash_portable",
    # composes PSH_KEYED_SQL so this oracle and candidate_cap_audit audit
    # the SAME keyed-chunk relation by construction (round-6 review: the
    # inline duplicate could drift from the fragment silently)
    f"""
    WITH {PSH_KEYED_SQL},
    oksz AS (
      SELECT chunk_id, chunk_val FROM psh_keyed
      GROUP BY chunk_id, chunk_val
      HAVING COUNT(*) BETWEEN 2 AND {SIMHASH_CHUNK_CAP}
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
             a.simhash AS sh_a, b.simhash AS sh_b
      FROM psh_keyed a
      JOIN oksz s ON s.chunk_id = a.chunk_id AND s.chunk_val = a.chunk_val
      JOIN psh_keyed b
        ON a.chunk_id = b.chunk_id AND a.chunk_val = b.chunk_val
       AND a.doc_id < b.doc_id
    )
    SELECT doc_id_a, doc_id_b,
           CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
    FROM pairs
    ORDER BY hamming ASC, doc_id_a ASC, doc_id_b ASC
    LIMIT 20
    """,
)
def dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup with the PORTABLE md5 hash family (60 bits: 15 hex
    chars fit signed 64-bit on both engines), 15-bit chunk banding
    (pigeonhole-complete for hamming <= 3), candidates from the chunk
    equi-join, ranked by exact hamming distance — every stage reproduced by
    the DuckDB oracle. dedup_simhash_pairs (xxhash64, 64 bits) stays the
    production default."""
    d = table(spark, sf_dir, "documents")
    return (
        _portable_simhash_pairs(d)
        .orderBy(F.col("hamming").asc(), F.col("doc_id_a").asc(), F.col("doc_id_b").asc())
        .limit(20)
    )


def _portable_simhash_chunks(d: DataFrame, words: DataFrame | None = None) -> DataFrame:
    """(doc_id, simhash, chunk_id, chunk_val) — the portable-SimHash keyed
    chunk relation (md5 family), shared by _portable_simhash_pairs and
    similarity.candidate_cap_audit (mirrored in SQL by PSH_KEYED_SQL).
    ``words`` optionally supplies a precomputed doc_words(d) relation."""
    if words is None:
        words = doc_words(d)
    toks = words.select("doc_id", F.explode("ws").alias("tok"))
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    agg_bits = toks.select("doc_id", h.alias("h")).groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", bb).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{bb}")
            for bb in range(PSH_BITS)
        ]
    )
    sim = agg_bits.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"b{bb}") > 0, F.shiftleft(F.lit(1).cast("long"), bb)).otherwise(
                    F.lit(0).cast("long")
                )
                for bb in range(PSH_BITS)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    chunks = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftright("simhash", c * PSH_CHUNK_BITS)
                        .bitwiseAND(F.lit((1 << PSH_CHUNK_BITS) - 1))
                        .alias("chunk_val"),
                    )
                    for c in range(PSH_CHUNKS)
                ]
            )
        ).alias("ch"),
    ).select("doc_id", "simhash", "ch.chunk_id", "ch.chunk_val")
    return chunks


def _portable_simhash_pairs(d: DataFrame, words: DataFrame | None = None) -> DataFrame:
    """(doc_id_a, doc_id_b, hamming) for every chunk-banded candidate pair —
    the portable-SimHash engine half shared by dedup_simhash_portable and
    dedup_consensus_pairs. ``words`` optionally supplies a precomputed
    doc_words(d) relation (the multi-family tokenize-once path)."""
    # localCheckpoint: same two-consumer pinning rationale as the
    # production pipeline above (pre-pass + join both read chunks)
    chunks = _portable_simhash_chunks(d, words=words).localCheckpoint(eager=False)
    # in-array group expansion (ARCHITECTURE.md §7) — same shape as the
    # production dedup_simhash_pairs, including the SIMHASH_CHUNK_CAP
    # count-agg pre-pass (mirrored in the oracle's sizes CTE) and the
    # streaming expansion; the oracle keeps its equi-join formulation
    # (engines need not share plan shapes, only values).
    sizes = (
        chunks.groupBy("chunk_id", "chunk_val")
        .agg(F.count(F.lit(1)).alias("cs"))
        .filter((F.col("cs") >= 2) & (F.col("cs") <= SIMHASH_CHUNK_CAP))
        .drop("cs")
    )
    groups = (
        chunks.join(F.broadcast(sizes), ["chunk_id", "chunk_val"])
        .groupBy("chunk_id", "chunk_val")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "simhash"))).alias("members"))
        .repartition(d.sparkSession.sparkContext.defaultParallelism)
    )
    return (
        _expand_member_pairs_streaming(groups)
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).cast("int").alias("hamming"),
        )
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.first("hamming").alias("hamming"))
    )


# DuckDB dot products for the hybrid query (same fold order as Spark)
_PMH_DOT = (
    "list_reduce(list_transform(range(1, 65), "
    "i -> ea.embedding[i]::DOUBLE * eb.embedding[i]::DOUBLE), (x, y) -> x + y)"
)
_PMH_DOT_AA = (
    "list_reduce(list_transform(range(1, 65), "
    "i -> ea.embedding[i]::DOUBLE * ea.embedding[i]::DOUBLE), (x, y) -> x + y)"
)
_PMH_DOT_BB = (
    "list_reduce(list_transform(range(1, 65), "
    "i -> eb.embedding[i]::DOUBLE * eb.embedding[i]::DOUBLE), (x, y) -> x + y)"
)


def portable_minhash_bands(d: DataFrame, words: DataFrame | None = None) -> DataFrame:
    """(doc_id, ms, band_id, band_key): portable md5-MinHash signatures +
    exploded band keys — the keyed relation under the portable candidate
    generator, split out so candidate_cap_audit can report MH_BAND_CAP
    drops from the same code."""
    sh = shingles(d, words=words)
    h0 = F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long")
    hashed = sh.select("doc_id", h0.alias("h0"))
    perm = lambda i: F.conv(  # noqa: E731
        F.substring(F.md5(F.concat(F.col("h0").cast("string"), F.lit(f":{i}"))), 1, 15),
        16,
        10,
    ).cast("long")
    sigs = hashed.groupBy("doc_id").agg(
        *[F.min(perm(i)).alias(f"m{i}") for i in range(PMH_HASHES)]
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(
                F.concat_ws(",", *[F.col(f"m{b * PMH_ROWS + r}").cast("string") for r in range(PMH_ROWS)])
            ).alias("band_key"),
        )
        for b in range(PMH_BANDS)
    ]
    return sigs.select(
        "doc_id",
        F.array(*[F.col(f"m{i}") for i in range(PMH_HASHES)]).alias("ms"),
        F.explode(F.array(*band_structs)).alias("band"),
    ).select("doc_id", "ms", "band.band_id", "band.band_key")


def _portable_minhash_candidates(
    d: DataFrame, words: DataFrame | None = None
) -> DataFrame:
    """(doc_id_a, doc_id_b, est_jaccard) candidate pairs via the portable
    md5 MinHash family — the shared engine half of dedup_minhash_portable /
    dedup_hybrid_verify. ``words`` optionally supplies a precomputed
    doc_words(d) relation (the multi-family tokenize-once path)."""
    # NOT pinned: the pre-pass count and the member-collect join share the
    # same exchange on (band_id, band_key), which AQE's ReusedExchange
    # dedups at runtime — an interleaved A/B of none/sigs-pin/bands-pin at
    # sf0.1 measured all three identical (~1.8-2.0 s on the prod twin).
    bands = portable_minhash_bands(d, words=words)
    # in-array group expansion (ARCHITECTURE.md §7) — same shape as the
    # production _minhash_pair_estimates; the signature vector rides the
    # group array once and the match count is computed map-side, so only
    # the 8-byte estimate reaches the pair-dedup shuffle. The oracle keeps
    # its equi-join formulation (values, not plan shapes, are the contract).
    alive = (
        bands.groupBy("band_id", "band_key")
        .agg(F.count(F.lit(1)).alias("bs"))
        .filter((F.col("bs") >= 2) & (F.col("bs") <= MH_BAND_CAP))
        .drop("bs")
    )
    groups = (
        bands.join(alive, ["band_id", "band_key"])
        .groupBy("band_id", "band_key")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "ms"))).alias("members"))
        .repartition(d.sparkSession.sparkContext.defaultParallelism)
    )
    return (
        _expand_member_pairs_streaming(groups)
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            (
                F.aggregate(
                    F.zip_with("a.ms", "b.ms", lambda x, y: (x == y).cast("int")),
                    F.lit(0),
                    lambda acc, v: acc + v,
                ).cast("double")
                / PMH_HASHES
            ).alias("est_jaccard"),
        )
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.first("est_jaccard").alias("est_jaccard"))
    )


@register(
    "dedup_hybrid_verify",
    _PMH_COMMON_SQL
    + f"""
    SELECT s.doc_id_a, s.doc_id_b, s.est_jaccard,
           {_PMH_DOT}
             / (sqrt({_PMH_DOT_AA}) * sqrt({_PMH_DOT_BB})) AS cosine
    FROM scored s
    JOIN embeddings ea ON ea.vec_id = s.doc_id_a
    JOIN embeddings eb ON eb.vec_id = s.doc_id_b
    ORDER BY s.est_jaccard DESC, cosine DESC, s.doc_id_a ASC, s.doc_id_b ASC
    LIMIT 20
    """,
)
def dedup_hybrid_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-signal dedup verification: lexical near-dup candidates
    (portable MinHash) re-scored with the SEMANTIC signal — the embedding
    cosine of the same document pair. The two-signal pattern separates
    true duplicates (high on both) from templated boilerplate (high lexical,
    low semantic) and paraphrases (the reverse); candidates still come only
    from the LSH equi-join, and the embedding join is keyed, so the whole
    thing stays linear in candidate count. Docs without embeddings drop out
    (inner join) — at sf0.1 only the embedded subset participates, same on
    both engines."""
    from fpl_data_pipeline_spark.operators.similarity import _dot, _norm

    d = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    cands = _portable_minhash_candidates(d)
    ea = emb.select(F.col("vec_id").alias("doc_id_a"), F.col("embedding").alias("va"))
    eb = emb.select(F.col("vec_id").alias("doc_id_b"), F.col("embedding").alias("vb"))
    cos = (_dot("va", "vb") / (_norm("va") * _norm("vb"))).alias("cosine")
    return (
        cands.join(ea, "doc_id_a")
        .join(eb, "doc_id_b")
        .select("doc_id_a", "doc_id_b", "est_jaccard", cos)
        .orderBy(
            F.col("est_jaccard").desc(),
            F.col("cosine").desc(),
            F.col("doc_id_a").asc(),
            F.col("doc_id_b").asc(),
        )
        .limit(20)
    )


@register(
    "dedup_apply_summary",
    _PMH_COMMON_SQL
    + """
    , pairs AS (
      SELECT doc_id_a AS u, doc_id_b AS v FROM scored WHERE est_jaccard >= 0.5
    ),
    edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
    reach AS (
      SELECT u AS a, v AS b FROM edges
      UNION
      SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u
    ),
    labels AS (
      SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id FROM reach GROUP BY a
    ),
    removed AS (SELECT doc_id FROM labels WHERE doc_id <> cluster_id)
    SELECT (SELECT COUNT(*) FROM documents) AS n_before,
           (SELECT COUNT(*) FROM removed) AS n_removed,
           (SELECT COUNT(*) FROM documents) - (SELECT COUNT(*) FROM removed) AS n_after,
           (SELECT COUNT(DISTINCT cluster_id) FROM labels) AS n_dup_clusters
    """,
)
def dedup_apply_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's END PRODUCT: apply canonical-keeper selection
    (cluster_id = min doc_id keeps, every other member is removed) and
    report the cleaned-corpus accounting — before/removed/after/cluster
    counts. The removal itself is one anti-join of the corpus against the
    removed-id set; at 100 TB that set is duplicate-count-sized and joins
    on the table's primary key. Fully oracle-checked through the portable
    sketch pipeline and the recursive-CTE components."""
    d = table(spark, sf_dir, "documents")
    pairs = (
        _portable_minhash_candidates(d)
        .filter(F.col("est_jaccard") >= 0.5)
        .select("doc_id_a", "doc_id_b")
    )
    labels = connected_components(pairs)
    removed = labels.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    cleaned = d.join(removed, "doc_id", "left_anti")  # the actual deduped corpus
    n_before = d.count()
    n_after = cleaned.count()
    n_clusters = labels.select("cluster_id").distinct().count()
    return spark.createDataFrame(
        [(n_before, n_before - n_after, n_after, n_clusters)],
        "n_before long, n_removed long, n_after long, n_dup_clusters long",
    )


# --- character n-gram Jaccard (tokenizer-free, language-agnostic) -----------
CHAR_NGRAM = 8


@register(
    "dedup_charngram_jaccard",
    f"""
    WITH norm AS (
      SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(length(t) - {CHAR_NGRAM - 2}, 1)),
               i -> substr(t, i, {CHAR_NGRAM}))) AS gs
      FROM norm
      WHERE length(t) >= {CHAR_NGRAM}
    ),
    exploded0 AS (SELECT doc_id, unnest(gs) AS g FROM grams),
    freq AS (SELECT g, COUNT(*) AS df FROM exploded0 GROUP BY g),
    exploded AS (
      SELECT e.doc_id, e.g FROM exploded0 e JOIN freq USING (g)
      WHERE df <= {SHINGLE_DF_CAP}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM exploded GROUP BY doc_id),
    pair_inter AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS n_common
      FROM exploded a JOIN exploded b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_id_a, doc_id_b,
           CAST(n_common AS DOUBLE)
             / (sa.n_grams + sb.n_grams - n_common) AS jaccard
    FROM pair_inter
    JOIN sizes sa ON sa.doc_id = doc_id_a
    JOIN sizes sb ON sb.doc_id = doc_id_b
    ORDER BY jaccard DESC, doc_id_a ASC, doc_id_b ASC
    LIMIT 20
    """,
)
def dedup_charngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character 8-gram Jaccard — the tokenizer-FREE dedup path: word
    shingling under-segments scripts without whitespace (CJK, Thai) and
    over-merges agglutinative text, while char n-grams are uniform across
    scripts (the CCNet/OSCAR convention). Same scale discipline as the word
    path: distinct grams per doc, document-frequency cap, candidate pairs
    from the shared-gram equi-join — never n². Docs shorter than the gram
    width contribute nothing on both engines."""
    d = table(spark, sf_dir, "documents")
    base = _ensure_parallel(d).select(
        "doc_id", _norm_text(F.col("text")).alias("t")
    )
    grams = F.when(
        F.length("t") >= CHAR_NGRAM,
        F.transform(
            F.sequence(F.lit(1), F.length("t") - (CHAR_NGRAM - 1)),
            lambda i: F.col("t").substr(i, F.lit(CHAR_NGRAM)),
        ),
    )
    sh = base.select("doc_id", F.explode(F.array_distinct(grams)).alias("g"))
    return (
        _set_overlap_stats(sh, "g", ids=d)
        .select(
            "doc_id_a",
            "doc_id_b",
            (
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), F.col("doc_id_a").asc(), F.col("doc_id_b").asc())
        .limit(20)
    )


# --- containment near-dup: subset/quotation detection ------------------------
@register(
    "dedup_containment_pairs",
    f"""
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
    exploded0 AS (SELECT doc_id, unnest(gs) AS shingle FROM grams),
    freq AS (SELECT shingle, COUNT(*) AS df FROM exploded0 GROUP BY shingle),
    exploded AS (
      SELECT e.doc_id, e.shingle FROM exploded0 e JOIN freq USING (shingle)
      WHERE df <= {SHINGLE_DF_CAP}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM exploded GROUP BY doc_id),
    pair_inter AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS n_common
      FROM exploded a JOIN exploded b
        ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_id_a AS contained_doc, doc_id_b AS container_doc,
           round(CAST(n_common AS DOUBLE) / sa.n, 9) AS containment,
           round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 9) AS jaccard
    FROM pair_inter
    JOIN sizes sa ON sa.doc_id = doc_id_a
    JOIN sizes sb ON sb.doc_id = doc_id_b
    WHERE sa.n <= sb.n
    ORDER BY containment DESC, jaccard DESC, contained_doc ASC, container_doc ASC
    LIMIT 20
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC containment dedup: containment(A in B) = |A∩B| / |A| —
    catches the quote/subset duplicates symmetric Jaccard dilutes (a
    paragraph fully copied into a 10x longer doc has jaccard ~0.1 but
    containment 1.0). Directed pairs: the smaller shingle set is the
    candidate contained side. Same capped-shingle equi-join candidates; the
    jaccard rides along to show the two scores separate."""
    d = table(spark, sf_dir, "documents")
    return (
        _set_overlap_stats(shingles(d), "shingle", directed=True, ids=d)
        .filter(F.col("na") <= F.col("nb"))
        .select(
            F.col("doc_id_a").alias("contained_doc"),
            F.col("doc_id_b").alias("container_doc"),
            F.round(F.col("n_common").cast("double") / F.col("na"), 9).alias("containment"),
            F.round(
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                9,
            ).alias("jaccard"),
        )
        .orderBy(
            F.col("containment").desc(),
            F.col("jaccard").desc(),
            F.col("contained_doc").asc(),
            F.col("container_doc").asc(),
        )
        .limit(20)
    )


# --- consensus dedup: pairs flagged by >= 2 independent sketch families -----
CONSENSUS_MIN_SIGNALS = 2
CONSENSUS_EST_JACCARD = 0.5
CONSENSUS_EXACT_JACCARD = 0.5
CONSENSUS_MAX_HAMMING = 3


def _consensus_oracle_sql() -> str:
    perm_mins = ", ".join(f"MIN({_pmh_perm_sql(i)}) AS m{i}" for i in range(PMH_HASHES))
    band_union = " UNION ALL ".join(_pmh_band_sql(b) for b in range(PMH_BANDS))
    match_sum = " + ".join(
        f"CASE WHEN am{i} = bm{i} THEN 1 ELSE 0 END" for i in range(PMH_HASHES)
    )
    cand_cols = ", ".join(f"a.m{i} AS am{i}, b.m{i} AS bm{i}" for i in range(PMH_HASHES))
    return f"""
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
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(unnest(gs)), 1, 15))::BIGINT AS h0
      FROM grams
    ),
    sigs AS (SELECT doc_id, {perm_mins} FROM hashed GROUP BY doc_id),
    bands AS ({band_union}),
    mh_cand AS (
      SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, {cand_cols}
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ),
    mh_edges AS (
      SELECT doc_id_a, doc_id_b FROM mh_cand
      WHERE CAST(({match_sum}) AS DOUBLE) / {PMH_HASHES} >= {CONSENSUS_EST_JACCARD}
    ),
    ng_exploded0 AS (SELECT doc_id, unnest(gs) AS shingle FROM grams),
    ng_freq AS (SELECT shingle, COUNT(*) AS df FROM ng_exploded0 GROUP BY shingle),
    ng_exploded AS (
      SELECT e.doc_id, e.shingle
      FROM ng_exploded0 e JOIN ng_freq USING (shingle)
      WHERE df <= {SHINGLE_DF_CAP}
    ),
    ng_sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM ng_exploded GROUP BY doc_id),
    ng_inter AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS n_common
      FROM ng_exploded a JOIN ng_exploded b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    ng_edges AS (
      SELECT doc_id_a, doc_id_b
      FROM ng_inter
      JOIN ng_sizes sa ON sa.doc_id = doc_id_a
      JOIN ng_sizes sb ON sb.doc_id = doc_id_b
      WHERE CAST(n_common AS DOUBLE)
              / (sa.n_shingles + sb.n_shingles - n_common) >= {CONSENSUS_EXACT_JACCARD}
    ),
    sh_toks AS (
      SELECT doc_id,
             ('0x' || substr(md5(unnest(list_filter(ws, w -> w <> ''))), 1, 15))::BIGINT AS h
      FROM words
    ),
    sh_bitsums AS (
      SELECT doc_id, b.b AS bit,
             SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM sh_toks CROSS JOIN (SELECT unnest(range(0, {PSH_BITS})) AS b) b
      GROUP BY doc_id, b.b
    ),
    sh_sims AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
      FROM sh_bitsums GROUP BY doc_id
    ),
    sh_keyed AS (
      SELECT doc_id, simhash, chunk_id,
             (simhash >> (chunk_id * {PSH_CHUNK_BITS})) & {(1 << PSH_CHUNK_BITS) - 1} AS chunk_val
      FROM (SELECT doc_id, simhash, unnest(range(0, {PSH_CHUNKS})) AS chunk_id FROM sh_sims)
    ),
    sh_oksz AS (
      SELECT chunk_id, chunk_val FROM sh_keyed
      GROUP BY chunk_id, chunk_val
      HAVING COUNT(*) BETWEEN 2 AND {SIMHASH_CHUNK_CAP}
    ),
    sh_edges AS (
      SELECT doc_id_a, doc_id_b FROM (
        SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               a.simhash AS sh_a, b.simhash AS sh_b
        FROM sh_keyed a
        JOIN sh_oksz s ON s.chunk_id = a.chunk_id AND s.chunk_val = a.chunk_val
        JOIN sh_keyed b
          ON a.chunk_id = b.chunk_id AND a.chunk_val = b.chunk_val
         AND a.doc_id < b.doc_id
      ) WHERE bit_count(xor(sh_a, sh_b)) <= {CONSENSUS_MAX_HAMMING}
    ),
    signals AS (
      SELECT doc_id_a, doc_id_b, 'minhash' AS signal FROM mh_edges
      UNION ALL
      SELECT doc_id_a, doc_id_b, 'ngram' FROM ng_edges
      UNION ALL
      SELECT doc_id_a, doc_id_b, 'simhash' FROM sh_edges
    )
    SELECT doc_id_a, doc_id_b,
           CAST(COUNT(*) AS BIGINT) AS n_signals,
           string_agg(signal, ',' ORDER BY signal) AS signals
    FROM signals
    GROUP BY doc_id_a, doc_id_b
    HAVING COUNT(*) >= {CONSENSUS_MIN_SIGNALS}
    ORDER BY n_signals DESC, doc_id_a ASC, doc_id_b ASC
    LIMIT 50
    """


@register("dedup_consensus_pairs", None)
def dedup_consensus_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble near-dup decision: a pair is a duplicate only when flagged
    by at least CONSENSUS_MIN_SIGNALS of three *independent* sketch
    families — portable MinHash (est Jaccard >= 0.5), exact df-capped
    n-gram Jaccard (>= 0.5), and portable SimHash (hamming <= 3). Voting
    across signal families is how production corpora suppress each
    family's characteristic false positives (MinHash banding collisions,
    SimHash near-threshold noise) without losing recall to any single
    family's blind spot.

    Scale shape: the three candidate generators are the already-audited
    banded equi-joins; the vote is one groupBy on the pair key whose input
    is three near-dup edge lists (tiny relative to the corpus). The oracle
    replays all three pipelines and the vote in one WITH tree."""
    d = table(spark, sf_dir, "documents")
    # Round-12 (guide §2.4 "remove passes outright"): the three families
    # each re-scanned + re-tokenized the corpus up to their first pinned
    # relation (3 parquet scans + 3 regex-split passes in the before-plan),
    # while the oracle's WITH tree always shared one ``words`` CTE.
    # Tokenize ONCE, pin the (doc_id, ws) relation, and hand it to each
    # family's ``words=`` parameter — the same tokenize-once pattern
    # candidate_cap_audit uses across its monitored families; each family's
    # gram/hash/band logic is byte-identical.
    words = doc_words(d).localCheckpoint(eager=False)
    mh = (
        _portable_minhash_candidates(d, words=words)
        .filter(F.col("est_jaccard") >= CONSENSUS_EST_JACCARD)
        .select("doc_id_a", "doc_id_b", F.lit("minhash").alias("signal"))
    )
    ng = (
        _ngram_jaccard_pairs(d, words=words)
        .filter(F.col("jaccard") >= CONSENSUS_EXACT_JACCARD)
        .select("doc_id_a", "doc_id_b", F.lit("ngram").alias("signal"))
    )
    sh = (
        _portable_simhash_pairs(d, words=words)
        .filter(F.col("hamming") <= CONSENSUS_MAX_HAMMING)
        .select("doc_id_a", "doc_id_b", F.lit("simhash").alias("signal"))
    )
    return (
        mh.unionByName(ng)
        .unionByName(sh)
        .groupBy("doc_id_a", "doc_id_b")
        .agg(
            F.count(F.lit(1)).alias("n_signals"),
            F.concat_ws(",", F.array_sort(F.collect_list("signal"))).alias("signals"),
        )
        .filter(F.col("n_signals") >= CONSENSUS_MIN_SIGNALS)
        .orderBy(F.col("n_signals").desc(), F.col("doc_id_a").asc(), F.col("doc_id_b").asc())
        .limit(50)
    )


ORACLE_SQL["dedup_consensus_pairs"] = _consensus_oracle_sql()


# --- segment-level boilerplate detection (round 4) --------------------------
SEG_WORDS = 8


@register(
    "dedup_segment_boilerplate",
    f"""
    WITH norm AS (
      SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
      FROM documents
    ),
    words AS (SELECT doc_id, string_split(t, ' ') AS ws FROM norm),
    segs AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, len(ws) // {SEG_WORDS} + 1),
               i -> array_to_string(
                      ws[(i-1)*{SEG_WORDS}+1 : (i-1)*{SEG_WORDS}+{SEG_WORDS}], ' ')
             )) AS seg
      FROM words
    ),
    seg_df AS (SELECT seg, COUNT(DISTINCT doc_id) AS ddf FROM segs GROUP BY seg),
    per_doc AS (
      SELECT s.doc_id,
             COUNT(*) AS n_segments,
             CAST(SUM(CASE WHEN d.ddf >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
      FROM segs s JOIN seg_df d USING (seg)
      GROUP BY s.doc_id
    )
    SELECT doc_id, n_segments, n_boiler,
           CAST(n_boiler AS DOUBLE) / n_segments AS boiler_ratio
    FROM per_doc
    ORDER BY boiler_ratio DESC, doc_id ASC
    LIMIT 20
    """,
)
def dedup_segment_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style segment-level boilerplate detection: each document is cut
    into non-overlapping 8-word segments (the stand-in for lines/paragraphs
    in this unpunctuated corpus), each segment is counted across DISTINCT
    documents, and a document's boilerplate ratio is the fraction of its
    segments that recur in at least one OTHER copy of the corpus — the
    signal used to strip shared headers/footers/nav chrome before training.

    100 TB shape: one explode (linear in corpus tokens), one hash agg on the
    segment key for the distinct-doc frequency, one equi-join back on that
    same key (AQE reuses the partitioning) — never any pairwise comparison.
    Top-20 by ratio keeps the result stable and small at any scale.
    """
    d = table(spark, sf_dir, "documents")
    words = d.select("doc_id", _norm_words(F.col("text")).alias("ws"))
    # CASE-guard: sequence(1, 0) is DESCENDING in Spark (same hazard as
    # shingles()); docs shorter than one segment contribute zero rows.
    segs_arr = F.when(
        F.size("ws") >= SEG_WORDS,
        F.transform(
            F.sequence(F.lit(1), F.floor(F.size("ws") / SEG_WORDS).cast("int")),
            lambda i: F.concat_ws(
                " ", F.slice(F.col("ws"), (i - 1) * SEG_WORDS + 1, SEG_WORDS)
            ),
        ),
    )
    # positional segments (NOT distinct: a segment repeated inside one doc
    # counts toward that doc's denominator each time it appears)
    segs = words.select("doc_id", F.explode(segs_arr).alias("seg")).localCheckpoint(
        eager=False
    )
    seg_df = segs.groupBy("seg").agg(F.countDistinct("doc_id").alias("ddf"))
    per_doc = (
        segs.join(seg_df, "seg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.when(F.col("ddf") >= 2, 1).otherwise(0)).alias("n_boiler"),
        )
    )
    return (
        per_doc.select(
            "doc_id",
            "n_segments",
            "n_boiler",
            (F.col("n_boiler").cast("double") / F.col("n_segments")).alias(
                "boiler_ratio"
            ),
        )
        .orderBy(F.col("boiler_ratio").desc(), F.col("doc_id").asc())
        .limit(20)
    )


# --- duplicate-graph degree histogram (round 4) -----------------------------
@register(
    "dupgraph_degree_stats",
    f"""
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
    exploded0 AS (SELECT doc_id, unnest(gs) AS shingle FROM grams),
    freq AS (SELECT shingle, COUNT(*) AS df FROM exploded0 GROUP BY shingle),
    exploded AS (
      SELECT e.doc_id, e.shingle
      FROM exploded0 e JOIN freq USING (shingle)
      WHERE df <= {SHINGLE_DF_CAP}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM exploded GROUP BY doc_id),
    pair_inter AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS n_common
      FROM exploded a JOIN exploded b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT doc_id_a, doc_id_b,
             CAST(n_common AS DOUBLE)
               / (sa.n_shingles + sb.n_shingles - n_common) AS jaccard
      FROM pair_inter
      JOIN sizes sa ON sa.doc_id = doc_id_a
      JOIN sizes sb ON sb.doc_id = doc_id_b
    ),
    edges AS (
      SELECT doc_id_a AS doc_id FROM scored WHERE jaccard >= 0.5
      UNION ALL
      SELECT doc_id_b FROM scored WHERE jaccard >= 0.5
    ),
    deg AS (SELECT doc_id, COUNT(*) AS degree FROM edges GROUP BY doc_id)
    SELECT degree, COUNT(*) AS n_docs
    FROM deg
    GROUP BY degree
    ORDER BY degree ASC
    """,
)
def dupgraph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the near-duplicate graph (exact word-3-gram
    Jaccard >= 0.5 edges): how many documents have exactly d near-dup
    neighbors. The shape of this histogram is the dedup planner's sizing
    input — a heavy tail means giant clusters (boilerplate mirrors, spam
    farms) that dominate removal; a thin tail means pairwise dups only.

    Reuses the df-capped candidate pipeline (_ngram_jaccard_pairs), so the
    scale properties are inherited: candidate generation is the capped
    shingle equi-join, never n^2; the histogram itself is two tiny hash
    aggregations over the edge list.
    """
    d = table(spark, sf_dir, "documents")
    edges = (
        _ngram_jaccard_pairs(d)
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_id_a", "doc_id_b")
    )
    deg = (
        edges.select(F.col("doc_id_a").alias("doc_id"))
        .unionAll(edges.select(F.col("doc_id_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.col("degree").asc())
    )


# --- MinHash estimate-error eval (round 4) ----------------------------------
@register(
    "minhash_estimate_error",
    _PMH_COMMON_SQL
    + """
    , ex AS (SELECT doc_id, unnest(gs) AS shingle FROM grams),
    szs AS (SELECT doc_id, COUNT(*) AS ns FROM ex GROUP BY doc_id),
    inter AS (
      SELECT s.doc_id_a, s.doc_id_b, COUNT(*) AS n_common
      FROM scored s
      JOIN ex a ON a.doc_id = s.doc_id_a
      JOIN ex b ON b.doc_id = s.doc_id_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    ),
    evald AS (
      SELECT s.doc_id_a, s.doc_id_b, s.est_jaccard,
             CAST(COALESCE(i.n_common, 0) AS DOUBLE)
               / (sa.ns + sb.ns - COALESCE(i.n_common, 0)) AS exact_jaccard
      FROM scored s
      LEFT JOIN inter i
        ON i.doc_id_a = s.doc_id_a AND i.doc_id_b = s.doc_id_b
      JOIN szs sa ON sa.doc_id = s.doc_id_a
      JOIN szs sb ON sb.doc_id = s.doc_id_b
    )
    SELECT doc_id_a, doc_id_b, est_jaccard, exact_jaccard,
           abs(est_jaccard - exact_jaccard) AS abs_err
    FROM evald
    ORDER BY abs_err DESC, doc_id_a ASC, doc_id_b ASC
    LIMIT 20
    """,
)
def minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy eval for the MinHash family (the dedup analog of
    ann_recall_eval): for every LSH candidate pair, the 16-hash estimated
    Jaccard next to the EXACT shingle-set Jaccard, worst estimates first.
    This is the harness that tells you whether to spend more hashes/bands
    before a production dedup run — estimator bias is measured on the real
    corpus, not assumed from theory.

    Scale shape: exact verification is computed ONLY for candidate pairs
    (candidates x their shingles equi-join — linear in candidate count x
    doc length), never all pairs; uses the portable md5 family end-to-end
    so every stage is value-checked by the oracle.
    """
    d = table(spark, sf_dir, "documents")
    # pinned: the candidate relation now feeds the semi-join bound below
    # AND the est/exact join — one banding pass, not two
    cand = _portable_minhash_candidates(d).localCheckpoint(eager=False)
    sh = shingles(d).localCheckpoint(eager=False)
    # Round-11: exact verification via per-doc shingle ARRAYS +
    # array_intersect (the prefix-filter round-8 shape) instead of joining
    # the candidate list against the exploded (doc_id, shingle) relation
    # twice — one row per doc enters the joins, the intersection size is
    # computed map-side, and the pair left-join disappears (an empty
    # intersect IS the n_common = 0 case). sh is (doc_id, shingle)-distinct
    # so |array_intersect| == the old per-pair row count.
    #
    # Round-12 (round-11 ADVICE): semi-join the shingle relation to the
    # docs that actually appear in a candidate pair BEFORE the collect_list
    # groupBy — the old shape buffered a full per-doc shingle array for
    # EVERY corpus doc, where the candidate set (and therefore every array
    # the joins can consume) is bounded by the banding. Docs outside the
    # candidate set never survive the inner joins, so results are
    # unchanged; aggregation state is now bounded by the candidate set.
    cand_docs = (
        cand.select(F.col("doc_id_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_id_b").alias("doc_id")))
    )
    doc_sets = (
        sh.join(cand_docs, "doc_id", "leftsemi")
        .groupBy("doc_id")
        .agg(F.collect_list("shingle").alias("gs"), F.count(F.lit(1)).alias("ns"))
    )
    n_common = F.size(F.array_intersect("ga", "gb"))
    return (
        cand.join(
            doc_sets.select(
                F.col("doc_id").alias("doc_id_a"),
                F.col("gs").alias("ga"),
                F.col("ns").alias("na"),
            ),
            "doc_id_a",
        )
        .join(
            doc_sets.select(
                F.col("doc_id").alias("doc_id_b"),
                F.col("gs").alias("gb"),
                F.col("ns").alias("nb"),
            ),
            "doc_id_b",
        )
        .select(
            "doc_id_a",
            "doc_id_b",
            "est_jaccard",
            (
                n_common.cast("double") / (F.col("na") + F.col("nb") - n_common)
            ).alias("exact_jaccard"),
        )
        .withColumn("abs_err", F.abs(F.col("est_jaccard") - F.col("exact_jaccard")))
        .orderBy(F.col("abs_err").desc(), F.col("doc_id_a").asc(), F.col("doc_id_b").asc())
        .limit(20)
    )


# --- exact-substring span matches (Lee et al. '22 dedup signal) -------------
SPAN_N = 5  # gram width: a shared run of L grams certifies L+N-1 shared tokens
SPAN_DF_CAP = 1000  # same anti-skew role as SHINGLE_DF_CAP / WINNOW_FP_CAP


@register(
    "dedup_span_matches",
    f"""
    WITH norm AS (
      SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
      FROM documents
    ),
    words AS (SELECT doc_id, string_split(t, ' ') AS ws FROM norm),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, greatest(len(ws) - {SPAN_N - 2}, 1)),
               i -> {{'pos': i - 1,
                      'h': substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                  || ' ' || ws[i+3] || ' ' || ws[i+4]), 1, 16)}}
             )) AS u
      FROM words
      WHERE len(ws) >= {SPAN_N}
    ),
    hashed AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM grams),
    freq AS (SELECT h, COUNT(DISTINCT doc_id) AS df FROM hashed GROUP BY h),
    capped AS (
      SELECT x.doc_id, x.pos, x.h
      FROM hashed x JOIN freq USING (h)
      WHERE df <= {SPAN_DF_CAP}
    ),
    matched AS (
      SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa, b.pos AS pb
      FROM capped a JOIN capped b ON a.h = b.h AND a.doc_id < b.doc_id
    ),
    diag AS (
      SELECT da, db, pa,
             pa - ROW_NUMBER() OVER (
               PARTITION BY da, db, pa - pb ORDER BY pa ASC) AS grp,
             pa - pb AS dg
      FROM matched
    ),
    runs AS (
      SELECT da, db, dg, grp, COUNT(*) AS run_len
      FROM diag GROUP BY da, db, dg, grp
    ),
    per_pair AS (
      SELECT da, db, MAX(run_len) AS max_run, CAST(SUM(run_len) AS BIGINT) AS n_matched
      FROM runs GROUP BY da, db
    )
    SELECT da AS doc_id_a, db AS doc_id_b,
           CAST(max_run + {SPAN_N - 1} AS BIGINT) AS span_tokens,
           n_matched AS n_matched_grams
    FROM per_pair
    ORDER BY span_tokens DESC, doc_id_a ASC, doc_id_b ASC
    LIMIT 20
    """,
)
def dedup_span_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    return span_matches(table(spark, sf_dir, "documents"))


def span_matches(d: DataFrame, df_cap: int = SPAN_DF_CAP) -> DataFrame:
    """Longest exact shared token run per near-dup pair — the
    exact-substring-dedup signal (Lee et al. '22, "Deduplicating Training
    Data Makes Language Models Better"): a run of L consecutive matching
    {SPAN_N}-gram positions certifies an exact shared substring of
    L+{SPAN_N - 1} tokens, without ever materializing suffix arrays.

    Shape: positional {SPAN_N}-gram hashes (one posexplode), df-capped
    equi-join on the hash (linear shuffle, fan-out bounded like every other
    dedup family), then gaps-and-islands per (pair, diagonal): consecutive
    match positions on the same pa-pb diagonal share pa - row_number, so
    one window + one aggregate finds every maximal run. Top-20 pairs by
    certified span length.
    """
    per_pair = span_pair_spans(d, df_cap)
    return per_pair.orderBy(
        F.col("span_tokens").desc(), F.col("doc_id_a").asc(), F.col("doc_id_b").asc()
    ).limit(20)


def span_positional_hashes(d: DataFrame, words: DataFrame | None = None) -> DataFrame:
    """(doc_id, pos, h) positional SPAN_N-gram hashes — the keyed relation
    under span_pair_spans, split out so candidate_cap_audit can report
    SPAN_DF_CAP drops from the same code."""
    return ordered_shingles(d, n=SPAN_N, words=words).select(
        "doc_id", "pos", F.substring(F.md5("shingle"), 1, 16).alias("h")
    )


def span_pair_spans(d: DataFrame, df_cap: int = SPAN_DF_CAP) -> DataFrame:
    """The full (un-truncated) per-pair span table — split out so
    tools/scale_probe.py can measure candidate growth across corpus
    scales; span_matches surfaces its top-20."""
    hashed = span_positional_hashes(d)
    # in-array group expansion (ARCHITECTURE.md §7): one groupBy on the
    # positional-gram hash collects every (doc_id, pos) occurrence, and
    # cross-doc position pairs explode map-side (members sort by doc_id
    # first, so i<j with a.doc_id < b.doc_id enumerates exactly the old
    # join's da<db rows).
    #
    # The df cap (distinct DOCS per hash, as before) is a count-agg
    # PRE-pass (round-7 migration): the round-4..6 shape filtered
    # size(array_distinct(members)) AFTER the collect, buffering a
    # boilerplate hash's full occurrence set in one aggregation buffer —
    # the same OOM trap the other capped families already closed. A
    # single-doc hash (dd=1) can only emit same-doc pairs that the da<db
    # filter drops, so dd >= 2 in the pre-pass prunes it without changing
    # the output.
    keep = (
        hashed.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("dd"))
        .filter((F.col("dd") >= 2) & (F.col("dd") <= df_cap))
        .drop("dd")
    )
    groups = (
        hashed.join(keep, "h")
        .groupBy("h")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "pos"))).alias("members"))
        .repartition(d.sparkSession.sparkContext.defaultParallelism)
    )
    matched = _expand_member_pairs_streaming(groups).select(
        F.col("a.doc_id").alias("da"),
        F.col("b.doc_id").alias("db"),
        F.col("a.pos").alias("pa"),
        F.col("b.pos").alias("pb"),
    ).filter(F.col("da") < F.col("db"))
    w = Window.partitionBy("da", "db", F.col("pa") - F.col("pb")).orderBy(
        F.col("pa").asc()
    )
    diag = matched.select(
        "da",
        "db",
        (F.col("pa") - F.col("pb")).alias("dg"),
        (F.col("pa") - F.row_number().over(w)).alias("grp"),
    )
    runs = diag.groupBy("da", "db", "dg", "grp").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    per_pair = runs.groupBy("da", "db").agg(
        F.max("run_len").alias("max_run"), F.sum("run_len").alias("n_matched")
    )
    return per_pair.select(
        F.col("da").alias("doc_id_a"),
        F.col("db").alias("doc_id_b"),
        (F.col("max_run") + (SPAN_N - 1)).alias("span_tokens"),
        F.col("n_matched").alias("n_matched_grams"),
    )


# --- threshold-sensitivity sweep (dedup tuning harness) ---------------------
@register(
    "dedup_threshold_sweep",
    f"""
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
    exploded0 AS (SELECT doc_id, unnest(gs) AS shingle FROM grams),
    freq AS (SELECT shingle, COUNT(*) AS df FROM exploded0 GROUP BY shingle),
    exploded AS (
      SELECT e.doc_id, e.shingle
      FROM exploded0 e JOIN freq USING (shingle)
      WHERE df <= {SHINGLE_DF_CAP}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM exploded GROUP BY doc_id),
    pair_inter AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS n_common
      FROM exploded a JOIN exploded b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT CAST(n_common AS DOUBLE)
               / (sa.n_shingles + sb.n_shingles - n_common) AS jaccard
      FROM pair_inter
      JOIN sizes sa ON sa.doc_id = doc_id_a
      JOIN sizes sb ON sb.doc_id = doc_id_b
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN jaccard >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge_50,
           CAST(SUM(CASE WHEN jaccard >= 0.6 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge_60,
           CAST(SUM(CASE WHEN jaccard >= 0.7 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge_70,
           CAST(SUM(CASE WHEN jaccard >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge_80,
           CAST(SUM(CASE WHEN jaccard >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge_90
    FROM scored
    """,
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-sensitivity curve of the exact-Jaccard candidate set: how
    many pairs survive at 0.5/0.6/0.7/0.8/0.9 — the tuning input for
    choosing the dedup cut (a cliff between two thresholds means a distinct
    near-dup population; a smooth tail means paraphrase drift). One extra
    conditional-sum aggregate on the pipeline every dedup family already
    runs; no new shuffle."""
    scored = _ngram_jaccard_pairs(table(spark, sf_dir, "documents"))
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_candidates")] + [
        F.sum(F.when(F.col("jaccard") >= t / 100.0, 1).otherwise(0))
        .cast("bigint")
        .alias(f"n_ge_{t}")
        for t in (50, 60, 70, 80, 90)
    ]
    return scored.agg(*aggs)


# --- prefix-filtering set-similarity join (PPJoin-style candidates) ---------
# Jaccard >= T with T = PF_NUM/PF_DEN; prefix length uses exact integer
# arithmetic (ceil(T*n) == (PF_NUM*n + PF_DEN-1) div PF_DEN) so both engines
# cut identical prefixes.
PF_NUM, PF_DEN = 7, 10


@register(
    "dedup_prefix_filter_pairs",
    f"""
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
    ex AS (SELECT doc_id, unnest(gs) AS shingle FROM grams),
    freq AS (SELECT shingle, COUNT(*) AS df FROM ex GROUP BY shingle),
    ranked AS (
      SELECT e.doc_id, e.shingle,
             ROW_NUMBER() OVER (PARTITION BY e.doc_id
                                ORDER BY f.df ASC, e.shingle ASC) AS r,
             COUNT(*) OVER (PARTITION BY e.doc_id) AS n
      FROM ex e JOIN freq f USING (shingle)
    ),
    prefix AS (
      SELECT doc_id, shingle
      FROM ranked
      WHERE r <= n - (({PF_NUM} * n + {PF_DEN - 1}) // {PF_DEN}) + 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      FROM prefix a JOIN prefix b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
    inter AS (
      SELECT p.da, p.db, COUNT(*) AS n_common
      FROM cand p
      JOIN ex a ON a.doc_id = p.da
      JOIN ex b ON b.doc_id = p.db AND b.shingle = a.shingle
      GROUP BY p.da, p.db
    )
    SELECT i.da AS doc_id_a, i.db AS doc_id_b,
           CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.da
    JOIN sizes sb ON sb.doc_id = i.db
    WHERE CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common)
            >= CAST({PF_NUM} AS DOUBLE) / {PF_DEN}
    ORDER BY jaccard DESC, doc_id_a ASC, doc_id_b ASC
    LIMIT 20
    """,
)
def dedup_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return prefix_filter_pairs(table(spark, sf_dir, "documents"))


def prefix_filter_pairs(d: DataFrame) -> DataFrame:
    """Set-similarity join via PREFIX FILTERING (PPJoin family, Xiao et al.
    '08): order each document's shingles globally by rarity (df asc,
    shingle asc) and join only on each doc's first n - ceil(T*n) + 1
    shingles. Completeness is provable: two sets with Jaccard >= T must
    share at least one prefix token under any common global order — so
    unlike the df-cap heuristic, recall at the threshold is exact BY
    CONSTRUCTION, while the candidate join touches only rare tokens (the
    prefix skips exactly the high-df head that generates the quadratic
    fan-out). Verification then computes exact Jaccard ONLY on candidate
    pairs (join keyed through the candidate list, linear in candidates x
    doc size, never corpus x corpus).

    tests/test_round5_ops.py proves recall against the exhaustive join and
    measures the candidate-set reduction on a planted corpus.
    """
    sh = _hashed_shingles(shingles(d)).localCheckpoint(eager=False)
    # Round-11 split of the doc-level frame: _prefix_docs (df count-agg +
    # df join + sorted-struct collect, the family's most expensive agg)
    # used to be recompiled FOUR times — once per self-join side of the
    # candidate build and once per verify join side. But only the
    # candidate stage needs the rarity ranking; pin the (doc_id, n,
    # prefix) projection ONCE (the prefix arrays are the ~30% rarity tail,
    # far smaller than the full gs arrays whose materialization measured
    # worse in round 8: 5.3 s vs 3.3 s warm), and give the verify sides a
    # PLAIN unranked collect each — array_intersect is order-insensitive
    # and sh is (doc_id, shingle)-distinct, so the unsorted lists verify
    # identically while skipping the df join and the struct sort entirely.
    docs_pref = _prefix_docs(sh).select("doc_id", "n", "prefix").localCheckpoint(
        eager=False
    )
    cand = _candidates_from_docs(docs_pref)
    # Verification via per-doc shingle ARRAYS + array_intersect instead of
    # exploded-row joins: one row per document enters the candidate joins
    # (not n_shingles rows), intersection size is computed map-side inside
    # codegen, and the shuffle volume of the verify phase drops by the
    # average document length. At 100 TB its join shuffles one array row
    # per doc instead of hundreds of shingle rows.
    doc_sets = sh.groupBy("doc_id").agg(
        F.collect_list("shingle").alias("gs"), F.count(F.lit(1)).alias("n")
    )
    da_sets = doc_sets.select(
        F.col("doc_id").alias("da"), F.col("gs").alias("ga"), F.col("n").alias("na")
    )
    db_sets = doc_sets.select(
        F.col("doc_id").alias("db"), F.col("gs").alias("gb"), F.col("n").alias("nb")
    )
    inter = (
        cand.join(da_sets, "da")
        .join(db_sets, "db")
        .select(
            "da",
            "db",
            "na",
            "nb",
            F.size(F.array_intersect("ga", "gb")).alias("n_common"),
        )
    )
    jac = (
        F.col("n_common").cast("double")
        / (F.col("na") + F.col("nb") - F.col("n_common"))
    )
    return (
        inter.select(
            F.col("da").alias("doc_id_a"),
            F.col("db").alias("doc_id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= float(PF_NUM) / PF_DEN)
        .orderBy(F.col("jaccard").desc(), F.col("doc_id_a").asc(), F.col("doc_id_b").asc())
        .limit(20)
    )


def _hashed_shingles(sh: DataFrame) -> DataFrame:
    """Swap the trigram STRING for its xxhash64 before the prefix-filter
    pipeline: the family never outputs shingles — only doc-id pairs and
    Jaccard — so every downstream exchange, sort, equi-join and
    array_intersect runs on 8-byte longs instead of ~30-byte strings.
    Measured solo: neutral at sf0.1 (CPU-bound small corpus, ~3.3 s both
    ways) but 2.2x at the 10x blowup (16.5 -> 7.3 s warm, shuffle write
    453 -> 339 MB) — string comparison inside the per-doc sort_array and
    the candidate equi-join is what stops scaling first. The rarity order
    becomes (df, hv) — still one total order applied identically to all
    docs, which is all the PPJoin completeness proof requires. A 2^-64
    hash collision would merge two tokens corpus-wide, consistently for
    every document (symmetric for both sides of any pair), nudging one
    intersection count; the value oracle is still exact on every tested
    corpus and the top-20 output carries no hash-derived columns."""
    return sh.select("doc_id", F.xxhash64("shingle").alias("shingle"))


def _prefix_docs(sh: DataFrame) -> DataFrame:
    """Doc-level frame for the prefix-filter family: per doc, the full
    shingle array ``gs``, its size ``n``, and the rarity-ordered PPJoin
    prefix array ``prefix`` — ONE groupBy(doc_id) after the df join
    produces all three (array sort_array over (df, shingle) structs
    replaces the per-doc window, and sizes + verify arrays come from the
    same aggregation instead of two further corpus-wide shuffles)."""
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    docs = (
        sh.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("df"), F.col("shingle")))
            ).alias("ranked"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return docs.select(
        "doc_id",
        F.transform("ranked", lambda x: x["shingle"]).alias("gs"),
        "n",
        F.expr(
            f"slice(transform(ranked, x -> x.shingle), 1,"
            f" cast(n - (({PF_NUM} * n + {PF_DEN - 1}) div {PF_DEN}) + 1 as int))"
        ).alias("prefix"),
    )


def _candidates_from_docs(docs: DataFrame) -> DataFrame:
    # Deliberately NOT the in-array group expansion every other family
    # uses: the prefix relation is tiny relative to the corpus (only the
    # rarity-ordered prefix tokens survive), so Catalyst broadcasts one
    # join side and the candidate step runs with ZERO shuffles of the
    # prefix rows — a groupBy-based expansion would force two exchanges
    # where the optimizer currently needs none. Measured at the 10x
    # blowup: join 18.0 s vs expansion 24.5 s cold (solo, n=2 each). At a
    # scale where the prefix relation stops being broadcastable, AQE
    # degrades this to a shuffle join — the same cost the expansion pays
    # up front.
    prefix = docs.select("doc_id", "n", F.explode("prefix").alias("shingle"))
    a = prefix.select(F.col("doc_id").alias("da"), F.col("n").alias("na"), "shingle")
    b = prefix.select(F.col("doc_id").alias("db"), F.col("n").alias("nb"), "shingle")
    # PPJoin length filter: Jaccard >= T forces T*max(na,nb) <= min(na,nb);
    # pruning size-incompatible candidates BEFORE the verification join cuts
    # its fan-out. Sizes ride along on the prefix rows (no extra join).
    return (
        a.join(b, "shingle")
        .filter(F.col("da") < F.col("db"))
        .filter(
            F.lit(PF_NUM) * F.greatest("na", "nb")
            <= F.lit(PF_DEN) * F.least("na", "nb")
        )
        .select("da", "db")
        .distinct()
        .localCheckpoint(eager=False)
    )


def prefix_candidate_pairs(d: DataFrame, sh: DataFrame | None = None) -> DataFrame:
    """The prefix-filtering candidate stage (rarity-ordered prefixes +
    PPJoin length filter) — split out so tools/scale_probe.py can measure
    candidate growth across corpus scales. ``sh`` lets the caller share an
    already-checkpointed shingle set."""
    if sh is None:
        sh = shingles(d).localCheckpoint(eager=False)
    return _candidates_from_docs(_prefix_docs(_hashed_shingles(sh)))


# --- intra-document duplicate segments (within-doc repetition removal) ------
INTRA_SEG_WORDS = 2  # segment width; production corpora use 8+ (see docstring)


@register(
    "dedup_intradoc_segments",
    f"""
    WITH norm AS (
      SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
      FROM documents
    ),
    words AS (SELECT doc_id, string_split(t, ' ') AS ws FROM norm),
    segs AS (
      SELECT doc_id, u.seg AS seg, u.pos AS pos
      FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(1, greatest(len(ws) // {INTRA_SEG_WORDS}, 0) + 1),
                 i -> {{'pos': i - 1,
                        'seg': ws[(i-1) * {INTRA_SEG_WORDS} + 1] || ' '
                               || ws[(i-1) * {INTRA_SEG_WORDS} + 2]}})) AS u
        FROM words
      )
    ),
    ranked AS (
      SELECT doc_id, seg, pos,
             ROW_NUMBER() OVER (PARTITION BY doc_id, seg ORDER BY pos ASC) AS occ
      FROM segs
    )
    SELECT doc_id,
           COUNT(*) AS n_segments,
           CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_segments,
           FLOOR(CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) * 1000000 + 0.5) / 1000000 AS dup_fraction
    FROM ranked
    GROUP BY doc_id
    ORDER BY n_dup_segments DESC, doc_id ASC
    LIMIT 20
    """,
)
def dedup_intradoc_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document repetition: how much of each document is a repeat of
    an earlier segment of ITSELF — the complement of the cross-document
    families (navigation loops, templated sections, stuttering generation
    artifacts all show up here; Gopher's repetition rules threshold this
    family of signals, this operator emits the removable-segment inventory).
    Keeps the FIRST occurrence of each segment per doc; later occurrences
    are the removable set.

    Segment width is {INTRA_SEG_WORDS} words here so the small-vocabulary
    synthetic corpus exhibits real within-doc repeats; production corpora
    use 8+ (the cross-doc boilerplate op's SEG_WORDS). Shape: one
    fixed-stride segmentation (map-side), one (doc, segment) window —
    partitioned by doc, never global — and a per-doc aggregate."""
    d = table(spark, sf_dir, "documents")
    words = d.select("doc_id", _norm_words(F.col("text")).alias("ws"))
    n_segs = F.floor(F.size("ws") / INTRA_SEG_WORDS).cast("int")
    segs = words.select(
        "doc_id",
        F.posexplode(
            F.when(
                n_segs >= 1,
                F.transform(
                    F.sequence(F.lit(1), n_segs),
                    lambda i: F.concat_ws(
                        " ",
                        *[
                            F.element_at(
                                F.col("ws"), (i - 1) * INTRA_SEG_WORDS + k + 1
                            )
                            for k in range(INTRA_SEG_WORDS)
                        ],
                    ),
                ),
            )
        ).alias("pos", "seg"),
    )
    w = Window.partitionBy("doc_id", "seg").orderBy(F.col("pos").asc())
    ranked = segs.withColumn("occ", F.row_number().over(w))
    dup = F.when(F.col("occ") > 1, 1).otherwise(0)
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(dup).cast("bigint").alias("n_dup_segments"),
            (
                F.floor(
                    F.sum(dup).cast("double") / F.count(F.lit(1)) * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("dup_fraction"),
        )
        .orderBy(F.col("n_dup_segments").desc(), F.col("doc_id").asc())
        .limit(20)
    )


# --- cross-source duplication matrix (feed-mirroring attribution) -----------
@register(
    "dedup_cross_source_matrix",
    """
    WITH fp AS (
      SELECT doc_id, source,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
      FROM documents
    ),
    pairs AS (
      SELECT LEAST(a.source, b.source) AS source_a,
             GREATEST(a.source, b.source) AS source_b,
             COUNT(*) AS n_dup_pairs
      FROM fp a JOIN fp b
        ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, CAST(n_dup_pairs AS BIGINT) AS n_dup_pairs
    FROM pairs
    ORDER BY n_dup_pairs DESC, source_a ASC, source_b ASC
    LIMIT 20
    """,
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHO duplicates WHOM: exact-duplicate pair counts per (source_a,
    source_b) — the feed-mirroring attribution behind dedup accounting.
    Diagonal entries (a == b) are within-feed re-crawls; heavy off-diagonal
    entries are mirror/aggregator feeds whose ingestion should be demoted
    BEFORE dedup burns compute on them (the operational decision
    dedup_apply_summary's totals can't localize).

    Same scale shape as every exact-dedup op: one md5 fingerprint per doc,
    one equi-join on the fingerprint (fan-out bounded by duplicate-family
    sizes), one two-key hash aggregate."""
    d = table(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id", "source", F.md5(_norm_text(F.col("text"))).alias("fp")
    )
    a = fp.select(F.col("doc_id").alias("ida"), F.col("source").alias("sa"), "fp")
    b = fp.select(F.col("doc_id").alias("idb"), F.col("source").alias("sb"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("ida") < F.col("idb"))
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_dup_pairs"))
        .orderBy(
            F.col("n_dup_pairs").desc(), F.col("source_a").asc(), F.col("source_b").asc()
        )
        .limit(20)
    )


# --- LSH operating-point audit: theory vs measured S-curve -------------------
# The (b, r) banding choice is the ONE free parameter of MinHash-LSH, and
# its whole contract is the S-curve P(candidate | jaccard=s) = 1-(1-s^r)^b.
# This audits that contract on the corpus itself: for every exact-Jaccard
# pair (the capped word-3-gram family — the engine's defined jaccard), did
# the portable banding emit it as a candidate? Bucketed by jaccard decile,
# measured candidate rate vs the analytic curve — the recall/efficiency
# evidence a dedup operator owes before its threshold ships. A bucket whose
# measured rate falls visibly below theory means band-key collisions or cap
# interference; one above means correlated permutations.
#
# Scale shape: both inputs are the existing bounded families (the df-capped
# exact pair set and the band-capped candidate set); the audit adds one
# pair-keyed LEFT join and a 10-row aggregate. Determinism: buckets are
# exact integer math ((10*n_common) div union); the theoretical rate is
# quantized per pair to integer micro-units BEFORE the sum (a raw double
# SUM would be partition-order-dependent); powers are expanded to products
# (s*s etc.) because pow() is not bit-identical across libm
# implementations while *, -, / are IEEE-exact on both engines.


@register(
    "lsh_operating_point",
    _PMH_COMMON_SQL
    + f"""
    , exploded0 AS (SELECT doc_id, unnest(gs) AS shingle FROM grams),
    freq AS (SELECT shingle, COUNT(*) AS df FROM exploded0 GROUP BY shingle),
    exploded AS (
      SELECT e.doc_id, e.shingle
      FROM exploded0 e JOIN freq USING (shingle)
      WHERE df <= {SHINGLE_DF_CAP}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM exploded GROUP BY doc_id),
    pair_inter AS (
      SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS n_common
      FROM exploded a JOIN exploded b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jp AS (
      SELECT doc_id_a, doc_id_b, n_common,
             sa.n_shingles AS na, sb.n_shingles AS nb
      FROM pair_inter
      JOIN sizes sa ON sa.doc_id = doc_id_a
      JOIN sizes sb ON sb.doc_id = doc_id_b
    ),
    audit0 AS (
      SELECT LEAST((10 * n_common) // (na + nb - n_common), 9) AS j_bucket,
             CAST(n_common AS DOUBLE) / (na + nb - n_common) AS s,
             CASE WHEN c.doc_id_a IS NULL THEN 0 ELSE 1 END AS is_cand
      FROM jp LEFT JOIN (SELECT DISTINCT doc_id_a, doc_id_b FROM scored) c
        USING (doc_id_a, doc_id_b)
    ),
    audit AS (
      SELECT j_bucket, is_cand,
             CAST(floor((1 - ((1 - (s*s)*(s*s)) * (1 - (s*s)*(s*s)))
                             * ((1 - (s*s)*(s*s)) * (1 - (s*s)*(s*s))))
                        * 1000000 + 0.5) AS BIGINT) AS p6
      FROM audit0
    )
    SELECT CAST(j_bucket AS BIGINT) AS j_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(is_cand) AS BIGINT) AS n_candidates,
           floor(CAST(SUM(is_cand) AS DOUBLE) / COUNT(*) * 1000000 + 0.5)
             / 1000000 AS candidate_rate,
           floor(CAST(SUM(p6) AS DOUBLE) / COUNT(*) + 0.5) / 1000000
             AS theoretical_rate
    FROM audit
    GROUP BY j_bucket
    ORDER BY j_bucket
    """,
)
def lsh_operating_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured vs theoretical MinHash-LSH candidate rate per exact-Jaccard
    decile, for the portable (b=4, r=4) banding: (j_bucket, n_pairs,
    n_candidates, candidate_rate, theoretical_rate). The abscissa is the
    capped-universe jaccard (the engine's defined jaccard; divergence from
    the sketch's uncapped view exists only where the df caps fire, which
    candidate_cap_audit reports separately)."""
    d = table(spark, sf_dir, "documents")
    stats = _set_overlap_stats(shingles(d), "shingle", ids=d)
    cand = (
        _portable_minhash_candidates(d)
        .select("doc_id_a", "doc_id_b")
        .withColumn("is_cand", F.lit(1))
    )
    u = F.col("na") + F.col("nb") - F.col("n_common")
    s = F.col("n_common").cast("double") / u
    s4 = (s * s) * (s * s)
    q = F.lit(1) - s4
    p = F.lit(1) - (q * q) * (q * q)
    audit = (
        stats.join(cand, ["doc_id_a", "doc_id_b"], "left")
        .select(
            F.least(
                F.expr("(10 * n_common) div (na + nb - n_common)"), F.lit(9)
            ).alias("j_bucket"),
            F.coalesce(F.col("is_cand"), F.lit(0)).alias("is_cand"),
            F.floor(p * 1000000 + F.lit(0.5)).cast("long").alias("p6"),
        )
    )
    return (
        audit.groupBy("j_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("is_cand").alias("n_candidates"),
            (
                F.floor(
                    F.sum("is_cand").cast("double")
                    / F.count(F.lit(1))
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("candidate_rate"),
            (
                F.floor(
                    F.sum("p6").cast("double") / F.count(F.lit(1)) + F.lit(0.5)
                )
                / 1000000
            ).alias("theoretical_rate"),
        )
        .orderBy("j_bucket")
    )


# --- content-defined chunking (CDC) dedup ------------------------------------
# The storage-dedup classic (rsync/LBFS/FastCDC), word-granular: a chunk
# boundary falls AFTER every word whose hash = 0 mod CDC_G, so boundaries
# are decided by CONTENT, not position — an insertion re-chunks only the
# chunk it lands in, and every later chunk (and its hash) survives
# verbatim. That is the modality the fixed n-gram families lack: shift a
# document by one word and every 3-gram changes, but ~all CDC chunks
# persist. Average chunk length = CDC_G words (geometric).
#
# Scale shape: NO pair join anywhere — the whole operator is two hash
# aggregations (chunk assembly per doc, chunk-hash document frequency)
# plus one equi-join of the chunk relation against the B-bounded df
# table, all linear in corpus size. The cumulative-sum chunk id is a
# per-doc window (the events sessionization shape — partition-local,
# never global). Portability: boundaries come from md5 (identical on
# both engines); chunk text is position-ordered; every rate follows the
# floor(x*1e6+0.5) convention.
CDC_G = 8  # expected words per chunk


@register(
    "dedup_cdc_chunks",
    f"""
    WITH norm AS (
      SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
      FROM documents
    ),
    toks AS (
      SELECT n.doc_id, r.i AS pos, ws[r.i] AS word
      FROM (SELECT doc_id, string_split(t, ' ') AS ws FROM norm) n,
           unnest(range(1, len(ws) + 1)) AS r(i)
      WHERE ws[r.i] <> ''
    ),
    flagged AS (
      SELECT doc_id, pos, word,
             CASE WHEN ('0x' || substr(md5(word), 1, 8))::BIGINT % {CDC_G} = 0
                  THEN 1 ELSE 0 END AS bf
      FROM toks
    ),
    cids AS (
      SELECT doc_id, pos, word,
             SUM(bf) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS UNBOUNDED PRECEDING) - bf AS chunk_id
      FROM flagged
    ),
    chunks AS (
      SELECT doc_id, chunk_id,
             md5(string_agg(word, ' ' ORDER BY pos)) AS chash
      FROM cids GROUP BY doc_id, chunk_id
    ),
    cdf AS (
      SELECT chash, COUNT(DISTINCT doc_id) AS ddf FROM chunks GROUP BY chash
    ),
    per_doc AS (
      SELECT c.doc_id,
             COUNT(*) AS n_chunks,
             CAST(SUM(CASE WHEN f.ddf >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup
      FROM chunks c JOIN cdf f USING (chash)
      GROUP BY c.doc_id
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(COALESCE(p.n_chunks, 0)) AS BIGINT) AS n_chunks,
           CAST(SUM(COALESCE(p.n_dup, 0)) AS BIGINT) AS n_dup_chunks,
           floor(CAST(SUM(COALESCE(p.n_dup, 0)) AS DOUBLE)
                 / greatest(SUM(COALESCE(p.n_chunks, 0)), 1)
                 * 1000000 + 0.5) / 1000000 AS dup_chunk_rate
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source content-defined-chunk duplication: (source, n_docs,
    n_chunks, n_dup_chunks, dup_chunk_rate), where a chunk is duplicated
    when its hash appears in >= 2 distinct documents. The
    insertion-robustness property (edit one word, later chunks survive)
    is pinned by tests/test_round8_ops.py against a planted edit."""
    d = table(spark, sf_dir, "documents")
    # Round-12 (guide §2.4 "remove shuffles outright"): chunk assembly is
    # now fully MAP-SIDE. The old shape posexploded every token, shuffled
    # and sorted the whole token relation per doc for a cumulative-sum
    # window, then re-assembled chunks with a collect_list aggregate — an
    # Exchange + Sort of the corpus's entire token stream whose only
    # purpose was to regroup words that were already adjacent in the
    # per-doc array. Here the boundary positions, chunk slices and chunk
    # hashes are computed inside the words array (whole-stage codegen, no
    # per-token row ever leaves the scan stage), and only the ~tokens/G
    # chunk-hash rows are exploded. Chunk strings are identical: a chunk
    # is the run of words ENDING at each boundary word (the old
    # cumsum-minus-own-flag id), plus the trailing partial chunk; the
    # zip_with's s <= e filter drops exactly the empty trailing chunk a
    # doc ending on a boundary word would produce. Tokenization is the
    # one-pass form (token-identical, see _norm_words); the boundary
    # decision pmod(conv(md5[..8]), G) = 0 is byte-for-byte the old one.
    docs = _ensure_parallel(d).select(
        "doc_id", _norm_words(F.col("text")).alias("ws")
    )
    bp = (
        f"filter(transform(ws, (w, i) -> IF(pmod(CAST(conv(substring(md5(w), 1, 8),"
        f" 16, 10) AS BIGINT), {CDC_G}) = 0, i + 1, -1)), p -> p > 0)"
    )
    chashes = (
        f"filter(zip_with(concat(array(1), transform(bp, p -> p + 1)),"
        f" concat(bp, array(size(ws))),"
        f" (s, e) -> IF(s <= e, md5(array_join(slice(ws, s, e - s + 1), ' ')),"
        f" CAST(NULL AS STRING))), x -> x IS NOT NULL)"
    )
    chunks = (
        docs.withColumn("bp", F.expr(bp))
        .select("doc_id", F.explode(F.expr(chashes)).alias("chash"))
    )
    cdf = chunks.groupBy("chash").agg(F.countDistinct("doc_id").alias("ddf"))
    per_doc = (
        chunks.join(cdf, "chash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("ddf") >= 2, 1).otherwise(0)).alias("n_dup"),
        )
    )
    n_chunks = F.sum(F.coalesce(F.col("n_chunks"), F.lit(0)))
    n_dup = F.sum(F.coalesce(F.col("n_dup"), F.lit(0)))
    return (
        d.select("doc_id", "source")
        .join(per_doc, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            n_chunks.alias("n_chunks"),
            n_dup.alias("n_dup_chunks"),
            (
                F.floor(
                    n_dup.cast("double")
                    / F.greatest(n_chunks, F.lit(1))
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("dup_chunk_rate"),
        )
        .orderBy("source")
    )
