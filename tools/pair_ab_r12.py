"""Round-12 A/B harness for the set-overlap pair stage (guide §1/§2).

Builds the charngram (or word-shingle) pair relation through several
candidate formulations of the expansion + aggregation and times each with
the noop sink, so the production change is decided by measurement:

  v0  current: slice-based streaming expansion, groupBy(doc_id_a, doc_id_b)
  v1  packed:  same expansion, groupBy(shiftleft(a,31)|b) single-long key
  v2  noslice: posexplode x2 + position filter (no per-anchor slice alloc)
  v3  packed + noslice

Each variant consumes the SAME wgroups relation (weighted distinct doc
sets), checkpointed once per variant run so the tokenize/gram stage is NOT
in the timed region — the pair stage is what differs.

Usage: python tools/pair_ab_r12.py [charngram|ngram] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from fpl_data_pipeline_spark import get_spark  # noqa: E402
from fpl_data_pipeline_spark.operators.dedup import (  # noqa: E402
    CHAR_NGRAM,
    SHINGLE_DF_CAP,
    _capped_key_groups,
    _norm_text,
    _ensure_parallel,
    shingles,
)
from fpl_data_pipeline_spark.tables import table  # noqa: E402


def charngram_sh(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    base = _ensure_parallel(d).select("doc_id", _norm_text(F.col("text")).alias("t"))
    grams = F.when(
        F.length("t") >= CHAR_NGRAM,
        F.transform(
            F.sequence(F.lit(1), F.length("t") - (CHAR_NGRAM - 1)),
            lambda i: F.col("t").substr(i, F.lit(CHAR_NGRAM)),
        ),
    )
    return base.select("doc_id", F.explode(F.array_distinct(grams)).alias("g")), "g"


def build_wgroups(sh, key_col):
    return (
        _capped_key_groups(sh.localCheckpoint(eager=False), key_col, SHINGLE_DF_CAP)
        .groupBy("docs")
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint()  # EAGER here: exclude gram build from the timed A/B
    )


def expansion_slice(pair_groups):
    anchored = pair_groups.select(
        "w", F.col("members").alias("_ms"), F.posexplode("members").alias("_i", "a")
    )
    return anchored.select(
        "w", "a", F.explode(F.expr("slice(_ms, _i + 2, size(_ms))")).alias("b")
    )


def expansion_noslice(pair_groups):
    anchored = pair_groups.select(
        "w", F.col("members").alias("_ms"), F.posexplode("members").alias("_i", "a")
    )
    return (
        anchored.select("w", "a", "_i", F.posexplode("_ms").alias("_j", "b"))
        .filter(F.col("_j") > F.col("_i"))
        .select("w", "a", "b")
    )


def agg_two_col(pairs):
    return (
        pairs.select(F.col("a").alias("doc_id_a"), F.col("b").alias("doc_id_b"), "w")
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.sum("w").alias("n_common"))
    )


def agg_packed(pairs):
    packed = pairs.select(F.expr("shiftleft(a, 31) | b").alias("ab"), "w")
    return (
        packed.groupBy("ab")
        .agg(F.sum("w").alias("n_common"))
        .select(
            F.shiftright("ab", 31).alias("doc_id_a"),
            F.col("ab").bitwiseAND(F.lit((1 << 31) - 1)).alias("doc_id_b"),
            "n_common",
        )
    )


def agg_packed_repart(pairs):
    """Packed key, but hash-repartition the RAW pair rows first so the
    (near-useless here — same pair lands in many map tasks) map-side
    partial aggregation runs post-shuffle instead of building a 4M-entry
    hash map per map task for ~no reduction."""
    packed = pairs.select(F.expr("shiftleft(a, 31) | b").alias("ab"), "w")
    par = pairs.sparkSession.sparkContext.defaultParallelism
    return (
        packed.repartition(par, "ab")
        .groupBy("ab")
        .agg(F.sum("w").alias("n_common"))
        .select(
            F.shiftright("ab", 31).alias("doc_id_a"),
            F.col("ab").bitwiseAND(F.lit((1 << 31) - 1)).alias("doc_id_b"),
            "n_common",
        )
    )


VARIANTS = {
    "v0_slice_twocol": lambda pg: agg_two_col(expansion_slice(pg)),
    "v1_slice_packed": lambda pg: agg_packed(expansion_slice(pg)),
    "v2_noslice_twocol": lambda pg: agg_two_col(expansion_noslice(pg)),
    "v3_noslice_packed": lambda pg: agg_packed(expansion_noslice(pg)),
    "v4_slice_packed_repart": lambda pg: agg_packed_repart(expansion_slice(pg)),
}


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "charngram"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("pair_ab_r12")
    spark.sparkContext.setLogLevel("ERROR")

    if which == "charngram":
        sh, key = charngram_sh(spark, sf_dir)
    else:
        sh, key = shingles(table(spark, sf_dir, "documents")), "shingle"

    par = spark.sparkContext.defaultParallelism
    wg = build_wgroups(sh, key)
    mx = wg.agg(
        F.max(F.element_at("docs", -1)).alias("mx"),
        F.min(F.element_at("docs", 1)).alias("mn"),
    ).first()
    n_pairs = (
        wg.filter(F.size("docs") >= 2)
        .agg(F.sum(F.expr("size(docs) * (size(docs) - 1) / 2")))
        .first()[0]
    )
    print(f"id range [{mx['mn']}, {mx['mx']}], pair emissions {n_pairs}")

    # correctness cross-check first (cheap count + sample hash)
    base = None
    for name, fn in VARIANTS.items():
        pg = wg.filter(F.size("docs") >= 2).repartition(par).select(
            F.col("docs").alias("members"), "w"
        )
        out = fn(pg)
        chk = out.agg(
            F.count(F.lit(1)),
            F.sum("n_common"),
            F.sum(F.expr("hash(doc_id_a, doc_id_b, n_common)")),
        ).first()
        chk = tuple(chk)
        if base is None:
            base = chk
        flag = "OK" if chk == base else "MISMATCH!!"
        print(f"{name}: rows={chk[0]} sum={chk[1]} hash={chk[2]} {flag}")

    for name, fn in VARIANTS.items():
        ts = []
        for _ in range(reps):
            pg = wg.filter(F.size("docs") >= 2).repartition(par).select(
                F.col("docs").alias("members"), "w"
            )
            out = fn(pg)
            spark.sparkContext.setJobDescription(f"pair_ab {name}")
            t0 = time.perf_counter()
            out.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: median {statistics.median(ts):.3f}s raw {[round(t,3) for t in ts]}")


if __name__ == "__main__":
    main()
