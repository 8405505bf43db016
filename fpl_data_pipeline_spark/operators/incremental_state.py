"""The shared deploy-state story for the incremental dedup families
(round-8 verdict task #5).

`dedup_incremental_batch` (text fingerprints) and `emb_incremental_neardup`
(banded sign-bit LSH keys) both answer the same deployment question — "which
of the arriving batch's items does the EXISTING corpus already contain?" —
and both, as registered sf-dir-pure queries, derive the corpus/batch split
from a content hash inside the query. A real 100 TB deployment instead
PERSISTS the state between increments:

- the text family's state is the distinct fingerprint set, bucketed on
  ``fp`` so every nightly batch probe is a co-located join against the
  state files with no state-side shuffle;
- the vector family's state is the LONG-FORM band-key relation
  (vec_id, band, k) — one row per (vector, band) — bucketed on (band, k):
  one probe join serves every band at once, and the state side again reads
  pre-shuffled. (The pre-round-9 wide form needed one join per band and
  scanned the state twice.)

This module holds that story once: builders (wide -> long), the probe
operators the registered queries now share, and the persist/load round trip
(sources/bucketing.py's catalog writer) that tests/test_incremental_state.py
drives through a two-batch sequencing scenario — batch2 must see batch1's
items as corpus after the state append.

Scale shape: state grows O(corpus) rows (x2 bands for vectors) and is
probed in O(batch x bucket-membership); the over-cap band drop (the
ND_BAND_CAP convention) keeps a boilerplate-heavy bucket from going
quadratic, observably (candidate_cap_audit). Nothing here is pair-quadratic
and nothing collects.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from fpl_data_pipeline_spark.sources.bucketing import write_bucketed

# default bucket counts: sized for ~128-256 MB bucket files at deploy scale;
# tiny in tests, which is fine (bucketing is a layout contract, not a size
# threshold)
STATE_BUCKETS = 8


def band_state_long(keys_wide: DataFrame, id_col: str = "vec_id",
                    band_cols: tuple = ("k0", "k1")) -> DataFrame:
    """(id, band, k) long form of a wide per-item band-key frame — the
    persisted shape: one row per (item, band), so ONE equi-join on
    (band, k) probes every band and the state table buckets on the join
    key it is always probed with."""
    args = ", ".join(f"{i}, {c}" for i, c in enumerate(band_cols))
    stack = F.expr(f"stack({len(band_cols)}, {args})")
    return keys_wide.select(F.col(id_col), stack.alias("band", "k"))


def probe_band_state(state: DataFrame, batch_keys: DataFrame,
                     cap: int) -> DataFrame:
    """Distinct (new_id, dup_of) candidates: batch items sharing an ALIVE
    (band, k) bucket with a corpus item. ``state``/``batch_keys`` are
    long-form (vec_id, band, k) frames (state may come straight from the
    persisted bucketed table). The alive pre-pass drops buckets whose
    membership exceeds ``cap`` — a bucket that a boilerplate corpus fills
    past the cap is non-discriminative, and its alive-set stays broadcast-
    sized because the band-key space is fixed-width."""
    alive = (
        state.groupBy("band", "k")
        .agg(F.count(F.lit(1)).alias("bs"))
        .filter(F.col("bs") <= cap)
        .drop("bs")
    )
    return (
        batch_keys.select(F.col("vec_id").alias("new_id"), "band", "k")
        .join(F.broadcast(alive), ["band", "k"])
        .join(state.select(F.col("vec_id").alias("dup_of"), "band", "k"),
              ["band", "k"])
        .select("new_id", "dup_of")
        .distinct()
    )


def probe_fingerprint_state(state: DataFrame, batch_fp: DataFrame) -> DataFrame:
    """(doc_id, status) for an arriving batch's (doc_id, fp) rows against
    the corpus fingerprint state (a 1-column distinct ``fp`` frame, read
    from the persisted bucketed table at deploy time): 'dup_of_corpus'
    when the fingerprint already exists, else 'new'. O(batch) probe join —
    the corpus pair space is never rescanned."""
    return batch_fp.join(
        state.withColumn("hit", F.lit(1)), "fp", "left"
    ).select(
        "doc_id",
        F.when(F.col("hit").isNotNull(), "dup_of_corpus")
        .otherwise("new")
        .alias("status"),
    )


def write_band_state(state: DataFrame, table_name: str, path: str,
                     num_buckets: int = STATE_BUCKETS) -> None:
    """Persist long-form band-key state bucketed on (band, k) — the probe
    join key — so increment probes read the state pre-shuffled."""
    write_bucketed(state, table_name, ["band", "k"], num_buckets, path)


def write_fingerprint_state(state: DataFrame, table_name: str, path: str,
                            num_buckets: int = STATE_BUCKETS) -> None:
    """Persist the distinct-fingerprint state bucketed on fp."""
    write_bucketed(state, table_name, ["fp"], num_buckets, path)


def append_band_state(spark: SparkSession, table_name: str,
                      new_keys: DataFrame) -> None:
    """Fold an accepted batch's band keys into the persisted state — the
    between-increments step of the deployment loop. bucketBy appends keep
    the bucketed layout, but each append adds one file set per bucket;
    run compact_band_state on the usual small-file cadence
    (sources/compaction.py's planner decides when)."""
    from fpl_data_pipeline_spark.sources.bucketing import _bucket_count

    new_keys.write.format("parquet").mode("append").bucketBy(
        _bucket_count(spark, table_name), "band", "k"
    ).sortBy("band", "k").saveAsTable(table_name)


def compact_band_state(spark: SparkSession, table_name: str,
                       path: str) -> None:
    """Rewrite the appended state table as one file set per bucket,
    preserving the bucketed layout (bucket count and keys read from the
    catalog). N appends leave N file sets per bucket — correct but
    ever-smaller files; this is the OPTIMIZE step of the deployment loop.
    ``path`` must be a NEW location: never an in-place overwrite of files
    a concurrent probe may be reading.

    Crash contract (honest, not atomic): the compacted copy is FULLY
    written under ``{table_name}__compacting`` before the old table is
    touched, so data is never at risk; the remaining window is two
    metadata ops (DROP old, RENAME new). A crash inside it leaves the
    catalog without ``table_name`` but with the complete ``__compacting``
    table — recovery is the same RENAME. A leftover ``__compacting`` from
    a prior crash is dropped first, making re-runs idempotent. (A real
    lakehouse deployment gets true atomicity from a table format with a
    transaction log; plain parquet + catalog cannot.)"""
    from fpl_data_pipeline_spark.sources.bucketing import (
        _bucket_count,
        write_bucketed,
    )

    tmp = f"{table_name}__compacting"
    n = _bucket_count(spark, table_name)
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    write_bucketed(spark.table(table_name), tmp, ["band", "k"], n, path)
    spark.sql(f"DROP TABLE {table_name}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {table_name}")
