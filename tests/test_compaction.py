"""Compaction-planner invariants beyond oracle parity: partition
completeness (every file in exactly one bin, sizes conserved), run
contiguity (bins never interleave in layout order), and target coverage
(after every non-final bin, cumulative rows have reached the next target
boundary — i.e. the pack never emits two consecutive undersized files)."""

from __future__ import annotations

import pyspark.sql.functions as F

from fpl_data_pipeline_spark.sources.compaction import TARGET_ROWS, compaction_bins
from fpl_data_pipeline_spark.tables import table

SF = "/root/testdata/sf0.001"


def _packed(spark):
    e = table(spark, SF, "events")
    files = e.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("size"))
    return files, compaction_bins(files, "day", "hour", "size", TARGET_ROWS)


def test_every_file_in_exactly_one_bin(spark):
    files, packed = _packed(spark)
    assert packed.count() == files.count()
    assert packed.filter(F.col("bin_id").isNull()).count() == 0
    tot = files.agg(F.sum("size")).first()[0]
    tot_packed = packed.agg(F.sum("size")).first()[0]
    assert tot == tot_packed


def test_bins_are_contiguous_runs(spark):
    """Within a day, the max hour of bin k precedes the min hour of bin
    k+1 — compaction preserves the time-clustered layout."""
    _, packed = _packed(spark)
    spans = (
        packed.groupBy("day", "bin_id")
        .agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
        .collect()
    )
    by_day = {}
    for r in spans:
        by_day.setdefault(r["day"], []).append((r["bin_id"], r["lo"], r["hi"]))
    for day, rows in by_day.items():
        rows.sort()
        for (b0, _, hi0), (b1, lo1, _) in zip(rows, rows[1:]):
            assert b1 == b0 + 1, f"bin ids not dense on {day}"
            assert hi0 < lo1, f"bins interleave on {day}"


def test_nonfinal_bins_reach_target(spark):
    """Streaming pack guarantee: when bin k+1 exists, the cumulative rows
    through bin k are >= (k+1)*TARGET — no premature small outputs."""
    _, packed = _packed(spark)
    sizes = (
        packed.groupBy("day", "bin_id")
        .agg(F.sum("size").alias("bin_rows"))
        .collect()
    )
    by_day = {}
    for r in sizes:
        by_day.setdefault(r["day"], []).append((r["bin_id"], r["bin_rows"]))
    for day, rows in by_day.items():
        rows.sort()
        cum = 0
        for i, (b, n) in enumerate(rows):
            cum += n
            if i < len(rows) - 1:
                assert cum >= (b + 1) * TARGET_ROWS, f"undersized non-final bin on {day}"
