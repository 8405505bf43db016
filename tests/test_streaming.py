"""Structured Streaming pipeline tests: availableNow drain equals the batch
computation; re-running with the same checkpoint is a no-op (exactly-once);
multimodal mapInPandas is batch-shape independent (SURVEY.md §2.10, M4)."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F
import pytest

from fpl_data_pipeline_spark.streaming.incremental import run_available_now, EVENT_SCHEMA
from fpl_data_pipeline_spark.tables import events_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_files(spark, tmp_path_factory):
    """Re-land events as microsecond parquet (streaming source files)."""
    root = tmp_path_factory.mktemp("stream")
    src = root / "source"
    events_table(spark, SF).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).repartition(4).write.parquet(str(src))
    return root


def _agg_state(spark, path):
    df = spark.read.parquet(path)
    return {
        (r["window_start"], r["event_type"]): r["n_events"] for r in df.collect()
    }


def test_available_now_matches_batch(spark, event_files):
    target = str(event_files / "hourly")
    ckpt = str(event_files / "ckpt")
    run_available_now(spark, str(event_files / "source"), target, ckpt)

    batch = (
        spark.read.schema(EVENT_SCHEMA)
        .parquet(str(event_files / "source"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    expected = {
        (r["window_start"], r["event_type"]): r["n_events"] for r in batch.collect()
    }
    assert _agg_state(spark, target) == expected


def test_rerun_same_checkpoint_is_noop(spark, event_files):
    target = str(event_files / "hourly")
    ckpt = str(event_files / "ckpt")
    before = _agg_state(spark, target)
    run_available_now(spark, str(event_files / "source"), target, ckpt)  # no new files
    assert _agg_state(spark, target) == before


def test_new_files_incrementally_merged(spark, event_files):
    """Land a new file beyond the watermark -> rerun -> its window appears;
    an event 9 days behind the watermark is dropped (correct late-data
    semantics under withWatermark('ts', '1 hour'))."""
    import datetime as dt

    target = str(event_files / "hourly")
    ckpt = str(event_files / "ckpt")
    before = _agg_state(spark, target)
    max_ts = max(k[0] for k in before)

    fresh_ts = max_ts + dt.timedelta(hours=2)
    too_late_ts = max_ts - dt.timedelta(days=9)
    new = spark.createDataFrame(
        [
            (999_999, fresh_ts, 1, "fresh_type", 1.0, "{}"),
            (999_998, too_late_ts, 1, "dropped_type", 1.0, "{}"),
        ],
        EVENT_SCHEMA,
    )
    new.write.mode("append").parquet(str(event_files / "source"))
    run_available_now(spark, str(event_files / "source"), target, ckpt)
    after = _agg_state(spark, target)
    assert after[(fresh_ts, "fresh_type")] == 1
    assert (too_late_ts, "dropped_type") not in after  # watermark drop
    # untouched windows unchanged
    assert all(after[k] == v for k, v in before.items())


def test_multimodal_batch_shape_independence(spark):
    from fpl_data_pipeline_spark.operators.multimodal import (
        extract_features,
        media_table,
    )

    media = media_table(spark, SF)
    small = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    out1 = extract_features(media.repartition(1)).orderBy("asset_id").collect()
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        out2 = extract_features(media.repartition(13)).orderBy("asset_id").collect()
    finally:
        if small:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", small)
        else:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    assert out1 == out2  # identical regardless of partitioning / Arrow batch size
    assert out1[0]["magic_hex"] is not None and len(out1[0]["features"]) == 8


def test_merge_recovers_from_crashed_swap(spark, event_files, tmp_path):
    """Crash-mid-swap recovery (streaming/incremental.py::merge_batch): a
    leftover .bak with the real table and a half-written .stage must be
    recovered/cleaned, and the merge must land on a consistent base."""
    import os

    src = str(event_files / "source")
    target = str(tmp_path / "hourly")
    ckpt1 = str(tmp_path / "ckpt1")
    run_available_now(spark, src, target, ckpt1)
    good = _agg_state(spark, target)

    # simulate a crash between the two renames: table moved to .bak,
    # .stage half-written garbage, target missing
    os.rename(target, target + ".bak")
    os.makedirs(target + ".stage")
    with open(target + ".stage/part-junk.parquet", "w") as f:
        f.write("not parquet")

    run_available_now(spark, src, target, str(tmp_path / "ckpt2"))
    assert _agg_state(spark, target) == good  # recovered, re-merged idempotently
    assert not os.path.exists(target + ".bak")
    assert not os.path.exists(target + ".stage")


def test_stream_stream_interval_join_matches_batch(spark, event_files, tmp_path):
    """Stream-stream interval join (click -> purchase within 1h, same user)
    under availableNow equals the batch interval join
    (streaming/incremental.py::run_stream_stream_join)."""
    from fpl_data_pipeline_spark.streaming.incremental import run_stream_stream_join

    src = str(event_files / "source")
    target = str(tmp_path / "attributed")
    run_stream_stream_join(spark, src, target, str(tmp_path / "ckpt"))

    ev = spark.read.schema(EVENT_SCHEMA).parquet(src)
    clicks = ev.filter("event_type = 'click'").selectExpr(
        "event_id AS click_id", "user_id", "ts AS click_ts"
    )
    purchases = ev.filter("event_type = 'purchase'").selectExpr(
        "event_id AS purchase_id", "user_id AS p_user", "ts AS purchase_ts",
        "value AS purchase_value"
    )
    batch = clicks.join(
        purchases,
        (clicks.user_id == purchases.p_user)
        & (purchases.purchase_ts >= clicks.click_ts)
        & (purchases.purchase_ts <= F.expr("click_ts + INTERVAL 1 HOUR")),
    )
    expected = {
        (r["click_id"], r["purchase_id"]) for r in batch.collect()
    }
    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.read.parquet(target).collect()
    }
    assert got == expected
    assert expected  # non-trivial: fixture actually contains matched pairs


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """Built-in streaming dedup: duplicate event_ids across micro-batches
    are suppressed while inside the watermark window — the declarative
    complement to the custom applyInPandasWithState dedup."""
    import datetime as dt

    src = str(tmp_path / "src")
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows1 = [(1, base, 1, "click", 1.0, "{}"), (2, base, 1, "click", 1.0, "{}")]
    rows2 = [(2, base, 1, "click", 1.0, "{}"), (3, base, 1, "click", 1.0, "{}")]  # 2 is a dup
    spark.createDataFrame(rows1, EVENT_SCHEMA).write.parquet(src)
    spark.createDataFrame(rows2, EVENT_SCHEMA).write.mode("append").parquet(src)

    out = str(tmp_path / "out")
    q = (
        spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]  # each id exactly once despite the cross-batch dup


def test_throttled_backfill_matches_unthrottled(spark, event_files, tmp_path):
    """maxFilesPerTrigger: a backfill processed in several bounded
    micro-batches (state/memory stays bounded) produces the same table as
    one big batch — the knob that makes availableNow safe on a 100 TB
    landing zone."""
    src = str(event_files / "source")
    target = str(tmp_path / "hourly_throttled")
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    from fpl_data_pipeline_spark.streaming.incremental import windowed_counts

    q = (
        windowed_counts(stream)
        .writeStream.outputMode("append")
        .format("parquet").option("path", target)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    progress = q.recentProgress
    assert len(progress) > 1  # genuinely ran multiple bounded micro-batches

    batch = (
        spark.read.schema(EVENT_SCHEMA).parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    expected = {(r["window_start"], r["event_type"]): r["n_events"] for r in batch.collect()}
    got = {(r["window_start"], r["event_type"]): r["n_events"]
           for r in spark.read.parquet(target).collect()}
    # Watermark semantics under throttling: each 1-file micro-batch advances
    # the watermark, so rows for an already-closed window arriving in a later
    # file are dropped as late data (files are not time-ordered). The
    # contract is therefore: only true windows are emitted, each at most its
    # batch count, never a window the batch doesn't have — and the unthrottled
    # single-batch equality is proven by test_available_now_matches_batch.
    assert got
    assert all(k in expected and v <= expected[k] for k, v in got.items())


def test_map_in_arrow_matches_map_in_pandas(spark):
    """mapInArrow — the zero-copy RecordBatch surface (no pandas
    materialization): byte-length accounting over the media table must
    equal the mapInPandas extractor's, completing the UDF API matrix."""
    import pyarrow as pa
    import pyspark.sql.functions as F

    from fpl_data_pipeline_spark.operators.multimodal import media_table

    media = media_table(spark, SF)

    def arrow_len(batches):
        for batch in batches:
            tbl = pa.table(batch)
            yield pa.RecordBatch.from_pydict(
                {
                    "asset_id": tbl["asset_id"].combine_chunks(),
                    "blob_len": pa.array(
                        [len(v.as_py() or b"") for v in tbl["media"]], pa.int64()
                    ),
                }
            )

    via_arrow = media.mapInArrow(arrow_len, "asset_id long, blob_len long")
    total_arrow = via_arrow.agg(F.sum("blob_len")).first()[0]
    total_meta = media.agg(F.sum("byte_len")).first()[0]
    assert total_arrow == total_meta
    assert via_arrow.count() == media.count()


def test_stream_static_dim_join_matches_batch(spark, event_files, tmp_path):
    """Stream-static join: the streaming micro-batches enrich against a
    STATIC broadcastable dim (user_id -> tier) and the drained result
    equals the equivalent batch join — the standard streaming dim-
    decoration shape (the static side is re-read per micro-batch, so dim
    updates between batches are picked up; here it is fixed)."""
    dim = spark.range(0, 2000).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 3).cast("int").alias("tier"),
    )
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(str(event_files / "source"))
        .join(F.broadcast(dim), "user_id")
        .groupBy("tier", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    target = tmp_path / "tiered"
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tiered_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["tier"], r["event_type"]): r["n"]
        for r in spark.sql("select * from tiered_counts").collect()
    }
    batch = (
        spark.read.schema(EVENT_SCHEMA)
        .parquet(str(event_files / "source"))
        .join(dim, "user_id")
        .groupBy("tier", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    expected = {(r["tier"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == expected and got
