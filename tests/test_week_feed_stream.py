"""The streaming week-feed Python DataSource: week-number offsets, sharded
per-week partitions, checkpoint-resumed incremental delivery — the
reference's high-water-mark protocol (includes.py get_id_data +
insert_week_* ordering) as a genuine Structured Streaming source."""

from __future__ import annotations

import json
import os

from fpl_data_pipeline_spark.sources.python_datasource import (
    WEEK_SHARDS,
    register_week_feed_source,
)


def _land_week(feed_dir: str, week: int, n_players: int = 6) -> None:
    doc = {
        "players": [
            {"id": i, "points": week * 10 + i, "minutes": 90 - i}
            for i in range(1, n_players + 1)
        ]
    }
    with open(os.path.join(feed_dir, f"week_{week}.json"), "w") as f:
        json.dump(doc, f)


def _drain(spark, feed_dir: str, checkpoint: str, sink_table: str) -> None:
    register_week_feed_source(spark)
    q = (
        spark.readStream.format("fpl_week_feed")
        .option("path", feed_dir)
        .load()
        .writeStream.format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_week_feed_delivers_all_landed_weeks(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    for w in (1, 2, 3):
        _land_week(str(feed), w)
    _drain(spark, str(feed), str(tmp_path / "ckpt"), "week_feed_sink")
    rows = spark.sql("SELECT * FROM week_feed_sink").collect()
    assert {r.week for r in rows} == {1, 2, 3}
    assert len(rows) == 3 * 6
    by_week_one = sorted(
        (r.player_id, r.points, r.minutes) for r in rows if r.week == 1
    )
    assert by_week_one == [(i, 10 + i, 90 - i) for i in range(1, 7)]


def _drain_to_parquet(spark, feed_dir: str, checkpoint: str, out_dir: str) -> None:
    register_week_feed_source(spark)
    q = (
        spark.readStream.format("fpl_week_feed")
        .option("path", feed_dir)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_week_feed_resumes_from_checkpoint_incrementally(spark, tmp_path):
    """Landing a new week and re-triggering with the SAME checkpoint must
    deliver ONLY the new week (offset advanced past weeks 1-2), and
    re-triggering with nothing new delivers nothing — the exactly-once
    week-delivery contract. Fault-tolerant parquet sink (the memory sink
    cannot recover from a checkpoint)."""
    feed = tmp_path / "feed"
    feed.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    for w in (1, 2):
        _land_week(str(feed), w)
    _drain_to_parquet(spark, str(feed), ckpt, out)
    first = spark.read.parquet(out).groupBy("week").count().collect()
    assert {r.week for r in first} == {1, 2}
    assert all(r["count"] == 6 for r in first)

    _land_week(str(feed), 3)
    _drain_to_parquet(spark, str(feed), ckpt, out)
    second = {r.week: r["count"] for r in spark.read.parquet(out).groupBy("week").count().collect()}
    # weeks 1-2 NOT re-delivered (still exactly 6 rows each), week 3 appended
    assert second == {1: 6, 2: 6, 3: 6}

    _drain_to_parquet(spark, str(feed), ckpt, out)
    third = spark.read.parquet(out).count()
    assert third == 18  # nothing new landed -> nothing delivered


def test_week_feed_shards_cover_all_players(spark, tmp_path):
    """Every player id lands in exactly one (week, shard) partition."""
    feed = tmp_path / "feed"
    feed.mkdir()
    _land_week(str(feed), 1, n_players=2 * WEEK_SHARDS + 1)
    _drain(spark, str(feed), str(tmp_path / "ckpt"), "week_feed_shards")
    rows = spark.sql("SELECT player_id FROM week_feed_shards").collect()
    ids = sorted(r.player_id for r in rows)
    assert ids == list(range(1, 2 * WEEK_SHARDS + 2))


def test_week_feed_out_of_order_week_still_delivered(spark, tmp_path):
    """A lower-numbered week landing AFTER a higher week was already
    committed must still be delivered: the offset is the delivered-week SET,
    not a max-week scalar that would silently skip below-offset weeks."""
    feed = tmp_path / "feed"
    feed.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    for w in (1, 3):
        _land_week(str(feed), w)
    _drain_to_parquet(spark, str(feed), ckpt, out)
    first = {r.week for r in spark.read.parquet(out).select("week").distinct().collect()}
    assert first == {1, 3}

    _land_week(str(feed), 2)  # late landing, below the committed max week
    _drain_to_parquet(spark, str(feed), ckpt, out)
    counts = {
        r.week: r["count"]
        for r in spark.read.parquet(out).groupBy("week").count().collect()
    }
    # week 2 delivered exactly once; weeks 1 and 3 not re-delivered
    assert counts == {1: 6, 2: 6, 3: 6}


def test_torn_publish_window_recovers_after_injected_crash(spark, tmp_path, monkeypatch):
    """Crash-inject the exact torn-publish window of the atomic-rename
    protocol: kill the run AFTER 'target renamed to backup' but BEFORE
    'stage renamed to target' (streaming/incremental.py merge_batch), then
    prove the next run's restore path (backup -> target, leftovers cleaned,
    uncommitted batch replayed) converges to the correct table."""
    import os

    import pytest as _pytest

    from fpl_data_pipeline_spark.streaming.incremental import run_week_feed_merge

    feed = tmp_path / "feed"
    feed.mkdir()
    target = str(tmp_path / "week_fact")
    ckpt = str(tmp_path / "ckpt")
    for w in (1, 2):
        _land_week(str(feed), w)
    run_week_feed_merge(spark, str(feed), target, ckpt)
    assert spark.read.parquet(target).count() == 12

    _land_week(str(feed), 3)
    real_rename = os.rename

    def crash_after_backup_rename(src, dst):
        real_rename(src, dst)
        if str(dst).endswith(".bak"):
            raise RuntimeError("injected crash: died between the two renames")

    with monkeypatch.context() as m:
        m.setattr(os, "rename", crash_after_backup_rename)
        with _pytest.raises(Exception, match="injected crash|Terminated with exception"):
            run_week_feed_merge(spark, str(feed), target, ckpt)

    # the torn state the crash leaves behind: target gone, old table in
    # backup, new version stranded in stage
    assert not os.path.exists(target)
    assert os.path.exists(target + ".bak")
    assert os.path.exists(target + ".stage")

    # next run: restore path recovers the table, the failed (uncommitted)
    # batch replays, and the keyed merge publishes weeks 1-3 exactly once
    run_week_feed_merge(spark, str(feed), target, ckpt)
    counts = {
        r.week: r["count"]
        for r in spark.read.parquet(target).groupBy("week").count().collect()
    }
    assert counts == {1: 6, 2: 6, 3: 6}
    assert not os.path.exists(target + ".bak")
    assert not os.path.exists(target + ".stage")


def test_week_feed_stream_merges_into_fact_table(spark, tmp_path):
    """Custom streaming source -> idempotent keyed merge, end to end:
    incremental drains accumulate weeks; a fresh-checkpoint full replay
    converges to the identical table (exactly-once via merge idempotency
    even without offset state)."""
    from fpl_data_pipeline_spark.streaming.incremental import run_week_feed_merge

    feed = tmp_path / "feed"
    feed.mkdir()
    target = str(tmp_path / "week_fact")
    for w in (1, 2):
        _land_week(str(feed), w)
    run_week_feed_merge(spark, str(feed), target, str(tmp_path / "ck1"))
    t1 = spark.read.parquet(target)
    assert t1.count() == 12
    assert {r.week for r in t1.select("week").distinct().collect()} == {1, 2}

    _land_week(str(feed), 3)
    run_week_feed_merge(spark, str(feed), target, str(tmp_path / "ck1"))
    # materialize BEFORE the next publish: the atomic rename replaces the
    # files a lazy DataFrame's scan would still point at
    rows2 = sorted(
        (r.week, r.player_id, r.points) for r in spark.read.parquet(target).collect()
    )
    assert len(rows2) == 18

    # full replay with a FRESH checkpoint: every week re-delivered, merge
    # keeps the table identical (keyed last-write-wins on equal rows)
    run_week_feed_merge(spark, str(feed), target, str(tmp_path / "ck2"))
    rows3 = sorted(
        (r.week, r.player_id, r.points) for r in spark.read.parquet(target).collect()
    )
    assert rows3 == rows2
