"""applyInPandasWithState operator contract: state accumulates across
micro-batches, emits once per (user, batch), and final running totals equal
the batch-mode aggregate (streaming/stateful.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from fpl_data_pipeline_spark.streaming.incremental import EVENT_SCHEMA
from fpl_data_pipeline_spark.streaming.stateful import user_running_profile
from fpl_data_pipeline_spark.tables import events_table

SF = "/root/testdata/sf0.001"


def test_state_accumulates_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    # two source files -> with maxFilesPerTrigger=1, two micro-batches
    ev = events_table(spark, SF).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(str(src / "b0"))
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(str(src / "b1"))

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    out = user_running_profile(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("profile_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = spark.sql("SELECT * FROM profile_out").collect()
    # every user appears once per micro-batch it had rows in; running totals
    # are the LAST emission per user
    per_user_emissions: dict[int, list] = {}
    for r in rows:
        per_user_emissions.setdefault(r["user_id"], []).append(r)
    assert max(len(v) for v in per_user_emissions.values()) == 2  # state crossed batches

    final = {
        u: max(rs, key=lambda r: r["n_events"]) for u, rs in per_user_emissions.items()
    }
    expected = {
        r["user_id"]: (r["n"], float(r["v"]))
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0).alias("v"),
        )
        .collect()
    }
    got = {u: (r["n_events"], r["total_value"]) for u, r in final.items()}
    assert got == expected
    # emissions within one batch never exceed the final count
    for u, rs in per_user_emissions.items():
        assert sum(r["batch_rows"] for r in rs) == expected[u][0]


def test_streaming_dedup_first_occurrence_only(spark, tmp_path):
    """A fingerprint seen in batch 1 must NOT re-emit in batch 2
    (streaming/stateful.py::streaming_dedup)."""
    import pyspark.sql.types as T
    from fpl_data_pipeline_spark.streaming.stateful import streaming_dedup

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("fp", T.StringType()),
        ]
    )
    src = tmp_path / "src"
    b0 = spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], schema)
    b1 = spark.createDataFrame([(4, "a"), (5, "c"), (6, "b")], schema)
    b0.coalesce(1).write.parquet(str(src / "b0"))
    b1.coalesce(1).write.parquet(str(src / "b1"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    q = (
        streaming_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r["fp"]: (r["first_event_id"], r["n_new"]) for r in spark.sql("SELECT * FROM dedup_out").collect()}
    emitted = spark.sql("SELECT count(*) c FROM dedup_out").first()["c"]
    assert emitted == 3  # a, b, c each exactly once despite 3 duplicate rows
    # first batch processed may be b0 or b1 (file order); 'a' and 'b' keep
    # whichever batch hit first, 'c' only exists in b1
    assert rows["c"] == (5, 1)
    assert rows["a"][0] in (1, 4) and rows["b"][0] in (2, 6)
