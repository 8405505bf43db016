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
