"""transformWithState (Spark 4 API) operator contract: state accumulates
across micro-batches and the final running totals equal the batch aggregate
AND the classic applyInPandasWithState implementation's results."""

from __future__ import annotations

import pytest


def _has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


# the TWS Python worker requires protobuf (see stateful_v2 module docstring)
pytestmark = pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState worker needs the protobuf package",
)

import pyspark.sql.functions as F

from fpl_data_pipeline_spark.streaming.incremental import EVENT_SCHEMA
from fpl_data_pipeline_spark.streaming.stateful_v2 import user_running_profile_v2
from fpl_data_pipeline_spark.tables import events_table

SF = "/root/testdata/sf0.001"


def test_transform_with_state_matches_batch(spark, tmp_path):
    src = tmp_path / "src"
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
    out = user_running_profile_v2(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("profile_v2_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = spark.sql("SELECT * FROM profile_v2_out").collect()
    per_user: dict[int, list] = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r)
    # state must actually cross micro-batches
    assert max(len(v) for v in per_user.values()) == 2

    final = {u: max(rs, key=lambda r: r["n_events"]) for u, rs in per_user.items()}
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
    for u, rs in per_user.items():
        assert sum(r["batch_rows"] for r in rs) == expected[u][0]
