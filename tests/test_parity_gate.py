"""The correctness gate must itself be trustworthy: each driver failure
class observed in round 1 (dtype drift, array-typed columns, value drift)
must be CAUGHT by tools/parity.py's comparators — a gate that silently
passes broken output is worse than no gate."""

from __future__ import annotations

import importlib.util
import os

import pandas as pd

_spec = importlib.util.spec_from_file_location(
    "parity",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools", "parity.py"),
)
parity = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(parity)


def test_dtype_key_separates_int_float_bool():
    assert parity.dtype_key(pd.Series([1, 2])) == "int"
    assert parity.dtype_key(pd.Series([1.0, 2.0])) == "float"
    assert parity.dtype_key(pd.Series([True, False])) == "bool"
    assert parity.dtype_key(pd.Series(["a"])) == "object"
    assert parity.dtype_key(pd.Series(pd.to_datetime(["2024-01-01"]))) == "timestamp"
    # the round-1 json_parse_aggregate failure class: int64 vs float64 differ
    assert parity.dtype_key(pd.Series([99111])) != parity.dtype_key(pd.Series([99111.0]))


def test_array_columns_detected():
    ok = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    bad = pd.DataFrame({"a": [1, 2], "q": [[1.0, 2.0], [3.0]]})
    assert parity.array_columns(ok) == []
    assert parity.array_columns(bad) == ["q"]  # round-1 approx_quantiles crash class


def test_value_hash_orders_and_detects_drift():
    a = pd.DataFrame({"k": [2, 1], "v": [20.0, 10.0]})
    b = pd.DataFrame({"k": [1, 2], "v": [10.0, 20.0]})
    assert parity.value_hash(parity.normalize(a)) == parity.value_hash(parity.normalize(b))
    c = pd.DataFrame({"k": [1, 2], "v": [10.0, 20.0001]})
    assert parity.value_hash(parity.normalize(a)) != parity.value_hash(parity.normalize(c))


def test_normalize_absorbs_last_bit_float_noise_only():
    a = pd.DataFrame({"v": [0.1 + 0.2]})          # 0.30000000000000004
    b = pd.DataFrame({"v": [0.3]})
    assert parity.value_hash(parity.normalize(a)) == parity.value_hash(parity.normalize(b))
    d = pd.DataFrame({"v": [0.3000001]})          # real drift survives
    assert parity.value_hash(parity.normalize(b)) != parity.value_hash(parity.normalize(d))


def test_reround_hazard_detector(spark):
    """Round-2 driver-fail class: a computed decimal surfaced as double then
    RE-ROUNDED to a smaller decimal scale (half-cent ties resolve differently
    across engines). The detector must flag the pre-fix upsert pattern and
    stay silent on every tie-free shape the registry uses."""
    import pyspark.sql.functions as F

    def plan(d):
        return d._jdf.queryExecution().optimizedPlan().toString()

    df = spark.createDataFrame([(1.23,)], ["p"])
    reprice = (F.col("p").cast("decimal(12,2)") * F.lit(1.1).cast("decimal(3,1)")).cast(
        "double"
    )
    prefix = df.withColumn("x", reprice).agg(
        F.sum(F.col("x").cast("decimal(18,2)")).cast("double").alias("t")
    )
    assert len(parity.reround_hazards(plan(prefix))) == 1  # scale 3 -> 2: tie
    postfix = df.withColumn("x", reprice).agg(
        F.sum(F.col("x").cast("decimal(18,3)")).cast("double").alias("t")
    )
    assert parity.reround_hazards(plan(postfix)) == []  # scale 3 -> 3: exact
    base = df.agg(F.sum(F.col("p").cast("decimal(18,2)")).cast("double").alias("t"))
    assert parity.reround_hazards(plan(base)) == []  # dsum over base column
    # window_moving_sum shape: exact decimal sum -> double -> same scale
    nested = df.withColumn(
        "s", F.sum(F.col("p").cast("decimal(18,2)")).over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy()
        ).cast("double")
    ).select(F.col("s").cast("decimal(18,2)").cast("double").alias("t"))
    assert parity.reround_hazards(plan(nested)) == []
