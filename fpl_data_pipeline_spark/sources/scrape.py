"""Understat scrape extraction (SURVEY.md §2.1 S4, §2.2 P13).

The reference pulls a match page, takes the 3rd <script> tag, slices the
substring between ``('`` and ``')``, unicode-unescape-decodes it, and
json-parses the result (reference includes.py:262-297). Re-expressed
Spark-side over a DataFrame of landed page bodies:

- substring isolation: built-in regexp_extract (JVM);
- unicode-unescape: the one transform Spark has no built-in for -> a scalar
  pandas UDF (Arrow-batched; SURVEY.md §2.9 names this the single required
  UDF);
- JSON -> rows: from_json + explode (schema-on-read, declared schema).

The HTTP/Selenium collection itself stays out-of-engine (driver-side
collector scripts, S5) — only the parse/flatten is an engine concern.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

SHOT_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("player", T.StringType()),
            T.StructField("player_id", T.StringType()),
            T.StructField("minute", T.StringType()),
            T.StructField("xG", T.StringType()),
            T.StructField("result", T.StringType()),
            T.StructField("h_a", T.StringType()),
        ]
    )
)


@F.pandas_udf(T.StringType())
def unicode_unescape(s: pd.Series) -> pd.Series:
    r"""Decode \xNN / \uNNNN escapes — the reference's
    ``.encode().decode('unicode_escape')`` (includes.py:280) as an
    Arrow-batched UDF. NULL-safe."""
    return s.map(
        lambda v: v.encode("utf-8", "backslashreplace").decode("unicode_escape")
        if v is not None
        else None
    )


def extract_embedded_json(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """page rows -> one row per embedded shot record.

    Input: (match_id, html). Output: match_id + the SHOT_SCHEMA fields.
    """
    payload = F.regexp_extract(F.col(html_col), r"JSON\.parse\('(.*?)'\)", 1)
    decoded = unicode_unescape(payload)
    parsed = F.from_json(decoded, SHOT_SCHEMA)
    return (
        pages.select("match_id", F.explode(parsed).alias("shot"))
        .select("match_id", "shot.*")
    )


def shots_to_stats(shots: DataFrame) -> DataFrame:
    """Aggregate extracted shots to the player_stats_dm grain
    (per player per match), with typed casts from the string-typed payload."""
    return (
        shots.groupBy("match_id", F.col("player_id").cast("int").alias("id"),
                      F.col("player").alias("full_name"))
        .agg(
            F.count(F.lit(1)).alias("shots"),
            F.sum(F.col("xG").cast("decimal(18,4)")).cast("decimal(18,2)").alias("xg"),
            F.max(F.col("minute").cast("int")).alias("last_shot_minute"),
        )
    )
