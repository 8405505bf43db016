"""Canonical FPL star-schema StructTypes (SURVEY.md §1.4) and raw landing
schemas for the FPL API JSON shapes (FIXTURES.md §2).

The warehouse tables are always explicitly typed (never inferred); raw JSON
is schema-on-read with these declared schemas for stability. Numeric-as-string
columns (influence/creativity/threat/ict_index) are kept as strings on purpose
— reference parity (sql_queries.py:8) — with typed accessor views provided by
``typed_fact_view``.
"""

from __future__ import annotations

import pyspark.sql.types as T

TEAM_DM = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("short_name", T.StringType()),
        T.StructField("strength_att_home", T.IntegerType()),
        T.StructField("strength_def_home", T.IntegerType()),
        T.StructField("strength_att_away", T.IntegerType()),
        T.StructField("strength_def_away", T.IntegerType()),
        T.StructField("code", T.IntegerType()),
    ]
)

PLAYER_DM = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("surname", T.StringType()),
        T.StructField("form", T.DecimalType(18, 2)),
        T.StructField("total_points", T.IntegerType()),
        T.StructField("now_costs", T.DecimalType(18, 2)),
        T.StructField("team_id", T.IntegerType()),
        T.StructField("position", T.StringType()),
    ]
)

PLAYER_WEEK_FT = T.StructType(
    [
        T.StructField("element_", T.IntegerType(), False),
        T.StructField("fixture", T.IntegerType()),
        T.StructField("total_points", T.IntegerType()),
        T.StructField("opp_team", T.IntegerType()),
        T.StructField("was_home", T.BooleanType()),
        T.StructField("team_h_score", T.IntegerType()),
        T.StructField("team_a_score", T.IntegerType()),
        T.StructField("round_gw", T.IntegerType(), False),
        T.StructField("minutes", T.IntegerType()),
        T.StructField("goals_scored", T.IntegerType()),
        T.StructField("assists", T.IntegerType()),
        T.StructField("clean_sheets", T.IntegerType()),
        T.StructField("goals_conceded", T.IntegerType()),
        T.StructField("own_goals", T.IntegerType()),
        T.StructField("penalties_saved", T.IntegerType()),
        T.StructField("penalties_missed", T.IntegerType()),
        T.StructField("yellow_card", T.IntegerType()),
        T.StructField("red_card", T.IntegerType()),
        T.StructField("save", T.IntegerType()),
        T.StructField("bonus", T.IntegerType()),
        T.StructField("bps", T.IntegerType()),
        T.StructField("influence", T.StringType()),
        T.StructField("creativity", T.StringType()),
        T.StructField("threat", T.StringType()),
        T.StructField("ict_index", T.StringType()),
        T.StructField("value_ply", T.DecimalType(18, 2)),
    ]
)

PLAYER_STATS_DM = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("full_name", T.StringType()),
        T.StructField("min_played", T.IntegerType()),
        T.StructField("key_passes", T.IntegerType()),
        T.StructField("assists", T.IntegerType()),
        T.StructField("shots", T.IntegerType()),
        T.StructField("xg", T.DecimalType(18, 2)),
        T.StructField("xa", T.DecimalType(18, 2)),
        T.StructField("match_id", T.IntegerType(), False),
    ]
)

WEEK_INFO_DM = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("avg_score", T.IntegerType()),
        T.StructField("finished", T.BooleanType()),
        T.StructField("data_checked", T.BooleanType()),
    ]
)

# --- raw landing schemas (FPL API JSON; FIXTURES.md §2.1-2.2) ---------------

RAW_ELEMENT = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("first_name", T.StringType()),
        T.StructField("second_name", T.StringType()),
        T.StructField("form", T.StringType()),
        T.StructField("total_points", T.IntegerType()),
        T.StructField("now_cost", T.IntegerType()),
        T.StructField("team", T.IntegerType()),
        T.StructField("element_type", T.IntegerType()),
    ]
)

RAW_TEAM = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("short_name", T.StringType()),
        T.StructField("strength_attack_home", T.IntegerType()),
        T.StructField("strength_defence_home", T.IntegerType()),
        T.StructField("strength_attack_away", T.IntegerType()),
        T.StructField("strength_defence_away", T.IntegerType()),
        T.StructField("code", T.IntegerType()),
    ]
)

RAW_EVENT = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("average_entry_score", T.IntegerType()),
        T.StructField("finished", T.BooleanType()),
        T.StructField("data_checked", T.BooleanType()),
    ]
)

RAW_HISTORY = T.StructType(
    [
        T.StructField("element", T.IntegerType()),
        T.StructField("fixture", T.IntegerType()),
        T.StructField("total_points", T.IntegerType()),
        T.StructField("opponent_team", T.IntegerType()),
        T.StructField("was_home", T.BooleanType()),
        T.StructField("team_h_score", T.IntegerType()),
        T.StructField("team_a_score", T.IntegerType()),
        T.StructField("round", T.IntegerType()),
        T.StructField("minutes", T.IntegerType()),
        T.StructField("goals_scored", T.IntegerType()),
        T.StructField("assists", T.IntegerType()),
        T.StructField("clean_sheets", T.IntegerType()),
        T.StructField("goals_conceded", T.IntegerType()),
        T.StructField("own_goals", T.IntegerType()),
        T.StructField("penalties_saved", T.IntegerType()),
        T.StructField("penalties_missed", T.IntegerType()),
        T.StructField("yellow_cards", T.IntegerType()),
        T.StructField("red_cards", T.IntegerType()),
        T.StructField("saves", T.IntegerType()),
        T.StructField("bonus", T.IntegerType()),
        T.StructField("bps", T.IntegerType()),
        T.StructField("influence", T.StringType()),
        T.StructField("creativity", T.StringType()),
        T.StructField("threat", T.StringType()),
        T.StructField("ict_index", T.StringType()),
        T.StructField("value", T.IntegerType()),
    ]
)

BOOTSTRAP_STATIC = T.StructType(
    [
        T.StructField("elements", T.ArrayType(RAW_ELEMENT)),
        T.StructField("teams", T.ArrayType(RAW_TEAM)),
        T.StructField("events", T.ArrayType(RAW_EVENT)),
    ]
)

ELEMENT_SUMMARY = T.StructType([T.StructField("history", T.ArrayType(RAW_HISTORY))])
