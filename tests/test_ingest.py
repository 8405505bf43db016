"""Ingestion-path tests (SURVEY.md §2.1, FIXTURES.md §2): JSON landing ->
star schema flatteners, field remaps, position decode, empty-history guard,
understat CSV reader with zero-byte skip, dynamic-cardinality discovery."""

from __future__ import annotations

import json
import os

import pytest

from fpl_data_pipeline_spark.sources import ingest


@pytest.fixture(scope="module")
def landing(tmp_path_factory):
    root = tmp_path_factory.mktemp("landing")
    bootstrap = {
        "elements": [
            {"id": 1, "first_name": "Mo", "second_name": "Salah", "form": "8.50",
             "total_points": 200, "now_cost": 130, "team": 1, "element_type": 3},
            {"id": 2, "first_name": "Alisson", "second_name": "Becker", "form": "5.00",
             "total_points": 90, "now_cost": 55, "team": 1, "element_type": 1},
            {"id": 3, "first_name": "Virgil", "second_name": "VanDijk", "form": "6.10",
             "total_points": 120, "now_cost": 65, "team": 2, "element_type": 2},
        ],
        "teams": [
            {"id": 1, "name": "Liverpool", "short_name": "LIV",
             "strength_attack_home": 1350, "strength_defence_home": 1300,
             "strength_attack_away": 1330, "strength_defence_away": 1280, "code": 14},
            {"id": 2, "name": "Arsenal", "short_name": "ARS",
             "strength_attack_home": 1340, "strength_defence_home": 1310,
             "strength_attack_away": 1320, "strength_defence_away": 1290, "code": 3},
        ],
        "events": [
            {"id": 1, "name": "Gameweek 1", "average_entry_score": 55,
             "finished": True, "data_checked": True},
            {"id": 2, "name": "Gameweek 2", "average_entry_score": 48,
             "finished": False, "data_checked": False},
        ],
    }
    (root / "bootstrap_static.json").write_text(json.dumps(bootstrap))

    hist = {
        "history": [
            {"element": 1, "fixture": 10, "total_points": 12, "opponent_team": 2,
             "was_home": True, "team_h_score": 3, "team_a_score": 1, "round": 1,
             "minutes": 90, "goals_scored": 2, "assists": 0, "clean_sheets": 0,
             "goals_conceded": 1, "own_goals": 0, "penalties_saved": 0,
             "penalties_missed": 0, "yellow_cards": 0, "red_cards": 0, "saves": 0,
             "bonus": 3, "bps": 60, "influence": "70.2", "creativity": "30.1",
             "threat": "80.0", "ict_index": "18.0", "value": 130},
            {"element": 1, "fixture": 20, "total_points": 2, "opponent_team": 2,
             "was_home": False, "team_h_score": 0, "team_a_score": 0, "round": 2,
             "minutes": 85, "goals_scored": 0, "assists": 0, "clean_sheets": 1,
             "goals_conceded": 0, "own_goals": 0, "penalties_saved": 0,
             "penalties_missed": 0, "yellow_cards": 1, "red_cards": 0, "saves": 0,
             "bonus": 0, "bps": 20, "influence": "20.0", "creativity": "10.5",
             "threat": "5.0", "ict_index": "3.5", "value": 131},
        ]
    }
    summaries = root / "summaries"
    summaries.mkdir()
    (summaries / "element_summary_1.json").write_text(json.dumps(hist))
    # new player with an empty history (includes.py:186-190 guard semantics)
    (summaries / "element_summary_2.json").write_text(json.dumps({"history": []}))

    csvdir = root / "scrapp_stat_data"
    csvdir.mkdir()
    (csvdir / "100.csv").write_text(
        ",player_id,player,time,key_passes,assists,shots,xG,xA,match_id\n"
        "0,501,Mo Salah,90,3,1,5,0.85,0.42,100\n"
        "1,502,Virgil VanDijk,90,0,0,1,0.10,0.02,100\n"
    )
    (csvdir / "101.csv").write_text("")  # zero-byte file: must be skipped
    return root


def test_player_dm_flatten_and_decode(spark, landing):
    b = ingest.read_bootstrap(spark, str(landing / "bootstrap_static.json"))
    p = ingest.build_player_dm(b)
    rows = {r["id"]: r for r in p.collect()}
    assert rows[1]["name"] == "Mo" and rows[1]["surname"] == "Salah"
    assert rows[1]["position"] == "mid" and rows[2]["position"] == "gk"
    assert float(rows[1]["form"]) == 8.50
    assert rows[1]["team_id"] == 1
    assert p.schema["now_costs"].dataType.simpleString() == "decimal(18,2)"


def test_team_and_week_info_flatten(spark, landing):
    b = ingest.read_bootstrap(spark, str(landing / "bootstrap_static.json"))
    t = {r["id"]: r for r in ingest.build_team_dm(b).collect()}
    assert t[1]["short_name"] == "LIV" and t[1]["strength_att_home"] == 1350
    w = {r["id"]: r for r in ingest.build_week_info_dm(b).collect()}
    assert w[1]["avg_score"] == 55 and w[2]["finished"] is False


def test_fact_flatten_remaps_and_empty_history(spark, landing):
    s = ingest.read_element_summaries(spark, str(landing / "summaries" / "*.json"))
    ft = ingest.build_player_week_ft(s)
    rows = ft.collect()
    assert len(rows) == 2  # empty history contributes nothing (no IndexError analog)
    r1 = next(r for r in rows if r["round_gw"] == 1)
    assert r1["element_"] == 1 and r1["opp_team"] == 2
    assert r1["yellow_card"] == 0 and r1["save"] == 0
    assert r1["influence"] == "70.2"  # numeric-as-string preserved
    assert float(r1["value_ply"]) == 130


def test_typed_fact_view(spark, landing):
    s = ingest.read_element_summaries(spark, str(landing / "summaries" / "*.json"))
    ft = ingest.typed_fact_view(ingest.build_player_week_ft(s))
    r1 = ft.filter("round_gw = 1").first()
    assert float(r1["influence_num"]) == 70.2
    assert ft.schema["influence"].dataType.simpleString() == "string"


def test_understat_csv_reader(spark, landing):
    df = ingest.read_understat_csv(spark, str(landing / "scrapp_stat_data" / "*.csv"))
    rows = df.collect()
    assert len(rows) == 2  # zero-byte file skipped
    r = next(r for r in rows if r["id"] == 501)
    assert r["full_name"] == "Mo Salah" and r["min_played"] == 90
    assert float(r["xg"]) == 0.85 and r["match_id"] == 100


def test_max_id_discovery(spark, landing):
    b = ingest.read_bootstrap(spark, str(landing / "bootstrap_static.json"))
    p = ingest.build_player_dm(b)
    assert ingest.max_id(p) == 3
    assert ingest.max_id(p.limit(0)) == 0  # empty table -> coalesce 0
