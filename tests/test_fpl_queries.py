"""The five dashboard queries (SURVEY.md §2.11) + the two ported reference
data-quality tests (§5.2.2) on FIXTURES.md synthetic tables."""

from __future__ import annotations

import pyspark.sql.functions as F

from fpl_data_pipeline_spark.plans import fpl_queries as Q
from tests.conftest import SALAH_ID, N_WEEKS


def test_basic_ply_data_topk(player_dm):
    out = Q.basic_ply_data(player_dm).collect()
    assert len(out) == 9
    forms = [float(r["form"]) for r in out]
    assert forms == sorted(forms, reverse=True)
    # must equal the global top-9 by form (set-wise, ties broken by id)
    top = player_dm.orderBy(F.col("form").desc(), F.col("id").asc()).limit(9).collect()
    assert [r["surname"] for r in out] == [r["surname"] for r in top]


def test_value_per_points_derived_column(player_dm):
    out = Q.value_per_points(player_dm).collect()
    assert len(out) == 9
    for r in out:
        # point_value = total_points / now_costs * 10 at decimal(12,2)
        row = player_dm.filter(
            (F.col("name") == r["name"]) & (F.col("surname") == r["surname"])
        ).first()
        expected = float(row["total_points"]) / float(row["now_costs"]) * 10
        assert abs(float(r["point_value"]) - expected) < 0.01


def test_detailed_flagship_semantics(player_dm, team_dm, player_week_ft):
    out = Q.detailed_ply_data_per_week(player_dm, team_dm, player_week_ft)
    rows = out.collect()
    assert len(rows) == 15
    # gw_1/2/3 are the 3 latest DISTINCT weeks globally; spot-check one player
    r0 = rows[0]
    ply_id = r0["id"]
    fact = player_week_ft.filter(F.col("element_") == ply_id)
    latest = fact.filter(F.col("round_gw") == N_WEEKS).select("total_points").first()
    if latest is None:
        assert r0["gw_1"] is None  # player missed the latest week -> NULL not 0
    else:
        assert r0["gw_1"] == latest["total_points"]
    # total_points = coalesced lifetime sum
    total = fact.agg(F.sum("total_points")).first()[0] or 0
    assert r0["total_points"] == total
    # avg_4_weeks = sum(last-4-week points)/4 (constant divisor)
    last4 = (
        fact.filter(F.col("round_gw") > N_WEEKS - 4).agg(F.sum("total_points")).first()[0]
        or 0
    )
    assert abs(float(r0["avg_4_weeks"]) - last4 / 4) < 0.01


def test_detailed_missing_week_null_semantics(spark, player_dm, team_dm, player_week_ft):
    # A player present in old weeks but absent from the 3 latest must show
    # NULL gw_1/2/3 (not 0) — SURVEY.md §7.3.4.
    only_old = player_week_ft.filter(F.col("round_gw") <= N_WEEKS - 3)
    some_id = only_old.select("element_").first()["element_"]
    capped = player_week_ft.filter(
        (F.col("element_") != some_id) | (F.col("round_gw") <= N_WEEKS - 3)
    )
    out = Q.detailed_ply_data_per_week(player_dm, team_dm, capped, k=10_000)
    row = out.filter(F.col("id") == some_id).first()
    assert row["gw_1"] is None and row["gw_2"] is None and row["gw_3"] is None
    assert row["total_points"] is not None  # coalesced, never NULL


def test_stats_queries_shared_cte(player_stats_dm):
    kp = Q.sql_stats_key_pass(player_stats_dm).collect()
    sh = Q.sql_stats_shots(player_stats_dm).collect()
    assert len(kp) == 15 and len(sh) == 15
    kps = [r["key_pass"] for r in kp]
    assert kps == sorted(kps, reverse=True)
    shots = [r["shots"] for r in sh]
    assert shots == sorted(shots, reverse=True)
    # total_xi = xg + xa (A4 derived sum-of-sums)
    for r in kp:
        assert abs(float(r["total_xi"]) - (float(r["xg"]) + float(r["xa"]))) < 1e-9


def test_known_entity_lookup(player_dm):
    # reference test_includes.py:4-6 — Salah must resolve to id 283
    assert Q.get_player_id(player_dm, "Salah") == SALAH_ID


def test_join_integrity_clean(player_week_ft, player_dm):
    # reference test_includes.py:9-12 (intended anti-join semantics)
    assert Q.orphan_fact_rows(player_week_ft, player_dm) == 0


def test_join_integrity_detects_orphans(player_week_ft_dirty, player_dm):
    assert Q.orphan_fact_rows(player_week_ft_dirty, player_dm) == 3


def test_dashboard_payload_shape(player_dm, team_dm, player_week_ft):
    # Flask routes.py:40-45 output-shape parity
    p = Q.dashboard_payload(player_dm, team_dm, player_week_ft)
    assert len(p["graph_lab"]) == 9 and len(p["graph_val"]) == 9
    assert all(isinstance(v, float) for v in p["graph_val"])
    assert len(p["ply_data_detail"]) == 15
