"""Deterministic FPL-shaped fixture data (FIXTURES.md, seed 42): 20 teams,
631 players (Salah planted at id 283, form ties at the top-9 boundary),
player_week_ft for 8 gameweeks with ~5% skipped player-weeks, ~300 understat
stat rows with ~10% name variants, week_info bookkeeping.

Generates the committed parquet fixtures (tools/make_fixtures.py ->
fixtures/) that give the §2.11 dashboard queries DuckDB-oracle parity rows.
Mirrors the row builders in tests/conftest.py (kept separate: the pytest
fixtures' rng interleaving depends on fixture resolution order, while this
generator pins one explicit order so the parquet bytes are reproducible).
"""

from __future__ import annotations

import random
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession

from fpl_data_pipeline_spark.sources import schemas as S

N_TEAMS = 20
N_PLAYERS = 631
N_WEEKS = 8
SALAH_ID = 283

FIRST = ["Mo", "Harry", "Kevin", "Bukayo", "Erling", "Son", "Phil", "Declan", "Jack", "Marcus"]
LAST = ["Kane", "DeBruyne", "Saka", "Haaland", "Heung-min", "Foden", "Rice", "Grealish", "Rashford", "Sterling"]
POSITIONS = ["gk", "def", "mid", "fwd"]


def _d2(x: float) -> Decimal:
    return Decimal(f"{x:.2f}")


def team_rows(rng: random.Random) -> list[tuple]:
    return [
        (
            i,
            f"Team {i}",
            f"T{i:02d}",
            rng.randint(1000, 1400),
            rng.randint(1000, 1400),
            rng.randint(1000, 1400),
            rng.randint(1000, 1400),
            i + 50,
        )
        for i in range(1, N_TEAMS + 1)
    ]


def player_rows(rng: random.Random) -> list[tuple]:
    rows = []
    for i in range(1, N_PLAYERS + 1):
        surname = "Salah" if i == SALAH_ID else LAST[rng.randrange(len(LAST))] + str(i % 97)
        rows.append(
            (
                i,
                FIRST[i % len(FIRST)],
                surname,
                _d2(rng.uniform(0, 12)),
                int(rng.betavariate(2, 5) * 300),
                _d2(rng.uniform(38, 135)),
                rng.randint(1, N_TEAMS),
                POSITIONS[rng.randrange(4)],
            )
        )
    # ties at the top-9 form boundary (FIXTURES.md §1.2)
    rows[10] = rows[10][:3] + (_d2(11.99),) + rows[10][4:]
    rows[11] = rows[11][:3] + (_d2(11.99),) + rows[11][4:]
    return rows


def week_rows(rng: random.Random) -> list[tuple]:
    rows = []
    for ply in range(1, N_PLAYERS + 1):
        for wk in range(1, N_WEEKS + 1):
            if rng.random() < 0.05:  # ~5% skipped player-weeks
                continue
            rows.append(
                (
                    ply,
                    wk * 1000 + ply % 10,
                    rng.randint(-2, 25),
                    rng.randint(1, N_TEAMS),
                    rng.random() < 0.5,
                    rng.randint(0, 6),
                    rng.randint(0, 6),
                    wk,
                    rng.randint(0, 90),
                    rng.randint(0, 3),
                    rng.randint(0, 2),
                    rng.randint(0, 1),
                    rng.randint(0, 4),
                    0,
                    0,
                    0,
                    rng.randint(0, 1),
                    0,
                    rng.randint(0, 5),
                    rng.randint(0, 3),
                    rng.randint(0, 80),
                    f"{rng.uniform(0, 99):.1f}",
                    f"{rng.uniform(0, 99):.1f}",
                    f"{rng.uniform(0, 99):.1f}",
                    f"{rng.uniform(0, 30):.1f}",
                    _d2(rng.uniform(38, 135)),
                )
            )
    return rows


def stats_rows(rng: random.Random, players: list[tuple]) -> list[tuple]:
    rows = []
    sid = 10_000
    for p in players[:100]:
        full = f"{p[1]} {p[2]}"
        if rng.random() < 0.10:  # spelling variants for fuzzy matching
            full = full.replace("a", "á", 1) if "a" in full else (full[:1] + ". " + full.split(" ", 1)[1])
        sid += 1
        for match in rng.sample(range(1, 41), 3):
            rows.append(
                (
                    sid,
                    full,
                    rng.randint(0, 90),
                    rng.randint(0, 8),
                    rng.randint(0, 3),
                    rng.randint(0, 10),
                    _d2(rng.uniform(0, 1.5)),
                    _d2(rng.uniform(0, 1.2)),
                    match,
                )
            )
    return rows


def week_info_rows(rng: random.Random) -> list[tuple]:
    return [
        (i, f"Gameweek {i}", rng.randint(30, 80), i < N_WEEKS, i < N_WEEKS)
        for i in range(1, N_WEEKS + 1)
    ]


def build_all(spark: SparkSession, seed: int = 42) -> dict[str, DataFrame]:
    """The five FPL tables as DataFrames, generated in one pinned order
    (team -> player -> week -> stats -> week_info) from a single seeded rng
    so the output is byte-reproducible."""
    rng = random.Random(seed)
    teams = team_rows(rng)
    players = player_rows(rng)
    weeks = week_rows(rng)
    stats = stats_rows(rng, players)
    winfo = week_info_rows(rng)
    return {
        "team_dm": spark.createDataFrame(teams, S.TEAM_DM),
        "player_dm": spark.createDataFrame(players, S.PLAYER_DM),
        "player_week_ft": spark.createDataFrame(weeks, S.PLAYER_WEEK_FT),
        "player_stats_dm": spark.createDataFrame(stats, S.PLAYER_STATS_DM),
        "week_info_dm": spark.createDataFrame(winfo, S.WEEK_INFO_DM),
    }
