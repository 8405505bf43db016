"""Shared fixtures: one local SparkSession + deterministic FPL-shaped tables
per FIXTURES.md (seed 42): 20 teams, 631 players (Salah planted at id 283),
player_week_ft for 8 gameweeks with ~5% skipped player-weeks, ~300 understat
stat rows with ~10% name variants, week_info bookkeeping, plus a dirty fact
variant (3 orphans + 2 duplicate keys) for integrity/upsert tests.
"""

from __future__ import annotations

import os
import random
import sys
from decimal import Decimal

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fpl_data_pipeline_spark import get_spark
from fpl_data_pipeline_spark.sources import schemas as S

N_TEAMS = 20
N_PLAYERS = 631
N_WEEKS = 8
SALAH_ID = 283

FIRST = ["Mo", "Harry", "Kevin", "Bukayo", "Erling", "Son", "Phil", "Declan", "Jack", "Marcus"]
LAST = ["Kane", "DeBruyne", "Saka", "Haaland", "Heung-min", "Foden", "Rice", "Grealish", "Rashford", "Sterling"]
POSITIONS = ["gk", "def", "mid", "fwd"]


@pytest.fixture(scope="session")
def spark():
    sp = get_spark("tests", shuffle_partitions=8)
    yield sp


@pytest.fixture(scope="session")
def rng():
    return random.Random(42)


def _d2(x: float) -> Decimal:
    return Decimal(f"{x:.2f}")


@pytest.fixture(scope="session")
def team_dm(spark, rng):
    rows = [
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
    return spark.createDataFrame(rows, S.TEAM_DM).cache()


@pytest.fixture(scope="session")
def player_dm(spark, rng):
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
    return spark.createDataFrame(rows, S.PLAYER_DM).cache()


def _week_rows(rng):
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


@pytest.fixture(scope="session")
def player_week_ft(spark, rng):
    return spark.createDataFrame(_week_rows(rng), S.PLAYER_WEEK_FT).cache()


@pytest.fixture(scope="session")
def player_week_ft_dirty(spark, player_week_ft):
    """3 orphan fact rows + 2 duplicate-key rows (FIXTURES.md §1.3)."""
    clean = player_week_ft.limit(0).collect()  # schema only
    base = player_week_ft.collect()
    orphans = [
        tuple([9000 + i] + list(base[i])[1:]) for i in range(3)
    ]  # element_ ids with no player
    dups = [tuple(base[i]) for i in (5, 6)]  # exact duplicate PK rows
    return spark.createDataFrame(base + orphans + dups, S.PLAYER_WEEK_FT).cache()


@pytest.fixture(scope="session")
def player_stats_dm(spark, rng, player_dm):
    players = player_dm.collect()
    rows = []
    sid = 10_000
    for p in players[:100]:
        full = f"{p['name']} {p['surname']}"
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
    return spark.createDataFrame(rows, S.PLAYER_STATS_DM).cache()


@pytest.fixture(scope="session")
def week_info_dm(spark, rng):
    rows = [
        (i, f"Gameweek {i}", rng.randint(30, 80), i < N_WEEKS, i < N_WEEKS)
        for i in range(1, N_WEEKS + 1)
    ]
    return spark.createDataFrame(rows, S.WEEK_INFO_DM).cache()
