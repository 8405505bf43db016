"""Write the deterministic FPL fixture tables (FIXTURES.md, seed 42) as
single-file parquet under fixtures/ — the data behind the §2.11 dashboard
queries' DuckDB-oracle parity rows. Idempotent: same seed -> same rows.

    python tools/make_fixtures.py [outdir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fpl_data_pipeline_spark import get_spark  # noqa: E402
from fpl_data_pipeline_spark.sources.fixtures import build_all  # noqa: E402


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
    )
    spark = get_spark("make_fixtures")
    for name, df in build_all(spark).items():
        path = os.path.join(outdir, name)
        df.coalesce(1).write.mode("overwrite").parquet(path)
        print(f"{path}: {df.count()} rows")
    write_bootstrap_json(outdir)
    write_element_summaries(outdir)


def write_bootstrap_json(outdir: str) -> None:
    """fixtures/bootstrap_static.json — the landed REST-feed document the
    custom Python DataSource (sources/python_datasource.py) reads; derived
    from the same seeded player/team/week rows as the parquet fixtures."""
    import json
    import random

    from fpl_data_pipeline_spark.sources import fixtures as FX

    rng = random.Random(42)
    teams = FX.team_rows(rng)
    players = FX.player_rows(rng)
    FX.week_rows(rng)  # keep rng stream aligned with build_all
    FX.stats_rows(rng, players)
    winfo = FX.week_info_rows(rng)
    doc = {
        "elements": [
            {"id": p[0], "first_name": p[1], "second_name": p[2],
             "form": str(p[3]), "total_points": p[4], "now_cost": int(float(p[5])),
             "team": p[6], "element_type": {"gk": 1, "def": 2, "mid": 3, "fwd": 4}[p[7]]}
            for p in players
        ],
        "teams": [
            {"id": t[0], "name": t[1], "short_name": t[2],
             "strength_attack_home": t[3], "strength_defence_home": t[4],
             "strength_attack_away": t[5], "strength_defence_away": t[6],
             "code": t[7]}
            for t in teams
        ],
        "events": [
            {"id": w[0], "name": w[1], "average_entry_score": w[2],
             "finished": w[3], "data_checked": w[4]}
            for w in winfo
        ],
    }
    with open(os.path.join(outdir, "bootstrap_static.json"), "w") as f:
        json.dump(doc, f)
    print(f"{outdir}/bootstrap_static.json: {len(doc['elements'])} elements")


N_SUMMARY_PLAYERS = 25  # per-key fixture feed size (fpl_element_summary source)


def write_element_summaries(outdir: str) -> None:
    """fixtures/element_summaries/<id>.json — the landed per-player
    element-summary documents the per-key DataSource
    (sources/python_datasource.py::ElementSummaryDataSource) fans out over;
    derived from the same seeded week rows as player_week_ft (rng stream
    re-derived in the generator's pinned call order)."""
    import json
    import random

    from fpl_data_pipeline_spark.sources import fixtures as FX

    rng = random.Random(42)
    FX.team_rows(rng)
    FX.player_rows(rng)
    weeks = FX.week_rows(rng)
    by_player: dict[int, list] = {}
    for w in weeks:
        if w[0] <= N_SUMMARY_PLAYERS:
            by_player.setdefault(w[0], []).append(
                {
                    "element": w[0],
                    "fixture": w[1],
                    "total_points": w[2],
                    "round": w[7],
                    "minutes": w[8],
                    "value": int(round(float(w[-1]))),
                }
            )
    d = os.path.join(outdir, "element_summaries")
    os.makedirs(d, exist_ok=True)
    for pid in range(1, N_SUMMARY_PLAYERS + 1):
        with open(os.path.join(d, f"{pid}.json"), "w") as f:
            json.dump({"history": by_player.get(pid, [])}, f)
    print(f"{d}: {N_SUMMARY_PLAYERS} summaries")


if __name__ == "__main__":
    main()
