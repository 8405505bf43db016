"""Every registered oracle must at least PLAN on DuckDB (catches SQL typos,
binder errors, and dialect slips without paying a Spark session) — the
fast half of the parity gate, Spark-free."""

from __future__ import annotations

import duckdb
import pytest

from fpl_data_pipeline_spark.registry import ORACLE_SQL, QUERIES, load_all
from fpl_data_pipeline_spark.tables import TABLE_NAMES

load_all()

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLE_NAMES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def test_every_oracle_plans(con):
    bad = {}
    for name, sql in ORACLE_SQL.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:
            bad[name] = str(e).splitlines()[0]
    assert not bad, f"oracles failing to plan: {bad}"


def test_registry_shape():
    assert len(QUERIES) >= 130
    # driver window: every entry oracled (kmeans evicted in round 3 so no
    # slot records err: no_oracle)
    window = list(QUERIES)[:50]
    rows_only = [n for n in window if n not in ORACLE_SQL]
    assert rows_only == []
    # every oracle belongs to a registered query
    assert set(ORACLE_SQL) <= set(QUERIES)
