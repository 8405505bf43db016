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


if __name__ == "__main__":
    main()
