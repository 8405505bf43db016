"""Interleaved A/B of the round-12 set-overlap key hashing
(SPARK_GRAFT_HASH_OVERLAP_KEYS) — alternating reps inside ONE session so
ambient load bursts hit both variants equally (this box's documented
steal pattern makes sequential windows incomparable).

Usage: python tools/hash_key_ab.py [reps] [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fpl_data_pipeline_spark import get_spark
from fpl_data_pipeline_spark.registry import QUERIES, load_all


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    names = sys.argv[2:] or ["dedup_charngram_jaccard", "dedup_ngram_jaccard"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all()
    spark = get_spark("hash_key_ab")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["topk_basic"](spark, sf_dir).count()  # warm-up

    for name in names:
        times: dict[str, list[float]] = {"hash": [], "nohash": []}
        # warm both variants once (parquet footers, codegen caches)
        for variant in ("hash", "nohash"):
            os.environ["SPARK_GRAFT_HASH_OVERLAP_KEYS"] = (
                "1" if variant == "hash" else "0"
            )
            QUERIES[name](spark, sf_dir).count()
        for r in range(reps):
            for variant in ("hash", "nohash") if r % 2 == 0 else ("nohash", "hash"):
                os.environ["SPARK_GRAFT_HASH_OVERLAP_KEYS"] = (
                    "1" if variant == "hash" else "0"
                )
                spark.sparkContext.setJobDescription(f"ab {name} {variant} rep{r}")
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).count()
                times[variant].append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        for v, ts in times.items():
            print(
                f"{name} {v}: median {statistics.median(ts):.3f}s "
                f"raw {[round(t, 3) for t in ts]}"
            )
    os.environ["SPARK_GRAFT_HASH_OVERLAP_KEYS"] = "1"


if __name__ == "__main__":
    main()
