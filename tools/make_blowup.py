"""Build an N× FK-consistent blowup of a testdata scale dir.

    python tools/make_blowup.py [src_sf_dir] [out_dir] [factor]

Defaults: /root/testdata/sf0.1 -> ./.scale10, factor 10 (~sf1-equivalent).

Every copy k offsets each key domain by k * (max_key + 1), applied to BOTH
sides of every foreign key (orders.o_custkey moves with customer.c_custkey,
lineitem.l_orderkey with orders.o_orderkey, ...), so joins behave exactly as
they would on a genuinely larger corpus. Dimension tables nation/region stay
as-is (their keys are referenced unchanged). documents text gets a per-copy
suffix token on copies k>0 — copies are NEAR-duplicates of the originals,
the realistic crawl-dup stress for the dedup families; embeddings values are
copied verbatim so vector distributions are preserved.

Used by tools/scale_probe.py and the per-round sf1-equivalent bench run
(BENCH_NOTES.md); the output dir is gitignored scratch, not test input.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from fpl_data_pipeline_spark import get_spark  # noqa: E402

# table -> list of (column, key_domain); every column in a domain shifts by
# the same per-copy offset
KEYED = {
    "customer": [("c_custkey", "cust")],
    "orders": [("o_orderkey", "ord"), ("o_custkey", "cust")],
    "lineitem": [("l_orderkey", "ord"), ("l_partkey", "part"), ("l_suppkey", "supp")],
    "part": [("p_partkey", "part")],
    "supplier": [("s_suppkey", "supp")],
    "events": [("event_id", "event"), ("user_id", "user")],
    "documents": [("doc_id", "doc")],
    "embeddings": [("vec_id", "doc")],  # 1:1 with documents by id
}
DOMAIN_SOURCE = {  # key domain -> (table, column) that defines its extent
    "cust": ("customer", "c_custkey"),
    "ord": ("orders", "o_orderkey"),
    "part": ("part", "p_partkey"),
    "supp": ("supplier", "s_suppkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
}
COPY_AS_IS = ("nation", "region")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else ".scale10"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("make_blowup")

    extents = {}
    for dom, (tbl, col) in DOMAIN_SOURCE.items():
        df = spark.read.parquet(f"{src}/{tbl}.parquet")
        extents[dom] = int(df.agg(F.max(col)).first()[0]) + 1
    print(f"key extents: {extents}", file=sys.stderr)

    os.makedirs(out, exist_ok=True)
    for tbl in COPY_AS_IS:
        spark.read.parquet(f"{src}/{tbl}.parquet").write.mode("overwrite").parquet(
            f"{out}/{tbl}.parquet"
        )
    for tbl, keys in KEYED.items():
        base = spark.read.parquet(f"{src}/{tbl}.parquet")
        copies = []
        for k in range(factor):
            c = base
            for col, dom in keys:
                c = c.withColumn(col, F.col(col) + F.lit(k * extents[dom]))
            if tbl == "documents" and k > 0:
                c = c.withColumn("text", F.concat(F.col("text"), F.lit(f" rep{k}")))
                c = c.withColumn("n_chars", F.length("text"))
            copies.append(c)
        blown = copies[0]
        for c in copies[1:]:
            blown = blown.unionByName(c)
        blown.write.mode("overwrite").parquet(f"{out}/{tbl}.parquet")
        print(f"{tbl}: x{factor}", file=sys.stderr)


if __name__ == "__main__":
    main()
