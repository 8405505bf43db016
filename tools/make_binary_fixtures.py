"""Generate the committed binary-asset fixtures for the real `binaryFile`
ingestion path (operators/multimodal.py::binary_ingest_summary).

Writes fixtures/binary_assets/asset_###.bin — deterministic pseudo-media
payloads (seeded byte pattern, varying lengths) — plus
fixtures/binary_assets_expected/ (parquet): per-file ground truth (name,
byte length, sha256, byte sum) computed here in pure Python, independent of
Spark, so the driver's DuckDB oracle can check the Spark-side ingestion +
feature extraction end-to-end. Byte-stable: re-running reproduces identical
files.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")
N_ASSETS = 12


def payload(i: int) -> bytes:
    length = 256 + i * 37
    return bytes((i * 31 + j * 7) % 256 for j in range(length))


def main() -> None:
    adir = os.path.join(ROOT, "binary_assets")
    os.makedirs(adir, exist_ok=True)
    rows = []
    for i in range(N_ASSETS):
        p = payload(i)
        name = f"asset_{i:03d}.bin"
        with open(os.path.join(adir, name), "wb") as f:
            f.write(p)
        rows.append(
            {
                "name": name,
                "byte_len": len(p),
                "sha256": hashlib.sha256(p).hexdigest(),
                "byte_sum": sum(p),
            }
        )
    tbl = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("name", pa.string()),
                ("byte_len", pa.int64()),
                ("sha256", pa.string()),
                ("byte_sum", pa.int64()),
            ]
        ),
    )
    edir = os.path.join(ROOT, "binary_assets_expected")
    os.makedirs(edir, exist_ok=True)
    pq.write_table(tbl, os.path.join(edir, "expected.parquet"))
    print(f"wrote {N_ASSETS} assets + expected.parquet under {ROOT}")


if __name__ == "__main__":
    main()
