"""Local mirror of the driver's correctness gate.

Runs every registered query on Spark AND its oracle SQL on DuckDB against the
same parquet tables, then compares row-count + sorted-column schema +
order-insensitive value hash. Use while iterating:

    python tools/parity.py [sf_dir] [query ...]
    python tools/parity.py --window        # preflight the driver's first-50 window
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from fpl_data_pipeline_spark import get_spark  # noqa: E402
from fpl_data_pipeline_spark.registry import QUERIES, ORACLE_SQL, load_all  # noqa: E402
from fpl_data_pipeline_spark.tables import TABLE_NAMES  # noqa: E402


def array_columns(df: pd.DataFrame) -> list[str]:
    """Columns containing list/array cells — the driver's canonicalizer
    cannot sort these (round-1 crash on approx_quantiles_price), so the
    local gate rejects them outright."""
    bad = []
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
            lambda v: isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray"
        ).any():
            bad.append(c)
    return bad


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize values, sort rows.

    Deliberately does NOT coerce dtypes: the driver's hash sees int64 vs
    float64 as different text (99111 vs 99111.0), so dtype mismatches must
    surface here too (round-1 json_parse_aggregate failure). Only float
    rounding (last-bit noise) and timestamp-precision canonicalization are
    applied."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            # round to 9 significant-ish decimals to absorb last-bit noise
            df[c] = s.round(9)
        elif pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                # tz-aware (e.g. DuckDB TIMESTAMPTZ) -> naive UTC before
                # precision-normalizing; session tz is UTC on both engines
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df


def dtype_key(s: pd.Series) -> str:
    """Coarse dtype class that distinguishes int/float/bool/string/timestamp
    but not width (the driver compares rendered values, and int32 vs int64
    render identically while int64 vs float64 do not)."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "timestamp"
    return "object"


def value_hash(df: pd.DataFrame) -> str:
    body = df.to_csv(index=False, float_format="%.9g").encode()
    return hashlib.sha256(body).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if "/" not in a]
    window_only = "--window" in only
    only = [a for a in only if a != "--window"]

    load_all()
    spark = get_spark("parity")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    if window_only:
        names = list(QUERIES)[:50]  # exactly the driver's correctness window
    else:
        names = only or sorted(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}; available: {sorted(QUERIES)}")
        return 2
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        fn = QUERIES[name]
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        arr_cols = array_columns(sdf)
        if arr_cols:
            print(f"FAIL  {name}: array-typed output columns {arr_cols} (driver canonicalizer crashes on these)")
            n_fail += 1
            continue
        if name not in ORACLE_SQL:
            print(f"ROWS  {name}: {len(sdf)} rows ({dt:.1f}s) [no oracle]")
            n_rowsonly += 1
            continue
        try:
            odf = con.execute(ORACLE_SQL[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        s, o = normalize(sdf), normalize(odf)
        problems = []
        if len(s) != len(o):
            problems.append(f"rowcount {len(s)} vs {len(o)}")
        if list(s.columns) != list(o.columns):
            problems.append(f"cols {list(s.columns)} vs {list(o.columns)}")
        elif [dtype_key(s[c]) for c in s.columns] != [dtype_key(o[c]) for c in o.columns]:
            mism = {
                c: (dtype_key(s[c]), dtype_key(o[c]))
                for c in s.columns
                if dtype_key(s[c]) != dtype_key(o[c])
            }
            problems.append(f"dtype mismatch {mism}")
        elif len(s) == len(o) and value_hash(s) != value_hash(o):
            neq = [c for c in s.columns if not s[c].equals(o[c])]
            problems.append(f"value-hash mismatch in cols {neq}")
            for c in neq[:2]:
                diff = s[s[c] != o[c]] if len(s) else s
                idx = diff.index[:3] if len(diff) else []
                for i in idx:
                    problems.append(f"  {c}[{i}]: spark={s[c][i]!r} oracle={o[c][i]!r}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(s)} rows ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only of {len(names)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
