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


def _toplevel_as_splits(expr: str) -> list[int]:
    """Positions of ' AS ' / ' as ' at paren-depth 0 inside a cast body."""
    out, depth, i = [], 0, 0
    while i < len(expr):
        ch = expr[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and expr[i : i + 4].lower() == " as ":
            out.append(i)
        i += 1
    return out


def reround_hazards(plan: str) -> list[str]:
    """Detect ``cast(cast(E as double) as decimal(p,s))`` where E carries a
    decimal of scale > s.

    This is the exact pattern behind the round-2 driver hash-fail
    (upsert_merged_state): a computed decimal value of scale k, surfaced as
    double, then RE-ROUNDED to a smaller scale s < k. The re-round can land
    on a half-ulp tie that Spark (rounds the shortest decimal representation
    of the double) and DuckDB (rounds the exact binary value) resolve
    differently. Casting to scale >= k is tie-free (the double sits within
    half an ULP of the k-decimal value). Walks the OPTIMIZED plan text so
    collapsed projections expose the full expression to the aggregate."""
    import re

    # Resolve attribute refs to their defining expressions: the optimizer
    # keeps Project [cast(... as double) AS x#1] separate from the
    # Aggregate that casts x#1 to decimal, so the nested pattern never
    # appears textually in one node. Alias definitions use uppercase ' AS '
    # in plan text (cast target types use lowercase ' as ').
    defs: dict[str, str] = {}
    for bm in re.finditer(r"\[", plan):
        start, depth, i = bm.end(), 1, bm.end()
        while i < len(plan) and depth:
            depth += {"[": 1, "]": -1}.get(plan[i], 0)
            i += 1
        entries, d, last = [], 0, start
        for j in range(start, i - 1):
            d += {"(": 1, ")": -1, "[": 1, "]": -1}.get(plan[j], 0)
            if d == 0 and plan[j] == ",":
                entries.append(plan[last:j])
                last = j + 1
        entries.append(plan[last : i - 1])
        for e in entries:
            am = re.search(r" AS (\w+#\d+)\s*$", e)
            if am:
                defs[am.group(1)] = e[: am.start()].strip()
    for _ in range(10):
        changed = False
        for ref, d in defs.items():
            if re.fullmatch(r"\w+#\d+", d.strip()):
                continue
            pat = re.escape(ref) + r"(?!\d)"
            new = re.sub(pat, lambda _m: "(" + d + ")", plan)
            if new != plan:
                plan, changed = new, True
        if not changed:
            break

    def _strip_parens(s: str) -> str:
        s = s.strip()
        while s.startswith("(") and s.endswith(")"):
            depth = 0
            for k, ch in enumerate(s):
                depth += {"(": 1, ")": -1}.get(ch, 0)
                if depth == 0 and k < len(s) - 1:
                    return s
            s = s[1:-1].strip()
        return s

    def _toplevel_split(s: str, ops: str) -> list[str]:
        parts, depth, last = [], 0, 0
        for k, ch in enumerate(s):
            depth += {"(": 1, ")": -1}.get(ch, 0)
            if depth == 0 and ch in ops and k > 0:
                parts.append(s[last:k])
                last = k + 1
        parts.append(s[last:])
        return parts

    def _est_scale(expr: str):
        """Best-effort decimal scale of a plan expression; None = unknown.
        Spark's result scale for decimal multiply is s1+s2, add/sub is
        max(s1,s2); literals carry their textual scale."""
        expr = _strip_parens(expr)
        cm = re.fullmatch(r"cast\((.*) as decimal\((\d+),(\d+)\)\)", expr, re.DOTALL)
        if cm:
            return int(cm.group(3))
        lm = re.fullmatch(r"-?\d+(\.\d+)?", expr)
        if lm:
            return len(lm.group(1)) - 1 if lm.group(1) else 0
        sm = re.match(r"sum\(", expr)
        if sm:  # decimal SUM preserves the operand's scale (window sums
            # print a trailing windowspecdefinition after the operand)
            depth, i = 1, sm.end()
            while i < len(expr) and depth:
                depth += {"(": 1, ")": -1}.get(expr[i], 0)
                i += 1
            rest = expr[i:].strip()
            if not rest or rest.startswith("windowspecdefinition("):
                return _est_scale(expr[sm.end() : i - 1])
        for ops, combine in (("+-", max), ("*", sum)):
            parts = _toplevel_split(expr, ops)
            if len(parts) > 1:
                scales = [_est_scale(p) for p in parts]
                return None if None in scales else combine(scales)
        return None

    hazards = set()
    for m in re.finditer(r"cast\(", plan):
        start, depth, i = m.end(), 1, m.end()
        while i < len(plan) and depth:
            depth += {"(": 1, ")": -1}.get(plan[i], 0)
            i += 1
        body = plan[start : i - 1]  # "EXPR as TYPE"
        splits = _toplevel_as_splits(body)
        if not splits:
            continue
        expr, ttype = body[: splits[-1]], body[splits[-1] + 4 :].strip()
        tm = re.match(r"decimal\((\d+),(\d+)\)", ttype)
        if not tm:
            continue
        out_scale = int(tm.group(2))
        # is EXPR itself a single top-level cast(... as double)?
        em = re.match(r"cast\((.*)\)$", _strip_parens(expr), re.DOTALL)
        if not em:
            continue
        inner_body = em.group(1)
        inner_splits = _toplevel_as_splits(inner_body)
        if not inner_splits or inner_body[inner_splits[-1] + 4 :].strip().lower() != "double":
            continue
        inner_expr = _strip_parens(inner_body[: inner_splits[-1]])
        # cast(X as double) with X already double is elided by the analyzer,
        # so reaching here means X is DERIVED (decimal arithmetic, string
        # parse, ...). The only provably-exact case: X is a single decimal
        # cast of scale <= the target scale.
        est = _est_scale(inner_expr)
        if est is not None and est <= out_scale:
            continue
        detail = f"derived scale {est}" if est is not None else "derived scale unknown"
        hazards.add(
            f"computed double re-rounded to decimal(_,{out_scale}) [{detail}]: "
            f"cast({expr[:120]} as {ttype})"
        )
    return sorted(hazards)


def main() -> int:
    sf_dirs = [a for a in sys.argv[1:] if "/" in a]
    only = [a for a in sys.argv[1:] if "/" not in a]
    window_only = "--window" in only
    only = [a for a in only if a != "--window"]
    if not sf_dirs:
        # window preflight runs BOTH scales: data-dependent rounding ties
        # (round-2 upsert_merged_state) only surface at some cardinalities
        sf_dirs = (
            ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
            if window_only
            else ["/root/testdata/sf0.01"]
        )

    load_all()
    spark = get_spark("parity")

    if window_only:
        names = list(QUERIES)[:50]  # exactly the driver's correctness window
    else:
        names = only or sorted(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}; available: {sorted(QUERIES)}")
        return 2
    rc = 0
    for sf_dir in sf_dirs:
        print(f"== {sf_dir} ==")
        rc = max(rc, run_sweep(spark, sf_dir, names))
    return rc


def run_sweep(spark, sf_dir: str, names: list[str]) -> int:
    con = duckdb.connect()
    # fail fast instead of filling the disk: an oracle with an unbounded
    # intermediate (the pre-fix cf_holdout_hitrate candidate fan-out
    # spilled >80 GB at sf0.1) should ERROR here, pointing at the join to
    # cap, not run the machine out of space 40 minutes into a sweep
    con.execute("SET memory_limit='48GB'")
    con.execute("SET max_temp_directory_size='20GB'")
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = n_rowsonly = n_hazard = 0
    for name in names:
        fn = QUERIES[name]
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            haz = reround_hazards(df._jdf.queryExecution().optimizedPlan().toString())
            for h in haz:
                print(f"HAZARD {name}: {h}")
            n_hazard += len(haz)
            sdf = df.toPandas()
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
    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only of {len(names)}"
        + (f"  [{n_hazard} re-round HAZARDs]" if n_hazard else "")
    )
    return 1 if (n_fail or n_hazard) else 0


if __name__ == "__main__":
    raise SystemExit(main())
