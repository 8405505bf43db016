"""Exact-arithmetic helpers for oracle-parity aggregation.

Two cross-engine hazards this module eliminates (SURVEY.md §4.3.3, §7.3.1):

1. *Order-dependent double sums*: Spark's partial-aggregation order differs
   from DuckDB's sequential scan, so SUM(double) differs in the last bits.
   Fix: sum in DECIMAL (exact, associative), cast to DOUBLE at the end.

2. *double->decimal cast of computed values*: Spark rounds the SHORTEST
   decimal representation of the double (Java BigDecimal.valueOf), DuckDB
   rounds the exact binary value — they disagree whenever a product lands
   near a half-cent. Fix: cast the *base columns* (clean 2-decimal values,
   where both roundings agree) to DECIMAL first and do the arithmetic in
   exact decimals. Similarly `round(double, 2)` uses engine-specific
   half-case handling -> use portable_round (floor(x*100+0.5)/100), which is
   pure IEEE double ops and therefore bitwise identical on both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

DEC = "decimal(18,2)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, alias: str | None = None, scale: int = 2) -> Column:
    """Order-independent exact sum of a ``scale``-decimal double column -> double.

    ``scale`` MUST be >= the intrinsic decimal scale of every value in the
    column: casting a double holding an s-decimal value to DECIMAL(_, s) is
    tie-free (the double is within half an ULP of the s-decimal value, far
    inside the 0.5*10^-s rounding band), but casting to a SMALLER scale
    re-rounds and can land on a half-ulp tie that Spark (shortest-repr) and
    DuckDB (exact binary) resolve differently. Base money columns are
    2-decimal; computed values like price*1.1 are 3-decimal -> scale=3.
    """
    out = F.sum(_c(col).cast(f"decimal(18,{scale})")).cast("double")
    return out.alias(alias) if alias else out


def dsum_sql(expr: str, scale: int = 2) -> str:
    """DuckDB mirror of :func:`dsum` for oracle SQL strings."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def money(col: Column | str) -> Column:
    """Exact decimal view of a 2-decimal money/measure column."""
    return _c(col).cast("decimal(12,2)")


MONEY_SQL = "CAST({} AS DECIMAL(12,2))"


def one_minus(col: Column | str) -> Column:
    """(1 - rate) as a tight exact decimal — keeps product widths <= 38."""
    return (F.lit(1) - money(col)).cast("decimal(4,2)")


def one_plus(col: Column | str) -> Column:
    return (F.lit(1) + money(col)).cast("decimal(4,2)")


ONE_MINUS_SQL = "CAST(1 - CAST({} AS DECIMAL(12,2)) AS DECIMAL(4,2))"
ONE_PLUS_SQL = "CAST(1 + CAST({} AS DECIMAL(12,2)) AS DECIMAL(4,2))"


def psum(col: Column, alias: str | None = None) -> Column:
    """Exact sum of an already-exact decimal product expression -> double."""
    out = F.sum(col).cast("double")
    return out.alias(alias) if alias else out


def revenue_col() -> Column:
    """l_extendedprice * (1 - l_discount), exact."""
    return money("l_extendedprice") * one_minus("l_discount")


REVENUE_SQL = (
    MONEY_SQL.format("l_extendedprice") + " * " + ONE_MINUS_SQL.format("l_discount")
)


def charge_col() -> Column:
    """l_extendedprice * (1 - l_discount) * (1 + l_tax), exact."""
    return revenue_col() * one_plus("l_tax")


CHARGE_SQL = REVENUE_SQL + " * " + ONE_PLUS_SQL.format("l_tax")


def portable_round(col: Column, scale: int = 2) -> Column:
    """round-half-up via floor(x*10^s + 0.5)/10^s — identical IEEE double ops
    on every engine, unlike round(double, s) whose half-case handling is
    engine-specific."""
    m = 10**scale
    return F.floor(col * m + F.lit(0.5)) / m


def portable_round_sql(expr: str, scale: int = 2) -> str:
    m = 10**scale
    return f"FLOOR(({expr}) * {m} + 0.5) / {m}"
