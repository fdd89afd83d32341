"""Exact-arithmetic helpers for DuckDB-oracle value-hash parity.

Problem: ``SUM(double)`` accumulates rounding error whose low bits depend on
partition/accumulation order, so Spark and DuckDB disagree in the last few
ULPs — and at 60k+ rows the absolute error can exceed any fixed ROUND() grid.

Convention (used on BOTH sides of every money aggregate):
    CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)

The testdata money columns (l_quantity, l_extendedprice, l_discount, l_tax,
o_totalprice, c_acctbal, s_acctbal, p_retailprice, events.value) all carry
exactly 2 decimal digits, so the DECIMAL cast is lossless, the decimal SUM is
exact integer arithmetic, and the final double conversion is the same IEEE
nearest-even on both engines → bit-identical results, no tolerance needed.

Averages are expressed as exact-sum / count in ONE double division:
    CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(x)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"


def dec(col: Column | str, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact sum of a fixed-point double column, surfaced as double."""
    return F.sum(dec(col, scale)).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Exact-sum / count average — deterministic double on both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale)).cast("double") / F.count(c)


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT({expr})"
