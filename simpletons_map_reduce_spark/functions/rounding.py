"""Oracle-stable rounding.

Spark's ROUND on doubles goes through BigDecimal.valueOf(double) (shortest
decimal string) with HALF_UP, while DuckDB rounds the scaled binary double —
the two can disagree on values whose shortest representation ends in ...5
(e.g. 123.455 stored as 123.45499999999998: Spark → 123.46, DuckDB → 123.45).

``floor(x * 10^n + 0.5) / 10^n`` instead uses only IEEE-754 double ops that
both engines execute identically, so both sides produce the *same* double and
the driver's value hash matches.  Every rounded column in queries() uses
``rn``; every oracle uses ``sql_rn`` with the same n.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rn(col: Column, n: int) -> Column:
    scale = float(10**n)
    return (F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)).alias(f"r{n}")


def r2(col: Column) -> Column:
    return rn(col, 2)


def r4(col: Column) -> Column:
    return rn(col, 4)


def r6(col: Column) -> Column:
    return rn(col, 6)


def sql_rn(expr: str, n: int) -> str:
    """The DuckDB-side twin of ``rn`` (identical double arithmetic)."""
    scale = float(10**n)
    return f"(FLOOR(({expr}) * {scale} + 0.5) / {scale})"
