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


# -- Exact summation for cancellation-heavy aggregates ----------------------
#
# ``rn`` makes a GIVEN double round identically on both engines, but a float
# SUM itself is association-dependent: Spark's partial/final aggregation and
# DuckDB's single-threaded sum can differ in the last ulp, and when the
# addends mix signs (profit = revenue − cost) the cancellation leaves that
# ulp right at a rounding boundary.  ``rsum``/``sql_rsum`` sidestep floats
# entirely: each ROW's value — bit-identical across engines, same IEEE
# expression tree — is floor-scaled to an integer number of 10^-p units,
# summed as BIGINT (exact, associative, order-free), and rescaled once at
# the end.  This is also the 100 TB-correct pattern: integer sums commute
# across any partial-aggregate tree, so the result is independent of
# partitioning, AQE re-plans, and combiner order.


def rsum(col: Column, n: int, p: int = 4) -> Column:
    """Order-exact sum of ``col`` rounded to ``n`` dp, via integer 10^-p units."""
    unit = float(10**p)
    ints = F.floor(col * F.lit(unit) + F.lit(0.5)).cast("long")
    return rn(F.sum(ints) / F.lit(unit), n)


def sql_rsum(expr: str, n: int, p: int = 4) -> str:
    """The DuckDB-side twin of ``rsum`` (identical integer arithmetic)."""
    unit = float(10**p)
    inner = f"sum(CAST(FLOOR(({expr}) * {unit} + 0.5) AS BIGINT)) / {unit}"
    return sql_rn(inner, n)
