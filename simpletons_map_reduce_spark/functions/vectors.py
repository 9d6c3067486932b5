"""Vector math over array<double> columns — JVM-side, no Python UDF.

The embeddings table stores array<float>; every operator first casts to
array<double> and then folds sequentially (``aggregate``), matching the
DuckDB oracle's ``list_reduce`` left fold element-for-element so both engines
produce bit-identical doubles.

At 100 TB the dot product is the cheap part; the expensive part is pair
generation — see operators/similarity.py for the broadcast / LSH strategies.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_vec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (same order as the oracle's list_reduce)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm2(a) * norm2(b))


def cosine_from_parts(dot_ab: Column, norm_a: Column, norm_b: Column) -> Column:
    """cosine given precomputed norms — pair-generation operators compute
    each vector's norm ONCE per row instead of twice per candidate pair
    (measured ~2× on the blocked pair join).

    Note: unrolling the 64-dim fold into a flat ``a1*b1 + a2*b2 + …`` chain
    was tried and measured ~30% SLOWER than the ``aggregate`` fold — the
    ~200-node expression tree blows up generated-code size past
    JIT-friendly limits.  The fold stays."""
    return dot_ab / (norm_a * norm_b)


def sql_dot(a: str, b: str) -> str:
    """DuckDB twin of ``dot``: sequential left fold, 1-indexed lists."""
    return (
        f"list_reduce(list_prepend(0.0, "
        f"list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])), "
        f"(acc, x) -> acc + x)"
    )


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / (sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)})))"
