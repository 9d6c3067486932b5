"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in ``simpletons_map_reduce_spark.queries`` — each module
registers callables plus the equivalent DuckDB SQL in one place so the two
sides can never drift apart silently.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from simpletons_map_reduce_spark.queries import REGISTRY

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Word count is the reference's own flagship application
    (mrapps/wc.go) — tokenize, shuffle on word, count.
    """
    return REGISTRY["wordcount"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; ops without an entry (approximate
    algorithms) accept the driver's weaker rows-only check."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
