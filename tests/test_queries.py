"""Registry-wide invariants: every query runs, has a stable schema, and the
ones with float outputs are deterministic across executions."""

from __future__ import annotations

import pytest

from simpletons_map_reduce_spark.queries import REGISTRY
from tests.conftest import SF0001

EXPECT_NONEMPTY = {
    name
    for name in REGISTRY
    if name not in {"anti_join"}  # anti_join is legitimately empty (every
    # customer has orders in the synthetic data)
}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs_and_schema_stable(spark, name):
    q = REGISTRY[name]
    df1 = q.fn(spark, SF0001)
    df2 = q.fn(spark, SF0001)
    assert df1.schema == df2.schema
    rows = df1.collect()
    if name in EXPECT_NONEMPTY:
        assert len(rows) > 0, f"{name} returned no rows at sf0.001"


@pytest.mark.parametrize("name", ["near_dedup", "similarity_topk", "tfidf_topterms"])
def test_double_run_determinism(spark, name):
    """The reference's determinism idiom (B7) generalized: running twice
    yields byte-identical results despite shuffles and float math."""
    q = REGISTRY[name]
    a = sorted(map(tuple, q.fn(spark, SF0001).collect()))
    b = sorted(map(tuple, q.fn(spark, SF0001).collect()))
    assert a == b


def test_oracle_declared_queries_have_matching_columns(spark, duck):
    """Column names must match the oracle exactly (driver hashes by sorted
    column name) — cheap structural check on every declared oracle."""
    for name, q in sorted(REGISTRY.items()):
        if q.oracle is None:
            continue
        scols = sorted(q.fn(spark, SF0001).columns)
        dcols = sorted(duck.sql(q.oracle).columns)
        assert scols == dcols, f"{name}: spark {scols} != duckdb {dcols}"
