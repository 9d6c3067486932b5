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


def test_table_checks_fire_on_corrupted_tables(spark, tmp_path):
    """Every constraint must report its violation count on a deliberately
    corrupted load (the fixture itself is clean → all zeros there)."""
    from simpletons_map_reduce_spark.queries import REGISTRY

    orders = [
        # (o_orderkey, o_custkey, o_totalprice)
        (1, 10, 100.0),
        (1, 10, 50.0),      # duplicate PK
        (2, None, 10.0),    # null FK key
        (3, 999, -5.0),     # dangling FK + non-positive price
    ]
    lineitem = [
        # (l_orderkey, l_linenumber, l_quantity, l_discount)
        (1, 1, 5.0, 0.1),
        (1, 1, 2.0, 0.2),   # duplicate PK
        (2, 1, 0.0, 1.5),   # non-positive qty + out-of-range discount
        (77, 1, 1.0, 0.0),  # dangling FK
    ]
    customer = [(10,), (11,)]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_totalprice double"
    ).write.parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        lineitem,
        "l_orderkey long, l_linenumber int, l_quantity double,"
        " l_discount double",
    ).write.parquet(f"{tmp_path}/lineitem.parquet")
    spark.createDataFrame(customer, "c_custkey long").write.parquet(
        f"{tmp_path}/customer.parquet"
    )
    got = {
        r.check_name: r.n_violations
        for r in REGISTRY["table_checks"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {
        "orders.null_custkey": 1,
        "orders.pk_unique": 1,
        "orders.positive_price": 1,
        "lineitem.pk_unique": 1,
        "lineitem.positive_qty": 1,
        "lineitem.discount_range": 1,
        "orders.fk_customer": 1,  # custkey 999 (NULL is the null check's job)
        "lineitem.fk_orders": 1,  # orderkey 77
    }
