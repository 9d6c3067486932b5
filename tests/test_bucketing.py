"""Bucketed co-located joins: the write-once-shuffle-never property.

Both tables are written bucketed+sorted on the join key; the join plan
must contain ZERO Exchange operators (the whole point), and its result
must equal the plain shuffle join over the original parquet.
"""

from __future__ import annotations

import pytest

from simpletons_map_reduce_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from simpletons_map_reduce_spark.plans import count_exchanges, physical_plan
from simpletons_map_reduce_spark.sources.tables import load_table
from tests.conftest import SF0001


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF0001, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, SF0001, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "orderkey"),
        "bkt_orders", "orderkey",
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "orderkey"),
        "bkt_lineitem", "orderkey",
    )
    yield "bkt_orders", "bkt_lineitem"
    for t in ("bkt_orders", "bkt_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    df = bucketed_join(spark, left, right, "orderkey")
    plan = physical_plan(df, "simple")
    assert count_exchanges(df) == 0, plan
    assert "SortMergeJoin" in plan


def test_bucketed_join_matches_shuffle_join(spark, bucketed_tables):
    left, right = bucketed_tables
    got = bucketed_join(spark, left, right, "orderkey").count()
    orders = load_table(spark, SF0001, "orders")
    lineitem = load_table(spark, SF0001, "lineitem")
    want = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).count()
    assert got == want and got > 0
