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


def test_stats_moments_agrees_with_builtin_estimators(spark):
    """The integer-moment mean/var/corr must agree with Spark's float
    var_pop/corr to float tolerance (the builtins are the semantic
    reference; the moments form exists for cross-engine exactness)."""
    import pyspark.sql.functions as F
    from simpletons_map_reduce_spark.sources.tables import load_table

    got = {
        r.l_returnflag: r
        for r in REGISTRY["stats_moments"].fn(spark, SF0001).collect()
    }
    li = load_table(spark, SF0001, "lineitem")
    ref = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.avg("l_quantity").alias("mean"),
            F.var_pop("l_quantity").alias("var"),
            F.corr(
                F.col("l_quantity"),
                F.floor(F.col("l_discount") * 10000 + F.lit(0.5)),
            ).alias("corr"),
        )
        .collect()
    }
    assert got.keys() == ref.keys()
    for k in ref:
        # tolerances = the 4-dp/6-dp floor-round granularity of the output
        assert abs(got[k].mean_qty - ref[k].mean) < 1e-4
        assert abs(got[k].var_qty - ref[k].var) < 1e-3
        assert abs(got[k].corr_qty_disc - ref[k].corr) < 2e-6


def test_anomaly_mad_brute_force(spark):
    """MAD outliers recomputed in plain Python must match exactly."""
    import statistics

    from simpletons_map_reduce_spark.sources.tables import load_table

    rows = load_table(spark, SF0001, "events").select(
        "event_id", "event_type", "value"
    ).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)

    def med_low(vals):
        # mirror the engines' rank idiom rk = (n + 1) DIV 2: the true
        # lower median (odd n → THE median, even n → lower of the
        # central pair); (n+1)//2 is safe here since n+1 > 0 so Python
        # floor and Spark/DuckDB truncation agree
        s = sorted(vals)
        rank = (len(s) + 1) // 2
        return s[rank - 1]

    want = set()
    for et, rs in by_type.items():
        med = med_low([r.value for r in rs])
        ads = [abs(r.value - med) for r in rs]
        mad = med_low(ads)
        if mad > 0:
            want |= {
                r.event_id for r, ad in zip(rs, ads) if ad > 3 * mad
            }
    got = {
        r.event_id for r in REGISTRY["anomaly_mad"].fn(spark, SF0001).collect()
    }
    assert got == want
    assert statistics  # keep the import referenced


def test_hybrid_search_composes_bm25_candidates(spark):
    """hybrid_search's rows are a subset of bm25_search's candidate set,
    ranks are 1..k by descending cosine, and the bm25_score column equals
    the lexical stage's score for each kept doc."""
    bm = {
        r.doc_id: r.score
        for r in REGISTRY["bm25_search"].fn(spark, SF0001).collect()
    }
    rows = sorted(
        REGISTRY["hybrid_search"].fn(spark, SF0001).collect(),
        key=lambda r: r.rk,
    )
    assert 0 < len(rows) <= 10
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert (a.cos_sim, -a.doc_id) >= (b.cos_sim, -b.doc_id)
    for r in rows:
        assert r.doc_id in bm and r.bm25_score == bm[r.doc_id]
