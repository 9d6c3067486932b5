"""salted_topk (operators/skew.py) must be result-identical to a plain
window top-k, including on pathologically skewed keys and ties."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from simpletons_map_reduce_spark.operators.skew import salted_topk


def _plain_topk(df, part_keys, order_by, k):
    w = Window.partitionBy(*part_keys).orderBy(*order_by)
    return (
        df.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )


@pytest.fixture(scope="module")
def skewed(spark):
    # key "hot": 5000 rows; keys k0..k9: 3 rows each; key "one": 1 row.
    rows = [("hot", i, float(i % 97)) for i in range(5000)]
    rows += [(f"k{j}", i, float(i)) for j in range(10) for i in range(3)]
    rows += [("one", 0, 42.0)]
    return spark.createDataFrame(rows, "key string, id int, score double").cache()


@pytest.mark.parametrize("k", [1, 5, 100])
def test_salted_matches_plain_window(spark, skewed, k):
    order = [F.col("score").desc(), F.col("id")]
    got = sorted(
        map(tuple, salted_topk(skewed, ["key"], order, k=k, salt=7).collect())
    )
    want = sorted(map(tuple, _plain_topk(skewed, ["key"], order, k).collect()))
    assert got == want


def test_salt_one_degenerates_to_plain(spark, skewed):
    order = [F.col("score").desc(), F.col("id")]
    got = sorted(
        map(tuple, salted_topk(skewed, ["key"], order, k=3, salt=1).collect())
    )
    want = sorted(map(tuple, _plain_topk(skewed, ["key"], order, 3).collect()))
    assert got == want


def test_ties_broken_deterministically(spark):
    # All scores equal — the id tiebreaker alone decides the top-k.
    df = spark.createDataFrame(
        [("a", i, 1.0) for i in range(200)], "key string, id int, score double"
    )
    order = [F.col("score").desc(), F.col("id")]
    got = salted_topk(df, ["key"], order, k=4, salt=5).orderBy("rk").collect()
    assert [(r.id, r.rk) for r in got] == [(0, 1), (1, 2), (2, 3), (3, 4)]


def test_near_dedup_pairs_invariant_to_input_partitioning(spark):
    """The dedup pair relation must not depend on how the corpus happens
    to be partitioned (the property that makes results stable across
    cluster sizes and AQE re-plans)."""
    from simpletons_map_reduce_spark.queries.dedup_ops import near_dedup_pairs
    from simpletons_map_reduce_spark.sources.tables import load_table
    from tests.conftest import SF0001

    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")
    a = sorted(
        map(tuple, near_dedup_pairs(docs.repartition(1)).collect())
    )
    b = sorted(
        map(tuple, near_dedup_pairs(docs.repartition(17, "doc_id")).collect())
    )
    assert a == b and a


def test_leakage_safe_split_keeps_clusters_together(spark):
    """No near-dup pair may straddle two splits."""
    from pyspark.sql import functions as F

    from simpletons_map_reduce_spark.queries.dedup_ops import dedup_clusters
    from simpletons_map_reduce_spark.functions.hashing import md5_mod_prime
    from simpletons_map_reduce_spark.queries.sampling_ops import (
        TRAIN_CUT,
        VALID_CUT,
    )
    from tests.conftest import SF0001

    cl = dedup_clusters(spark, SF0001)
    h = md5_mod_prime(F.expr("CAST(cluster_id AS STRING)"))
    split = (
        F.when(h < TRAIN_CUT, "train")
        .when(h < VALID_CUT, "valid")
        .otherwise("test")
    )
    per_cluster = (
        cl.select("cluster_id", split.alias("split"))
        .groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .collect()
    )
    assert per_cluster, "no clusters on fixture — test vacuous"
    assert all(r.n_splits == 1 for r in per_cluster)


def test_salted_join_spreads_hot_key(spark):
    """With a planted 90%-hot key, the salted join's per-(key, salt) group
    sizes must be ~1/S of the unsalted hot-key volume."""
    from pyspark.sql import functions as F

    from simpletons_map_reduce_spark.queries.relational import JOIN_SALT

    n = 10_000
    fact = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
        F.pmod(F.hash("id"), F.lit(JOIN_SALT)).alias("salt"),
    )
    sizes = (
        fact.filter(F.col("k") == 1)
        .groupBy("salt")
        .count()
        .collect()
    )
    assert len(sizes) == JOIN_SALT  # every salt bucket occupied
    hot = int(n * 0.9)
    for r in sizes:
        assert r["count"] < hot / JOIN_SALT * 1.5  # no residual hot bucket


def test_dedup_weights_unit_mass_per_cluster(spark):
    """Soft dedup invariants: every doc appears exactly once; each
    near-dup cluster's member weights sum to 1 (unit mass), singletons
    get weight 1; total weight = n_clusters + n_singletons."""
    from collections import defaultdict

    from simpletons_map_reduce_spark.queries import REGISTRY
    from tests.conftest import SF001

    rows = REGISTRY["dedup_weights"].fn(spark, SF001).collect()
    assert len({r.doc_id for r in rows}) == len(rows) == 500
    mass = defaultdict(float)
    size = {}
    for r in rows:
        mass[r.cluster_id] += r.weight
        size[r.cluster_id] = r.cluster_size
        if r.cluster_size == 1:
            assert r.weight == 1.0 and r.cluster_id == r.doc_id
    for cid, m in mass.items():
        assert abs(m - 1.0) < 1e-4, (cid, m, size[cid])
    assert any(s > 1 for s in size.values()), "fixture should have clusters"
