"""Accuracy contracts for the sketch operators (rows-only in the registry).

Same pattern as the ANN recall pins: the driver can only row-count these, so
the real guarantee — sketch answer close to exact answer — lives here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from simpletons_map_reduce_spark.queries import REGISTRY
from simpletons_map_reduce_spark.sources.tables import load_table
from tests.conftest import SF001


def test_approx_distinct_within_rsd(spark):
    approx = {
        r.event_type: r.approx_users
        for r in REGISTRY["approx_distinct"].fn(spark, SF001).collect()
    }
    exact = {
        r.event_type: r.exact
        for r in load_table(spark, SF001, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        rel = abs(approx[k] - exact[k]) / max(exact[k], 1)
        # rsd=0.02; allow 3 sigma
        assert rel < 0.06, (k, approx[k], exact[k])


def test_approx_quantiles_close_to_exact(spark):
    rows = {r.event_type: r for r in REGISTRY["approx_quantiles"].fn(spark, SF001).collect()}
    events = load_table(spark, SF001, "events")
    exact = {
        r.event_type: r.qs
        for r in events.groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.5, 0.9, 0.99))").alias("qs"))
        .collect()
    }
    assert rows.keys() == exact.keys()
    for k, r in rows.items():
        spread = max(exact[k]) - min(exact[k]) or 1.0
        for got, want in zip((r.p50, r.p90, r.p99), exact[k]):
            # rank error 1/accuracy — value error bounded via local density;
            # 2% of the p50..p99 spread is a generous, stable envelope.
            assert abs(got - want) <= 0.02 * spread + 1e-6, (k, got, want)


def test_cms_one_sided_error_and_bound(spark):
    """CMS guarantees est >= exact (counts only collide upward); realized
    overcount must sit far inside the eps*N envelope (eps = e/w)."""
    from simpletons_map_reduce_spark.functions.text import tokens_lower
    from simpletons_map_reduce_spark.queries.sketch_ops import CMS_W

    rows = REGISTRY["cms_heavy_hitters"].fn(spark, SF001).collect()
    assert len(rows) == 20
    docs = load_table(spark, SF001, "documents")
    n_tokens = docs.select(
        F.explode(tokens_lower(F.col("text"))).alias("t")
    ).count()
    for r in rows:
        assert r.overcount >= 0, r  # one-sided by construction
        assert r.est_cnt == r.exact_cnt + r.overcount
        # standard CMS bound: overcount <= e/w * N with prob 1-e^-d;
        # realized values should be well inside even at d=4.
        assert r.overcount <= 2.718 / CMS_W * n_tokens + 1, (r, n_tokens)
