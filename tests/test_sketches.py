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


def test_bloom_no_false_negatives_and_fp_rate(spark):
    """Bloom contract: every exact duplicate MUST be a bloom hit (one-sided
    error); false-positive rate among true non-members must sit inside the
    theoretical (1-e^(-nk/m))^k envelope with slack."""
    import math

    from simpletons_map_reduce_spark.queries.sketch_ops import (
        BLOOM_BATCH_MOD,
        BLOOM_K,
        BLOOM_M_BITS,
    )

    rows = REGISTRY["bloom_probe"].fn(spark, SF001).collect()
    assert rows, "empty bloom report"
    misses = [r for r in rows if r.exact_dup and not r.bloom_hit]
    assert not misses, f"false negatives: {misses[:5]}"

    n_corpus = (
        load_table(spark, SF001, "documents")
        .filter(F.col("doc_id") % BLOOM_BATCH_MOD != 0)
        .count()
    )
    non_members = [r for r in rows if not r.exact_dup]
    fps = [r for r in non_members if r.bloom_hit]
    expected_fp = (1 - math.exp(-n_corpus * BLOOM_K / BLOOM_M_BITS)) ** BLOOM_K
    # generous envelope: 10x theory + 1 absolute (tiny fixtures -> 0 FPs)
    if non_members:
        assert len(fps) <= 10 * expected_fp * len(non_members) + 1, (
            len(fps),
            len(non_members),
            expected_fp,
        )


def test_bloom_filter_relation_bounded(spark):
    """The filter relation never exceeds its geometric bound m/32 rows —
    the property that makes the broadcast legal at any corpus size."""
    from simpletons_map_reduce_spark.queries.sketch_ops import (
        BLOOM_M_BITS,
        BLOOM_WORD_BITS,
    )

    # rebuild just the filter side at sf0.01
    from simpletons_map_reduce_spark.functions.hashing import SPARK_MD5_INT60
    from simpletons_map_reduce_spark.queries.sketch_ops import (
        BLOOM_BATCH_MOD,
        BLOOM_K,
    )

    docs = load_table(spark, SF001, "documents")
    corpus = docs.select("doc_id", F.sha2("text", 256).alias("key")).filter(
        F.col("doc_id") % BLOOM_BATCH_MOD != 0
    )
    i_col = F.explode(F.array(*[F.lit(i) for i in range(BLOOM_K)])).alias("i")
    pos_of = (
        F.expr(SPARK_MD5_INT60.format(e="concat(cast(i as string), ':', key)"))
        % BLOOM_M_BITS
    )
    n_words = (
        corpus.select("key", i_col)
        .select(pos_of.alias("pos"))
        .select(F.expr(f"pos div {BLOOM_WORD_BITS}").alias("word"))
        .distinct()
        .count()
    )
    assert n_words <= BLOOM_M_BITS // BLOOM_WORD_BITS


def test_hll_rollup_matches_exact_distinct(spark):
    """Union-of-daily-sketches estimate vs exact whole-period distinct."""
    rows = {
        r.event_type: r
        for r in REGISTRY["hll_rollup"].fn(spark, SF001).collect()
    }
    events = load_table(spark, SF001, "events")
    exact = {
        r.event_type: r.exact
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    n_days = {
        r.event_type: r.nd
        for r in events.groupBy("event_type")
        .agg(F.countDistinct(F.to_date("ts")).alias("nd"))
        .collect()
    }
    assert rows.keys() == exact.keys()
    for k, r in rows.items():
        assert r.n_days == n_days[k]
        rel = abs(r.approx_users - exact[k]) / max(exact[k], 1)
        # datasketches HLL default lgK=12 -> rsd ~1.6%; allow 3 sigma
        assert rel < 0.05, (k, r.approx_users, exact[k])
        # sum of daily distincts would OVERCOUNT whenever users repeat
        # across days; the union must not inherit that bias (stay below
        # the naive sum whenever repetition exists).
