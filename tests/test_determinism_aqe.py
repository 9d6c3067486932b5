"""Determinism under physical re-planning: AQE on vs off.

At cluster scale AQE rewrites plans at runtime (coalesced partitions,
skew splits, join-strategy switches).  A correct engine must produce
IDENTICAL results either way; the order-exact integer-sum idiom
(functions/rounding.py) exists precisely so aggregation results cannot
depend on the physical plan.  These tests re-run representative queries
with adaptive execution disabled and hash-compare against the AQE-on
answer."""

from __future__ import annotations

import pytest

from simpletons_map_reduce_spark.queries import REGISTRY
from tests.conftest import SF001

QUERIES = [
    "pricing_summary",     # float-sum aggregate with rounding contract
    "product_profit",      # rsum star join (mixed-sign cancellation)
    "bm25_search",         # rank boundary on rounded score
    "top_supplier",        # integer-unit argmax tie set
    "stats_moments",       # integer moments
    "near_dedup",          # LSH candidate generation + verification
    "ngram_jaccard",       # dfreq join strategy is AQE's choice (round 5:
                           # broadcast hint removed) — result must not
                           # depend on which strategy it picks
    "media_dedup",         # kernel-echoed block key + window guard
    "pipeline_funnel_fused",  # fused gates + composed pair pipelines
    "bloom_probe",         # bit_or filter + exact join: AQE picks the
                           # exact-side strategy (round 6)
    "zorder_layout",       # scalar-max broadcast + zone aggregate
    "mixture_weights",     # integer-weight sums must survive re-planning
    "mixture_apply",       # floor-threshold boundary from exact sums
    "perplexity_buckets",  # ntile cut on the rounded-score total order
    "knn_classify",        # vote ties on the rounded-score rank boundary
]


@pytest.mark.parametrize("name", QUERIES)
def test_result_identical_with_aqe_off(spark, name):
    fn = REGISTRY[name].fn
    on = sorted(map(tuple, fn(spark, SF001).collect()))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        off = sorted(map(tuple, fn(spark, SF001).collect()))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert on == off
    assert on, f"{name} empty at sf0.01 — comparison vacuous"
