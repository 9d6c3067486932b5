"""Property pins for the sampling-family operators added after the main
battery (the earlier sampling ops are pinned in test_queries.py)."""

from __future__ import annotations

from simpletons_map_reduce_spark.queries import REGISTRY
from tests.conftest import SF001


def test_mixture_weights_properties(spark):
    """Temperature flattening invariants: shares sum to ~1, below-average
    sources get boost > 1, above-average get boost < 1, and flattening
    strictly compresses the share spread (max/min ratio shrinks)."""
    rows = REGISTRY["mixture_weights"].fn(spark, SF001).collect()
    assert rows
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.target_share for r in rows) - 1.0) < 1e-3
    mean_share = 1.0 / len(rows)
    for r in rows:
        if r.share < mean_share * 0.99:
            assert r.boost > 1.0, r
        elif r.share > mean_share * 1.01:
            assert r.boost < 1.0, r
    nat = [r.share for r in rows]
    tgt = [r.target_share for r in rows]
    if min(nat) > 0:
        assert max(tgt) / min(tgt) <= max(nat) / min(nat) + 1e-9
