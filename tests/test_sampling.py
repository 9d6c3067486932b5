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


def test_mixture_apply_consistent_with_weights(spark):
    """The applied sample must realize the policy: over-represented
    sources keep < base_rate of docs, boosted sources keep more than the
    most-downsampled one; thresholds never exceed the hash modulus; kept
    counts are within binomial noise of thr/P * n_docs."""
    from simpletons_map_reduce_spark.functions.hashing import MINHASH_PRIME

    rows = {r.source: r for r in REGISTRY["mixture_apply"].fn(spark, SF001).collect()}
    weights = {
        r.source: r for r in REGISTRY["mixture_weights"].fn(spark, SF001).collect()
    }
    assert rows.keys() == weights.keys()
    for src, r in rows.items():
        assert 0 < r.thr <= MINHASH_PRIME
        assert 0 <= r.n_kept <= r.n_docs
        assert r.kept_toks <= r.toks
        expect = r.thr / MINHASH_PRIME * r.n_docs
        # 4-sigma binomial envelope (+2 absolute floor for tiny strata)
        sigma = (expect * (1 - r.thr / MINHASH_PRIME)) ** 0.5
        assert abs(r.n_kept - expect) <= 4 * sigma + 2, (src, r.n_kept, expect)
    # the most-boosted source must have a strictly higher threshold than
    # the most-downsampled one
    boosts = {s: weights[s].boost for s in weights}
    hi, lo = max(boosts, key=boosts.get), min(boosts, key=boosts.get)
    if boosts[hi] > boosts[lo]:
        assert rows[hi].thr > rows[lo].thr
