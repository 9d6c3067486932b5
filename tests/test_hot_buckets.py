"""Hot-bucket caps: candidate volume must stay ~linear on boilerplate corpora.

A corpus with B identical (or near-identical) documents puts all B into the
same LSH band buckets — B(B-1)/2 logical candidate pairs per band before
verification, which AQE can split physically but never shrink logically.
MAX_BAND_BUCKET (near_dedup) and NJ_MAX_DF (ngram_jaccard) bound that; these
tests pin the contract: boilerplate explosion suppressed, genuinely unique
near-dup pairs still found.
"""

from __future__ import annotations

from simpletons_map_reduce_spark.queries.dedup_ops import (
    near_dedup_candidates,
    near_dedup_pairs,
    ngram_jaccard_candidates,
    ngram_jaccard_pairs,
)

N_BOILER = 120  # identical docs → C(120,2) = 7140 would-be candidate pairs
N_PAIRS = 3     # genuine near-dup pairs with unique vocabulary

_BOILER_TEXT = (
    "all rights reserved this page is copyright by the site owner and "
    "may not be reproduced without permission terms of service apply"
)


def _corpus(spark):
    rows = [(i, _BOILER_TEXT) for i in range(N_BOILER)]
    did = N_BOILER
    for j in range(N_PAIRS):
        base = " ".join(
            f"{w}{j}"
            for w in (
                "alpha bravo charlie delta echo foxtrot golf hotel india "
                "juliet kilo lima"
            ).split()
        )
        rows.append((did, base))
        rows.append((did + 1, base + f" mike{j}"))  # jaccard 10/11 ≈ 0.91
        did += 2
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_hot_bucket_cap_bounds_candidates(spark):
    docs = _corpus(spark)
    uncapped = near_dedup_candidates(docs, bucket_cap=1 << 30).count()
    capped = near_dedup_candidates(docs, bucket_cap=16).count()
    # identical docs alone contribute C(120,2) candidates when uncapped
    assert uncapped >= N_BOILER * (N_BOILER - 1) // 2
    # capped: the 120-member buckets are dropped; what's left is ~linear
    # (the genuine pairs and any small accidental collisions)
    assert capped < N_BOILER


def test_lsh_cap_keeps_unique_near_dups(spark):
    docs = _corpus(spark)
    found = {
        (r.doc_a, r.doc_b)
        for r in near_dedup_pairs(docs, bucket_cap=16).collect()
    }
    for j in range(N_PAIRS):
        a, b = N_BOILER + 2 * j, N_BOILER + 2 * j + 1
        assert (a, b) in found, f"genuine near-dup pair {(a, b)} lost to cap"


def test_ngram_prefix_bucket_cap_bounds_candidates(spark):
    """Boilerplate grams stay under the df guard here (df=120 < 10k), so
    without the bucket cap every boilerplate doc's prefix collides with all
    others — C(120,2) candidates.  The cap SAMPLES those buckets down to
    ``cap`` hash-ordered members (identical docs have identical bucket
    membership, so every saturated bucket keeps the SAME 16 docs and the
    distinct candidate set is bounded at C(cap,2)); the genuine pairs'
    2-member buckets survive untouched."""
    cap = 16
    docs = _corpus(spark)
    uncapped = ngram_jaccard_candidates(docs, bucket_cap=1 << 30).count()
    capped = ngram_jaccard_candidates(docs, bucket_cap=cap).count()
    assert uncapped >= N_BOILER * (N_BOILER - 1) // 2
    # bounded: the sampled boilerplate block contributes C(cap,2), and the
    # "genuine" docs — whose digit suffixes the letters-only tokenizer
    # strips, making all 2·N_PAIRS of them one near-dup group — contribute
    # C(2·N_PAIRS,2).  Far below the quadratic 7140.
    genuine_all = 2 * N_PAIRS
    assert capped <= cap * (cap - 1) // 2 + genuine_all * (genuine_all - 1) // 2, capped
    found = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, bucket_cap=cap).collect()
    }
    for j in range(N_PAIRS):
        a, b = N_BOILER + 2 * j, N_BOILER + 2 * j + 1
        assert (a, b) in found, f"genuine pair {(a, b)} lost to bucket cap"
    # graceful-degradation floor (VERDICT r4 item 6): saturated buckets
    # must still EMIT duplicate pairs (the sampled C(16,2) identical-doc
    # pairs, jaccard 1.0) instead of collapsing recall to zero
    boiler_found = [p for p in found if p[0] < N_BOILER and p[1] < N_BOILER]
    assert len(boiler_found) == cap * (cap - 1) // 2, len(boiler_found)


def test_simhash_pairs_find_planted_near_dups(spark):
    """Docs differing by one token out of ~12 flip few fingerprint bits:
    each genuine pair must appear within the hamming threshold, and every
    emitted pair must satisfy it."""
    from simpletons_map_reduce_spark.queries.dedup_ops import (
        SIMHASH_HAM_MAX,
        simhash_pairs_from,
    )

    docs = _corpus(spark)
    rows = simhash_pairs_from(spark, docs).collect()
    found = {(r.doc_a, r.doc_b) for r in rows}
    assert all(r.hamming <= SIMHASH_HAM_MAX for r in rows)
    for j in range(N_PAIRS):
        a, b = N_BOILER + 2 * j, N_BOILER + 2 * j + 1
        assert (a, b) in found, f"genuine pair {(a, b)} missed by simhash"


def test_ngram_prefix_df_guard(spark):
    docs = _corpus(spark)
    pairs = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, max_df=8).collect()
    }
    # boilerplate grams all have dfreq=120 > 8 → no boilerplate candidates
    assert all(a >= N_BOILER for a, _ in pairs)
    # unique-vocabulary near-dups (dfreq <= 2) still found
    for j in range(N_PAIRS):
        a, b = N_BOILER + 2 * j, N_BOILER + 2 * j + 1
        assert (a, b) in pairs, f"genuine pair {(a, b)} lost to df guard"


def test_containment_finds_planted_subset_that_jaccard_misses(spark):
    """A short doc quoted verbatim inside a much longer one: containment
    ≈ 1.0 (flagged) while Jaccard sits far below its 0.8 threshold."""
    from simpletons_map_reduce_spark.queries.dedup_ops import (
        ngram_containment_pairs,
    )

    quote = " ".join(f"q{i}" for i in range(30))
    filler = " ".join(f"f{i}" for i in range(300))
    rows = [
        (1, quote),                      # the containee
        (2, filler + " " + quote),       # the container (quotes doc 1)
        (3, " ".join(f"z{i}" for i in range(40))),  # unrelated
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_small, r.doc_big): r.containment
           for r in ngram_containment_pairs(docs).collect()}
    assert (1, 2) in got, got
    assert got[(1, 2)] >= 0.9
    jac = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(docs).collect()}
    assert (1, 2) not in jac  # the asymmetric op earns its keep
    assert not any(3 in p for p in got)
