"""Randomized differential testing of the ngram dedup pipeline.

The curated oracle checks run the FIXED caps on FIXED fixtures; this
family generates boilerplate-heavy corpora (tiny vocabulary → saturated
prefix buckets) together with random (max_df, bucket_cap) parameters and
runs the SAME pipeline on Spark and DuckDB, comparing pairs exactly.
That cross-engine-checks the subtlest round-5 logic far beyond the
fixtures: the md5(doc_id)-ordered deterministic bucket sampling, the
saturation flag, and the bucket-aware positional-filter CASE — any
divergence in hash mirroring, window ordering, or integer threshold
arithmetic surfaces as a row diff on a shrinkable example.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from simpletons_map_reduce_spark.caching import release_persisted
from simpletons_map_reduce_spark.queries.dedup_ops import (
    build_near_dedup_oracle,
    build_ngram_containment_oracle,
    build_ngram_jaccard_oracle,
    near_dedup_pairs,
    ngram_containment_pairs,
    ngram_jaccard_pairs,
)

#: tiny vocabulary → heavy gram sharing → saturated buckets at small cap
VOCAB = ["alpha", "bravo", "carol", "delta", "every", "faded", "gamma", "hotel"]


@st.composite
def corpus_and_caps(draw):
    n_templates = draw(st.integers(min_value=2, max_value=4))
    templates = [
        draw(
            st.lists(
                st.sampled_from(VOCAB), min_size=0, max_size=12
            )
        )
        for _ in range(n_templates)
    ]
    docs = []
    n_docs = draw(st.integers(min_value=6, max_value=28))
    for i in range(n_docs):
        base = list(templates[draw(st.integers(0, n_templates - 1))])
        # small mutation: maybe append/drop one token → near-dups, not
        # only exact replicas
        if base and draw(st.booleans()):
            base = base[:-1]
        if draw(st.booleans()):
            base.append(draw(st.sampled_from(VOCAB)))
        docs.append((i, " ".join(base)))
    max_df = draw(st.integers(min_value=3, max_value=40))
    bucket_cap = draw(st.integers(min_value=2, max_value=8))
    return docs, max_df, bucket_cap


@given(corpus_and_caps())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ngram_jaccard_matches_duckdb_on_generated_corpora(spark, case):
    docs, max_df, bucket_cap = case
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    try:
        got = sorted(
            (r.doc_a, r.doc_b, r.jaccard)
            for r in ngram_jaccard_pairs(
                sdf, max_df=max_df, bucket_cap=bucket_cap
            ).collect()
        )
    finally:
        release_persisted()
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(docs, columns=["doc_id", "text"]),
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            build_ngram_jaccard_oracle(max_df=max_df, bucket_cap=bucket_cap)
        ).fetchall()
    )
    con.close()
    assert got == want, (max_df, bucket_cap, docs)


@given(corpus_and_caps())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_near_dedup_matches_duckdb_on_generated_corpora(spark, case):
    """The whole MinHash mirror — per-token md5, polynomial gram combos
    (incl. the 0/1/2-token short-doc branches), 32 affine permutations,
    band keys, the [2, cap] bucket filter, exact verification — on
    random corpora with a random band-bucket cap."""
    docs, _max_df, bucket_cap = case
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    try:
        got = sorted(
            (r.doc_a, r.doc_b, r.jaccard)
            for r in near_dedup_pairs(sdf, bucket_cap=bucket_cap).collect()
        )
    finally:
        release_persisted()
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(docs, columns=["doc_id", "text"]),
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            build_near_dedup_oracle(bucket_cap=bucket_cap)
        ).fetchall()
    )
    con.close()
    assert got == want, (bucket_cap, docs)


@given(corpus_and_caps())
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dedup_clusters_match_recursive_cte_on_generated_corpora(spark, case):
    """Pointer-doubling label propagation ≡ recursive-CTE transitive
    closure on the near-dup graph induced by a random corpus + random
    bucket cap — the strongest algorithmic property in the dedup family
    (min-reachable-id per connected component), checked against an
    independent formulation, not a reimplementation."""
    from simpletons_map_reduce_spark.queries.dedup_ops import (
        _build_clusters_oracle,
        clusters_from_pairs,
    )

    docs, _max_df, bucket_cap = case
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    try:
        pairs = near_dedup_pairs(sdf, bucket_cap=bucket_cap).select(
            "doc_a", "doc_b"
        )
        got = sorted(
            (r.doc_id, r.cluster_id)
            for r in clusters_from_pairs(pairs).collect()
        )
    finally:
        release_persisted()
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(docs, columns=["doc_id", "text"]),
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            _build_clusters_oracle(
                build_near_dedup_oracle(bucket_cap=bucket_cap)
            )
        ).fetchall()
    )
    con.close()
    assert got == want, (bucket_cap, docs)


@given(corpus_and_caps())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dedup_incremental_matches_duckdb_on_generated_corpora(spark, case):
    """The asymmetric new-batch-vs-corpus probe over the same random
    corpora + band-bucket caps — the modulo batch split plus the shared
    MinHash mirror."""
    from simpletons_map_reduce_spark.queries.dedup_ops import (
        build_dedup_incremental_oracle,
        dedup_incremental_pairs,
    )

    docs, _max_df, bucket_cap = case
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    try:
        got = sorted(
            (r.new_doc, r.corpus_doc, r.jaccard)
            for r in dedup_incremental_pairs(
                sdf, bucket_cap=bucket_cap
            ).collect()
        )
    finally:
        release_persisted()
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(docs, columns=["doc_id", "text"]),
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            build_dedup_incremental_oracle(bucket_cap=bucket_cap)
        ).fetchall()
    )
    con.close()
    assert got == want, (bucket_cap, docs)


@given(corpus_and_caps())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_simhash_pairs_match_duckdb_on_generated_corpora(spark, case):
    """Frequency-weighted bit votes, banded fingerprint join, hamming
    verification — the third candidate strategy, fuzzed on the same
    random corpora (operator parameters are fixed constants; the corpus
    is the random input)."""
    from simpletons_map_reduce_spark.queries.dedup_ops import (
        _build_simhash_pairs_oracle,
        simhash_pairs_from,
    )

    docs, _max_df, _bucket_cap = case
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    try:
        got = sorted(
            (r.doc_a, r.doc_b, r.hamming)
            for r in simhash_pairs_from(spark, sdf).collect()
        )
    finally:
        release_persisted()
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(docs, columns=["doc_id", "text"]),
    )
    want = sorted(
        tuple(r) for r in con.sql(_build_simhash_pairs_oracle()).fetchall()
    )
    con.close()
    assert got == want, docs


@given(corpus_and_caps())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ngram_containment_matches_duckdb_on_generated_corpora(spark, case):
    docs, max_df, bucket_cap = case
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    try:
        got = sorted(
            (r.doc_small, r.doc_big, r.containment)
            for r in ngram_containment_pairs(
                sdf, max_df=max_df, bucket_cap=bucket_cap
            ).collect()
        )
    finally:
        release_persisted()
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(docs, columns=["doc_id", "text"]),
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            build_ngram_containment_oracle(
                max_df=max_df, bucket_cap=bucket_cap
            )
        ).fetchall()
    )
    con.close()
    assert got == want, (max_df, bucket_cap, docs)
