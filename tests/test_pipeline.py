"""Composite-pipeline invariants (corpus_filter / pipeline_funnel)."""

from __future__ import annotations

from simpletons_map_reduce_spark.queries import REGISTRY
from tests.conftest import SF0001


def test_funnel_is_monotone_and_anchored(spark):
    """Funnel counts never increase stage-to-stage; stage 0 is the raw
    corpus; the survivor count agrees with dedup_apply minus contamination
    (the stages it composes)."""
    rows = sorted(
        REGISTRY["pipeline_funnel"].fn(spark, SF0001).collect(),
        key=lambda r: r.stage_no,
    )
    assert [r.stage for r in rows] == [
        "raw", "lang", "quality", "tokens", "exact_dedup", "near_dedup",
        "decontaminated",
    ]
    counts = [r.docs for r in rows]
    assert counts == sorted(counts, reverse=True)
    from simpletons_map_reduce_spark.sources.tables import load_table

    assert counts[0] == load_table(spark, SF0001, "documents").count()
    assert counts[-1] > 0, "everything filtered out — funnel is vacuous"
    # at least one gate must actually drop something on the fixture
    assert counts[-1] < counts[0]


def test_funnel_fused_equals_composed(spark):
    """The fused single-scan funnel must produce the EXACT histogram of the
    operator-composed one — the drift the fused variant refuses by
    importing the registered gates' own expressions."""
    from simpletons_map_reduce_spark.caching import release_persisted

    composed = sorted(
        (r.stage_no, r.stage, r.docs)
        for r in REGISTRY["pipeline_funnel"].fn(spark, SF0001).collect()
    )
    release_persisted()
    fused = sorted(
        (r.stage_no, r.stage, r.docs)
        for r in REGISTRY["pipeline_funnel_fused"].fn(spark, SF0001).collect()
    )
    release_persisted()
    assert fused == composed


def test_contamination_13gram_planted_collisions(spark, tmp_path):
    """Planted pins for the published decontamination grain: a single
    shared 13-token run flags the (doc, stripe) combination; a 12-token
    run does NOT; a doc hitting benchmarks in BOTH stripes yields one row
    per stripe; suite members are exempt for their OWN suite; the
    shared-gram count is exact."""
    import random

    from simpletons_map_reduce_spark.queries import REGISTRY
    from simpletons_map_reduce_spark.queries.pipeline import (
        CONTAM13_N,
        CONTAM13_STRIPES,
    )

    rng = random.Random(13)

    def words(prefix, n):
        return [f"{prefix}{rng.randrange(10**9)}" for _ in range(n)]

    run13 = [f"hit{i}" for i in range(CONTAM13_N)]
    run12 = [f"miss{i}" for i in range(CONTAM13_N - 1)]
    m1, m2 = CONTAM13_STRIPES  # 97, 89
    both = m1 * m2  # bench doc in BOTH stripes
    docs = {
        # benchmark docs (multiples of the stripe moduli)
        m1: words("b", 5) + run13 + words("b", 5),
        m2: words("c", 5) + run12 + words("c", 5),
        both: words("d", 4) + run13 + words("d", 4),
        # corpus docs
        5: words("x", 3) + run13 + words("x", 7),   # hits m1 AND both
        7: words("y", 6) + run12 + words("y", 6),   # 12-run: never flagged
        11: words("z", 20),                          # clean
    }
    t = spark.createDataFrame(
        [(d, " ".join(toks)) for d, toks in docs.items()],
        "doc_id BIGINT, text STRING",
    )
    t.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r.doc_id, r.stripe): r.n_shared
        for r in REGISTRY["contamination_13gram"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    # doc 5 shares exactly one 13-gram with each suite (run13 is in m1's
    # set via doc m1 and in m2's set via doc `both`); doc m1 is itself a
    # train doc RELATIVE TO stripe m2 and hits m2's set the same way;
    # suite members are exempt for their own suite (m1 @ m1, both @ both),
    # so `both` — a member of both suites — never appears.
    want = {
        (5, m1): 1,
        (5, m2): 1,
        (m1, m2): 1,
    }
    assert got == want


def test_contamination_apply_is_exact_complement(spark):
    """The apply op must keep exactly the docs the 13-gram report does
    not flag — shared-subquery construction means this cannot drift, but
    the pin guards the anti-join shape itself."""
    from simpletons_map_reduce_spark.queries import REGISTRY
    from simpletons_map_reduce_spark.sources.tables import load_table
    from tests.conftest import SF001

    flagged = {
        r.doc_id
        for r in REGISTRY["contamination_13gram"].fn(spark, SF001).collect()
    }
    kept = {
        r.doc_id
        for r in REGISTRY["contamination_apply"].fn(spark, SF001).collect()
    }
    all_ids = {
        r.doc_id
        for r in load_table(spark, SF001, "documents").select("doc_id").collect()
    }
    assert kept == all_ids - flagged
    assert kept and flagged, "fixture should have both survivors and flags"
