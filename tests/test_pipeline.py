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
    """Planted pins for the published decontamination grain under the
    round-11 BOUNDED suites: a single shared 13-token run flags the
    (doc, suite) combination; a 12-token run does NOT; suite members are
    exempt for their OWN suite but flaggable against the other; the
    shared-gram count is exact."""
    import random

    from simpletons_map_reduce_spark.queries import REGISTRY
    from simpletons_map_reduce_spark.queries.pipeline import (
        CONTAM13_N,
        CONTAM13_SUITES,
    )

    rng = random.Random(13)

    def words(prefix, n):
        return [f"{prefix}{rng.randrange(10**9)}" for _ in range(n)]

    run13 = [f"hit{i}" for i in range(CONTAM13_N)]
    run13b = [f"hot{i}" for i in range(CONTAM13_N)]
    run12 = [f"miss{i}" for i in range(CONTAM13_N - 1)]
    (s1, lo1, hi1), (s2, lo2, hi2) = CONTAM13_SUITES
    docs = {
        # suite-1 members (doc_id in [lo1, hi1))
        lo1 + 50: words("b", 5) + run13 + words("b", 5),
        lo1 + 55: words("e", 5) + run13b + words("e", 5),
        # suite-2 members (doc_id in [lo2, hi2))
        lo2 + 50: words("c", 5) + run12 + words("c", 5),
        lo2 + 60: words("d", 4) + run13b + words("d", 4),
        # train docs (outside both windows)
        hi2 + 5: words("x", 3) + run13 + words("x", 7),   # hits suite 1
        hi2 + 7: words("y", 6) + run12 + words("y", 6),   # 12-run: never
        hi2 + 11: words("z", 20),                          # clean
    }
    t = spark.createDataFrame(
        [(d, " ".join(toks)) for d, toks in docs.items()],
        "doc_id BIGINT, text STRING",
    )
    t.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r.doc_id, r.suite): r.n_shared
        for r in REGISTRY["contamination_13gram"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    # hi2+5 shares exactly one 13-gram (run13) with suite 1's set; the
    # run13b run lives in BOTH suites' sets via one member each, so each
    # member is flagged against the OTHER suite (cross-suite members are
    # train docs) while staying exempt from its own; the 12-token run
    # never produces a 13-gram collision.
    want = {
        (hi2 + 5, s1): 1,
        (lo1 + 55, s2): 1,
        (lo2 + 60, s1): 1,
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
