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
