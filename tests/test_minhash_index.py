"""Pins for the MinHash signature index artifact (operators/minhash_index.py).

Mirrors tests/test_ann_index.py for the dedup side of the build-once/
probe-many story:
- write/load roundtrip: schema + cardinalities survive;
- the probe plan never recomputes signatures — no MapInPandas stage
  (np_minhash_bands) anywhere; the only Python stage is the cogrouped
  bucket-verify kernel, which is candidate-scale, not corpus-scale;
- near_dedup_indexed output equals near_dedup exactly (the artifact is a
  materialization, not an approximation);
- staleness: size and signature-scheme mismatches refuse to load.
"""

from __future__ import annotations

import pytest

from simpletons_map_reduce_spark.operators.minhash_index import (
    load_minhash_index,
    write_minhash_index,
)
from simpletons_map_reduce_spark.queries import REGISTRY
from simpletons_map_reduce_spark.queries.dedup_ops import BAND_ROWS, NUM_PERM
from simpletons_map_reduce_spark.sources.tables import load_table

from tests.conftest import SF0001


def _docs(spark):
    return load_table(spark, SF0001, "documents").select("doc_id", "text")


def test_roundtrip_and_probe_has_no_signature_stage(spark, tmp_path):
    docs = _docs(spark)
    n = docs.count()
    idx = str(tmp_path / "mh")
    write_minhash_index(docs, idx)
    shs, bands = load_minhash_index(spark, idx, expect_n=n)
    assert shs.columns == ["doc_id", "shset"]
    assert set(bands.columns) == {"doc_id", "band", "band_key"}
    assert shs.count() == n
    # every doc emits NUM_PERM/BAND_ROWS band rows
    assert bands.count() == n * (NUM_PERM // BAND_ROWS)
    # probe plan: the signature kernel (MapInPandas) must NOT appear
    probe = REGISTRY["near_dedup_indexed"].fn(spark, SF0001)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_indexed_output_equals_inline(spark):
    a = sorted(
        map(tuple, REGISTRY["near_dedup_indexed"].fn(spark, SF0001).collect())
    )
    b = sorted(map(tuple, REGISTRY["near_dedup"].fn(spark, SF0001).collect()))
    assert a == b
    assert len(a) > 0


def test_incremental_indexed_equals_inline(spark):
    """The production ingest probe: artifact-served incremental dedup
    matches the inline operator exactly, and its probe plan never
    recomputes signatures."""
    a = sorted(
        map(
            tuple,
            REGISTRY["dedup_incremental_indexed"].fn(spark, SF0001).collect(),
        )
    )
    b = sorted(
        map(tuple, REGISTRY["dedup_incremental"].fn(spark, SF0001).collect())
    )
    assert a == b
    probe = REGISTRY["dedup_incremental_indexed"].fn(spark, SF0001)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan, plan


def test_stale_index_refuses_to_load(spark, tmp_path):
    docs = _docs(spark)
    idx = str(tmp_path / "mh")
    write_minhash_index(docs.limit(50), idx)
    with pytest.raises(ValueError, match="stale MinHash index"):
        load_minhash_index(spark, idx, expect_n=999_999)


def test_composites_pair_relation_is_artifact_served(spark):
    """Round 13: the dedup composites (dedup_clusters and, through it,
    dedup_apply/report/weights, leakage_safe_split, the funnel pair)
    consume the pair relation from the persisted MinHash artifact — the
    pair plan has no corpus-scale signature stage (MapInPandas), only
    the candidate-scale cogrouped verify kernel, and the pairs equal the
    inline relation exactly."""
    from simpletons_map_reduce_spark.queries.dedup_ops import (
        near_dedup_pairs_indexed,
    )

    pairs = near_dedup_pairs_indexed(spark, SF0001)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan, plan
    assert "FlatMapCoGroupsInPandas" in plan, plan
    a = sorted(map(tuple, pairs.collect()))
    b = sorted(map(tuple, REGISTRY["near_dedup"].fn(spark, SF0001).collect()))
    assert a == b and len(a) > 0
