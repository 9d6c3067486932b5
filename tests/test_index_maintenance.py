"""Pins for round-10 incremental index maintenance + staleness hardening.

Contracts:
- append ≡ rebuild EXACTLY for the MinHash and BM25 artifacts (per-doc
  signatures / per-doc postings are corpus-independent; vocabulary-grain
  merges are exact integer sums), so the appended artifacts keep their
  probes' DuckDB oracles;
- IVF append assigns the batch under the FROZEN segment-0 centroids
  (FAISS train-once/add-many) — the appended segment equals a direct
  frozen-centroid assignment of the batch, and the segment union covers
  the full corpus;
- a killed append is INVISIBLE: orphan segment directories written
  without a meta commit are never read, and the retry overwrites them
  (write-new-then-swap);
- the content fingerprint closes the same-size staleness hole: every
  artifact family refuses to load when the corpus files changed even if
  the row count did not (VERDICT r9 missing #2 / ADVICE r9);
- appends refuse contract violations loudly (BM25 overlapping doc_ids,
  MinHash signature-scheme drift).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simpletons_map_reduce_spark.operators.ann_index import (
    append_ivf_batch,
    append_lsh_batch,
    append_pq_batch,
    corpus_fingerprint,
    load_ivf_index,
    load_lsh_index,
    load_pq_index,
    write_ivf_index,
    write_lsh_index,
    write_pq_index,
)
from simpletons_map_reduce_spark.operators.bm25_index import (
    append_bm25_batch,
    load_bm25_index,
    write_bm25_index,
)
from simpletons_map_reduce_spark.operators.minhash_index import (
    append_minhash_batch,
    load_minhash_index,
    write_minhash_index,
)
from simpletons_map_reduce_spark.sources.tables import load_table

from tests.conftest import SF0001


def _docs(spark):
    return load_table(spark, SF0001, "documents").select("doc_id", "text")


def _split(docs):
    return (
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0),
    )


def _emb(spark):
    from simpletons_map_reduce_spark.queries.similarity_ops import (
        _emb_with_norm,
    )

    return _emb_with_norm(spark, SF0001).select("vec_id", "v", "nv")


def _rows(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


# ---------------------------------------------------------------------------
# append ≡ rebuild
# ---------------------------------------------------------------------------


def test_minhash_append_equals_full_build(spark, tmp_path):
    docs = _docs(spark)
    n = docs.count()
    standing, batch = _split(docs)
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    write_minhash_index(standing, inc, corpus_fp=1)
    append_minhash_batch(spark, inc, batch, new_corpus_fp=2)
    write_minhash_index(docs, full, corpus_fp=2)
    shs_i, bands_i = load_minhash_index(spark, inc, expect_n=n, expect_fp=2)
    shs_f, bands_f = load_minhash_index(spark, full, expect_n=n, expect_fp=2)
    assert _rows(shs_i, ["doc_id", "shset"]) == _rows(shs_f, ["doc_id", "shset"])
    assert _rows(bands_i, ["doc_id", "band", "band_key"]) == _rows(
        bands_f, ["doc_id", "band", "band_key"]
    )


def test_bm25_append_equals_full_build(spark, tmp_path):
    docs = _docs(spark)
    n = docs.count()
    standing, batch = _split(docs)
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    write_bm25_index(standing, inc, corpus_fp=1)
    append_bm25_batch(spark, inc, batch, new_corpus_fp=2)
    write_bm25_index(docs, full, n_corpus=n, corpus_fp=2)
    p_i, dl_i, ts_i, nd_i, avg_i = load_bm25_index(
        spark, inc, expect_n=n, expect_fp=2
    )
    p_f, dl_f, ts_f, nd_f, avg_f = load_bm25_index(
        spark, full, expect_n=n, expect_fp=2
    )
    assert _rows(p_i, ["tok", "doc_id", "tf"]) == _rows(
        p_f, ["tok", "doc_id", "tf"]
    )
    assert _rows(dl_i, ["doc_id", "dl"]) == _rows(dl_f, ["doc_id", "dl"])
    assert _rows(ts_i, ["tok", "df"]) == _rows(ts_f, ["tok", "df"])
    assert (nd_i, avg_i) == (nd_f, avg_f)


def test_bm25_append_rejects_overlapping_batch(spark, tmp_path):
    docs = _docs(spark)
    idx = str(tmp_path / "idx")
    write_bm25_index(docs.limit(100), idx)
    with pytest.raises(ValueError, match="already indexed"):
        append_bm25_batch(spark, idx, docs.limit(10))


def test_ivf_append_assigns_under_frozen_centroids(spark, tmp_path):
    from simpletons_map_reduce_spark.functions.vectorized import (
        np_assign_clusters,
    )

    emb = _emb(spark)
    n = emb.count()
    standing = emb.filter(F.col("vec_id") % 10 != 7)
    batch = emb.filter(F.col("vec_id") % 10 == 7)
    idx = str(tmp_path / "ivf")
    write_ivf_index(standing, idx, corpus_fp=1)
    cents0, assigned0, k0 = load_ivf_index(spark, idx)
    append_ivf_batch(spark, idx, batch, new_corpus_fp=2)
    cents1, assigned1, k1 = load_ivf_index(spark, idx, expect_n=n, expect_fp=2)
    # centroids frozen, k unchanged
    assert k1 == k0
    assert _rows(cents1, ["cent_id"]) == _rows(cents0, ["cent_id"])
    # segment union covers the full corpus (top-2 soft assignment → each
    # vector appears once per assigned cluster, max 2)
    assert assigned1.select("vec_id").distinct().count() == n
    # the appended rows ARE a direct frozen-centroid assignment of the batch
    got = assigned1.join(batch.select("vec_id"), "vec_id", "left_semi")
    want = np_assign_clusters(batch, cents0, top=2, carry_vectors=True)
    assert _rows(got, ["vec_id", "cluster"]) == _rows(
        want, ["vec_id", "cluster"]
    )


def test_lsh_append_equals_full_build(spark, tmp_path):
    emb = _emb(spark)
    n = emb.count()
    standing = emb.filter(F.col("vec_id") % 10 != 7)
    batch = emb.filter(F.col("vec_id") % 10 == 7)
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    write_lsh_index(standing, inc, corpus_fp=1)
    append_lsh_batch(spark, inc, batch, new_corpus_fp=2)
    write_lsh_index(emb, full, corpus_fp=2)
    cols = ["vec_id", "band", "bkey"]
    assert _rows(
        load_lsh_index(spark, inc, expect_n=n, expect_fp=2), cols
    ) == _rows(load_lsh_index(spark, full, expect_n=n, expect_fp=2), cols)


def test_pq_append_encodes_under_frozen_codebooks(spark, tmp_path):
    from simpletons_map_reduce_spark.functions.vectorized import np_pq_encode

    emb = _emb(spark)
    n = emb.count()
    standing = emb.filter(F.col("vec_id") % 10 != 7)
    batch = emb.filter(F.col("vec_id") % 10 == 7)
    idx = str(tmp_path / "pq")
    write_pq_index(standing, idx, corpus_fp=1)
    append_pq_batch(spark, idx, batch, new_corpus_fp=2)
    cb_path, codes = load_pq_index(spark, idx, expect_n=n, expect_fp=2)
    assert codes.select("vec_id").distinct().count() == n
    got = codes.join(batch.select("vec_id"), "vec_id", "left_semi")
    want = np_pq_encode(batch, cb_path)
    cols = [c for c in want.columns]
    assert _rows(got.select(*cols), cols) == _rows(want, cols)


# ---------------------------------------------------------------------------
# transactionality: orphan segments are invisible, retries overwrite them
# ---------------------------------------------------------------------------


def test_killed_append_is_invisible_and_retry_overwrites(spark, tmp_path):
    docs = _docs(spark)
    standing, batch = _split(docs)
    n_standing = standing.count()
    idx = str(tmp_path / "mh")
    write_minhash_index(standing, idx, corpus_fp=1)
    # simulate an append killed after the segment write but BEFORE the
    # meta commit: the orphan segment must not be served
    batch.limit(3).selectExpr(
        "doc_id", "array(1L, 2L) AS shset"
    ).write.parquet(f"{idx}/mh_shingles_seg1.parquet")
    shs, _bands = load_minhash_index(spark, idx, expect_n=n_standing)
    assert shs.count() == n_standing  # orphan invisible
    # the retried append overwrites the orphan and commits
    append_minhash_batch(spark, idx, batch, new_corpus_fp=2)
    shs2, _ = load_minhash_index(spark, idx, expect_n=docs.count(), expect_fp=2)
    assert shs2.count() == docs.count()
    # no leftover fake rows: every shset is a real gram set, not [1, 2]
    fake = F.array(F.lit(1).cast("long"), F.lit(2).cast("long"))
    assert shs2.filter(F.col("shset") == fake).count() == 0


def test_multi_batch_ingest_loop(spark, tmp_path):
    """THE production ingest loop, end to end over multiple batches: the
    corpus arrives as three waves; each wave PROBES the standing MinHash
    artifact (which new docs near-duplicate anything already ingested?)
    and is then ABSORBED via append.  Pins:
    - after all waves, the artifact ≡ a from-scratch build over the full
      corpus (segments=2 exercises the multi-segment read + the second
      append's meta chain);
    - the BM25 termstats version chain survives two appends (v1 → v2
      full-rewrite pointer swap) with exactly the full build's stats;
    - the union of per-wave probe hits equals the full-corpus pair set
      restricted to cross-wave-or-earlier pairs — every near-dup pair is
      found exactly when its LATER member arrives, none twice."""
    from pyspark.sql import functions as F

    from simpletons_map_reduce_spark.queries.dedup_ops import (
        MAX_BAND_BUCKET,
        _assign_to_bucket,
        _bucket_verified,
        kept_from_bands,
        near_dedup_pairs,
    )

    docs = _docs(spark)
    waves = [docs.filter(F.col("doc_id") % 3 == r) for r in range(3)]
    mh = str(tmp_path / "mh")
    bm = str(tmp_path / "bm")
    write_minhash_index(waves[0], mh, corpus_fp=0)
    write_bm25_index(waves[0], bm, corpus_fp=0)
    found = []
    for i, wave in enumerate(waves[1:], start=1):
        # probe: new wave vs EVERYTHING ingested so far.  The wave signs
        # fresh (production: the batch is new), the standing side reads
        # the artifact; reuse the bucket machinery over the combined
        # band relation, split by membership in the arriving wave.
        shs_i, bands_i = _minhash_probe_relations(spark, mh, wave)
        wave_ids = wave.select(F.col("doc_id").alias("new_doc"))
        kept = kept_from_bands(bands_i, MAX_BAND_BUCKET)
        new_side = kept.join(
            wave_ids.withColumnRenamed("new_doc", "doc_id"), "doc_id",
            "left_semi",
        ).alias("x")
        old_side = kept.join(
            wave_ids.withColumnRenamed("new_doc", "doc_id"), "doc_id",
            "left_anti",
        ).alias("y")
        colls = new_side.join(
            old_side,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_key") == F.col("y.band_key")),
        ).select(
            F.col("x.doc_id").alias("new_doc"),
            F.col("y.doc_id").alias("corpus_doc"),
            F.col("x.band").alias("band"),
            # r12: _assign_to_bucket folds the bucket key through its
            # aggregate (min(struct(band, band_key))) instead of joining
            # back to `kept`, so collisions carry the key
            F.col("x.band_key").alias("band_key"),
        )
        assigned = _assign_to_bucket(colls, "new_doc", "corpus_doc")
        hits = _bucket_verified(assigned, shs_i, "new_doc", "corpus_doc")
        found += [
            tuple(sorted((r.new_doc, r.corpus_doc)))
            for r in hits.collect()
        ]
        append_minhash_batch(spark, mh, wave, new_corpus_fp=i)
        append_bm25_batch(spark, bm, wave, new_corpus_fp=i)
    n = docs.count()
    # artifact ≡ full build after two appends (segments=2)
    full_mh = str(tmp_path / "mh_full")
    write_minhash_index(docs, full_mh, corpus_fp=2)
    shs_a, bands_a = load_minhash_index(spark, mh, expect_n=n, expect_fp=2)
    shs_f, bands_f = load_minhash_index(spark, full_mh, expect_n=n, expect_fp=2)
    assert _rows(shs_a, ["doc_id", "shset"]) == _rows(shs_f, ["doc_id", "shset"])
    assert _rows(bands_a, ["doc_id", "band", "band_key"]) == _rows(
        bands_f, ["doc_id", "band", "band_key"]
    )
    full_bm = str(tmp_path / "bm_full")
    write_bm25_index(docs, full_bm, n_corpus=n, corpus_fp=2)
    p_a, dl_a, ts_a, nd_a, avg_a = load_bm25_index(spark, bm, expect_n=n, expect_fp=2)
    p_f, dl_f, ts_f, nd_f, avg_f = load_bm25_index(
        spark, full_bm, expect_n=n, expect_fp=2
    )
    assert _rows(ts_a, ["tok", "df"]) == _rows(ts_f, ["tok", "df"])
    assert (nd_a, avg_a) == (nd_f, avg_f)
    # probe-union completeness: every full-corpus pair is cross-wave or
    # within wave 0; the loop finds exactly the cross-wave ones, each once
    all_pairs = {
        tuple(sorted((r.doc_a, r.doc_b)))
        for r in near_dedup_pairs(docs).collect()
    }
    wave_of = {}
    for r_i in range(3):
        for row in waves[r_i].select("doc_id").collect():
            wave_of[row.doc_id] = r_i
    # same-wave pairs are the batch's internal dedup (near_dedup_pairs on
    # the wave itself in production — both members arrive together and
    # the probe is new-vs-STANDING); the loop owes exactly the pairs
    # whose members arrived in DIFFERENT waves.
    expected = {
        p for p in all_pairs if wave_of[p[0]] != wave_of[p[1]]
    }
    assert sorted(found) == sorted(expected)
    assert len(found) == len(set(found)), "a pair was emitted twice"


def _minhash_probe_relations(spark, index_dir, wave):
    """(shingles, bands) over standing-artifact ∪ freshly-signed wave —
    the probe-side relations an ingest loop builds per batch."""
    from simpletons_map_reduce_spark.operators.minhash_index import (
        _minhash_relations,
        load_minhash_index,
    )

    shs_st, bands_st = load_minhash_index(spark, index_dir)
    shs_w, bands_w = _minhash_relations(wave)
    return (
        shs_st.select("doc_id", "shset").unionByName(
            shs_w.select("doc_id", "shset")
        ),
        bands_st.unionByName(bands_w.select(*bands_st.columns)),
    )


def test_appended_index_for_resumes_after_killed_append(spark, tmp_path):
    """The refuse-and-redo contract of the appended_*_index_for exercise
    paths: a run killed BETWEEN the standing build and the append leaves
    meta.n short of the full corpus; the next call must refuse that
    partial artifact (with the logged-warning recovery path) and redo the
    build+append sequence, ending in the correct full artifact."""
    from simpletons_map_reduce_spark.operators.ann_index import (
        index_location,
    )
    from simpletons_map_reduce_spark.operators.minhash_index import (
        appended_minhash_index_for,
    )

    root = str(tmp_path)
    docs = _docs(spark)
    base, n, fp = index_location(spark, SF0001, root, "documents")
    # simulate the kill: standing half built, append never ran
    standing, _batch = _split(docs)
    write_minhash_index(standing, base + "-app-mh", corpus_fp=fp)
    with pytest.warns(UserWarning, match="rebuilding once"):
        shs, _bands = appended_minhash_index_for(spark, SF0001, root=root)
    assert shs.count() == n


# ---------------------------------------------------------------------------
# content-fingerprint staleness (same-size corpus mutation)
# ---------------------------------------------------------------------------


def test_appended_probe_plans_keep_pushdown_and_stay_python_free(spark):
    """The segmented read must not cost the probes their plan properties:
    bm25_search_appended still pushes ``tok IN (...)`` into the postings
    scan (the multi-path parquet read is ONE FileScan relation, so zone
    maps prune per row group exactly as in the single-segment artifact)
    and neither appended probe grows a Python stage."""
    from simpletons_map_reduce_spark.queries import REGISTRY

    bm = REGISTRY["bm25_search_appended"].fn(spark, SF0001)
    plan = bm._jdf.queryExecution().executedPlan().toString()
    assert "In(tok, [" in plan, plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    inc = REGISTRY["dedup_incremental_appended"].fn(spark, SF0001)
    plan = inc._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan, plan  # signatures never recompute


def test_fingerprint_changes_on_touch(tmp_path):
    import os
    import shutil

    src = "/root/testdata/sf0.001/documents.parquet"  # single-FILE layout
    dst = tmp_path / "documents.parquet"
    shutil.copy(src, dst)
    fp1 = corpus_fingerprint(str(tmp_path), "documents")
    # same bytes, same size — only mtime moves (the in-place-rewrite shape)
    os.utime(dst, ns=(dst.stat().st_atime_ns, dst.stat().st_mtime_ns + 1))
    fp2 = corpus_fingerprint(str(tmp_path), "documents")
    assert fp1 != fp2
    # DIRECTORY layout (Spark-written part files): part files count,
    # sidecars (_SUCCESS, .crc) do not
    d2 = tmp_path / "dir" / "documents.parquet"
    d2.mkdir(parents=True)
    shutil.copy(src, d2 / "part-00000.parquet")
    fpd = corpus_fingerprint(str(tmp_path / "dir"), "documents")
    (d2 / "_SUCCESS").write_text("")
    (d2 / ".part-00000.parquet.crc").write_text("x")
    assert corpus_fingerprint(str(tmp_path / "dir"), "documents") == fpd
    shutil.copy(src, d2 / "part-00001.parquet")
    fpd2 = corpus_fingerprint(str(tmp_path / "dir"), "documents")
    assert fpd2 != fpd
    # files NESTED under leftover staging dirs (_temporary/…) are skipped
    # too — any path component starting with _ or . disqualifies, not just
    # the basename (ADVICE r10): crashed-writer debris must not move the
    # fingerprint of an otherwise identical commit.
    tdir = d2 / "_temporary" / "0" / "task_001"
    tdir.mkdir(parents=True)
    shutil.copy(src, tdir / "part-00099.parquet")
    assert corpus_fingerprint(str(tmp_path / "dir"), "documents") == fpd2


@pytest.mark.parametrize("family", ["minhash", "bm25", "ivf", "pq", "lsh"])
def test_content_fingerprint_refusal(spark, tmp_path, family):
    idx = str(tmp_path / family)
    if family in ("minhash", "bm25"):
        data = _docs(spark).limit(60)
        n = data.count()
        write = {"minhash": write_minhash_index, "bm25": write_bm25_index}[
            family
        ]
        load = {"minhash": load_minhash_index, "bm25": load_bm25_index}[family]
        write(data, idx, corpus_fp=111)
    else:
        data = _emb(spark).limit(60)
        n = data.count()
        write = {"ivf": write_ivf_index, "pq": write_pq_index, "lsh": write_lsh_index}[
            family
        ]
        load = {"ivf": load_ivf_index, "pq": load_pq_index, "lsh": load_lsh_index}[
            family
        ]
        write(data, idx, corpus_fp=111)
    # row count unchanged, content fingerprint moved → must refuse
    with pytest.raises(ValueError, match="corpus files changed"):
        load(spark, idx, expect_n=n, expect_fp=999)
    # matching fingerprint loads fine
    load(spark, idx, expect_n=n, expect_fp=111)
