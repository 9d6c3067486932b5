"""Pins for round-12 index upsert (VERDICT r11 "what's missing" #1):
born_seg-versioned supersession tombstones make re-adding an existing
key an O(|batch|) operation — delete → compact → append is no longer
the edit path.

Contracts:
- upsert ≡ rebuild-over-the-EDITED-corpus for every family (MinHash/
  LSH literally; IVF/PQ under the FROZEN model; BM25's scoring
  statistics exactly);
- bookkeeping is exact: meta.n grows only by genuinely-fresh keys,
  n_deleted decrements for revived (previously delete_from_index-ed)
  keys, and live = n − n_deleted holds through upsert and compaction;
- a crash between the tombstone commit and the append is retry-safe:
  the re-run is idempotent (no double-counted meta.n, statistics exact);
- plain appends still refuse upserted keys (a re-add would duplicate
  the live replacement) — upsert_into_index is the sanctioned path;
- compaction folds supersession tombstones with nothing observable
  changing;
- vacuum_index sweeps exactly the orphans (superseded generations,
  orphan tombstone/termstats versions) and never a referenced file.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simpletons_map_reduce_spark.operators.ann_index import (
    _meta_maint,
    append_ivf_batch,
    append_lsh_batch,
    append_pq_batch,
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
from simpletons_map_reduce_spark.operators.index_maintenance import (
    compact_index,
    delete_from_index,
    upsert_into_index,
    upsert_text_edit,
    vacuum_index,
)
from simpletons_map_reduce_spark.operators.minhash_index import (
    append_minhash_batch,
    load_minhash_index,
    write_minhash_index,
)
from simpletons_map_reduce_spark.sources.tables import load_table

from tests.conftest import SF0001

#: the edited slice (mixes standing + %10==0 batch ids, same as the
#: compaction suite's DEL so revive interactions are exercised).
UPS = [3, 20, 37, 54, 71, 88, 105, 122]


def _docs(spark):
    return load_table(spark, SF0001, "documents").select("doc_id", "text")


def _emb(spark):
    from simpletons_map_reduce_spark.queries.similarity_ops import (
        _emb_with_norm,
    )

    return _emb_with_norm(spark, SF0001).select("vec_id", "v", "nv")


def _rows(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


def _edit_docs(docs):
    """The upserted view of a (doc_id, text) relation: UPS rows edited."""
    return docs.select(
        "doc_id",
        F.when(
            F.col("doc_id").isin(UPS), upsert_text_edit(F.col("text"))
        ).otherwise(F.col("text")).alias("text"),
    )


def _doc_batch(docs):
    return docs.filter(F.col("doc_id").isin(UPS)).select(
        "doc_id", upsert_text_edit(F.col("text")).alias("text")
    )


def _edit_vec(col):
    """Deterministic vector edit: negation (same norm, different row)."""
    return F.transform(col, lambda x: -x)


def _vec_batch(emb):
    return emb.filter(F.col("vec_id").isin(UPS)).select(
        "vec_id", _edit_vec(F.col("v")).alias("v"), "nv"
    )


def _edit_emb(emb):
    return emb.select(
        "vec_id",
        F.when(F.col("vec_id").isin(UPS), _edit_vec(F.col("v")))
        .otherwise(F.col("v")).alias("v"),
        "nv",
    )


# ---------------------------------------------------------------------------
# upsert ≡ rebuild over the edited corpus
# ---------------------------------------------------------------------------


def test_minhash_upsert_equals_edited_rebuild(spark, tmp_path):
    docs = _docs(spark)
    n = docs.count()
    idx, ref = str(tmp_path / "mh"), str(tmp_path / "ref")
    write_minhash_index(docs, idx, corpus_fp=1)
    res = upsert_into_index(
        spark, idx, "mh", _doc_batch(docs), append_minhash_batch,
        new_corpus_fp=1,
    )
    assert res == {
        "batch_keys": len(UPS), "fresh": 0,
        "superseded": len(UPS), "revived": 0,
    }
    write_minhash_index(_edit_docs(docs), ref, corpus_fp=2)
    shs_r, bands_r = load_minhash_index(spark, ref)
    shs_u, bands_u = load_minhash_index(spark, idx, expect_n=n, expect_fp=1)
    cols_s, cols_b = ["doc_id", "shset"], ["doc_id", "band", "band_key"]
    assert _rows(shs_u, cols_s) == _rows(shs_r, cols_s)
    assert _rows(bands_u, cols_b) == _rows(bands_r, cols_b)
    meta = spark.read.parquet(f"{idx}/mh_meta.parquet").collect()[0]
    gen, tombs, n_deleted = _meta_maint(meta)
    # supersessions are NOT deletions: live = n − n_deleted = n
    assert (int(meta.n), n_deleted, tombs, gen) == (n, 0, 1, 0)
    # ...and compaction folds the supersession tombstones untouched
    assert compact_index(spark, idx, "mh") is True
    shs_c, bands_c = load_minhash_index(spark, idx, expect_n=n, expect_fp=1)
    assert _rows(shs_c, cols_s) == _rows(shs_r, cols_s)
    assert _rows(bands_c, cols_b) == _rows(bands_r, cols_b)


def test_bm25_upsert_stats_equal_edited_rebuild(spark, tmp_path):
    docs = _docs(spark)
    n = docs.count()
    idx, ref = str(tmp_path / "bm"), str(tmp_path / "ref")
    write_bm25_index(docs, idx, n_corpus=n, corpus_fp=1)
    upsert_into_index(
        spark, idx, "bm25", _doc_batch(docs), append_bm25_batch,
        new_corpus_fp=1, count_as_new=0, check_disjoint=False,
    )
    write_bm25_index(_edit_docs(docs), ref, corpus_fp=2)
    p_u, dl_u, ts_u, nd_u, avg_u = load_bm25_index(
        spark, idx, expect_n=n, expect_fp=1
    )
    p_r, dl_r, ts_r, nd_r, avg_r = load_bm25_index(spark, ref)
    assert _rows(p_u, ["tok", "doc_id", "tf"]) == _rows(
        p_r, ["tok", "doc_id", "tf"]
    )
    assert _rows(dl_u, ["doc_id", "dl"]) == _rows(dl_r, ["doc_id", "dl"])
    # the df decrement-then-increment round trip is exact
    assert _rows(ts_u, ["tok", "df"]) == _rows(ts_r, ["tok", "df"])
    assert (nd_u, avg_u) == (nd_r, avg_r)


def test_lsh_upsert_equals_edited_rebuild(spark, tmp_path):
    emb = _emb(spark)
    n = emb.count()
    idx, ref = str(tmp_path / "lsh"), str(tmp_path / "ref")
    write_lsh_index(emb, idx, corpus_fp=1)
    res = upsert_into_index(
        spark, idx, "lsh", _vec_batch(emb), append_lsh_batch,
        new_corpus_fp=1,
    )
    assert (res["fresh"], res["superseded"]) == (0, len(UPS))
    write_lsh_index(_edit_emb(emb), ref, corpus_fp=2)
    cols = ["vec_id", "band", "bkey"]
    assert _rows(
        load_lsh_index(spark, idx, expect_n=n, expect_fp=1), cols
    ) == _rows(load_lsh_index(spark, ref), cols)


def test_ivf_pq_upsert_under_frozen_models(spark, tmp_path):
    from simpletons_map_reduce_spark.functions.vectorized import (
        np_assign_clusters,
        np_pq_encode,
    )

    emb = _emb(spark)
    n = emb.count()

    ivf = str(tmp_path / "ivf")
    write_ivf_index(emb, ivf, corpus_fp=1)
    cents0, _, _ = load_ivf_index(spark, ivf)
    upsert_into_index(
        spark, ivf, "ivf", _vec_batch(emb), append_ivf_batch,
        new_corpus_fp=1,
    )
    # FAISS update semantic: the edited corpus assigned under the FROZEN
    # centroids — never a re-train
    want = np_assign_clusters(_edit_emb(emb), cents0, top=2,
                              carry_vectors=True)
    cols = ["vec_id", "cluster"]
    _, got, _ = load_ivf_index(spark, ivf, expect_n=n, expect_fp=1)
    assert _rows(got, cols) == _rows(want, cols)

    pq = str(tmp_path / "pq")
    write_pq_index(emb, pq, corpus_fp=1)
    upsert_into_index(
        spark, pq, "pq", _vec_batch(emb), append_pq_batch, new_corpus_fp=1,
    )
    cb_path, codes = load_pq_index(spark, pq, expect_n=n, expect_fp=1)
    want = np_pq_encode(_edit_emb(emb), cb_path)
    cols = list(want.columns)
    assert _rows(codes.select(*cols), cols) == _rows(want, cols)


# ---------------------------------------------------------------------------
# bookkeeping: fresh / superseded / revived, and the guard
# ---------------------------------------------------------------------------


def test_upsert_partitions_fresh_superseded_revived(spark, tmp_path):
    emb = _emb(spark)
    n = emb.count()
    idx = str(tmp_path / "lsh")
    write_lsh_index(emb, idx, corpus_fp=1)
    dead = UPS[:3]
    assert delete_from_index(spark, idx, "lsh", dead) == len(dead)
    fresh_ids = [10**9 + 1, 10**9 + 2]
    batch = _vec_batch(emb).unionByName(
        emb.filter(F.col("vec_id").isin(UPS[:2])).select(
            F.when(F.col("vec_id") == UPS[0], fresh_ids[0])
            .otherwise(fresh_ids[1]).cast("long").alias("vec_id"),
            "v", "nv",
        )
    )
    res = upsert_into_index(
        spark, idx, "lsh", batch, append_lsh_batch, new_corpus_fp=1
    )
    # dead keys revive, the rest of UPS supersede, synthetic ids are fresh
    assert res == {
        "batch_keys": len(UPS) + 2,
        "fresh": 2,
        "superseded": len(UPS) - len(dead),
        "revived": len(dead),
    }
    meta = spark.read.parquet(f"{idx}/lsh_meta.parquet").collect()[0]
    _, tombs, n_deleted = _meta_maint(meta)
    assert (int(meta.n), n_deleted) == (n + 2, 0)  # revive refunds deletes
    live = load_lsh_index(spark, idx, expect_n=n + 2, expect_fp=1)
    assert live.select("vec_id").distinct().count() == n + 2


def test_plain_append_refuses_upserted_keys(spark, tmp_path):
    emb = _emb(spark)
    idx = str(tmp_path / "lsh")
    write_lsh_index(emb, idx, corpus_fp=1)
    upsert_into_index(
        spark, idx, "lsh", _vec_batch(emb), append_lsh_batch, new_corpus_fp=1
    )
    with pytest.raises(ValueError, match="tombstoned"):
        append_lsh_batch(spark, idx, _vec_batch(emb))
    # a second upsert of the same keys stays legal (edit the edit)
    res = upsert_into_index(
        spark, idx, "lsh", _vec_batch(emb), append_lsh_batch, new_corpus_fp=1
    )
    assert res["superseded"] == len(UPS)
    n = emb.count()
    live = load_lsh_index(spark, idx, expect_n=n, expect_fp=1)
    assert live.select("vec_id").distinct().count() == n


def test_delete_after_upsert_counts_once(spark, tmp_path):
    emb = _emb(spark)
    n = emb.count()
    idx = str(tmp_path / "lsh")
    write_lsh_index(emb, idx, corpus_fp=1)
    upsert_into_index(
        spark, idx, "lsh", _vec_batch(emb), append_lsh_batch, new_corpus_fp=1
    )
    # deleting an upserted key kills the REPLACEMENT row too
    assert delete_from_index(spark, idx, "lsh", UPS) == len(UPS)
    meta = spark.read.parquet(f"{idx}/lsh_meta.parquet").collect()[0]
    assert _meta_maint(meta)[2] == len(UPS)
    live = load_lsh_index(spark, idx, expect_n=n, expect_fp=1)
    assert live.select("vec_id").distinct().count() == n - len(UPS)
    assert live.filter(F.col("vec_id").isin(UPS)).count() == 0


# ---------------------------------------------------------------------------
# transactionality: crash between tombstone commit and append
# ---------------------------------------------------------------------------


def test_upsert_retry_is_idempotent(spark, tmp_path):
    docs = _docs(spark)
    n = docs.count()
    idx, ref = str(tmp_path / "bm"), str(tmp_path / "ref")
    write_bm25_index(docs, idx, n_corpus=n, corpus_fp=1)

    def _boom(*a, **kw):
        raise RuntimeError("killed between tombstone commit and append")

    with pytest.raises(RuntimeError, match="killed"):
        upsert_into_index(
            spark, idx, "bm25", _doc_batch(docs), _boom,
            new_corpus_fp=1, count_as_new=0,
        )
    # mid-crash state: keys superseded-but-absent; the RETRY completes
    # and is exact (fresh is computed against PHYSICAL presence, the df
    # decrement against LIVE postings — both no-ops on the re-run)
    upsert_into_index(
        spark, idx, "bm25", _doc_batch(docs), append_bm25_batch,
        new_corpus_fp=1, count_as_new=0, check_disjoint=False,
    )
    write_bm25_index(_edit_docs(docs), ref, corpus_fp=2)
    p_u, dl_u, ts_u, nd_u, avg_u = load_bm25_index(
        spark, idx, expect_n=n, expect_fp=1
    )
    p_r, dl_r, ts_r, nd_r, avg_r = load_bm25_index(spark, ref)
    assert _rows(p_u, ["tok", "doc_id", "tf"]) == _rows(
        p_r, ["tok", "doc_id", "tf"]
    )
    assert _rows(ts_u, ["tok", "df"]) == _rows(ts_r, ["tok", "df"])
    assert (nd_u, avg_u) == (nd_r, avg_r)
    meta = spark.read.parquet(f"{idx}/bm25_meta.parquet").collect()[0]
    assert int(meta.n_corpus) == n  # never double-counted


# ---------------------------------------------------------------------------
# vacuum: orphan sweep
# ---------------------------------------------------------------------------


def test_vacuum_sweeps_orphans_and_keeps_referenced(
    spark, tmp_path, monkeypatch
):
    import os

    docs = _docs(spark)
    n = docs.count()
    idx = str(tmp_path / "mh")
    standing = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    write_minhash_index(standing, idx, corpus_fp=1)
    append_minhash_batch(spark, idx, batch, new_corpus_fp=2)
    delete_from_index(spark, idx, "mh", UPS)
    cols = ["doc_id", "band", "band_key"]
    want = _rows(load_minhash_index(spark, idx, expect_n=n, expect_fp=2)[1],
                 cols)

    # compact with the post-commit cleanup disabled: the whole old
    # generation is left orphaned — the crash-after-commit state that
    # ADVICE r11 flagged as permanently leaked
    import simpletons_map_reduce_spark.operators.index_maintenance as im

    monkeypatch.setattr(im.shutil, "rmtree", lambda *a, **kw: None)
    monkeypatch.setattr(im, "vacuum_index", lambda *a, **kw: [])
    assert compact_index(spark, idx, "mh") is True
    monkeypatch.undo()
    names = set(os.listdir(idx))
    assert "mh_bands.parquet" in names            # orphaned gen-0 base
    assert "mh_bands_seg1.parquet" in names       # orphaned gen-0 segment
    assert "mh_tombs_v1.parquet" in names         # orphaned tombstones

    # the no-op compact path sweeps them (the documented retry recovery)
    assert compact_index(spark, idx, "mh") is False
    names = set(os.listdir(idx))
    assert "mh_bands.parquet" not in names
    assert "mh_bands_seg1.parquet" not in names
    assert "mh_shingles.parquet" not in names
    assert "mh_tombs_v1.parquet" not in names
    # the referenced generation survives and serves unchanged
    assert "mh_bands_g1.parquet" in names and "mh_shingles_g1.parquet" in names
    assert _rows(
        load_minhash_index(spark, idx, expect_n=n, expect_fp=2)[1], cols
    ) == want


def test_vacuum_is_family_scoped(spark, tmp_path):
    """Shared artifact dir: vacuuming one family must never touch another
    family's files (referenced OR orphaned)."""
    import os

    emb = _emb(spark)
    idx = str(tmp_path / "shared")
    write_lsh_index(emb, idx, corpus_fp=1)
    write_pq_index(emb, idx, corpus_fp=1)
    # plant a PQ orphan; vacuum LSH
    orphan = f"{idx}/pq_codes_seg9.parquet"
    os.makedirs(orphan)
    removed = vacuum_index(spark, idx, "lsh")
    assert removed == []
    assert os.path.isdir(orphan)
    removed = vacuum_index(spark, idx, "pq")
    assert removed == [orphan]
    assert not os.path.isdir(orphan)
    # both families still load
    load_lsh_index(spark, idx)
    load_pq_index(spark, idx)
