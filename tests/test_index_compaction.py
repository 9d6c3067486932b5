"""Pins for round-11 index maintenance: tombstone deletes + segment
compaction (the LSM half of the ingest loop; VERDICT r10 items 2-3).

Contracts:
- delete ≡ rebuild-over-survivors for every family: a tombstoned load
  serves EXACTLY what a from-scratch build over the surviving corpus
  would (MinHash/LSH literally; IVF/PQ under the FROZEN model — the
  FAISS remove_ids semantic); for BM25 the SCORING STATISTICS
  (termstats, N, avgdl, n_tokens) match the survivor rebuild exactly;
- compaction changes NOTHING observable: probe rows identical before
  and after, segments fold to 0, tombstones fold away, generation bumps;
- a killed compaction is INVISIBLE: until the meta commit the old
  generation serves unchanged, and the retry overwrites the orphan
  new-generation files;
- deletes are idempotent and exactly accounted (live = n − n_deleted;
  re-deleting or deleting absent keys is a no-op);
- appends REFUSE tombstoned keys (the anti-join would silently erase
  the re-added rows) until a compaction folds the tombstone away —
  delete → compact → append is the update path, and it works.
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
    FAMILIES,
    compact_index,
    delete_from_index,
)
from simpletons_map_reduce_spark.operators.minhash_index import (
    append_minhash_batch,
    load_minhash_index,
    write_minhash_index,
)
from simpletons_map_reduce_spark.sources.tables import load_table

from tests.conftest import SF0001

DEL = [3, 20, 37, 54, 71, 88, 105, 122]  # mixes standing + %10==0 batch ids


def _docs(spark):
    return load_table(spark, SF0001, "documents").select("doc_id", "text")


def _split(df, col="doc_id"):
    return df.filter(F.col(col) % 10 != 0), df.filter(F.col(col) % 10 == 0)


def _emb(spark):
    from simpletons_map_reduce_spark.queries.similarity_ops import (
        _emb_with_norm,
    )

    return _emb_with_norm(spark, SF0001).select("vec_id", "v", "nv")


def _rows(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


def _not_deleted(df, col):
    return df.filter(~F.col(col).isin(DEL))


# ---------------------------------------------------------------------------
# delete ≡ rebuild-over-survivors, and compaction changes nothing
# ---------------------------------------------------------------------------


def test_minhash_delete_then_compact_equals_survivor_rebuild(spark, tmp_path):
    docs = _docs(spark)
    n = docs.count()
    standing, batch = _split(docs)
    idx = str(tmp_path / "mh")
    ref = str(tmp_path / "ref")
    write_minhash_index(standing, idx, corpus_fp=1)
    append_minhash_batch(spark, idx, batch, new_corpus_fp=2)
    assert delete_from_index(spark, idx, "mh", DEL) == len(DEL)
    write_minhash_index(_not_deleted(docs, "doc_id"), ref, corpus_fp=3)

    cols_s, cols_b = ["doc_id", "shset"], ["doc_id", "band", "band_key"]
    shs_r, bands_r = load_minhash_index(spark, ref)
    # tombstoned load ≡ survivor rebuild
    shs_t, bands_t = load_minhash_index(spark, idx, expect_n=n, expect_fp=2)
    assert _rows(shs_t, cols_s) == _rows(shs_r, cols_s)
    assert _rows(bands_t, cols_b) == _rows(bands_r, cols_b)
    # compaction: same rows, folded physical state
    assert compact_index(spark, idx, "mh") is True
    shs_c, bands_c = load_minhash_index(spark, idx, expect_n=n, expect_fp=2)
    assert _rows(shs_c, cols_s) == _rows(shs_r, cols_s)
    assert _rows(bands_c, cols_b) == _rows(bands_r, cols_b)
    meta = spark.read.parquet(f"{idx}/mh_meta.parquet").collect()[0]
    gen, tombs, n_deleted = _meta_maint(meta)
    assert (gen, tombs, n_deleted) == (1, 0, len(DEL))
    assert int(meta.segments) == 0
    assert int(meta.n) == n  # corpus coverage unchanged by deletes
    # idempotent re-compaction is a no-op
    assert compact_index(spark, idx, "mh") is False


def test_bm25_delete_stats_equal_survivor_rebuild(spark, tmp_path):
    docs = _docs(spark)
    n = docs.count()
    standing, batch = _split(docs)
    idx = str(tmp_path / "bm")
    ref = str(tmp_path / "ref")
    write_bm25_index(standing, idx, corpus_fp=1)
    append_bm25_batch(spark, idx, batch, new_corpus_fp=2)
    assert delete_from_index(spark, idx, "bm25", DEL) == len(DEL)
    survivors = _not_deleted(docs, "doc_id")
    write_bm25_index(survivors, ref, corpus_fp=3)

    p_t, dl_t, ts_t, nd_t, avg_t = load_bm25_index(
        spark, idx, expect_n=n, expect_fp=2
    )
    p_r, dl_r, ts_r, nd_r, avg_r = load_bm25_index(spark, ref)
    assert _rows(p_t, ["tok", "doc_id", "tf"]) == _rows(
        p_r, ["tok", "doc_id", "tf"]
    )
    assert _rows(dl_t, ["doc_id", "dl"]) == _rows(dl_r, ["doc_id", "dl"])
    # the exact df decrement: termstats match the survivor rebuild
    assert _rows(ts_t, ["tok", "df"]) == _rows(ts_r, ["tok", "df"])
    assert (nd_t, avg_t) == (nd_r, avg_r)
    # ...and all of it survives compaction untouched
    assert compact_index(spark, idx, "bm25") is True
    p_c, dl_c, ts_c, nd_c, avg_c = load_bm25_index(
        spark, idx, expect_n=n, expect_fp=2
    )
    assert _rows(p_c, ["tok", "doc_id", "tf"]) == _rows(
        p_r, ["tok", "doc_id", "tf"]
    )
    assert _rows(ts_c, ["tok", "df"]) == _rows(ts_r, ["tok", "df"])
    assert (nd_c, avg_c) == (nd_r, avg_r)


def test_ivf_delete_then_compact_under_frozen_centroids(spark, tmp_path):
    emb = _emb(spark)
    n = emb.count()
    standing = emb.filter(F.col("vec_id") % 10 != 7)
    batch = emb.filter(F.col("vec_id") % 10 == 7)
    idx = str(tmp_path / "ivf")
    write_ivf_index(standing, idx, corpus_fp=1)
    cents0, _, k0 = load_ivf_index(spark, idx)
    append_ivf_batch(spark, idx, batch, new_corpus_fp=2)
    assert delete_from_index(spark, idx, "ivf", DEL) == len(DEL)
    # FAISS remove_ids semantic: survivors' assignments under the FROZEN
    # model — never a re-train
    from simpletons_map_reduce_spark.functions.vectorized import (
        np_assign_clusters,
    )

    want = np_assign_clusters(
        _not_deleted(emb, "vec_id"), cents0, top=2, carry_vectors=True
    )
    cols = ["vec_id", "cluster"]
    _, got_t, _ = load_ivf_index(spark, idx, expect_n=n, expect_fp=2)
    assert _rows(got_t, cols) == _rows(want, cols)
    assert compact_index(spark, idx, "ivf") is True
    cents1, got_c, k1 = load_ivf_index(spark, idx, expect_n=n, expect_fp=2)
    assert k1 == k0
    assert _rows(got_c, cols) == _rows(want, cols)


def test_pq_and_lsh_delete_then_compact(spark, tmp_path):
    emb = _emb(spark)
    n = emb.count()
    standing = emb.filter(F.col("vec_id") % 10 != 7)
    batch = emb.filter(F.col("vec_id") % 10 == 7)
    survivors = _not_deleted(emb, "vec_id")

    pq = str(tmp_path / "pq")
    write_pq_index(standing, pq, corpus_fp=1)
    append_pq_batch(spark, pq, batch, new_corpus_fp=2)
    assert delete_from_index(spark, pq, "pq", DEL) == len(DEL)
    cb_path, codes_t = load_pq_index(spark, pq, expect_n=n, expect_fp=2)
    from simpletons_map_reduce_spark.functions.vectorized import np_pq_encode

    want = np_pq_encode(survivors, cb_path)
    cols = list(want.columns)
    assert _rows(codes_t.select(*cols), cols) == _rows(want, cols)
    assert compact_index(spark, pq, "pq") is True
    _, codes_c = load_pq_index(spark, pq, expect_n=n, expect_fp=2)
    assert _rows(codes_c.select(*cols), cols) == _rows(want, cols)

    lsh = str(tmp_path / "lsh")
    ref = str(tmp_path / "lshref")
    write_lsh_index(standing, lsh, corpus_fp=1)
    append_lsh_batch(spark, lsh, batch, new_corpus_fp=2)
    assert delete_from_index(spark, lsh, "lsh", DEL) == len(DEL)
    write_lsh_index(survivors, ref, corpus_fp=3)
    cols = ["vec_id", "band", "bkey"]
    want_rows = _rows(load_lsh_index(spark, ref), cols)
    assert _rows(
        load_lsh_index(spark, lsh, expect_n=n, expect_fp=2), cols
    ) == want_rows
    assert compact_index(spark, lsh, "lsh") is True
    assert _rows(
        load_lsh_index(spark, lsh, expect_n=n, expect_fp=2), cols
    ) == want_rows


# ---------------------------------------------------------------------------
# transactionality + accounting + the update path
# ---------------------------------------------------------------------------


def test_killed_compaction_serves_old_generation(spark, tmp_path, monkeypatch):
    docs = _docs(spark)
    n = docs.count()
    standing, batch = _split(docs)
    idx = str(tmp_path / "mh")
    write_minhash_index(standing, idx, corpus_fp=1)
    append_minhash_batch(spark, idx, batch, new_corpus_fp=2)
    delete_from_index(spark, idx, "mh", DEL)
    cols = ["doc_id", "band", "band_key"]
    before = _rows(load_minhash_index(spark, idx, expect_n=n, expect_fp=2)[1],
                   cols)

    # kill the compaction at the worst moment: every new-generation file
    # written, the meta commit about to happen
    import simpletons_map_reduce_spark.operators.index_maintenance as im

    def _boom(*a, **kw):
        raise RuntimeError("killed before meta commit")

    monkeypatch.setattr(im, "_rewrite_meta", _boom)
    with pytest.raises(RuntimeError, match="killed"):
        compact_index(spark, idx, "mh")
    monkeypatch.undo()

    # old generation (segments + tombstones) serves unchanged
    meta = spark.read.parquet(f"{idx}/mh_meta.parquet").collect()[0]
    gen, tombs, _ = _meta_maint(meta)
    assert (gen, int(meta.segments), tombs) == (0, 1, 1)
    assert _rows(
        load_minhash_index(spark, idx, expect_n=n, expect_fp=2)[1], cols
    ) == before
    # the retry overwrites the orphan new-generation files and commits
    assert compact_index(spark, idx, "mh") is True
    assert _rows(
        load_minhash_index(spark, idx, expect_n=n, expect_fp=2)[1], cols
    ) == before


def test_killed_delete_is_invisible_and_retry_commits(
    spark, tmp_path, monkeypatch
):
    """A delete killed between the tombstone write and the meta commit
    serves the PRE-delete state (the orphan tombstone version is never
    read) and the retry overwrites the orphan and commits exactly."""
    emb = _emb(spark)
    n = emb.count()
    idx = str(tmp_path / "lsh")
    write_lsh_index(emb, idx, corpus_fp=1)

    import simpletons_map_reduce_spark.operators.index_maintenance as im

    def _boom(*a, **kw):
        raise RuntimeError("killed before meta commit")

    monkeypatch.setattr(im, "_rewrite_meta", _boom)
    with pytest.raises(RuntimeError, match="killed"):
        delete_from_index(spark, idx, "lsh", DEL)
    monkeypatch.undo()

    # orphan tombstone v1 exists on disk, but the meta says tombs=0 —
    # the load serves every row
    live = load_lsh_index(spark, idx, expect_n=n, expect_fp=1)
    assert live.select("vec_id").distinct().count() == n
    # the retry overwrites the orphan and commits
    assert delete_from_index(spark, idx, "lsh", DEL) == len(DEL)
    live2 = load_lsh_index(spark, idx, expect_n=n, expect_fp=1)
    assert live2.select("vec_id").distinct().count() == n - len(DEL)


def test_delete_is_idempotent_and_exactly_accounted(spark, tmp_path):
    emb = _emb(spark)
    n = emb.count()
    idx = str(tmp_path / "lsh")
    write_lsh_index(emb, idx, corpus_fp=1)
    assert delete_from_index(spark, idx, "lsh", DEL) == len(DEL)
    # re-deleting the same keys, or keys the index never held: no-ops
    assert delete_from_index(spark, idx, "lsh", DEL) == 0
    assert delete_from_index(spark, idx, "lsh", [10**12, 10**12 + 1]) == 0
    meta = spark.read.parquet(f"{idx}/lsh_meta.parquet").collect()[0]
    _, _, n_deleted = _meta_maint(meta)
    assert n_deleted == len(DEL)  # live = n − n_deleted
    live = load_lsh_index(spark, idx, expect_n=n, expect_fp=1)
    assert live.select("vec_id").distinct().count() == n - len(DEL)


def test_append_refuses_tombstoned_keys_until_compaction(spark, tmp_path):
    docs = _docs(spark)
    standing, batch = _split(docs)
    idx = str(tmp_path / "bm")
    write_bm25_index(standing, idx, corpus_fp=1)
    # tombstone a mixed slice so the guard set is non-trivial
    delete_from_index(spark, idx, "bm25", DEL)
    # a batch reusing LIVE standing ids: the disjointness guard fires
    with pytest.raises(ValueError, match="already indexed"):
        append_bm25_batch(spark, idx, _not_deleted(standing, "doc_id").limit(5))
    # delete a slice of the standing corpus, then try to re-add it: the
    # tombstone guard fires BEFORE the anti-join could silently eat it
    victims = standing.filter(F.col("doc_id") % 31 == 1)
    victim_ids = [int(r.doc_id) for r in victims.select("doc_id").collect()]
    assert victim_ids, "fixture must contain a % 31 == 1 standing slice"
    delete_from_index(spark, idx, "bm25", victim_ids)
    with pytest.raises(ValueError, match="tombstoned"):
        append_bm25_batch(spark, idx, victims)
    # the UPDATE path: compaction folds the tombstones, then the re-add
    # (new text versions of the deleted docs) is a legal append
    assert compact_index(spark, idx, "bm25") is True
    append_bm25_batch(spark, idx, victims, new_corpus_fp=9)
    p, dl, ts, nd, avg = load_bm25_index(spark, idx)
    # re-added docs are live again
    assert dl.filter(F.col("doc_id").isin(victim_ids)).count() == len(
        victim_ids
    )
    # and the stats equal a rebuild over exactly the live population
    ref = str(tmp_path / "ref")
    live_docs = standing.filter(
        ~F.col("doc_id").isin([d for d in DEL if d % 10 != 0])
    )
    write_bm25_index(live_docs, ref, corpus_fp=9)
    _, _, ts_r, nd_r, avg_r = load_bm25_index(spark, ref)
    assert _rows(ts, ["tok", "df"]) == _rows(ts_r, ["tok", "df"])
    assert (nd, avg) == (nd_r, avg_r)


def test_bm25_delete_everything_completes(spark, tmp_path):
    """The legal retract-everything call: deleting every document must
    COMMIT (zeros in the scoring meta, not a crash after the tombstone
    write) and probes must see an empty live index."""
    docs = _docs(spark).limit(50)
    ids = [int(r.doc_id) for r in docs.select("doc_id").collect()]
    idx = str(tmp_path / "bm")
    write_bm25_index(docs, idx, corpus_fp=1)
    assert delete_from_index(spark, idx, "bm25", ids) == len(ids)
    p, dl, ts, nd, avg = load_bm25_index(spark, idx)
    assert (p.count(), dl.count()) == (0, 0)
    assert (nd, avg) == (0.0, 0.0)
    # and compaction folds the now-empty relations without error
    assert compact_index(spark, idx, "bm25") is True
    p2, dl2, _, nd2, avg2 = load_bm25_index(spark, idx)
    assert (p2.count(), dl2.count(), nd2, avg2) == (0, 0, 0.0, 0.0)


def test_compact_noop_on_fresh_build(spark, tmp_path):
    emb = _emb(spark)
    idx = str(tmp_path / "pq")
    write_pq_index(emb, idx, corpus_fp=1)
    assert compact_index(spark, idx, "pq") is False


def test_maybe_compact_policy(spark, tmp_path):
    """The ingest loop's trigger: declines under the thresholds, fires
    past them, and cumulative (already-folded) deletions never re-fire
    it."""
    from simpletons_map_reduce_spark.operators.index_maintenance import (
        maybe_compact,
    )

    emb = _emb(spark)
    n = emb.count()
    standing = emb.filter(F.col("vec_id") % 10 != 7)
    batch = emb.filter(F.col("vec_id") % 10 == 7)
    idx = str(tmp_path / "lsh")
    write_lsh_index(standing, idx, corpus_fp=1)
    append_lsh_batch(spark, idx, batch, new_corpus_fp=2)
    # one segment, no tombstones: under both thresholds → declines
    assert maybe_compact(spark, idx, "lsh") is False
    # segment budget of zero: fires
    assert maybe_compact(spark, idx, "lsh", max_segments=0) is True
    meta = spark.read.parquet(f"{idx}/lsh_meta.parquet").collect()[0]
    assert (int(meta.segments), _meta_maint(meta)[0]) == (0, 1)
    # outstanding tombstones past the deleted-fraction threshold: fires
    delete_from_index(spark, idx, "lsh", DEL)
    assert maybe_compact(spark, idx, "lsh", max_deleted_fraction=0.0) is True
    # cumulative n_deleted is non-zero, but nothing is OUTSTANDING and
    # segments are folded — the policy must decline, not loop forever
    assert maybe_compact(spark, idx, "lsh", max_segments=0,
                         max_deleted_fraction=0.0) is False


def test_interleaved_lsm_lifecycle(spark, tmp_path):
    """The full LSM lifecycle interleaved, as a long-running ingest loop
    drives it: ingest → delete → ingest → compact → RE-ADD updated
    versions of the deleted docs (the update path) → delete → ingest →
    compact.  Pins: the end state ≡ a from-scratch build over exactly
    the live corpus (updated text included — proving the update took
    effect); the tombstone guard fires mid-loop; generation/segment/
    deletion counters are exact after two compactions."""
    docs = _docs(spark)
    w = [docs.filter(F.col("doc_id") % 3 == r) for r in range(3)]
    d1 = [int(r.doc_id) for r in
          w[0].filter(F.col("doc_id") % 7 == 1).select("doc_id").collect()]
    d2 = [int(r.doc_id) for r in
          w[1].filter(F.col("doc_id") % 11 == 2).select("doc_id").collect()]
    assert d1 and d2
    upd = (
        docs.filter(F.col("doc_id").isin(d1))
        .select("doc_id", F.concat(F.col("text"), F.lit(" updated marker"))
                .alias("text"))
    )

    idx = str(tmp_path / "mh")
    write_minhash_index(w[0], idx, corpus_fp=1)
    assert delete_from_index(spark, idx, "mh", d1) == len(d1)
    append_minhash_batch(spark, idx, w[1], new_corpus_fp=2)
    # re-adding a tombstoned id before compaction: refused loudly
    with pytest.raises(ValueError, match="tombstoned"):
        append_minhash_batch(spark, idx, upd)
    assert compact_index(spark, idx, "mh") is True  # folds d1 → gen 1
    append_minhash_batch(spark, idx, upd, new_corpus_fp=3)  # the update
    assert delete_from_index(spark, idx, "mh", d2) == len(d2)
    append_minhash_batch(spark, idx, w[2], new_corpus_fp=4)
    assert compact_index(spark, idx, "mh") is True  # folds d2 → gen 2

    meta = spark.read.parquet(f"{idx}/mh_meta.parquet").collect()[0]
    gen, tombs, n_deleted = _meta_maint(meta)
    assert (gen, int(meta.segments), tombs) == (2, 0, 0)
    assert n_deleted == len(d1) + len(d2)
    n_ingested = w[0].count() + w[1].count() + len(d1) + w[2].count()
    assert int(meta.n) == n_ingested  # coverage counts every ingest
    # end state ≡ from-scratch build over exactly the live corpus
    live = (
        w[0].filter(~F.col("doc_id").isin(d1))
        .unionByName(w[1].filter(~F.col("doc_id").isin(d2)))
        .unionByName(upd)
        .unionByName(w[2])
    )
    ref = str(tmp_path / "ref")
    write_minhash_index(live, ref, corpus_fp=9)
    cols_s, cols_b = ["doc_id", "shset"], ["doc_id", "band", "band_key"]
    shs_g, bands_g = load_minhash_index(spark, idx)
    shs_r, bands_r = load_minhash_index(spark, ref)
    assert _rows(shs_g, cols_s) == _rows(shs_r, cols_s)
    assert _rows(bands_g, cols_b) == _rows(bands_r, cols_b)


def test_deleted_probe_plan_keeps_pushdown_and_broadcast_anti(spark):
    """The tombstone path must not cost the probe its scan pruning: the
    term predicate stays PUSHED into the postings scan THROUGH the
    broadcast anti-join, both tombstone anti-joins broadcast (no new
    exchange), and no Python stage appears."""
    from simpletons_map_reduce_spark.queries import REGISTRY
    from tests.conftest import SF0001

    df = REGISTRY["bm25_search_deleted"].fn(spark, SF0001)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(tok" in plan, plan
    assert plan.count("LeftAnti, BuildRight") == 2, plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan, plan


def test_family_registry_covers_all_five(spark):
    assert set(FAMILIES) == {"mh", "bm25", "ivf", "pq", "lsh"}
    for fam, spec in FAMILIES.items():
        assert spec["presence"] in spec["relations"]
        assert spec["key"] in ("doc_id", "vec_id")
