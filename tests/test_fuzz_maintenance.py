"""Randomized differential testing of the index-maintenance lifecycle.

The curated pins (tests/test_index_compaction.py) drive FIXED
split/delete sets; this family draws random standing/batch splits and
random delete sets (including ids the index never held, already-deleted
ids, and empty deletes) and random compact-or-not decisions, then
asserts the lifecycle invariant the whole layer is built on:

    load(build(standing) ∘ append(batch) ∘ delete(keys) [∘ compact])
        ≡ load(build(live))          where live = (standing ∪ batch) − keys

exactly — rows AND, for BM25, the scoring statistics (termstats, N,
avgdl).  Any divergence in segment-union arithmetic, tombstone
anti-joins, df decrements, generation-path naming, or meta accounting
surfaces as a row diff on a shrinkable example.  BM25 covers the
document-side (vocabulary-grain merges, stat exactness); LSH covers the
vector side (per-row signatures — the same lifecycle over a different
key column and layout).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from simpletons_map_reduce_spark.caching import release_persisted
from simpletons_map_reduce_spark.operators.ann_index import (
    _meta_maint,
    append_lsh_batch,
    load_lsh_index,
    write_lsh_index,
)
from simpletons_map_reduce_spark.operators.bm25_index import (
    append_bm25_batch,
    load_bm25_index,
    write_bm25_index,
)
from simpletons_map_reduce_spark.operators.index_maintenance import (
    compact_index,
    delete_from_index,
)
from simpletons_map_reduce_spark.sources.tables import load_table

from tests.conftest import SF0001

VOCAB = ["alpha", "bravo", "carol", "delta", "every", "faded", "gamma"]


@st.composite
def lifecycle_case(draw):
    n_docs = draw(st.integers(min_value=6, max_value=20))
    texts = [
        " ".join(
            draw(st.lists(st.sampled_from(VOCAB), min_size=0, max_size=10))
        )
        for _ in range(n_docs)
    ]
    # standing/batch split: any subset (possibly empty batch — an ingest
    # loop's no-op tick is legal)
    batch_ids = draw(
        st.sets(st.integers(0, n_docs - 1), min_size=0, max_size=n_docs // 2)
    )
    # delete set: drawn from a RANGE WIDER than the corpus, so absent
    # ids exercise the presence filter; two waves exercise idempotence
    del1 = draw(st.sets(st.integers(0, n_docs + 5), max_size=n_docs - 1))
    del2 = draw(st.sets(st.integers(0, n_docs + 5), max_size=4))
    do_compact = draw(st.booleans())
    # keep at least one live doc (the deliberate empty-live edge is
    # pinned deterministically in test_index_compaction.py)
    live = set(range(n_docs)) - del1 - del2
    if not live:
        del1 = set(list(del1)[: n_docs // 2])
        del2 = set()
    return texts, batch_ids, del1, del2, do_compact


def _rows(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=lifecycle_case())
def test_bm25_lifecycle_equals_rebuild_over_live(spark, tmp_path_factory, case):
    texts, batch_ids, del1, del2, do_compact = case
    tmp = tmp_path_factory.mktemp("fuzzbm")
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING"
    )
    standing = docs.filter(~F.col("doc_id").isin(list(batch_ids) or [-1]))
    batch = docs.filter(F.col("doc_id").isin(list(batch_ids) or [-1]))
    dead = del1 | del2
    live = docs.filter(~F.col("doc_id").isin(list(dead) or [-1]))

    idx = str(tmp / "inc")
    ref = str(tmp / "ref")
    write_bm25_index(standing, idx, corpus_fp=1)
    append_bm25_batch(spark, idx, batch, new_corpus_fp=2)
    n1 = delete_from_index(spark, idx, "bm25", sorted(del1))
    n2 = delete_from_index(spark, idx, "bm25", sorted(del2))
    if do_compact:
        compact_index(spark, idx, "bm25")
    write_bm25_index(live, ref, corpus_fp=3)

    p_g, dl_g, ts_g, nd_g, avg_g = load_bm25_index(spark, idx)
    p_r, dl_r, ts_r, nd_r, avg_r = load_bm25_index(spark, ref)
    assert _rows(p_g, ["tok", "doc_id", "tf"]) == _rows(
        p_r, ["tok", "doc_id", "tf"]
    )
    assert _rows(dl_g, ["doc_id", "dl"]) == _rows(dl_r, ["doc_id", "dl"])
    assert _rows(ts_g, ["tok", "df"]) == _rows(ts_r, ["tok", "df"])
    assert (nd_g, avg_g) == (nd_r, avg_r)
    # exact accounting: only ids PRESENT IN THE INDEX count — for BM25
    # presence is the doclen relation, so a letterless doc (nothing was
    # ever indexed for it) is a no-op delete by design
    meta = spark.read.parquet(f"{idx}/bm25_meta.parquet").collect()[0]
    _, _, n_deleted = _meta_maint(meta)
    present_dead = {
        i for i in dead if i < len(texts) and texts[i].strip()
    }
    assert n1 + n2 == len(present_dead) == n_deleted
    release_persisted()


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batch_ids=st.sets(st.integers(0, 39), max_size=15),
    dead=st.sets(st.integers(0, 45), max_size=30),
    do_compact=st.booleans(),
)
def test_lsh_lifecycle_equals_rebuild_over_live(
    spark, tmp_path_factory, batch_ids, dead, do_compact
):
    from simpletons_map_reduce_spark.queries.similarity_ops import (
        _emb_with_norm,
    )

    tmp = tmp_path_factory.mktemp("fuzzlsh")
    emb = _emb_with_norm(spark, SF0001).select("vec_id", "v", "nv").filter(
        F.col("vec_id") < 40
    )
    if set(range(40)) <= dead:
        dead = set(list(dead)[:20])
    standing = emb.filter(~F.col("vec_id").isin(list(batch_ids) or [-1]))
    batch = emb.filter(F.col("vec_id").isin(list(batch_ids) or [-1]))
    live = emb.filter(~F.col("vec_id").isin(list(dead) or [-1]))

    idx = str(tmp / "inc")
    ref = str(tmp / "ref")
    write_lsh_index(standing, idx, corpus_fp=1)
    append_lsh_batch(spark, idx, batch, new_corpus_fp=2)
    n_del = delete_from_index(spark, idx, "lsh", sorted(dead))
    if do_compact:
        compact_index(spark, idx, "lsh")
    write_lsh_index(live, ref, corpus_fp=3)

    cols = ["vec_id", "band", "bkey"]
    assert _rows(load_lsh_index(spark, idx), cols) == _rows(
        load_lsh_index(spark, ref), cols
    )
    assert n_del == len({i for i in dead if i < 40})
    release_persisted()


# ---------------------------------------------------------------------------
# round 12: upsert waves in the fuzz loop (VERDICT r11 item 2's re-add
# cases) — random edits interleaved with deletes, in BOTH orders, must
# leave the artifact ≡ a rebuild over the edited live corpus
# ---------------------------------------------------------------------------


@st.composite
def upsert_case(draw):
    n_docs = draw(st.integers(min_value=6, max_value=16))
    texts = [
        " ".join(
            draw(st.lists(st.sampled_from(VOCAB), min_size=0, max_size=8))
        )
        for _ in range(n_docs)
    ]
    batch_ids = draw(
        st.sets(st.integers(0, n_docs - 1), min_size=0, max_size=n_docs // 2)
    )
    dead = draw(st.sets(st.integers(0, n_docs + 4), max_size=n_docs - 1))
    # edit set drawn from a range wider than the corpus: in-corpus ids
    # are SUPERSEDED (or REVIVED when the delete ran first), ids beyond
    # it are FRESH inserts arriving through the upsert path
    edit_ids = draw(
        st.sets(st.integers(0, n_docs + 4), min_size=0, max_size=n_docs)
    )
    edit_texts = {
        i: " ".join(
            draw(st.lists(st.sampled_from(VOCAB), min_size=0, max_size=8))
        )
        for i in sorted(edit_ids)
    }
    upsert_first = draw(st.booleans())
    do_compact = draw(st.booleans())
    return texts, batch_ids, dead, edit_texts, upsert_first, do_compact


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=upsert_case())
def test_bm25_upsert_lifecycle_equals_edited_rebuild(
    spark, tmp_path_factory, case
):
    from simpletons_map_reduce_spark.operators.index_maintenance import (
        upsert_into_index,
    )

    texts, batch_ids, dead, edit_texts, upsert_first, do_compact = case
    n_docs = len(texts)
    tmp = tmp_path_factory.mktemp("fuzzups")
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING"
    )
    standing = docs.filter(~F.col("doc_id").isin(list(batch_ids) or [-1]))
    batch = docs.filter(F.col("doc_id").isin(list(batch_ids) or [-1]))
    edits = spark.createDataFrame(
        [(i, t) for i, t in sorted(edit_texts.items())] or [(-1, "")],
        "doc_id BIGINT, text STRING",
    ).filter(F.col("doc_id") >= 0)

    idx = str(tmp / "inc")
    ref = str(tmp / "ref")
    write_bm25_index(standing, idx, corpus_fp=1)
    append_bm25_batch(spark, idx, batch, new_corpus_fp=2)

    def _delete():
        delete_from_index(spark, idx, "bm25", sorted(dead))

    def _upsert():
        upsert_into_index(
            spark, idx, "bm25", edits, append_bm25_batch, new_corpus_fp=3
        )

    if upsert_first:
        _upsert(), _delete()
        # a delete AFTER the upsert wins for every id it names
        live_ids = (set(range(n_docs)) | set(edit_texts)) - dead
    else:
        _delete(), _upsert()
        # an upsert AFTER the delete revives the ids it re-adds
        live_ids = (set(range(n_docs)) | set(edit_texts)) - (
            dead - set(edit_texts)
        )
    if do_compact:
        compact_index(spark, idx, "bm25")

    final_text = {
        i: edit_texts.get(i, texts[i] if i < n_docs else "")
        for i in live_ids
    }
    live = spark.createDataFrame(
        sorted(final_text.items()) or [(-1, "")],
        "doc_id BIGINT, text STRING",
    ).filter(F.col("doc_id") >= 0)
    write_bm25_index(live, ref, corpus_fp=4)

    p_g, dl_g, ts_g, nd_g, avg_g = load_bm25_index(spark, idx)
    p_r, dl_r, ts_r, nd_r, avg_r = load_bm25_index(spark, ref)
    assert _rows(p_g, ["tok", "doc_id", "tf"]) == _rows(
        p_r, ["tok", "doc_id", "tf"]
    )
    assert _rows(dl_g, ["doc_id", "dl"]) == _rows(dl_r, ["doc_id", "dl"])
    assert _rows(ts_g, ["tok", "df"]) == _rows(ts_r, ["tok", "df"])
    assert (nd_g, avg_g) == (nd_r, avg_r)
    release_persisted()


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batch_ids=st.sets(st.integers(0, 39), max_size=15),
    dead=st.sets(st.integers(0, 45), max_size=25),
    edit_ids=st.sets(st.integers(0, 45), max_size=20),
    upsert_first=st.booleans(),
    do_compact=st.booleans(),
)
def test_lsh_upsert_lifecycle_equals_edited_rebuild(
    spark, tmp_path_factory, batch_ids, dead, edit_ids, upsert_first,
    do_compact,
):
    """Vector-side twin: edited vectors are deterministic sign-flip
    re-embeddings (content genuinely moves), edit ids 40-45 arrive as
    fresh inserts from outside the 40-vector standing corpus."""
    from simpletons_map_reduce_spark.operators.ann_index import moved_emb
    from simpletons_map_reduce_spark.operators.index_maintenance import (
        upsert_into_index,
    )
    from simpletons_map_reduce_spark.queries.similarity_ops import (
        _emb_with_norm,
    )

    tmp = tmp_path_factory.mktemp("fuzzupslsh")
    full = _emb_with_norm(spark, SF0001).select("vec_id", "v", "nv")
    emb = full.filter(F.col("vec_id") < 40)
    if set(range(40)) <= dead:
        dead = set(list(dead)[:20])
    standing = emb.filter(~F.col("vec_id").isin(list(batch_ids) or [-1]))
    batch = emb.filter(F.col("vec_id").isin(list(batch_ids) or [-1]))
    edits = moved_emb(
        full.filter(F.col("vec_id").isin(list(edit_ids) or [-1]))
    )

    idx = str(tmp / "inc")
    ref = str(tmp / "ref")
    write_lsh_index(standing, idx, corpus_fp=1)
    append_lsh_batch(spark, idx, batch, new_corpus_fp=2)

    def _delete():
        delete_from_index(spark, idx, "lsh", sorted(dead))

    def _upsert():
        upsert_into_index(
            spark, idx, "lsh", edits, append_lsh_batch, new_corpus_fp=3
        )

    if upsert_first:
        _upsert(), _delete()
        live_ids = (set(range(40)) | edit_ids) - dead
    else:
        _delete(), _upsert()
        live_ids = (set(range(40)) | edit_ids) - (dead - edit_ids)
    if do_compact:
        compact_index(spark, idx, "lsh")

    surviving_edits = live_ids & edit_ids
    live = emb.filter(
        F.col("vec_id").isin(list(live_ids - surviving_edits) or [-1])
    ).unionByName(
        moved_emb(
            full.filter(F.col("vec_id").isin(list(surviving_edits) or [-1]))
        )
    )
    write_lsh_index(live, ref, corpus_fp=4)

    cols = ["vec_id", "band", "bkey"]
    assert _rows(load_lsh_index(spark, idx), cols) == _rows(
        load_lsh_index(spark, ref), cols
    )
    release_persisted()
