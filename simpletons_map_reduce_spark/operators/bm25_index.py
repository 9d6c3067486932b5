"""Build-once / probe-many BM25 postings index artifact.

``bm25_search`` scans the corpus per query — fine for one ad-hoc search,
but retrieval serves MANY queries per corpus build, and no search engine
re-tokenizes 100 TB per keyword.  This module persists the classic
tf-postings inverted index (the full-relevance generalization of the
reference's term→documents index, mrapps/indexer.go:16-40) with the same
artifact contract as the IVF/PQ/LSH/MinHash indexes:

- ``postings.parquet``   (tok, doc_id, tf) — repartitioned by ``tok``
  and sorted within partitions, so parquet row-group min/max stats on
  ``tok`` are tight: a probe's ``tok IN (...)`` predicate is PUSHED to
  the scan and prunes everything but the queried terms' row groups (the
  zone-map story of ``zorder_layout``, applied to text search);
- ``doclen.parquet``     (doc_id, dl) — the per-document length relation
  BM25's length normalization reads;
- ``termstats.parquet``  (tok, df) — per-term document frequency, so idf
  needs no postings aggregation at probe time;
- ``bm25_meta.parquet``  1 row (n docs, avgdl, n_tokens, n_corpus,
  corpus_fp, segments) — the corpus constants + the staleness checks
  (row count AND a file-metadata content fingerprint).

MAINTENANCE (round 10): the artifact is APPENDABLE.  An ingest batch of
NEW documents is tokenized alone; its (tok, doc_id, tf) postings and
(doc_id, dl) lengths are disjoint from the standing corpus's (new doc
ids), so they land as segments (``postings_seg{i}`` / ``doclen_seg{i}``)
with no merge.  Only the vocabulary-grain relations merge: termstats df
counts sum with the batch's, and the scalar constants (n, avgdl,
n_tokens) are re-derived from the segmented doclen relation — all
vocabulary/doc-grain work, never a corpus re-tokenize.  Each append
writes a fresh ``termstats_v{i}.parquet`` (full rewrite of a small
relation: Heaps' law keeps vocabulary ~√corpus) and commits by writing
the meta row LAST — a killed append leaves orphan files no load reads
(write-new-then-swap; pinned append ≡ rebuild in tests/test_bm25_index).

The PROBE (``bm25_search_indexed``) reads term-pruned postings, joins
the broadcast per-term stats and the doc-keyed length relation, and
ranks with the same order-exact integer-unit score sum as the inline
operator — identical output, same DuckDB oracle, zero corpus scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ann_index import (
    _check_fresh,
    _clear_meta,
    _guard_not_tombstoned,
    _load_tombstones,
    _meta_maint,
    _read_live,
    _seg_path,
)


def _batch_postings(docs: DataFrame) -> DataFrame:
    """(tok, doc_id, tf) over a (doc_id, text) relation — the tokenize +
    term-count pass shared by build and append.  Persisted DISK_ONLY: the
    postings relation is corpus-scale (one row per distinct term per doc)
    and feeds doclen + termstats + the write, and corpus-scale relations
    never go to heap (the house rule the MinHash/IVF builds follow;
    ADVICE r9)."""
    from pyspark.storagelevel import StorageLevel

    from ..caching import tracked_persist
    from ..functions.text import tokens_lower

    e = docs.select(
        "doc_id", F.explode(tokens_lower(F.col("text"))).alias("tok")
    )
    return tracked_persist(
        e.groupBy("tok", "doc_id").agg(F.count("*").cast("long").alias("tf")),
        level=StorageLevel.DISK_ONLY,
    )


def _termstats_path(index_dir: str, ver: int, gen: int = 0) -> str:
    """Versioned termstats location: the initial build's relation keeps
    the historical name; each append OR delete commits a full rewrite
    under a new version (``ts_ver`` in the meta) so the meta pointer swap
    is atomic-in-effect.  Compaction starts a new generation at v0."""
    if gen == 0:
        if ver == 0:
            return f"{index_dir}/termstats.parquet"
        return f"{index_dir}/termstats_v{ver}.parquet"
    return f"{index_dir}/termstats_g{gen}_v{ver}.parquet"


def _live_doclen(
    spark: SparkSession, index_dir: str, gen: int, segments: int, tombs: int
) -> DataFrame:
    """The LIVE (doc_id, dl) relation: current generation's segment union
    minus (versioned) tombstoned documents — the population every scoring
    constant is defined over."""
    return _read_live(
        spark, index_dir, "doclen", segments, gen,
        _load_tombstones(spark, index_dir, "bm25", tombs), "doc_id",
    )


def _write_bm25_meta(
    spark: SparkSession, index_dir: str,
    segments: int, n_corpus: int, corpus_fp: int | None,
    gen: int = 0, tombs: int = 0, n_deleted: int = 0, ts_ver: int | None = None,
) -> None:
    """Derive the scoring constants from the LIVE doclen relation (the
    segmented union minus tombstones) and commit the meta row — the write
    that publishes a build/append/delete.  ``ts_ver`` defaults to
    ``segments`` (the historical scheme where appends were the only
    termstats writers); deletes pass an explicit bumped version."""
    if ts_ver is None:
        ts_ver = segments
    stats = (
        _live_doclen(spark, index_dir, gen, segments, tombs)
        .agg(
            F.count("*").alias("n"),
            F.avg("dl").alias("avgdl"),
            F.sum("dl").alias("n_tokens"),
        )
        .collect()[0]
    )
    # n (scoring) counts LIVE docs with >= 1 token — the population BM25's
    # N/avgdl are defined over (a letterless doc can never be a hit);
    # n_corpus (staleness) counts ALL documents the index was derived
    # from, the same unit callers' expect_n uses — logical deletes change
    # the scoring population but NOT the corpus-coverage count.  A delete
    # that empties the live population (legal: retract everything) leaves
    # NULL aggregates — commit zeros so the delete completes and probes
    # return no hits, instead of crashing after the tombstone write.
    meta = spark.createDataFrame(
        [(
            stats.n,
            float(stats.avgdl) if stats.avgdl is not None else 0.0,
            stats.n_tokens if stats.n_tokens is not None else 0,
            n_corpus,
            corpus_fp, segments, gen, tombs, n_deleted, ts_ver,
        )],
        "n BIGINT, avgdl DOUBLE, n_tokens BIGINT, n_corpus BIGINT, "
        "corpus_fp BIGINT, segments BIGINT, gen BIGINT, tombs BIGINT, "
        "n_deleted BIGINT, ts_ver BIGINT",
    )
    meta.coalesce(1).write.mode("overwrite").parquet(
        f"{index_dir}/bm25_meta.parquet"
    )


def write_bm25_index(
    docs: DataFrame,
    index_dir: str,
    n_corpus: int | None = None,
    corpus_fp: int | None = None,
) -> None:
    """Tokenize (doc_id, text) once and persist the postings, doc-length,
    and term-stats relations.  ``n_corpus`` lets callers that already
    counted the corpus (bm25_index_for via index_location) skip the
    redundant count job; standalone callers omit it.  Meta is deleted
    first / written last (the commit marker)."""
    _clear_meta(index_dir, "bm25_meta.parquet")
    postings = _batch_postings(docs)
    (
        postings.repartition("tok")
        .sortWithinPartitions("tok")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/postings.parquet")
    )
    (
        postings.groupBy("doc_id")
        .agg(F.sum("tf").cast("long").alias("dl"))
        # range-clustered on doc_id: row-group min/max stats are tight, so
        # the append guard's batch-bounds predicate prunes to the overlap
        # (zero row groups for a monotone ingest loop) and tombstone-era
        # doc-grain lookups read only the touched ranges
        .repartitionByRange(8, "doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/doclen.parquet")
    )
    (
        postings.groupBy("tok")
        .agg(F.count("*").cast("long").alias("df"))
        .repartition("tok")
        .sortWithinPartitions("tok")
        .write.mode("overwrite")
        .parquet(_termstats_path(index_dir, 0))
    )
    if n_corpus is None:
        n_corpus = docs.count()
    _write_bm25_meta(docs.sparkSession, index_dir, 0, n_corpus, corpus_fp)


def append_bm25_batch(
    spark: SparkSession,
    index_dir: str,
    batch_docs: DataFrame,
    new_corpus_fp: int | None = None,
    check_disjoint: bool = True,
    count_as_new: int | None = None,
    allow_superseded: bool = False,
) -> None:
    """Absorb an ingest batch of NEW documents into a standing BM25
    artifact without re-tokenizing the corpus: batch postings/doclen land
    as segments, termstats merges df counts (vocabulary-grain — small by
    Heaps' law), and the scoring constants re-derive from the segmented
    doclen (doc-grain).  Per-batch cost is O(|batch| + vocabulary), never
    O(corpus) — the cost model a production ingest loop needs at 100 TB.
    Meta commits LAST: a killed append leaves orphan segment/termstats
    files no load reads, and the retry overwrites them.

    ``check_disjoint`` guards the NEW-docs contract with a doc-grain
    semi-join against the standing doclen relation, BOUNDED by the
    batch's doc_id range (appending an UPDATE would double-count its
    terms): doclen is range-clustered on doc_id, so the guard reads only
    row groups overlapping the batch — O(overlap), zero standing rows
    for a monotone ingest loop.  Disable for trusted ingest paths.
    """
    from .index_maintenance import _ts_ver

    meta = spark.read.parquet(f"{index_dir}/bm25_meta.parquet").collect()[0]
    gen, tombs, n_deleted = _meta_maint(meta)
    ts_ver = _ts_ver(meta)
    if not allow_superseded:
        _guard_not_tombstoned(
            batch_docs, "doc_id",
            _load_tombstones(spark, index_dir, "bm25", tombs), index_dir,
            "bm25",
        )
    segs = int(meta.segments)
    seg = segs + 1
    postings = _batch_postings(batch_docs)
    if check_disjoint:
        # O(overlap), not O(corpus) (VERDICT r10 what's-wrong #3): bound
        # the standing-side scan by the batch's doc_id range — doclen is
        # range-clustered on doc_id at every write, so the predicate
        # prunes the scan to overlapping row groups only; a monotone
        # ingest loop (new ids past the standing max) reads ZERO standing
        # rows.  The bounds collect is one batch-grain aggregate over the
        # already-persisted postings.
        lo, hi = (
            postings.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
        )
        old_dl = _live_doclen(spark, index_dir, gen, segs, tombs)
        if lo is not None:
            old_dl = old_dl.filter(F.col("doc_id").between(lo, hi))
        n_overlap = (
            postings.select("doc_id").distinct()
            .join(old_dl, "doc_id", "left_semi")
            .count()
        )
        if n_overlap:
            raise ValueError(
                f"append_bm25_batch: {n_overlap} batch doc_ids already "
                f"indexed at {index_dir} — appends must be NEW documents "
                f"(an update needs delete_from_index + compact_index, "
                f"or a rebuild)"
            )
    (
        postings.repartition("tok")
        .sortWithinPartitions("tok")
        .write.mode("overwrite")
        .parquet(_seg_path(index_dir, "postings", gen, seg))
    )
    (
        postings.groupBy("doc_id")
        .agg(F.sum("tf").cast("long").alias("dl"))
        .repartitionByRange(8, "doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .parquet(_seg_path(index_dir, "doclen", gen, seg))
    )
    batch_df = postings.groupBy("tok").agg(
        F.count("*").cast("long").alias("df")
    )
    old_ts = spark.read.parquet(_termstats_path(index_dir, ts_ver, gen))
    (
        old_ts.unionByName(batch_df)
        .groupBy("tok")
        .agg(F.sum("df").cast("long").alias("df"))
        .repartition("tok")
        .sortWithinPartitions("tok")
        .write.mode("overwrite")
        .parquet(_termstats_path(index_dir, ts_ver + 1, gen))
    )
    _write_bm25_meta(
        spark, index_dir, seg,
        int(meta.n_corpus)
        + (batch_docs.count() if count_as_new is None else count_as_new),
        new_corpus_fp if new_corpus_fp is not None else meta.corpus_fp,
        gen=gen, tombs=tombs, n_deleted=n_deleted, ts_ver=ts_ver + 1,
    )


def load_bm25_index(
    spark: SparkSession,
    index_dir: str,
    expect_n: int | None = None,
    expect_fp: int | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame, float, float]:
    """(postings, doclen, termstats, n_docs, avgdl) — postings/doclen as
    the current generation's segment unions minus tombstoned documents,
    termstats at the meta's version pointer (kept EXACT under deletes by
    ``delete_from_index``'s df decrement, so probes never rescan) —
    refusing a stale artifact on corpus-size or content-fingerprint
    mismatch."""
    from .index_maintenance import _ts_ver

    meta = spark.read.parquet(f"{index_dir}/bm25_meta.parquet").collect()[0]
    _check_fresh(meta, index_dir, "BM25", expect_n, expect_fp, n_attr="n_corpus")
    segs = int(meta.segments)
    gen, tombs, _ = _meta_maint(meta)
    ts_ver = _ts_ver(meta)
    tomb_df = _load_tombstones(spark, index_dir, "bm25", tombs)
    return (
        _read_live(spark, index_dir, "postings", segs, gen, tomb_df,
                   "doc_id"),
        _read_live(spark, index_dir, "doclen", segs, gen, tomb_df, "doc_id"),
        spark.read.parquet(_termstats_path(index_dir, ts_ver, gen)),
        float(meta.n),
        float(meta.avgdl),
    )


def bm25_index_for(
    spark: SparkSession,
    sf_dir: str,
    root: str | None = None,
    force: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame, float, float]:
    """Cache-or-build under the shared per-corpus ingest directory
    (``ann_index.index_location`` keying + ``cache_or_build`` rebuild
    semantics)."""
    from ..sources.tables import load_table
    from .ann_index import cache_or_build, index_location

    index_dir, n, fp = index_location(spark, sf_dir, root, "documents")

    def _build():
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        write_bm25_index(docs, index_dir, n_corpus=n, corpus_fp=fp)

    return cache_or_build(
        index_dir,
        "bm25_meta.parquet",
        force,
        _build,
        lambda: load_bm25_index(spark, index_dir, expect_n=n, expect_fp=fp),
    )


def deleted_bm25_index_for(
    spark: SparkSession,
    sf_dir: str,
    root: str | None = None,
    force: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame, float, float]:
    """The tombstone-delete exercise behind ``bm25_search_deleted``:
    build the postings artifact over the FULL corpus, then
    ``delete_from_index`` the ``doc_id % DELETE_MOD == DELETE_RESIDUE``
    slice — NO compaction, so the probe exercises the live tombstone
    path: postings/doclen anti-joined against the tombstone relation at
    load, per-term dfs decremented exactly from the dying docs' own
    postings, N/avgdl re-derived over the survivors.  The probe shares
    bm25_search's oracle FILTERED to the surviving documents, so the
    driver hash gate verifies the delete arithmetic end-to-end: one
    wrong df decrement or a stale avgdl moves a BM25 score and breaks
    the hash.

    Family-scoped ``…-del-bm25`` dir; refuse-and-redo resumability (the
    load refuses an artifact with no recorded deletions — a kill between
    build and delete redoes the sequence).
    """
    import shutil

    from ..sources.tables import load_table
    from .ann_index import cache_or_build, index_location
    from .index_maintenance import (
        DELETE_MOD,
        DELETE_RESIDUE,
        delete_from_index,
    )

    base_dir, n, fp = index_location(spark, sf_dir, root, "documents")
    index_dir = base_dir + "-del-bm25"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def _build():
        shutil.rmtree(index_dir, ignore_errors=True)
        write_bm25_index(docs, index_dir, n_corpus=n, corpus_fp=fp)
        deleted = delete_from_index(
            spark, index_dir, "bm25",
            docs.filter(F.col("doc_id") % DELETE_MOD == DELETE_RESIDUE)
            .select("doc_id"),
        )
        if deleted == 0:
            # loud refusal beats the _load gate's build→refuse→rebuild
            # loop on a corpus with no (token-bearing) slice members
            raise ValueError(
                f"deleted-BM25 exercise needs a non-empty doc_id % "
                f"{DELETE_MOD} == {DELETE_RESIDUE} slice in {sf_dir} — "
                f"this corpus has none in the index"
            )

    def _load():
        out = load_bm25_index(spark, index_dir, expect_n=n, expect_fp=fp)
        meta = spark.read.parquet(
            f"{index_dir}/bm25_meta.parquet"
        ).collect()[0]
        _, tombs, n_deleted = _meta_maint(meta)
        if tombs < 1 or n_deleted == 0:
            raise ValueError(
                f"deleted-BM25 artifact at {index_dir} has no recorded "
                f"deletions (tombs={tombs}) — lifecycle incomplete, redo"
            )
        return out

    return cache_or_build(index_dir, "bm25_meta.parquet", force, _build, _load)


def upserted_bm25_index_for(
    spark: SparkSession,
    sf_dir: str,
    root: str | None = None,
    force: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame, float, float]:
    """The UPSERT exercise behind ``bm25_search_upserted`` (round 12 —
    the O(|batch|) edit path VERDICT r11 named as the top gap): build
    the postings artifact over the FULL corpus, then
    ``upsert_into_index`` the ``doc_id % DELETE_MOD == DELETE_RESIDUE``
    slice with EDITED text (``upsert_text_edit``: the first query term
    rewritten out, a two-token marker appended) — NO compaction, no
    rebuild.  The supersession tombstones kill the slice's old
    postings/doclen rows at load; the replacement rows come from the
    appended segment; per-term dfs were decremented from the OLD rows
    and re-incremented from the NEW ones; N/avgdl re-derived over the
    edited population.  The probe shares bm25_search's oracle over the
    EDITED corpus (``upsert_case_sql``), so the driver hash gate
    verifies the entire edit path end-to-end: one surviving old row,
    one wrong df step, or a stale avgdl moves a BM25 score and breaks
    the hash.  ``count_as_new=0``: the batch replaces known corpus rows,
    so corpus coverage (n_corpus, the load staleness check) must not
    grow — letterless slice docs would otherwise be miscounted as fresh
    (doclen, the presence relation, omits them by design).

    Family-scoped ``…-ups-bm25`` dir; refuse-and-redo resumability (the
    load refuses an artifact without the completed upsert shape:
    outstanding supersession tombstones + the replacement segment, with
    zero counted deletions).
    """
    import shutil

    from pyspark.sql import functions as F

    from ..sources.tables import load_table
    from .ann_index import cache_or_build, index_location
    from .index_maintenance import (
        DELETE_MOD,
        DELETE_RESIDUE,
        upsert_into_index,
        upsert_text_edit,
    )

    base_dir, n, fp = index_location(spark, sf_dir, root, "documents")
    index_dir = base_dir + "-ups-bm25"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def _build():
        shutil.rmtree(index_dir, ignore_errors=True)
        write_bm25_index(docs, index_dir, n_corpus=n, corpus_fp=fp)
        batch = docs.filter(
            F.col("doc_id") % DELETE_MOD == DELETE_RESIDUE
        ).select("doc_id", upsert_text_edit(F.col("text")).alias("text"))
        res = upsert_into_index(
            spark, index_dir, "bm25", batch, append_bm25_batch,
            new_corpus_fp=fp, count_as_new=0, check_disjoint=False,
        )
        if res["superseded"] + res["revived"] == 0:
            raise ValueError(
                f"upserted-BM25 exercise needs a non-empty doc_id % "
                f"{DELETE_MOD} == {DELETE_RESIDUE} slice in {sf_dir} — "
                f"this corpus has none in the index"
            )

    def _load():
        out = load_bm25_index(spark, index_dir, expect_n=n, expect_fp=fp)
        meta = spark.read.parquet(
            f"{index_dir}/bm25_meta.parquet"
        ).collect()[0]
        _, tombs, n_deleted = _meta_maint(meta)
        if tombs < 1 or int(meta.segments) < 1 or n_deleted != 0:
            raise ValueError(
                f"upserted-BM25 artifact at {index_dir} lacks the "
                f"completed upsert shape (tombs={tombs}, "
                f"segments={meta.segments}, n_deleted={n_deleted}) — redo"
            )
        return out

    return cache_or_build(index_dir, "bm25_meta.parquet", force, _build, _load)


def appended_bm25_index_for(
    spark: SparkSession,
    sf_dir: str,
    root: str | None = None,
    force: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame, float, float]:
    """The ingest-loop exercise path behind ``bm25_search_appended``:
    build the artifact over the STANDING corpus (``doc_id %
    NEW_BATCH_MOD != 0`` — dedup_incremental's batch split, reused so
    every incremental-maintenance op agrees on what "the new batch" is),
    then ``append_bm25_batch`` the remaining ~10%.  Because append ≡
    rebuild exactly (pytest-pinned), the probe result is identical to
    ``bm25_search_indexed``'s and shares its oracle — the driver hash
    gate therefore checks the APPEND arithmetic end-to-end.

    Lives under a FAMILY-SCOPED sibling ``…-app-bm25`` directory so it
    never fights the full-build artifact (same corpus, same n — same
    index_location key) NOR the other appended families: the resumable
    build starts with an rmtree of its directory, and a shared -app dir
    made the minhash and bm25 appended builds wipe each other on every
    cache miss (caught as consistent 12-14 s rebuild rows in the
    round-10 bench).  Resumable: a run killed between build and append
    leaves meta.n_corpus short of the full count, the next load refuses,
    and cache_or_build redoes the sequence from scratch.
    """
    import shutil

    from ..sources.tables import load_table
    from .ann_index import cache_or_build, index_location

    base_dir, n, fp = index_location(spark, sf_dir, root, "documents")
    index_dir = base_dir + "-app-bm25"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def _build():
        from ..queries.dedup_ops import NEW_BATCH_MOD

        shutil.rmtree(index_dir, ignore_errors=True)
        standing = docs.filter(F.col("doc_id") % NEW_BATCH_MOD != 0)
        batch = docs.filter(F.col("doc_id") % NEW_BATCH_MOD == 0)
        write_bm25_index(standing, index_dir, corpus_fp=fp)
        append_bm25_batch(spark, index_dir, batch, new_corpus_fp=fp)

    return cache_or_build(
        index_dir,
        "bm25_meta.parquet",
        force,
        _build,
        lambda: load_bm25_index(spark, index_dir, expect_n=n, expect_fp=fp),
    )
