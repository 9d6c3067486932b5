"""Build-once / probe-many MinHash signature index artifact.

The round-9 IVF/PQ artifacts (``ann_index.py``) settled the pattern for
embeddings; this module applies it to the OTHER corpus-scale index a
training pipeline keeps hot: the MinHash-LSH signature relations behind
``near_dedup`` / ``dedup_incremental``.  Signature computation — per-token
md5, polynomial gram combination, NUM_PERM affine min-permutations — is
the dominant map-side cost of every LSH query (the sf100 sweep measured
it as the bulk of near_dedup's 373 s at 5M docs), and in production it is
paid ONCE at corpus ingest: every new crawl batch probes the standing
corpus's signatures, it does not re-derive them.

Artifact layout under ``index_dir`` (coexists with the IVF/PQ files —
one ingest directory per corpus):

- ``mh_shingles.parquet``  (doc_id, shset array<bigint>) — the exact
  62-bit gram-hash sets, the candidate-VERIFICATION side;
- ``mh_bands.parquet``     (doc_id, band, band_key) — the full LSH band
  relation, PRE-cap (bucket caps are a query-time policy: the same
  artifact serves probes with different caps, exactly like a database
  index serving different predicates);
- ``mh_meta.parquet``      1 row (n, num_perm, band_rows, corpus_fp,
  segments) — staleness check (row count + file-metadata content
  fingerprint) + the signature-scheme fingerprint (an artifact built
  under a different permutation count refuses to load rather than
  silently producing wrong-band probes).

MAINTENANCE (round 10): the artifact is APPENDABLE.  Per-document
signatures are independent — a doc's shingle set and band keys depend on
its text alone — so absorbing an ingest batch means signing ONLY the
batch and landing the rows as new segments (``mh_shingles_seg{i}`` /
``mh_bands_seg{i}``); the standing corpus is never re-signed.  The meta
row is the commit pointer, written LAST: a killed append leaves orphan
segment directories no load reads, and the retry overwrites them
(write-new-then-swap).  ``append_minhash_batch`` output is EXACTLY what
a from-scratch build over the grown corpus would produce (pinned in
tests/test_minhash_index.py), so every probe op keeps its oracle.

The PROBE path (``near_dedup_indexed``) reads the two relations and runs
bucket-cap → collision self-join → bucket-local exact verification —
tokenization, md5, and the minhash Arrow kernel never run (pinned in
tests/test_minhash_index.py: no MapInPandas stage in the probe plan; the
only Python stage is the cogrouped verify kernel, which is candidate-
scale, not corpus-scale).  Output is identical to ``near_dedup`` by
construction — the artifact is a materialization, not an approximation —
so it shares the SAME DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .ann_index import (
    _check_fresh,
    _clear_meta,
    _guard_not_tombstoned,
    _load_tombstones,
    _meta_maint,
    _read_live,
    _seg_path,
)


def _minhash_relations(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(shingles, bands) over a (doc_id, text) relation — the signature
    computation shared by the initial build and the batch append, so the
    two paths can never drift.  The shingle projection is persisted
    DISK_ONLY (house rule for corpus-scale array rows) and feeds both
    relations; callers release via release_persisted()."""
    from ..caching import tracked_persist
    from ..functions.hashing import minhash_params
    from ..functions.vectorized import np_minhash_bands
    from ..queries.dedup_ops import BAND_ROWS, NUM_PERM, shingle_projection

    from pyspark.storagelevel import StorageLevel

    shs = tracked_persist(
        shingle_projection(docs), level=StorageLevel.DISK_ONLY
    )
    bands = np_minhash_bands(
        shs.select("doc_id", "hl"), minhash_params(NUM_PERM), BAND_ROWS
    )
    return shs, bands


def _write_mh_meta(
    spark: SparkSession, index_dir: str,
    n: int, corpus_fp: int | None, segments: int,
    gen: int = 0, tombs: int = 0, n_deleted: int = 0,
) -> None:
    from ..queries.dedup_ops import BAND_ROWS, NUM_PERM

    meta = spark.createDataFrame(
        [(n, NUM_PERM, BAND_ROWS, corpus_fp, segments, gen, tombs, n_deleted)],
        "n BIGINT, num_perm BIGINT, band_rows BIGINT, corpus_fp BIGINT, "
        "segments BIGINT, gen BIGINT, tombs BIGINT, n_deleted BIGINT",
    )
    meta.coalesce(1).write.mode("overwrite").parquet(
        f"{index_dir}/mh_meta.parquet"
    )


def write_minhash_index(
    docs: DataFrame, index_dir: str, corpus_fp: int | None = None
) -> None:
    """Compute shingle sets + LSH bands over (doc_id, text) and persist
    both relations.  ``docs`` is scanned once via the shared DISK_ONLY
    shingle projection.  Meta is deleted first / written last, so a
    killed (re)build is a cache miss on next access, never torn data
    served as fresh."""
    _clear_meta(index_dir, "mh_meta.parquet")
    shs, bands = _minhash_relations(docs)
    (
        shs.select("doc_id", "shset")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/mh_shingles.parquet")
    )
    # cluster files by band so a probe's bucket-count window reads
    # band-colocated row groups (the exchange still happens — plain
    # parquet carries no partitioning metadata — but IO locality holds).
    (
        bands.repartition("band")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/mh_bands.parquet")
    )
    _write_mh_meta(docs.sparkSession, index_dir, docs.count(), corpus_fp, 0)


def append_minhash_batch(
    spark: SparkSession,
    index_dir: str,
    batch_docs: DataFrame,
    new_corpus_fp: int | None = None,
    count_as_new: int | None = None,
    allow_superseded: bool = False,
) -> None:
    """Absorb an ingest batch into a standing MinHash artifact: sign ONLY
    the batch (per-doc signatures are independent of the rest of the
    corpus, so segment union ≡ full rebuild EXACTLY — pinned in
    tests/test_minhash_index.py) and land the rows as new shingle/band
    segments.  At 100 TB this is the difference between per-batch cost
    O(|batch|) and the full re-sign (hours) the rebuild-only contract
    forced.  Meta (count, fingerprint, segment pointer) commits LAST —
    a killed append is invisible and the retry overwrites its orphans.

    ``batch_docs`` must be NEW doc_ids (an ingest batch, not an update);
    ``new_corpus_fp`` is the corpus fingerprint AFTER the batch landed.
    """
    meta = spark.read.parquet(f"{index_dir}/mh_meta.parquet").collect()[0]
    from ..queries.dedup_ops import BAND_ROWS, NUM_PERM

    if (meta.num_perm, meta.band_rows) != (NUM_PERM, BAND_ROWS):
        raise ValueError(
            f"MinHash index at {index_dir} uses num_perm={meta.num_perm}, "
            f"band_rows={meta.band_rows}; the engine now uses "
            f"({NUM_PERM}, {BAND_ROWS}) — rebuild, do not append"
        )
    gen, tombs, n_deleted = _meta_maint(meta)
    if not allow_superseded:
        _guard_not_tombstoned(
            batch_docs, "doc_id",
            _load_tombstones(spark, index_dir, "mh", tombs), index_dir, "mh",
        )
    seg = int(meta.segments) + 1
    shs, bands = _minhash_relations(batch_docs)
    (
        shs.select("doc_id", "shset")
        .write.mode("overwrite")
        .parquet(_seg_path(index_dir, "mh_shingles", gen, seg))
    )
    (
        bands.repartition("band")
        .write.mode("overwrite")
        .parquet(_seg_path(index_dir, "mh_bands", gen, seg))
    )
    _write_mh_meta(
        spark, index_dir,
        int(meta.n)
        + (batch_docs.count() if count_as_new is None else count_as_new),
        new_corpus_fp if new_corpus_fp is not None else meta.corpus_fp,
        seg, gen=gen, tombs=tombs, n_deleted=n_deleted,
    )


def load_minhash_index(
    spark: SparkSession,
    index_dir: str,
    expect_n: int | None = None,
    expect_fp: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(shingles, bands) — each the union of the base segment and every
    appended batch segment — with the same staleness contract as the ANN
    artifacts: a count, content-fingerprint, or signature-scheme mismatch
    raises instead of silently probing a stale index."""
    from ..queries.dedup_ops import BAND_ROWS, NUM_PERM

    meta = spark.read.parquet(f"{index_dir}/mh_meta.parquet").collect()[0]
    _check_fresh(meta, index_dir, "MinHash", expect_n, expect_fp)
    if (meta.num_perm, meta.band_rows) != (NUM_PERM, BAND_ROWS):
        raise ValueError(
            f"MinHash index at {index_dir} was built with "
            f"num_perm={meta.num_perm}, band_rows={meta.band_rows}; the "
            f"engine now uses ({NUM_PERM}, {BAND_ROWS}) — rebuild"
        )
    segs = int(meta.segments)
    gen, tombs, _ = _meta_maint(meta)
    tomb_df = _load_tombstones(spark, index_dir, "mh", tombs)
    return (
        _read_live(spark, index_dir, "mh_shingles", segs, gen, tomb_df,
                   "doc_id"),
        _read_live(spark, index_dir, "mh_bands", segs, gen, tomb_df,
                   "doc_id"),
    )


def minhash_index_for(
    spark: SparkSession,
    sf_dir: str,
    root: str | None = None,
    force: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Cache-or-build under the shared per-corpus artifact directory
    (``ann_index.index_location`` keying; a num_perm/band_rows scheme
    bump or content-fingerprint mismatch rebuilds automatically via
    ``cache_or_build``)."""
    from ..sources.tables import load_table, spread
    from .ann_index import cache_or_build, index_location

    index_dir, n, fp = index_location(spark, sf_dir, root, "documents")

    def _build():
        docs = spread(
            load_table(spark, sf_dir, "documents").select("doc_id", "text")
        )
        write_minhash_index(docs, index_dir, corpus_fp=fp)

    return cache_or_build(
        index_dir,
        "mh_meta.parquet",
        force,
        _build,
        lambda: load_minhash_index(spark, index_dir, expect_n=n, expect_fp=fp),
    )


def maintained_minhash_index_for(
    spark: SparkSession,
    sf_dir: str,
    root: str | None = None,
    force: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """The FULL maintenance lifecycle behind ``dedup_incremental_maintained``:
    build over the standing corpus (``doc_id % NEW_BATCH_MOD != 0``),
    ``append_minhash_batch`` the new ~10%, ``delete_from_index`` the
    ``doc_id % DELETE_MOD == DELETE_RESIDUE`` slice (which straddles both
    standing corpus and appended batch — the split moduli are coprime),
    then ``compact_index`` — segments merged, tombstones folded, one new
    generation.  The probe shares dedup_incremental's oracle FILTERED to
    the surviving docs, so the driver hash gate verifies append + delete
    + compaction arithmetic end-to-end.

    Family-scoped ``…-mnt-mh`` dir.  Resumable: the load refuses any
    artifact whose meta does not show the COMPLETED lifecycle (gen ≥ 1,
    tombstones folded, deletions recorded), so a kill between any two
    steps redoes the sequence from scratch (refuse-and-redo, same
    contract as the appended exercises).
    """
    import shutil

    from pyspark.sql import functions as F

    from ..sources.tables import load_table, spread
    from .ann_index import cache_or_build, index_location
    from .index_maintenance import (
        DELETE_MOD,
        DELETE_RESIDUE,
        compact_index,
        delete_from_index,
    )

    base_dir, n, fp = index_location(spark, sf_dir, root, "documents")
    index_dir = base_dir + "-mnt-mh"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def _build():
        from ..queries.dedup_ops import NEW_BATCH_MOD

        shutil.rmtree(index_dir, ignore_errors=True)
        standing = spread(docs.filter(F.col("doc_id") % NEW_BATCH_MOD != 0))
        batch = spread(docs.filter(F.col("doc_id") % NEW_BATCH_MOD == 0))
        write_minhash_index(standing, index_dir, corpus_fp=fp)
        append_minhash_batch(spark, index_dir, batch, new_corpus_fp=fp)
        deleted = delete_from_index(
            spark, index_dir, "mh",
            docs.filter(F.col("doc_id") % DELETE_MOD == DELETE_RESIDUE)
            .select("doc_id"),
        )
        if deleted == 0:
            # refuse a vacuous exercise LOUDLY: the _load gate pins that
            # deletions happened, and silently passing an empty slice
            # would loop build→refuse→rebuild forever on this corpus
            raise ValueError(
                f"maintained-MinHash exercise needs a non-empty doc_id % "
                f"{DELETE_MOD} == {DELETE_RESIDUE} slice in {sf_dir} — "
                f"this corpus has none in the index"
            )
        compact_index(spark, index_dir, "mh")

    def _load():
        out = load_minhash_index(spark, index_dir, expect_n=n, expect_fp=fp)
        meta = spark.read.parquet(f"{index_dir}/mh_meta.parquet").collect()[0]
        gen, tombs, n_deleted = _meta_maint(meta)
        if gen < 1 or tombs != 0 or n_deleted == 0:
            raise ValueError(
                f"maintained MinHash artifact at {index_dir} is mid-"
                f"lifecycle (gen={gen}, tombs={tombs}, "
                f"n_deleted={n_deleted}) — redo"
            )
        return out

    return cache_or_build(index_dir, "mh_meta.parquet", force, _build, _load)


def upserted_minhash_index_for(
    spark: SparkSession,
    sf_dir: str,
    root: str | None = None,
    force: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """The UPSERT exercise behind ``dedup_incremental_upserted`` (round
    12): build the signature artifact over the FULL corpus, then
    ``upsert_into_index`` the ``doc_id % DELETE_MOD == DELETE_RESIDUE``
    slice with EDITED text — O(|slice|), no compaction, no re-sign of
    the standing corpus.  Supersession tombstones (born_seg-versioned)
    kill the slice's old shingle/band rows at load while the replacement
    segment's rows survive; per-doc signatures are corpus-independent,
    so the loaded relations are EXACTLY a rebuild over the edited corpus
    (pytest-pinned in tests/test_index_upsert.py).  The probe shares
    dedup_incremental's oracle over the EDITED corpus text
    (``upsert_case_sql``), so the driver hash gate verifies the whole
    edit path — one resurrected old band or one missing replacement
    shingle moves a candidate pair and breaks the hash.

    Family-scoped ``…-ups-mh`` dir; refuse-and-redo resumability (the
    load refuses an artifact without the completed upsert shape)."""
    import shutil

    from pyspark.sql import functions as F

    from ..sources.tables import load_table, spread
    from .ann_index import cache_or_build, index_location
    from .index_maintenance import (
        DELETE_MOD,
        DELETE_RESIDUE,
        upsert_into_index,
        upsert_text_edit,
    )

    base_dir, n, fp = index_location(spark, sf_dir, root, "documents")
    index_dir = base_dir + "-ups-mh"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def _build():
        shutil.rmtree(index_dir, ignore_errors=True)
        write_minhash_index(spread(docs), index_dir, corpus_fp=fp)
        batch = spread(
            docs.filter(F.col("doc_id") % DELETE_MOD == DELETE_RESIDUE)
            .select("doc_id", upsert_text_edit(F.col("text")).alias("text"))
        )
        res = upsert_into_index(
            spark, index_dir, "mh", batch, append_minhash_batch,
            new_corpus_fp=fp, count_as_new=0,
        )
        if res["superseded"] + res["revived"] == 0:
            raise ValueError(
                f"upserted-MinHash exercise needs a non-empty doc_id % "
                f"{DELETE_MOD} == {DELETE_RESIDUE} slice in {sf_dir} — "
                f"this corpus has none in the index"
            )

    def _load():
        out = load_minhash_index(spark, index_dir, expect_n=n, expect_fp=fp)
        meta = spark.read.parquet(f"{index_dir}/mh_meta.parquet").collect()[0]
        _, tombs, n_deleted = _meta_maint(meta)
        if tombs < 1 or int(meta.segments) < 1 or n_deleted != 0:
            raise ValueError(
                f"upserted MinHash artifact at {index_dir} lacks the "
                f"completed upsert shape (tombs={tombs}, "
                f"segments={meta.segments}, n_deleted={n_deleted}) — redo"
            )
        return out

    return cache_or_build(index_dir, "mh_meta.parquet", force, _build, _load)


def appended_minhash_index_for(
    spark: SparkSession,
    sf_dir: str,
    root: str | None = None,
    force: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """The ingest-loop exercise path behind ``dedup_incremental_appended``:
    build the signature artifact over the STANDING corpus (``doc_id %
    NEW_BATCH_MOD != 0``), then ``append_minhash_batch`` the new ~10%.
    Per-doc signatures are corpus-independent, so the appended artifact
    is EXACTLY the full build (pytest-pinned) and the probe shares
    ``dedup_incremental``'s oracle — the driver hash gate checks the
    append path end-to-end.  Family-scoped sibling ``…-app-mh``
    directory (the resumable build's rmtree must never touch another
    family's artifact); resumable via the same refuse-and-redo contract
    as ``appended_bm25_index_for``.
    """
    import shutil

    from pyspark.sql import functions as F

    from ..sources.tables import load_table, spread
    from .ann_index import cache_or_build, index_location

    base_dir, n, fp = index_location(spark, sf_dir, root, "documents")
    index_dir = base_dir + "-app-mh"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def _build():
        from ..queries.dedup_ops import NEW_BATCH_MOD

        shutil.rmtree(index_dir, ignore_errors=True)
        standing = spread(docs.filter(F.col("doc_id") % NEW_BATCH_MOD != 0))
        batch = spread(docs.filter(F.col("doc_id") % NEW_BATCH_MOD == 0))
        write_minhash_index(standing, index_dir, corpus_fp=fp)
        append_minhash_batch(spark, index_dir, batch, new_corpus_fp=fp)

    return cache_or_build(
        index_dir,
        "mh_meta.parquet",
        force,
        _build,
        lambda: load_minhash_index(spark, index_dir, expect_n=n, expect_fp=fp),
    )
