"""Build-once / probe-many IVF index artifact (VERDICT r8 item 4).

Every IVF-backed query (``ann_ivf``, ``ann_recall_report``,
``knn_classify_ann``, ``embedding_dedup_ann``) re-learns its Lloyd
centroids and re-runs the full-corpus assignment per invocation — fine
for a one-off, but at the sf100 sweep's 20M vectors that is 6-15 min of
redundant k-means per op, and at 100 TB nobody rebuilds an index per
query.  This module applies the ``bucketing.py`` write-once idea to ANN:
pay the build (Lloyd + the O(n·k) assignment pass) ONCE at ingest, store
the two index relations as parquet, and let every later query probe
straight off the files.

Artifact layout under ``index_dir``:

- ``centroids.parquet``    (cent_id, cv array<double>, ncv) — k rows,
  broadcastable at any k we'd set;
- ``assignments.parquet``  (cluster, vec_id, v, nv) — the top-2
  soft-assignment relation, repartitioned by cluster so a probe's
  cluster join reads co-located bucket files;
- ``meta.parquet``         1 row (n, k, dim) — n doubles as the staleness
  check (an index built over a different corpus size refuses to load).

The PROBE path downstream of the artifact is pure JVM (broadcast
centroid scoring → window rank → cluster join → fold cosine; pinned in
tests/test_ann_index.py: no MapInPandas/Arrow stage in the plan), so a
cluster can serve many query batches off one build without ever starting
a Python worker for the index.

Staleness contract: same as any database index — rebuild when the corpus
changes.  ``ivf_index_for`` keys the cached artifact on (corpus name,
row count) and validates BOTH the count and a file-metadata content
fingerprint on load (round 10; both checks are metadata-cheap — no scan),
so neither a regenerated fixture of different size NOR a same-size
in-place rewrite of the corpus files can ever be served a stale index.

Maintenance contract (round 10): artifacts are APPENDABLE.  Data
relations are segmented — ``assignments.parquet`` is segment 0 and
``append_ivf_batch`` adds ``assignments_seg{i}.parquet`` for each
ingested batch, assigning the new vectors under the FROZEN segment-0
centroids (the standard production IVF shape: FAISS ``add`` after
``train``).  The meta row is the commit pointer and is written LAST:
a killed append leaves an orphan segment directory that no load ever
reads (meta still says the old segment count) and that the retried
append simply overwrites — write-new-then-swap, no torn state served.
Rebuilds get the same discipline: every ``write_*`` deletes the meta
file FIRST, so a killed rebuild leaves a meta-less (→ rebuild on next
access) artifact, never a half-overwritten one served as fresh.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import warnings
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: default root for cached per-corpus index artifacts.
DEFAULT_INDEX_ROOT = str(Path(__file__).resolve().parents[2] / ".annindex")


def corpus_fingerprint(sf_dir: str, table: str) -> int:
    """Metadata-cheap content fingerprint of a corpus parquet directory:
    an md5 over the sorted (relative path, size, mtime_ns) triples of its
    data files, folded to a signed-BIGINT-safe int.  Narrows the hole
    row-count keying leaves open — an in-place rewrite that preserves n —
    without ever scanning data.  This is a size+mtime HEURISTIC, not a
    content hash: a normal rewrite changes mtime_ns (and a byte-identical
    rewrite merely triggers a safe, unneeded rebuild), but mtime-
    preserving tooling (``cp -p``, ``rsync -t``, tar restores) can
    replace a same-size file without tripping it — the residual corner a
    true content hash would cost a full scan to close.  Sidecars
    (_SUCCESS/.crc) and anything under a leftover staging directory
    (``_temporary/…``) are skipped — every path COMPONENT starting with
    ``_`` or ``.`` is ignored, not just the basename — so a re-commit of
    identical part files with identical stats fingerprints identically
    even when a crashed writer left staging debris behind.
    Handles both layouts: a Spark-written parquet DIRECTORY of part files
    and a single parquet FILE (the driver's testdata fixtures)."""
    p = Path(sf_dir) / f"{table}.parquet"
    acc = hashlib.md5()
    files = [p] if p.is_file() else sorted(p.rglob("*"))
    for f in files:
        if not f.is_file():
            continue
        rel_parts = f.relative_to(p.parent).parts if f != p else (f.name,)
        if any(part.startswith(("_", ".")) for part in rel_parts):
            continue
        st = f.stat()
        acc.update(
            f"{f.relative_to(p.parent)}:{st.st_size}:{st.st_mtime_ns}\n".encode()
        )
    return int.from_bytes(acc.digest()[:8], "big") % (2**62)


def _clear_meta(index_dir: str, meta_name: str) -> None:
    """Invalidate an artifact before overwriting its data relations: with
    the meta file gone, a concurrent or post-crash reader takes the
    rebuild path instead of loading half-overwritten data as fresh."""
    shutil.rmtree(f"{index_dir}/{meta_name}", ignore_errors=True)


def _gen_base_path(index_dir: str, base: str, gen: int) -> str:
    """Generation-versioned base path for a segmented relation.  Gen 0
    keeps the historical name (``{base}.parquet``) so pre-compaction-era
    artifacts load unchanged; each compaction rewrites the relation into
    ``{base}_g{gen}.parquet`` and swaps the meta pointer LAST — the old
    generation's files are never touched until the new meta commits."""
    if gen == 0:
        return f"{index_dir}/{base}.parquet"
    return f"{index_dir}/{base}_g{gen}.parquet"


def _seg_path(index_dir: str, base: str, gen: int, i: int) -> str:
    """Path of appended segment ``i`` within generation ``gen`` — segment
    names are generation-scoped so no write ever REUSES a path an older
    generation referenced (a post-compaction append cannot overwrite an
    orphan of the previous generation).  Note this protects against path
    reuse only: compact_index deletes the old generation's files shortly
    AFTER its meta commit, so readers that began streaming the old
    generation before the swap are not protected — single-writer
    maintenance with probes between operations is the supported
    discipline."""
    if gen == 0:
        return f"{index_dir}/{base}_seg{i}.parquet"
    return f"{index_dir}/{base}_g{gen}_seg{i}.parquet"


def _segment_paths(
    index_dir: str, base: str, segments: int, gen: int = 0
) -> list[str]:
    """Parquet paths for a segmented relation: the generation's base file
    plus every appended batch segment of that generation."""
    paths = [_gen_base_path(index_dir, base, gen)]
    paths += [_seg_path(index_dir, base, gen, i) for i in range(1, segments + 1)]
    return paths


def _meta_maint(meta) -> tuple[int, int, int]:
    """(gen, tombs, n_deleted) from a meta row, defaulting to the
    pre-maintenance era (0, 0, 0) for artifacts written before the
    compaction/tombstone columns existed — old artifacts stay loadable."""
    d = meta.asDict()
    return (
        int(d.get("gen") or 0),
        int(d.get("tombs") or 0),
        int(d.get("n_deleted") or 0),
    )


def _tombstone_path(index_dir: str, family: str, version: int) -> str:
    """Tombstone relation for a family within the (shared) artifact dir.
    Full rewrite per delete (the tombstone set is tiny next to the
    corpus), versioned so the meta pointer swap is atomic-in-effect —
    the same discipline as the BM25 termstats versions."""
    return f"{index_dir}/{family}_tombs_v{version}.parquet"


#: born_seg assigned to pre-upsert-era tombstones (key-only schema) at
#: load: far above any real segment index, so the versioned anti-join
#: kills the key in EVERY segment — exactly the legacy semantics.
LEGACY_BORN_SEG = 1 << 40


def _load_tombstones(
    spark: SparkSession, index_dir: str, family: str, tombs: int
) -> DataFrame | None:
    """The family's current tombstone relation, or None when none are
    outstanding.  Schema (round 12): (key, born_seg, counted) —
    ``born_seg`` is the artifact's segment count when the tombstone was
    written, so rows in LATER segments survive the anti-join (the
    supersession rule that makes upsert O(|batch|)); ``counted`` marks
    genuine deletions (tracked in meta.n_deleted) vs upsert
    supersessions (live count unchanged).  Key-only legacy relations are
    upgraded in-plan to (LEGACY_BORN_SEG, true) — kill everywhere,
    counted — so pre-upsert artifacts load unchanged."""
    if tombs == 0:
        return None
    df = spark.read.parquet(_tombstone_path(index_dir, family, tombs))
    if "born_seg" not in df.columns:
        df = df.withColumn(
            "born_seg", F.lit(LEGACY_BORN_SEG).cast("long")
        ).withColumn("counted", F.lit(True))
    return df


def _minus_tombstones(df: DataFrame, tomb_df: DataFrame | None, key: str):
    """Drop logically-deleted rows from a loaded index relation.  The
    tombstone set is broadcast (deletes are rare and tiny relative to the
    corpus), so the anti-join adds no shuffle to any probe plan.

    Two modes: when ``df`` carries a ``_seg`` provenance column (the
    :func:`_read_live` union-read), the anti-join is VERSIONED — a row
    dies only if its segment predates the tombstone (``_seg <=
    born_seg``), which is what lets an upsert re-add a superseded key in
    a later segment.  Without ``_seg`` the whole key dies (correct for
    delete-only tombstones, whose keys have no post-tombstone rows by
    the append guard)."""
    if tomb_df is None:
        return df
    if "_seg" in df.columns:
        t = tomb_df.select(F.col(key).alias("_tkey"), "born_seg")
        return df.join(
            F.broadcast(t),
            (F.col(key) == F.col("_tkey"))
            & (F.col("_seg") <= F.col("born_seg")),
            "left_anti",
        ).drop("_seg")
    return df.join(F.broadcast(tomb_df.select(key)), key, "left_anti")


def _read_live(
    spark: SparkSession,
    index_dir: str,
    base: str,
    segments: int,
    gen: int,
    tomb_df: DataFrame | None,
    key: str,
) -> DataFrame:
    """The LIVE rows of a segmented relation: segment union minus
    versioned tombstones.  The zero-tombstone fast path is a single
    multi-path parquet scan (no anti-join, no provenance column —
    unchanged from the pre-upsert engine); with tombstones outstanding,
    each segment scan is tagged with its index (a per-branch literal —
    still one narrow union of scans, no shuffle) so the broadcast
    anti-join can apply the supersession rule."""
    from functools import reduce

    paths = _segment_paths(index_dir, base, segments, gen)
    if tomb_df is None:
        return spark.read.parquet(*paths)
    parts = [
        spark.read.parquet(p).withColumn("_seg", F.lit(i).cast("long"))
        for i, p in enumerate(paths)
    ]
    return _minus_tombstones(reduce(DataFrame.unionByName, parts), tomb_df, key)


def _guard_not_tombstoned(
    batch_df: DataFrame, key: str, tomb_df: DataFrame | None,
    index_dir: str, family: str,
) -> None:
    """Append-path guard: a plain append must not reuse a tombstoned
    key — for a genuinely-deleted key the load-time anti-join would
    erase the re-added rows, and for an upsert-superseded key the
    re-add would duplicate the live replacement.  Re-adding an existing
    id is ``upsert_into_index``'s job (which writes the supersession
    tombstone itself and bypasses this guard), or legal after a
    compaction folds the tombstone away.  Cost is O(|batch|): the
    tombstone side broadcasts."""
    if tomb_df is None:
        return
    n = (
        batch_df.select(key).distinct()
        .join(F.broadcast(tomb_df.select(key)), key, "left_semi")
        .count()
    )
    if n:
        raise ValueError(
            f"append to {family} index at {index_dir}: {n} batch {key}s "
            f"are tombstoned — re-adding an existing key is an UPDATE: "
            f"use upsert_into_index (or compact_index first), or use "
            f"fresh ids"
        )


def _check_fresh(
    meta, index_dir: str, kind: str,
    expect_n: int | None, expect_fp: int | None,
    n_attr: str = "n",
) -> None:
    """Shared load-time staleness gate: row count + content fingerprint.
    Metas written before the fingerprint era lack the column — the row
    access raises, and cache_or_build upgrades the artifact by rebuild."""
    built_n = getattr(meta, n_attr)
    if expect_n is not None and built_n != expect_n:
        raise ValueError(
            f"stale {kind} index at {index_dir}: built over n={built_n}, "
            f"corpus now has n={expect_n} — rebuild"
        )
    if expect_fp is not None and meta.corpus_fp != expect_fp:
        raise ValueError(
            f"stale {kind} index at {index_dir}: corpus files changed "
            f"since the build (fingerprint {meta.corpus_fp} != "
            f"{expect_fp}) — rebuild"
        )


def index_location(
    spark: SparkSession, sf_dir: str, root: str | None, table: str
) -> tuple[str, int, int]:
    """(index_dir, n, corpus_fp): the shared per-corpus artifact directory
    under ``root`` (default ``<repo>/.annindex``; override with
    $SPARK_GRAFT_ANNINDEX for sweeps on other volumes), the table's row
    count, and its file-metadata content fingerprint — the load-time
    staleness pair.

    Keyed on (corpus dir BASENAME, an 8-hex digest of the corpus dir's
    ABSOLUTE path, row count of the indexed table): the path digest keeps
    two different corpora that happen to share a basename and a row
    count (e.g. /vol_a/sf001 vs /vol_b/sf001) from silently serving each
    other's artifacts.  Embedding-table artifacts (IVF/PQ/LSH) and
    document-table artifacts (MinHash/BM25) land in the same directory
    when the two tables have equal row counts (the fixtures' shape) and
    in sibling ``<name>-…`` directories otherwise — coexistence is a
    convenience, not a contract."""
    root = root or os.environ.get("SPARK_GRAFT_ANNINDEX", DEFAULT_INDEX_ROOT)
    n = spark.read.parquet(f"{sf_dir}/{table}.parquet").count()
    resolved = str(Path(sf_dir).resolve())
    digest = hashlib.md5(resolved.encode()).hexdigest()[:8]
    name = Path(resolved.rstrip("/")).name or "corpus"
    fp = corpus_fingerprint(sf_dir, table)
    return str(Path(root) / f"{name}-{digest}-n{n}"), n, fp


def cache_or_build(index_dir: str, meta_name: str, force: bool, build, load):
    """Shared cache-or-build gate: build when forced or the meta file is
    absent; otherwise load, and if the load fails for ANY reason —
    staleness/scheme-fingerprint ValueError, a meta schema from an older
    engine version, or a corrupt/partially-written artifact (killed mid-
    overwrite) — rebuild ONCE and re-load.  A rebuild is always safe,
    and a permanent load error would brick every registered probe query
    until someone hand-deleted the artifact.  A genuine code bug in the
    load path costs one wasted rebuild and then surfaces unchanged from
    the second load.  The swallowed load error is WARNED, not silent
    (ADVICE r9): a recovery rebuild and a routine cache miss must be
    distinguishable in operator logs."""
    if force or not Path(f"{index_dir}/{meta_name}").exists():
        build()
        return load()
    try:
        return load()
    except Exception as exc:
        warnings.warn(
            f"index artifact at {index_dir} ({meta_name}) failed to load "
            f"({type(exc).__name__}: {exc}) — rebuilding once",
            stacklevel=2,
        )
        build()
        return load()


def _write_ivf_meta(
    spark: SparkSession, index_dir: str,
    n: int, k: int, dim: int, corpus_fp: int | None, segments: int,
    gen: int = 0, tombs: int = 0, n_deleted: int = 0,
) -> None:
    meta = spark.createDataFrame(
        [(n, k, dim, corpus_fp, segments, gen, tombs, n_deleted)],
        "n BIGINT, k BIGINT, dim BIGINT, corpus_fp BIGINT, "
        "segments BIGINT, gen BIGINT, tombs BIGINT, n_deleted BIGINT",
    )
    meta.coalesce(1).write.mode("overwrite").parquet(
        f"{index_dir}/meta.parquet"
    )


def write_ivf_index(
    emb: DataFrame, index_dir: str, corpus_fp: int | None = None
) -> None:
    """Build the IVF index over a (vec_id, v, nv) relation and persist it.

    ``emb`` should be persisted by the caller if it is expensive to
    recompute (the build scans it for the count, the Lloyd sample, and
    the assignment pass).  Meta is written LAST (the commit marker) and
    deleted FIRST, so neither a killed build nor a killed rebuild can be
    loaded as fresh.
    """
    from ..queries.similarity_ops import EMB_DIM, _ivf_build

    _clear_meta(index_dir, "meta.parquet")
    cents, assigned, k = _ivf_build(emb)
    n = emb.count()
    # one writer task per cluster group: the probe-side join then reads
    # co-located files (and small k never explodes the file count).
    n_files = max(4, min(32, k // 32))
    (
        assigned.select("cluster", "vec_id", "v", "nv")
        .repartition(n_files, "cluster")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/assignments.parquet")
    )
    cents.coalesce(1).write.mode("overwrite").parquet(
        f"{index_dir}/centroids.parquet"
    )
    _write_ivf_meta(emb.sparkSession, index_dir, n, k, EMB_DIM, corpus_fp, 0)


def append_ivf_batch(
    spark: SparkSession,
    index_dir: str,
    batch_emb: DataFrame,
    new_corpus_fp: int | None = None,
    count_as_new: int | None = None,
    allow_superseded: bool = False,
) -> None:
    """Absorb an ingested batch into a standing IVF artifact WITHOUT a
    rebuild: assign the batch's (vec_id, v, nv) rows under the FROZEN
    segment-0 centroids (the FAISS train-once/add-many shape — Lloyd
    never re-runs, which is the whole point: at 100 TB the re-train is
    the cost an ingest loop cannot pay per batch) and persist them as a
    new assignment segment.  The meta row — row count, fingerprint,
    segment count — is rewritten LAST: a killed append leaves an orphan
    segment no load reads and the retry overwrites (write-new-then-swap).

    Callers pass ``new_corpus_fp`` = the corpus fingerprint AFTER the
    batch landed, so probes against the grown corpus see a fresh index.
    ``count_as_new`` overrides the meta.n increment (upsert_into_index
    passes the NET-new key count so replacing rows does not inflate the
    corpus-coverage check); ``allow_superseded`` skips the tombstone
    guard (upsert only: the caller just wrote the supersession
    tombstones this segment outlives).
    """
    from ..functions.vectorized import np_assign_clusters

    meta = spark.read.parquet(f"{index_dir}/meta.parquet").collect()[0]
    gen, tombs, n_deleted = _meta_maint(meta)
    if not allow_superseded:
        _guard_not_tombstoned(
            batch_emb, "vec_id",
            _load_tombstones(spark, index_dir, "ivf", tombs), index_dir,
            "ivf",
        )
    seg = int(meta.segments) + 1
    cents = spark.read.parquet(f"{index_dir}/centroids.parquet")
    assigned = np_assign_clusters(batch_emb, cents, top=2, carry_vectors=True)
    (
        assigned.select("cluster", "vec_id", "v", "nv")
        .write.mode("overwrite")
        .parquet(_seg_path(index_dir, "assignments", gen, seg))
    )
    batch_n = batch_emb.count() if count_as_new is None else count_as_new
    _write_ivf_meta(
        spark, index_dir,
        int(meta.n) + batch_n, int(meta.k), int(meta.dim),
        new_corpus_fp if new_corpus_fp is not None else meta.corpus_fp,
        seg, gen=gen, tombs=tombs, n_deleted=n_deleted,
    )


def load_ivf_index(
    spark: SparkSession,
    index_dir: str,
    expect_n: int | None = None,
    expect_fp: int | None = None,
) -> tuple[DataFrame, DataFrame, int]:
    """Load a written index as the (cents, assigned, k) triple the search
    paths take.  ``expect_n`` (the current corpus row count) and
    ``expect_fp`` (its file fingerprint) make the load refuse a stale
    artifact instead of silently probing it.  The assignment relation is
    the UNION of the current generation's base and every appended batch
    segment, minus any tombstoned vec_ids (broadcast anti-join)."""
    meta = spark.read.parquet(f"{index_dir}/meta.parquet").collect()[0]
    _check_fresh(meta, index_dir, "IVF", expect_n, expect_fp)
    gen, tombs, _ = _meta_maint(meta)
    cents = spark.read.parquet(f"{index_dir}/centroids.parquet")
    assigned = _read_live(
        spark, index_dir, "assignments", int(meta.segments), gen,
        _load_tombstones(spark, index_dir, "ivf", tombs), "vec_id",
    )
    return cents, assigned, int(meta.k)


def write_pq_index(
    emb: DataFrame, index_dir: str, corpus_fp: int | None = None
) -> None:
    """Build the PQ index over a (vec_id, v, nv) relation and persist it:
    the per-subspace codebooks plus the ENCODED corpus (PQ_M uint8-range
    codes per vector — the 64× compression that lets a 100 TB embedding
    corpus live in cluster memory).  The encode pass — the O(n·k) term —
    is paid here once; probes stream the 8-byte-code relation only."""
    from ..functions.vectorized import np_pq_encode, pq_train_codebook
    from ..queries.similarity_ops import PQ_K, PQ_M

    _clear_meta(index_dir, "pq_meta.parquet")
    cb_path = f"{index_dir}/pq_codebook.parquet"
    (
        pq_train_codebook(emb, PQ_M, PQ_K)
        .select("sub", "code", "center")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(cb_path)
    )
    np_pq_encode(emb, cb_path).write.mode("overwrite").parquet(
        f"{index_dir}/pq_codes.parquet"
    )
    n = emb.count()
    _write_pq_meta(emb.sparkSession, index_dir, n, corpus_fp, 0)


def _write_pq_meta(
    spark: SparkSession, index_dir: str,
    n: int, corpus_fp: int | None, segments: int,
    gen: int = 0, tombs: int = 0, n_deleted: int = 0,
) -> None:
    from ..queries.similarity_ops import PQ_K, PQ_M

    meta = spark.createDataFrame(
        [(n, PQ_M, PQ_K, corpus_fp, segments, gen, tombs, n_deleted)],
        "n BIGINT, m BIGINT, k BIGINT, corpus_fp BIGINT, segments BIGINT, "
        "gen BIGINT, tombs BIGINT, n_deleted BIGINT",
    )
    meta.coalesce(1).write.mode("overwrite").parquet(
        f"{index_dir}/pq_meta.parquet"
    )


def append_pq_batch(
    spark: SparkSession,
    index_dir: str,
    batch_emb: DataFrame,
    new_corpus_fp: int | None = None,
    count_as_new: int | None = None,
    allow_superseded: bool = False,
) -> None:
    """Absorb an ingest batch into a standing PQ artifact: encode ONLY
    the batch under the FROZEN per-subspace codebooks (codebooks are the
    trained model; codes are per-row and corpus-independent given the
    model — the same train-once/add-many contract as the IVF append) and
    land the 8-byte code rows as a new segment.  Meta commits last.
    ``count_as_new``/``allow_superseded``: see :func:`append_ivf_batch`
    (the upsert hooks)."""
    from ..functions.vectorized import np_pq_encode

    meta = spark.read.parquet(f"{index_dir}/pq_meta.parquet").collect()[0]
    gen, tombs, n_deleted = _meta_maint(meta)
    if not allow_superseded:
        _guard_not_tombstoned(
            batch_emb, "vec_id",
            _load_tombstones(spark, index_dir, "pq", tombs), index_dir, "pq",
        )
    seg = int(meta.segments) + 1
    np_pq_encode(batch_emb, f"{index_dir}/pq_codebook.parquet").write.mode(
        "overwrite"
    ).parquet(_seg_path(index_dir, "pq_codes", gen, seg))
    _write_pq_meta(
        spark, index_dir,
        int(meta.n)
        + (batch_emb.count() if count_as_new is None else count_as_new),
        new_corpus_fp if new_corpus_fp is not None else meta.corpus_fp,
        seg, gen=gen, tombs=tombs, n_deleted=n_deleted,
    )


def load_pq_index(
    spark: SparkSession,
    index_dir: str,
    expect_n: int | None = None,
    expect_fp: int | None = None,
) -> tuple[str, DataFrame]:
    """(codebook_path, codes relation — the union of the current
    generation's base and every appended batch, minus tombstoned vec_ids)
    with the same staleness contract as :func:`load_ivf_index`."""
    meta = spark.read.parquet(f"{index_dir}/pq_meta.parquet").collect()[0]
    _check_fresh(meta, index_dir, "PQ", expect_n, expect_fp)
    gen, tombs, _ = _meta_maint(meta)
    return (
        f"{index_dir}/pq_codebook.parquet",
        _read_live(
            spark, index_dir, "pq_codes", int(meta.segments), gen,
            _load_tombstones(spark, index_dir, "pq", tombs), "vec_id",
        ),
    )


def _persisted_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISK_ONLY (vec_id, v, nv) relation for index builds — corpus-scale
    550-byte vector rows never go to heap (the ann_recall_report sf100
    OOM rule)."""
    from pyspark.storagelevel import StorageLevel

    from ..caching import tracked_persist
    from ..queries.similarity_ops import _emb_with_norm

    return tracked_persist(
        _emb_with_norm(spark, sf_dir).select("vec_id", "v", "nv"),
        level=StorageLevel.DISK_ONLY,
    )


def pq_index_for(
    spark: SparkSession,
    sf_dir: str,
    root: str | None = None,
    force: bool = False,
) -> tuple[str, DataFrame]:
    """Cache-or-build PQ index for ``sf_dir``'s embeddings — shares the
    per-corpus artifact directory with :func:`ivf_index_for` (one ingest
    directory per corpus; IVF and PQ files coexist independently)."""
    index_dir, n, fp = index_location(spark, sf_dir, root, "embeddings")
    return cache_or_build(
        index_dir,
        "pq_meta.parquet",
        force,
        lambda: write_pq_index(
            _persisted_emb(spark, sf_dir), index_dir, corpus_fp=fp
        ),
        lambda: load_pq_index(spark, index_dir, expect_n=n, expect_fp=fp),
    )


def appended_pq_index_for(
    spark: SparkSession,
    sf_dir: str,
    root: str | None = None,
    force: bool = False,
) -> tuple[str, DataFrame]:
    """Ingest-loop exercise path behind ``ann_pq_appended``: train the
    codebooks over the standing 90%, then ``append_pq_batch`` the rest
    under the FROZEN codebooks (codes are per-row given the model, so
    segment union covers the full corpus).  Family-scoped ``…-app-pq``
    dir; refuse-and-redo resumability."""
    base_dir, n, fp = index_location(spark, sf_dir, root, "embeddings")
    index_dir = base_dir + "-app-pq"

    def _build():
        # persist inside the build closure: a cache-hit load must not
        # register a tracked persist it never uses (ADVICE r10).
        emb = _persisted_emb(spark, sf_dir)
        shutil.rmtree(index_dir, ignore_errors=True)
        write_pq_index(emb.filter(F.col("vec_id") % 10 != 7), index_dir,
                       corpus_fp=fp)
        append_pq_batch(
            spark, index_dir, emb.filter(F.col("vec_id") % 10 == 7),
            new_corpus_fp=fp,
        )

    return cache_or_build(
        index_dir,
        "pq_meta.parquet",
        force,
        _build,
        lambda: load_pq_index(spark, index_dir, expect_n=n, expect_fp=fp),
    )


def appended_lsh_index_for(
    spark: SparkSession,
    sf_dir: str,
    root: str | None = None,
    force: bool = False,
) -> DataFrame:
    """Ingest-loop exercise path behind ``ann_lsh_appended``: sign the
    standing 90% at build, ``append_lsh_batch`` the rest under the same
    fingerprinted hyperplanes — segment union ≡ full rebuild EXACTLY
    (per-row signatures; pinned in tests/test_index_maintenance.py), so
    the probe output is identical to ``ann_lsh_indexed``'s.  Family-
    scoped ``…-app-lsh`` dir; refuse-and-redo resumability."""
    base_dir, n, fp = index_location(spark, sf_dir, root, "embeddings")
    index_dir = base_dir + "-app-lsh"

    def _build():
        emb = _persisted_emb(spark, sf_dir)
        shutil.rmtree(index_dir, ignore_errors=True)
        write_lsh_index(emb.filter(F.col("vec_id") % 10 != 7), index_dir,
                        corpus_fp=fp)
        append_lsh_batch(
            spark, index_dir, emb.filter(F.col("vec_id") % 10 == 7),
            new_corpus_fp=fp,
        )

    return cache_or_build(
        index_dir,
        "lsh_meta.parquet",
        force,
        _build,
        lambda: load_lsh_index(spark, index_dir, expect_n=n, expect_fp=fp),
    )


def _hyperplane_checksum(planes: list[list[int]]) -> int:
    """Order-sensitive integer fingerprint of the ±1 hyperplane matrix —
    cheap, deterministic, and any seed/geometry change flips it."""
    acc = 0
    for i, row in enumerate(planes):
        for j, v in enumerate(row):
            acc = (acc * 1_000_003 + (i * len(row) + j + 2) * v) % (2**61 - 1)
    return acc


def write_lsh_index(
    emb: DataFrame, index_dir: str, corpus_fp: int | None = None
) -> None:
    """Build the sign-random-projection band relation over a (vec_id, v,
    nv) relation and persist it — the signature matmul (the only Arrow
    stage of the LSH path) is paid here once; probes are pure JVM."""
    from ..functions.vectorized import np_sign_bands
    from ..queries.similarity_ops import LSH_BAND_BITS, LSH_NBITS, _hyperplanes

    _clear_meta(index_dir, "lsh_meta.parquet")
    planes = _hyperplanes()
    (
        np_sign_bands(emb, planes, LSH_BAND_BITS)
        .repartition("band", "bkey")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/lsh_bands.parquet")
    )
    _write_lsh_meta(emb.sparkSession, index_dir, emb.count(), corpus_fp, 0)


def _write_lsh_meta(
    spark: SparkSession, index_dir: str,
    n: int, corpus_fp: int | None, segments: int,
    gen: int = 0, tombs: int = 0, n_deleted: int = 0,
) -> None:
    from ..queries.similarity_ops import LSH_BAND_BITS, LSH_NBITS, _hyperplanes

    meta = spark.createDataFrame(
        [(
            n, LSH_NBITS, LSH_BAND_BITS,
            _hyperplane_checksum(_hyperplanes()), corpus_fp, segments,
            gen, tombs, n_deleted,
        )],
        "n BIGINT, nbits BIGINT, band_bits BIGINT, plane_sum BIGINT, "
        "corpus_fp BIGINT, segments BIGINT, gen BIGINT, tombs BIGINT, "
        "n_deleted BIGINT",
    )
    meta.coalesce(1).write.mode("overwrite").parquet(
        f"{index_dir}/lsh_meta.parquet"
    )


def append_lsh_batch(
    spark: SparkSession,
    index_dir: str,
    batch_emb: DataFrame,
    new_corpus_fp: int | None = None,
    count_as_new: int | None = None,
    allow_superseded: bool = False,
) -> None:
    """Absorb an ingest batch into a standing LSH artifact: sign ONLY the
    batch under the FIXED hyperplanes (the plane matrix is deterministic
    engine geometry, fingerprinted in the meta — per-row signatures are
    corpus-independent, so segment union ≡ full rebuild EXACTLY, same
    argument as the MinHash append) and land the band rows as a new
    segment.  Meta commits last (write-new-then-swap)."""
    from ..functions.vectorized import np_sign_bands
    from ..queries.similarity_ops import LSH_BAND_BITS, _hyperplanes

    meta = spark.read.parquet(f"{index_dir}/lsh_meta.parquet").collect()[0]
    planes = _hyperplanes()
    if meta.plane_sum != _hyperplane_checksum(planes):
        raise ValueError(
            f"LSH index at {index_dir} was built under different "
            f"hyperplanes — rebuild, do not append"
        )
    gen, tombs, n_deleted = _meta_maint(meta)
    if not allow_superseded:
        _guard_not_tombstoned(
            batch_emb, "vec_id",
            _load_tombstones(spark, index_dir, "lsh", tombs), index_dir,
            "lsh",
        )
    seg = int(meta.segments) + 1
    (
        np_sign_bands(batch_emb, planes, LSH_BAND_BITS)
        .repartition("band", "bkey")
        .write.mode("overwrite")
        .parquet(_seg_path(index_dir, "lsh_bands", gen, seg))
    )
    _write_lsh_meta(
        spark, index_dir,
        int(meta.n)
        + (batch_emb.count() if count_as_new is None else count_as_new),
        new_corpus_fp if new_corpus_fp is not None else meta.corpus_fp,
        seg, gen=gen, tombs=tombs, n_deleted=n_deleted,
    )


def load_lsh_index(
    spark: SparkSession,
    index_dir: str,
    expect_n: int | None = None,
    expect_fp: int | None = None,
) -> DataFrame:
    """The (vec_id, band, bkey) band relation, refusing stale artifacts:
    corpus-size/content mismatch AND hyperplane/geometry mismatch raise."""
    from ..queries.similarity_ops import LSH_BAND_BITS, LSH_NBITS, _hyperplanes

    meta = spark.read.parquet(f"{index_dir}/lsh_meta.parquet").collect()[0]
    _check_fresh(meta, index_dir, "LSH", expect_n, expect_fp)
    current = (LSH_NBITS, LSH_BAND_BITS, _hyperplane_checksum(_hyperplanes()))
    if (meta.nbits, meta.band_bits, meta.plane_sum) != current:
        raise ValueError(
            f"LSH index at {index_dir} was built under different "
            f"hyperplanes/geometry (nbits={meta.nbits}, "
            f"band_bits={meta.band_bits}) — rebuild"
        )
    gen, tombs, _ = _meta_maint(meta)
    return _read_live(
        spark, index_dir, "lsh_bands", int(meta.segments), gen,
        _load_tombstones(spark, index_dir, "lsh", tombs), "vec_id",
    )


def lsh_index_for(
    spark: SparkSession,
    sf_dir: str,
    root: str | None = None,
    force: bool = False,
) -> DataFrame:
    """Cache-or-build, sharing the per-corpus ingest directory with the
    IVF/PQ (and MinHash) artifacts.  A hyperplane/geometry fingerprint
    mismatch rebuilds automatically (cache_or_build) rather than erroring
    until someone deletes the artifact."""
    index_dir, n, fp = index_location(spark, sf_dir, root, "embeddings")
    return cache_or_build(
        index_dir,
        "lsh_meta.parquet",
        force,
        lambda: write_lsh_index(
            _persisted_emb(spark, sf_dir), index_dir, corpus_fp=fp
        ),
        lambda: load_lsh_index(spark, index_dir, expect_n=n, expect_fp=fp),
    )


def ivf_index_for(
    spark: SparkSession,
    sf_dir: str,
    root: str | None = None,
    force: bool = False,
) -> tuple[DataFrame, DataFrame, int]:
    """Cache-or-build: the index artifact for ``sf_dir``'s embeddings.

    Keyed via :func:`index_location`.  First call per corpus pays the
    build; every later call — including other queries and other sessions
    — loads the parquet relations and probes without a Lloyd stage.
    """
    index_dir, n, fp = index_location(spark, sf_dir, root, "embeddings")
    return cache_or_build(
        index_dir,
        "meta.parquet",
        force,
        lambda: write_ivf_index(
            _persisted_emb(spark, sf_dir), index_dir, corpus_fp=fp
        ),
        lambda: load_ivf_index(spark, index_dir, expect_n=n, expect_fp=fp),
    )


def appended_ivf_index_for(
    spark: SparkSession,
    sf_dir: str,
    root: str | None = None,
    force: bool = False,
) -> tuple[DataFrame, DataFrame, int]:
    """The ingest-loop exercise path behind ``ann_ivf_appended``: train
    the IVF index over the STANDING corpus (``vec_id % 10 != 7`` — the
    same ~10% batch FRACTION as the document-side maintenance ops, but
    deliberately a DIFFERENT residue than their NEW_BATCH_MOD residue-0
    split; see the residue-7 comment in ``_build``), then
    ``append_ivf_batch`` the new vectors under the frozen centroids.
    The loaded assignment relation covers the FULL corpus (pinned in
    tests/test_index_maintenance.py: the appended segment equals a direct
    frozen-centroid assignment of the batch), so probes serve the grown
    corpus without a re-train — FAISS's train-once/add-many, as parquet.
    Family-scoped sibling ``…-app-ivf`` directory (the resumable build's
    rmtree must never touch another family's artifact — a shared -app dir
    made the minhash and bm25 appended builds wipe each other on every
    cache miss, caught as a consistent 12-14 s rebuild in the round-10
    bench); refuse-and-redo resumability."""
    base_dir, n, fp = index_location(spark, sf_dir, root, "embeddings")
    index_dir = base_dir + "-app-ivf"

    def _build():
        emb = _persisted_emb(spark, sf_dir)
        shutil.rmtree(index_dir, ignore_errors=True)
        # batch residue 7, not 0: Lloyd seeds centroids at vec_id %
        # cent_mod == 0 — residue-0 batches would remove EVERY seed from
        # the standing corpus whenever 10 | cent_mod (empty centroid
        # model, caught by the round-10 smoke); residue 7 can never
        # annihilate the seed set (vec_id 0 is always a seed and ≡ 0).
        standing = emb.filter(F.col("vec_id") % 10 != 7)
        batch = emb.filter(F.col("vec_id") % 10 == 7)
        write_ivf_index(standing, index_dir, corpus_fp=fp)
        append_ivf_batch(spark, index_dir, batch, new_corpus_fp=fp)

    return cache_or_build(
        index_dir,
        "meta.parquet",
        force,
        _build,
        lambda: load_ivf_index(spark, index_dir, expect_n=n, expect_fp=fp),
    )


# ---------------------------------------------------------------------------
# model-refresh policy: recall probe + maybe_retrain (round 12 —
# VERDICT r11 "what's missing" #2)
# ---------------------------------------------------------------------------

#: default retrain trigger: measured probe recall@k below this fraction
#: of the exact answer.  Sits between the families' healthy measured
#: range (0.92-0.98 across fixtures) and the pinned quality floors —
#: fire only on genuine model decay, never on normal approximation.
ANN_RECALL_FLOOR = 0.75
#: deterministic probe sample size: the lowest vec_ids of the live
#: corpus.  Bounded — the probe's exact answer costs ONE corpus scan ×
#: RETRAIN_PROBE_QUERIES dot products, an observability query.
RETRAIN_PROBE_QUERIES = 16


def ann_recall_probe(
    spark: SparkSession,
    index_dir: str,
    family: str,
    emb: DataFrame,
    k: int | None = None,
    n_queries: int = RETRAIN_PROBE_QUERIES,
) -> float:
    """Measured recall@k of a standing IVF/PQ artifact against the exact
    cosine top-k over ``emb`` — the CURRENT live corpus — on a
    deterministic query sample (the ``n_queries`` lowest vec_ids).

    This is the semantic staleness check the metadata gates cannot see:
    the count/fingerprint checks prove the artifact covers the corpus's
    FILES, but a frozen model (IVF centroids, PQ codebooks — frozen at
    build by design) silently decays as append/upsert waves drift the
    distribution away from what it was trained on.  Cost: one corpus
    scan for the exact answer plus one ordinary artifact probe.
    """
    from pyspark.sql import Window

    from ..functions.rounding import rn
    from ..functions.vectors import cosine_from_parts, dot
    from ..queries.similarity_ops import MIN_NPROBE, TOPK_K, _ivf_search

    if k is None:
        k = TOPK_K
    queries = emb.orderBy("vec_id").limit(n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            rn(
                cosine_from_parts(
                    dot(F.col("qv"), F.col("v")), F.col("nq"), F.col("nv")
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    exact = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id")
    )

    if family == "ivf":
        cents, assigned, kk = load_ivf_index(spark, index_dir)
        approx = _ivf_search(
            queries, cents, assigned, max(MIN_NPROBE, kk // 5)
        ).select("query_id", "neighbor_id")
    elif family == "pq":
        from ..functions.vectorized import np_pq_scan, write_pq_queries
        from ..queries.similarity_ops import PQ_TOP_C, _pq_rank

        cb_path, codes = load_pq_index(spark, index_dir)
        cand = np_pq_scan(codes, cb_path, write_pq_queries(queries), PQ_TOP_C)
        approx = _pq_rank(emb, queries, cand).select(
            "query_id", "neighbor_id"
        )
    else:
        raise ValueError(
            f"ann_recall_probe: family {family!r} has no trained model to "
            f"decay — LSH hyperplanes are data-independent engine geometry "
            f"(rebuild only on a deliberate geometry change); MinHash/BM25 "
            f"are exact"
        )
    row = (
        exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
        .agg(F.count("*").alias("hits"))
        .crossJoin(exact.agg(F.count("*").alias("total")))
        .collect()[0]
    )
    return float(row.hits) / float(row.total) if row.total else 1.0


def maybe_retrain(
    spark: SparkSession,
    index_dir: str,
    family: str,
    emb: DataFrame,
    min_recall: float = ANN_RECALL_FLOOR,
    k: int | None = None,
    n_queries: int = RETRAIN_PROBE_QUERIES,
    corpus_fp: int | None = None,
) -> dict:
    """The model-refresh POLICY hook completing the lifecycle for the
    trained ANN families (IVF centroids, PQ codebooks): probe the
    artifact's recall against the current live corpus and, when it has
    decayed below ``min_recall``, RETRAIN — a full ``write_*_index``
    over ``emb``, relearning the model and re-encoding the corpus, with
    maintenance counters reset (a fresh generation-0 artifact).

    This is the companion to ``maybe_compact``: compaction bounds the
    PHYSICAL debt of an ingest loop (segments, tombstones); this bounds
    the SEMANTIC debt (frozen-model drift) — call it on the same cadence
    as corpus-fingerprint changes, e.g. after every N append/upsert
    waves.  Cheap when it declines: one probe (a corpus scan + an
    artifact probe).  ``corpus_fp`` defaults to the standing meta's
    fingerprint, so the retrained artifact stays valid for the same
    corpus files; pass the current fingerprint when the corpus moved.
    ``emb`` should be persisted by the caller (the probe and a retrain
    both scan it).

    Returns {"recall", "retrained"} (+ "recall_after" when retrained,
    measured with the same probe so the caller can alert if a retrain
    did not help — distribution pathologies a rebuild cannot fix).
    """
    recall = ann_recall_probe(
        spark, index_dir, family, emb, k=k, n_queries=n_queries
    )
    if recall >= min_recall:
        return {"recall": recall, "retrained": False}
    if corpus_fp is None:
        meta_file = "meta.parquet" if family == "ivf" else "pq_meta.parquet"
        meta = spark.read.parquet(f"{index_dir}/{meta_file}").collect()[0]
        corpus_fp = meta.corpus_fp
    if family == "ivf":
        write_ivf_index(emb, index_dir, corpus_fp=corpus_fp)
    else:
        write_pq_index(emb, index_dir, corpus_fp=corpus_fp)
    recall_after = ann_recall_probe(
        spark, index_dir, family, emb, k=k, n_queries=n_queries
    )
    return {
        "recall": recall, "retrained": True, "recall_after": recall_after,
    }


def _maintained_vector_lifecycle(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    family: str,
    fp: int,
    write_fn,
    append_fn,
) -> None:
    """Shared build half of the maintained vector-family exercises:
    standing build (vec_id % 10 != 7) → append the rest under the frozen
    model → delete the vec_id % DELETE_MOD == DELETE_RESIDUE slice →
    compact.  Raises loudly on a corpus with no delete-slice members
    (a silent empty delete would loop the refuse-and-redo load gate)."""
    from .index_maintenance import (
        DELETE_MOD,
        DELETE_RESIDUE,
        compact_index,
        delete_from_index,
    )

    emb = _persisted_emb(spark, sf_dir)
    shutil.rmtree(index_dir, ignore_errors=True)
    write_fn(emb.filter(F.col("vec_id") % 10 != 7), index_dir, corpus_fp=fp)
    append_fn(
        spark, index_dir, emb.filter(F.col("vec_id") % 10 == 7),
        new_corpus_fp=fp,
    )
    deleted = delete_from_index(
        spark, index_dir, family,
        emb.filter(F.col("vec_id") % DELETE_MOD == DELETE_RESIDUE)
        .select("vec_id"),
    )
    if deleted == 0:
        raise ValueError(
            f"maintained-{family} exercise needs a non-empty vec_id % "
            f"{DELETE_MOD} == {DELETE_RESIDUE} slice in {sf_dir} — "
            f"this corpus has none in the index"
        )
    compact_index(spark, index_dir, family)


def _maintained_load_gate(spark, index_dir: str, meta_file: str, out):
    """Refuse a mid-lifecycle maintained artifact: the completed
    exercise always ends compacted (gen ≥ 1), tombstones folded, with
    deletions recorded."""
    meta = spark.read.parquet(f"{index_dir}/{meta_file}").collect()[0]
    gen, tombs, n_deleted = _meta_maint(meta)
    if gen < 1 or tombs != 0 or n_deleted == 0:
        raise ValueError(
            f"maintained artifact at {index_dir} is mid-lifecycle "
            f"(gen={gen}, tombs={tombs}, n_deleted={n_deleted}) — redo"
        )
    return out


def maintained_lsh_index_for(
    spark: SparkSession,
    sf_dir: str,
    root: str | None = None,
    force: bool = False,
) -> DataFrame:
    """The full maintenance lifecycle behind ``ann_lsh_maintained``:
    build → append (fixed fingerprinted hyperplanes) → tombstone the
    ``vec_id % 17 == 3`` slice → compact.  Per-row signatures make every
    step ≡ a rebuild over the live vectors EXACTLY (pinned in
    tests/test_index_compaction.py).  Family-scoped ``…-mnt-lsh`` dir;
    refuse-and-redo resumability."""
    base_dir, n, fp = index_location(spark, sf_dir, root, "embeddings")
    index_dir = base_dir + "-mnt-lsh"

    def _build():
        _maintained_vector_lifecycle(
            spark, sf_dir, index_dir, "lsh", fp,
            write_lsh_index, append_lsh_batch,
        )

    def _load():
        return _maintained_load_gate(
            spark, index_dir, "lsh_meta.parquet",
            load_lsh_index(spark, index_dir, expect_n=n, expect_fp=fp),
        )

    return cache_or_build(index_dir, "lsh_meta.parquet", force, _build, _load)


def maintained_pq_index_for(
    spark: SparkSession,
    sf_dir: str,
    root: str | None = None,
    force: bool = False,
) -> tuple[str, DataFrame]:
    """The full maintenance lifecycle behind ``ann_pq_maintained``:
    codebooks train on the standing 90% and FREEZE; the batch encodes
    under them; the delete slice tombstones; compaction folds — the
    surviving code relation ≡ a frozen-codebook encode of the live
    vectors (pinned in tests/test_index_compaction.py).  Family-scoped
    ``…-mnt-pq`` dir; refuse-and-redo resumability."""
    base_dir, n, fp = index_location(spark, sf_dir, root, "embeddings")
    index_dir = base_dir + "-mnt-pq"

    def _build():
        _maintained_vector_lifecycle(
            spark, sf_dir, index_dir, "pq", fp,
            write_pq_index, append_pq_batch,
        )

    def _load():
        return _maintained_load_gate(
            spark, index_dir, "pq_meta.parquet",
            load_pq_index(spark, index_dir, expect_n=n, expect_fp=fp),
        )

    return cache_or_build(index_dir, "pq_meta.parquet", force, _build, _load)


def maintained_ivf_index_for(
    spark: SparkSession,
    sf_dir: str,
    root: str | None = None,
    force: bool = False,
) -> tuple[DataFrame, DataFrame, int]:
    """The FULL maintenance lifecycle behind ``ann_ivf_maintained``:
    train over the standing corpus (``vec_id % 10 != 7``, the appended
    exercise's split), ``append_ivf_batch`` the rest under the FROZEN
    centroids, ``delete_from_index`` the ``vec_id % DELETE_MOD ==
    DELETE_RESIDUE`` slice, then ``compact_index`` — the FAISS
    train/add/remove_ids cycle, as parquet relations.  The loaded
    assignment relation is pytest-pinned EXACTLY equal to a direct
    frozen-centroid assignment of the surviving vectors
    (tests/test_index_compaction.py), so probes serve the edited corpus
    with no re-train.  Family-scoped ``…-mnt-ivf`` dir; the load refuses
    a mid-lifecycle artifact (refuse-and-redo resumability)."""
    base_dir, n, fp = index_location(spark, sf_dir, root, "embeddings")
    index_dir = base_dir + "-mnt-ivf"

    def _build():
        # same residue-7 batch split as appended_ivf_index_for (residue 0
        # would annihilate the Lloyd seed set — see that function).
        _maintained_vector_lifecycle(
            spark, sf_dir, index_dir, "ivf", fp,
            write_ivf_index, append_ivf_batch,
        )

    def _load():
        return _maintained_load_gate(
            spark, index_dir, "meta.parquet",
            load_ivf_index(spark, index_dir, expect_n=n, expect_fp=fp),
        )

    return cache_or_build(index_dir, "meta.parquet", force, _build, _load)


#: sidecar recording the drift-then-retrain exercise's measured scalars;
#: written LAST (after the retrain completes) so it doubles as the
#: commit marker — a killed exercise leaves no sidecar and the next
#: access redoes the whole scenario from scratch.
RETRAIN_SIDECAR = "retrain_report.parquet"


def moved_emb(emb: DataFrame) -> DataFrame:
    """The drift scenario's re-embedded corpus: deterministic per-id
    sign flips (component i of vector ``vec_id`` negates when
    ``(vec_id + i)`` is even) move EVERY vector while norms — and the
    corpus files, and thus the fingerprint/count staleness gates — stay
    put.  Exactly the staleness the metadata checks are blind to: a
    re-embedding with a new encoder.  Same recipe as
    tests/test_ann_retrain.py and tools/stress_retrain.py."""
    return emb.select(
        "vec_id",
        F.transform(
            "v",
            lambda x, i: F.when((F.col("vec_id") + i) % 2 == 0, -x)
            .otherwise(x),
        ).alias("v"),
        "nv",
    )


def retrained_index_for(
    spark: SparkSession,
    sf_dir: str,
    family: str,
    root: str | None = None,
    force: bool = False,
):
    """The drift-then-retrain exercise behind ``ann_retrain_report``:
    train the ``family`` model ("ivf" | "pq") over the corpus
    embeddings, re-embed the corpus (``moved_emb`` — metadata gates
    can't see it), measure the collapsed recall, and let
    ``maybe_retrain`` relearn the model and re-encode — then sidecar-
    commit the measured scalars so cache-hit loads replay the same
    report row.  The artifact this leaves behind is the RETRAINED one
    (model learned over the moved corpus), which the report live-probes
    against the moved corpus — the recorded flags and the artifact
    content are checked together.

    Family-scoped ``…-rtn-{family}`` dir (never the registered
    per-corpus dirs — the -msw rule).  Refuse-and-redo resumability:
    the sidecar is written last, a ``retrained=False`` sidecar (drift
    that failed to trip the floor — a broken scenario) refuses to load,
    and ``cache_or_build`` redoes the exercise once on any load error.

    Returns ``(index_dir, sidecar_row, index_relations)``.
    """
    if family not in ("ivf", "pq"):
        raise ValueError(
            f"retrained_index_for: family {family!r} has no trained model "
            f"to drift (see ann_recall_probe)"
        )
    base_dir, n, fp = index_location(spark, sf_dir, root, "embeddings")
    index_dir = f"{base_dir}-rtn-{family}"
    writer = write_ivf_index if family == "ivf" else write_pq_index
    loader = load_ivf_index if family == "ivf" else load_pq_index

    def _build():
        from pyspark.storagelevel import StorageLevel

        from ..caching import tracked_persist

        emb = _persisted_emb(spark, sf_dir)
        moved = tracked_persist(
            moved_emb(emb), level=StorageLevel.DISK_ONLY
        )
        shutil.rmtree(index_dir, ignore_errors=True)
        writer(emb, index_dir, corpus_fp=fp)
        # maybe_retrain's own probe IS the decay measurement (its
        # "recall" key) — no separate ann_recall_probe pass needed.
        res = maybe_retrain(spark, index_dir, family, moved, corpus_fp=fp)
        spark.createDataFrame(
            [(
                family,
                float(res["recall"]),
                bool(res["retrained"]),
                float(res.get("recall_after", res["recall"])),
            )],
            "family STRING, recall_decayed DOUBLE, retrained BOOLEAN, "
            "recall_after DOUBLE",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{index_dir}/{RETRAIN_SIDECAR}"
        )

    def _load():
        side = spark.read.parquet(
            f"{index_dir}/{RETRAIN_SIDECAR}"
        ).collect()[0]
        if not side.retrained:
            raise ValueError(
                f"retrain exercise at {index_dir} never tripped the "
                f"recall floor (decayed={side.recall_decayed}) — redo"
            )
        return side, loader(spark, index_dir, expect_n=n, expect_fp=fp)

    side, idx = cache_or_build(
        index_dir, RETRAIN_SIDECAR, force, _build, _load
    )
    return index_dir, side, idx


def upserted_vector_index_for(
    spark: SparkSession,
    sf_dir: str,
    family: str,
    root: str | None = None,
    force: bool = False,
):
    """The vector-side UPSERT exercise behind ``ann_upserted_recall_report``
    (round 12): build the ``family`` artifact over the full corpus, then
    ``upsert_into_index`` the ``vec_id % DELETE_MOD == DELETE_RESIDUE``
    slice RE-EMBEDDED (``moved_emb`` sign flips — every upserted vector
    genuinely moves) — one supersession-tombstone write plus one
    appended segment, no compaction.  The loaded artifact must then
    serve the EDITED corpus: old rows for the slice dead under the
    supersession anti-join, new rows live in the appended segment,
    models frozen (the FAISS add-after-train shape).  Document-side
    twins (MinHash/BM25) are hash-gated directly via
    ``dedup_incremental_upserted`` / ``bm25_search_upserted``; this
    exercise gives the three vector families the same driver-visible
    lifecycle through a recall report.

    Family-scoped ``…-ups-{family}`` dir; refuse-and-redo resumability
    (the load refuses an artifact the upsert never reached: no appended
    segment or no tombstone version yet)."""
    fam_io = {
        "ivf": (write_ivf_index, append_ivf_batch, "meta.parquet",
                load_ivf_index),
        "lsh": (write_lsh_index, append_lsh_batch, "lsh_meta.parquet",
                load_lsh_index),
        "pq": (write_pq_index, append_pq_batch, "pq_meta.parquet",
               load_pq_index),
    }
    if family not in fam_io:
        raise ValueError(f"upserted_vector_index_for: unknown {family!r}")
    writer, appender, meta_file, loader = fam_io[family]
    base_dir, n, fp = index_location(spark, sf_dir, root, "embeddings")
    index_dir = f"{base_dir}-ups-{family}"

    def _build():
        from .index_maintenance import (
            DELETE_MOD,
            DELETE_RESIDUE,
            upsert_into_index,
        )

        emb = _persisted_emb(spark, sf_dir)
        shutil.rmtree(index_dir, ignore_errors=True)
        writer(emb, index_dir, corpus_fp=fp)
        res = upsert_into_index(
            spark, index_dir, family,
            moved_emb(
                emb.filter(F.col("vec_id") % DELETE_MOD == DELETE_RESIDUE)
            ),
            appender, new_corpus_fp=fp,
        )
        if res["superseded"] == 0:
            raise ValueError(
                f"upserted-{family} exercise needs a non-empty vec_id % "
                f"{DELETE_MOD} == {DELETE_RESIDUE} slice in {sf_dir}"
            )

    def _load():
        meta = spark.read.parquet(f"{index_dir}/{meta_file}").collect()[0]
        _, tombs, _ = _meta_maint(meta)
        if tombs < 1 or int(meta.segments) < 1:
            raise ValueError(
                f"upserted artifact at {index_dir} is mid-lifecycle "
                f"(segments={int(meta.segments)}, tombs={tombs}) — redo"
            )
        return loader(spark, index_dir, expect_n=n, expect_fp=fp)

    return cache_or_build(index_dir, meta_file, force, _build, _load)
