"""Delete + compaction for the five index artifact families — the LSM
half of the ingest loop the round-10 appends left open.

Round 10 made the MinHash/BM25/IVF/PQ/LSH artifacts APPENDABLE: each
ingest batch lands as a parquet segment and the meta row commits last.
Two gaps remained for a production ingest loop (VERDICT r10):

1. **Unbounded segment growth.**  Thousands of appends → thousands of
   segment directories per relation → small-file reads and ever-widening
   unions at probe time.  :func:`compact_index` is the LSM merge: it
   rewrites the current generation's segment union (minus tombstones)
   into a single NEW-generation base relation with the family's designed
   layout (postings re-sorted by term, bands re-clustered, IVF
   assignments re-bucketed by cluster), then swaps the meta pointer
   LAST.  A killed compaction leaves the OLD generation fully intact and
   serveable — new-generation files are orphans the retry overwrites —
   because no old-generation file is touched until the new meta commits
   (old files are deleted best-effort strictly AFTER the commit).

2. **No delete/update path.**  ``append_bm25_batch`` rightly refuses
   updates, so one edited document forced a full rebuild.
   :func:`delete_from_index` adds the standard tombstone story: deleted
   keys land in a versioned tombstone relation that every load
   anti-joins away (broadcast — the tombstone set is tiny next to the
   corpus, so no probe plan gains a shuffle), and compaction folds the
   tombstones into the physical rewrite.  An UPDATE is therefore
   delete → compact → append.  For BM25 — the one family whose probe
   reads corpus-level statistics — the delete also decrements the exact
   per-term document frequencies (from the dying docs' own postings, no
   re-tokenize) and re-derives N/avgdl from the live doclen relation, so
   a tombstoned probe scores EXACTLY like a rebuild over the surviving
   corpus (driver-hash-gated via ``bm25_search_deleted``).

Bookkeeping invariants (all families):

- ``meta.n`` / ``meta.n_corpus`` = corpus rows the index was DERIVED
  from — the load-time staleness check against the corpus files, which
  logical deletes do not touch;
- ``meta.n_deleted`` = cumulative tombstoned keys (live = n − deleted);
  compaction physically removes the rows but keeps the counter;
- ``meta.tombs`` = current tombstone file version (0 = none
  outstanding); reset by compaction;
- ``meta.gen`` = physical generation; bumped only by compaction.

Spark-first notes: every rewrite is a declarative DataFrame plan
(segment-union scan → broadcast anti-join → layout repartition → parquet
write); nothing is collected beyond 1-row metas, and the per-family
layout closures reproduce the original build's clustering so a probe
against a compacted artifact has the SAME plan shape as against a fresh
build (pinned in tests/test_index_compaction.py).
"""

from __future__ import annotations

import shutil
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ann_index import (
    _gen_base_path,
    _load_tombstones,
    _meta_maint,
    _minus_tombstones,
    _segment_paths,
    _tombstone_path,
)

#: the registered maintenance-lifecycle exercises' deterministic delete
#: slice: key % 17 == 3 (coprime to the %10 ingest-batch split, so the
#: deleted slice straddles standing corpus AND appended batch).
DELETE_MOD = 17
DELETE_RESIDUE = 3


def _ivf_layout(df: DataFrame, meta) -> DataFrame:
    # mirror write_ivf_index: one writer task per cluster group so the
    # probe-side join reads co-located files.
    n_files = max(4, min(32, int(meta.k) // 32))
    return df.repartition(n_files, "cluster")


#: per-family physical description: meta file, tombstone key column, the
#: doc/vec-grain PRESENCE relation (used to restrict deletes to keys the
#: index actually holds), and each segmented relation with the layout
#: closure that reproduces the original build's clustering on rewrite.
FAMILIES: dict[str, dict] = {
    "mh": dict(
        meta_file="mh_meta.parquet",
        key="doc_id",
        presence="mh_shingles",
        relations={
            "mh_shingles": lambda df, meta: df,
            "mh_bands": lambda df, meta: df.repartition("band"),
        },
    ),
    "bm25": dict(
        meta_file="bm25_meta.parquet",
        key="doc_id",
        presence="doclen",
        relations={
            "postings": lambda df, meta: (
                df.repartition("tok").sortWithinPartitions("tok")
            ),
            # range-clustered on doc_id like every doclen write, so the
            # append guard's batch-bounds pruning survives compaction
            "doclen": lambda df, meta: (
                df.repartitionByRange(8, "doc_id")
                .sortWithinPartitions("doc_id")
            ),
        },
    ),
    "ivf": dict(
        meta_file="meta.parquet",
        key="vec_id",
        presence="assignments",
        relations={"assignments": _ivf_layout},
    ),
    "pq": dict(
        meta_file="pq_meta.parquet",
        key="vec_id",
        presence="pq_codes",
        relations={"pq_codes": lambda df, meta: df},
    ),
    "lsh": dict(
        meta_file="lsh_meta.parquet",
        key="vec_id",
        presence="lsh_bands",
        relations={"lsh_bands": lambda df, meta: df.repartition("band", "bkey")},
    ),
}


def _read_meta(spark: SparkSession, index_dir: str, family: str):
    return spark.read.parquet(
        f"{index_dir}/{FAMILIES[family]['meta_file']}"
    ).collect()[0]


def _ts_ver(meta) -> int:
    """BM25 termstats version pointer (pre-maintenance metas used the
    segment count as the implicit version)."""
    return int(meta.asDict().get("ts_ver") or meta.segments)


def _rewrite_meta(
    spark: SparkSession, index_dir: str, family: str, meta,
    *, segments: int, gen: int, tombs: int, n_deleted: int,
    ts_ver: int | None = None,
) -> None:
    """Re-commit a family's meta row with updated maintenance counters,
    preserving the family's identity/staleness columns.  Always the LAST
    write of any maintenance operation (the commit point)."""
    if family == "mh":
        from .minhash_index import _write_mh_meta

        _write_mh_meta(
            spark, index_dir, int(meta.n), meta.corpus_fp, segments,
            gen=gen, tombs=tombs, n_deleted=n_deleted,
        )
    elif family == "bm25":
        from .bm25_index import _write_bm25_meta

        _write_bm25_meta(
            spark, index_dir, segments, int(meta.n_corpus), meta.corpus_fp,
            gen=gen, tombs=tombs, n_deleted=n_deleted, ts_ver=ts_ver,
        )
    elif family == "ivf":
        from .ann_index import _write_ivf_meta

        _write_ivf_meta(
            spark, index_dir, int(meta.n), int(meta.k), int(meta.dim),
            meta.corpus_fp, segments,
            gen=gen, tombs=tombs, n_deleted=n_deleted,
        )
    elif family == "pq":
        from .ann_index import _write_pq_meta

        _write_pq_meta(
            spark, index_dir, int(meta.n), meta.corpus_fp, segments,
            gen=gen, tombs=tombs, n_deleted=n_deleted,
        )
    elif family == "lsh":
        from .ann_index import _write_lsh_meta

        _write_lsh_meta(
            spark, index_dir, int(meta.n), meta.corpus_fp, segments,
            gen=gen, tombs=tombs, n_deleted=n_deleted,
        )
    else:  # pragma: no cover - registry typo guard
        raise ValueError(f"unknown index family: {family}")


def delete_from_index(
    spark: SparkSession,
    index_dir: str,
    family: str,
    keys: DataFrame | Iterable[int],
) -> int:
    """Logically delete keys from a standing index artifact; returns the
    number of keys actually tombstoned (keys absent from the index, or
    already deleted, are ignored — deletes are idempotent).  "Present"
    means present in the family's presence relation: for BM25 that is
    doclen, so a letterless document — for which nothing was ever
    indexed — is a no-op delete (there is nothing to remove and no
    statistic to adjust).

    Cost model: O(|index keys| + |tombstones|) column-pruned scans (the
    presence check and, for BM25, the dying docs' postings lookup), never
    a corpus re-tokenize/re-sign/re-encode.  The new tombstone relation
    is a versioned full rewrite (the set is tiny next to the corpus) and
    the meta row commits LAST — a killed delete leaves an orphan
    tombstone version no load reads, and the retry overwrites it.

    BM25 keeps its statistics EXACT under deletion: per-term df
    decrements come from the dying documents' own postings rows, and
    N/avgdl/n_tokens re-derive from the live doclen — so a tombstoned
    probe is indistinguishable from a rebuild over the surviving corpus.
    """
    fam = FAMILIES[family]
    key = fam["key"]
    meta = _read_meta(spark, index_dir, family)
    gen, tombs, n_deleted = _meta_maint(meta)
    segs = int(meta.segments)

    if isinstance(keys, DataFrame):
        kdf = keys.select(key).distinct()
    else:
        kdf = spark.createDataFrame(
            [(int(k),) for k in keys], f"{key} BIGINT"
        ).distinct()

    old_tombs = _load_tombstones(spark, index_dir, family, tombs)
    live_keys = _minus_tombstones(
        spark.read.parquet(
            *_segment_paths(index_dir, fam["presence"], segs, gen)
        ).select(key).distinct(),
        old_tombs, key,
    )
    # idempotence + exact bookkeeping: only keys the index actually holds
    # (and hasn't already tombstoned) count toward n_deleted.  delta is
    # persisted (house rule: a relation whose plan scans corpus-scale
    # segments and feeds multiple consumers — the count, the tombstone
    # write, and BM25's df-decrement semi-join — computes once).
    from ..caching import tracked_persist

    delta = tracked_persist(kdf.join(live_keys, key, "left_semi"))
    delta_n = delta.count()
    if delta_n == 0:
        return 0

    new_tombs = (
        delta if old_tombs is None
        else old_tombs.select(key).unionByName(delta).distinct()
    )
    new_tombs.coalesce(1).write.mode("overwrite").parquet(
        _tombstone_path(index_dir, family, tombs + 1)
    )

    ts_ver = None
    if family == "bm25":
        from .bm25_index import _termstats_path

        cur_ts = _ts_ver(meta)
        postings_live = _minus_tombstones(
            spark.read.parquet(
                *_segment_paths(index_dir, "postings", segs, gen)
            ),
            old_tombs, key,
        )
        # one postings row per (term, doc): the dying docs' rows ARE the
        # per-term df decrements — no re-tokenize, the index already
        # holds everything needed to subtract a document.
        dec = (
            postings_live.join(F.broadcast(delta), key, "left_semi")
            .groupBy("tok")
            .agg(F.count("*").cast("long").alias("dec"))
        )
        old_ts = spark.read.parquet(_termstats_path(index_dir, cur_ts, gen))
        (
            old_ts.join(F.broadcast(dec), "tok", "left")
            .withColumn(
                "df",
                (F.col("df") - F.coalesce(F.col("dec"), F.lit(0)))
                .cast("long"),
            )
            .filter(F.col("df") > 0)
            .select("tok", "df")
            .repartition("tok")
            .sortWithinPartitions("tok")
            .write.mode("overwrite")
            .parquet(_termstats_path(index_dir, cur_ts + 1, gen))
        )
        ts_ver = cur_ts + 1

    _rewrite_meta(
        spark, index_dir, family, meta,
        segments=segs, gen=gen, tombs=tombs + 1,
        n_deleted=n_deleted + delta_n, ts_ver=ts_ver,
    )
    return delta_n


def compact_index(spark: SparkSession, index_dir: str, family: str) -> bool:
    """Merge a family's appended segments back into a single base
    relation and fold outstanding tombstones into the physical rewrite —
    the LSM compaction that bounds probe-side file counts under a
    long-running ingest loop.  Returns False (no-op) when the artifact
    has neither segments nor tombstones.

    Discipline: every rewrite lands under a NEW generation's paths; the
    meta pointer (gen+1, segments=0, tombs=0) commits LAST; the old
    generation's files are removed best-effort only AFTER the commit.  A
    killed compaction therefore leaves the old artifact fully serveable
    (new-generation files are unreferenced orphans the retry overwrites)
    — pinned in tests/test_index_compaction.py.

    Probes against the compacted artifact are EXACTLY equal to probes
    against the segmented+tombstoned one (same rows, and the layout
    closures reproduce the original build's clustering, so the same plan
    shape).  ``n_deleted`` is preserved across compaction: the invariant
    live = n − n_deleted holds whether deletions are logical or folded.
    """
    fam = FAMILIES[family]
    key = fam["key"]
    meta = _read_meta(spark, index_dir, family)
    gen, tombs, n_deleted = _meta_maint(meta)
    segs = int(meta.segments)
    if segs == 0 and tombs == 0:
        return False
    new_gen = gen + 1
    tomb_df = _load_tombstones(spark, index_dir, family, tombs)

    for base, layout in fam["relations"].items():
        live = _minus_tombstones(
            spark.read.parquet(*_segment_paths(index_dir, base, segs, gen)),
            tomb_df, key,
        )
        layout(live, meta).write.mode("overwrite").parquet(
            _gen_base_path(index_dir, base, new_gen)
        )

    ts_ver = None
    old_ts_paths: list[str] = []
    if family == "bm25":
        from .bm25_index import _termstats_path

        # termstats is kept exact by every append/delete, so compaction
        # COPIES the current pointer into the new generation (vocabulary-
        # grain read/write) instead of re-deriving it from postings.
        cur_ts = _ts_ver(meta)
        (
            spark.read.parquet(_termstats_path(index_dir, cur_ts, gen))
            .repartition("tok")
            .sortWithinPartitions("tok")
            .write.mode("overwrite")
            .parquet(_termstats_path(index_dir, 0, new_gen))
        )
        ts_ver = 0
        old_ts_paths = [
            _termstats_path(index_dir, v, gen) for v in range(cur_ts + 1)
        ]

    # the commit point: until this write, every loader still serves the
    # old generation untouched.
    _rewrite_meta(
        spark, index_dir, family, meta,
        segments=0, gen=new_gen, tombs=0, n_deleted=n_deleted,
        ts_ver=ts_ver,
    )

    # best-effort space reclamation, strictly after the commit.
    old_paths: list[str] = []
    for base in fam["relations"]:
        old_paths += _segment_paths(index_dir, base, segs, gen)
    old_paths += [
        _tombstone_path(index_dir, family, v) for v in range(1, tombs + 1)
    ]
    old_paths += old_ts_paths
    for p in old_paths:
        shutil.rmtree(p, ignore_errors=True)
    return True


#: default compaction policy: compact once probe plans union more than
#: this many appended segments, or once any tombstones are outstanding
#: beyond this fraction of the corpus.  Chosen where the small-file /
#: anti-join tax starts to show in probe timings (SCALE.md round 11);
#: ingest loops with different batch grain tune per call.
MAX_SEGMENTS = 8
MAX_DELETED_FRACTION = 0.02


def maybe_compact(
    spark: SparkSession,
    index_dir: str,
    family: str,
    max_segments: int = MAX_SEGMENTS,
    max_deleted_fraction: float = MAX_DELETED_FRACTION,
) -> bool:
    """The ingest loop's compaction POLICY hook: compact when the
    artifact has accumulated more than ``max_segments`` appended
    segments, or when outstanding tombstones exceed
    ``max_deleted_fraction`` of the covered corpus (every probe pays the
    anti-join until they fold).  Cheap when it declines: one 1-row meta
    read, plus a count of the tiny tombstone relation only when any
    deletions are outstanding.  Call it after every ``append_*_batch`` /
    ``delete_from_index`` — the LSM background-merge trigger, made
    explicit."""
    meta = _read_meta(spark, index_dir, family)
    gen, tombs, _n_deleted = _meta_maint(meta)
    segs = int(meta.segments)
    n_attr = "n_corpus" if family == "bm25" else "n"
    n = int(getattr(meta, n_attr)) or 1
    # OUTSTANDING tombstones are the current tombstone relation's rows
    # (n_deleted is cumulative across folds and would trigger forever
    # after the first big fold); the relation is a single tiny coalesced
    # file, read only when any tombstones exist at all.
    outstanding = 0
    if tombs > 0:
        outstanding = _load_tombstones(spark, index_dir, family, tombs).count()
    if segs <= max_segments and outstanding <= max_deleted_fraction * n:
        return False
    return compact_index(spark, index_dir, family)
