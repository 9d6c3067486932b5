"""Big-SF stress for the candidate-pair family (VERDICT r3 item 6).

The caps that keep the pair-generating operators sub-quadratic (LSH band
buckets, PPJoin prefix filters, IVF cells) are all verified at sf0.01 /
sf1; this tool runs the family at 100× the graded scale (sf10 — built by
``tools/make_bigdata.py --copies 100``) and reports wall time AND output
cardinality per op, so superlinear candidate growth the caps miss shows
up as a number, not a hunch.

Note on the fixture's shape: make_bigdata gives every original document
``copies-1`` near-dup replicas, so the TRUE pair count itself grows
quadratically in ``copies`` (10-doc groups at sf1 → 45 pairs/group;
100-doc groups at sf10 → 4950/group).  The scale criterion is therefore
pairs-proportional work (wall ∝ emitted pairs), not wall ∝ rows.

    python tools/stress_bigsf.py --sf-dir /root/repo/.benchdata/sf10
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from simpletons_map_reduce_spark.caching import release_persisted  # noqa: E402
from simpletons_map_reduce_spark.queries import REGISTRY  # noqa: E402
from simpletons_map_reduce_spark.session import get_session  # noqa: E402

#: the ops whose cost is driven by candidate-pair generation.
FAMILY = [
    "near_dedup",
    "ngram_jaccard",
    "dedup_clusters",
    "dedup_apply",
    "embedding_dedup_ann",
    "dedup_incremental",
    "ngram_containment",
    "simhash_pairs",
    "dedup_report",
    "ann_pq",
]


def _embedding_dedup_ann_t95(spark, sf_dir):
    # The registered 0.35 threshold is a small-SF oracle artifact: at
    # dim 64 random pairs pass it at ~2%, so true pair mass at tens of
    # millions of vectors is quadratic by construction; big-SF sweeps run
    # the realistic near-dup threshold (see embedding_dedup_ann_threshold).
    from simpletons_map_reduce_spark.queries.similarity_ops import (
        embedding_dedup_ann_threshold,
    )

    return embedding_dedup_ann_threshold(spark, sf_dir, 0.95)


def _ivf_index_build(spark, sf_dir):
    # Force-build the shared IVF index artifact (operators/ann_index.py)
    # so the sweep can report build cost and probe cost as separate rows.
    from simpletons_map_reduce_spark.operators.ann_index import ivf_index_for

    cents, _assigned, _k = ivf_index_for(spark, sf_dir, force=True)
    return cents


def _embedding_dedup_ann_t95_indexed(spark, sf_dir):
    from pyspark.storagelevel import StorageLevel

    from simpletons_map_reduce_spark.caching import tracked_persist
    from simpletons_map_reduce_spark.operators.ann_index import ivf_index_for
    from simpletons_map_reduce_spark.queries.similarity_ops import (
        _emb_with_norm,
        embedding_dedup_ann_pairs,
    )

    index = ivf_index_for(spark, sf_dir)
    emb = tracked_persist(
        _emb_with_norm(spark, sf_dir).select("vec_id", "v", "nv"),
        level=StorageLevel.DISK_ONLY,
    )
    return embedding_dedup_ann_pairs(emb, 0.95, index=index)


def _substring_keep_one_sum(spark, sf_dir):
    # count() answers from metadata (the redaction's per-doc left joins
    # are unique-keyed, so Catalyst prunes them — the substring_dedup_apply
    # measurement note in SCALE.md); aggregate the accounting columns so
    # the sweep actually executes the redaction.  The runner's count()
    # ALSO constant-folds "count of a global aggregate = 1" without
    # executing the child (measured: 1.7 s vs the real 375 s at sf100),
    # so a value-dependent filter pins the aggregate into the plan.
    from pyspark.sql import functions as F

    return (
        REGISTRY["substring_dedup_keep_one"].fn(spark, sf_dir)
        .agg(
            F.sum("n_removed").alias("sum_removed"),
            F.count("*").alias("n_docs"),
        )
        .filter(F.coalesce(F.col("sum_removed"), F.lit(0)) >= -1)
    )


def _repetition_signals_sum(spark, sf_dir):
    # same two hazards as _substring_keep_one_sum (join pruning under a
    # bare count(); count-of-global-agg constant folding).
    from pyspark.sql import functions as F

    return (
        REGISTRY["repetition_signals"].fn(spark, sf_dir)
        .agg(
            F.sum("top2gram_frac").alias("s1"),
            F.sum("dup5gram_frac").alias("s2"),
            F.sum("dup_line_frac").alias("s3"),
            F.count("*").alias("n_docs"),
        )
        .filter(F.coalesce(F.col("s1"), F.lit(0.0)) >= -1.0)
    )


def _dsir_weights_sum(spark, sf_dir):
    # same constant-fold hazards as _substring_keep_one_sum: a bare
    # count() of the doc-grain aggregate can prune the logw sum — the
    # expensive column — so aggregate it behind a value-dependent filter.
    from pyspark.sql import functions as F

    return (
        REGISTRY["dsir_weights"].fn(spark, sf_dir)
        .agg(
            F.sum("logw").alias("s"),
            F.sum("n_grams").alias("g"),
            F.count("*").alias("n_docs"),
        )
        .filter(F.coalesce(F.col("s"), F.lit(0.0)) >= -1e18)
    )


def _minhash_index_build(spark, sf_dir):
    # the write-once signature build (round 9); returns the band relation
    # so count() forces a full read-back of the written artifact.
    from simpletons_map_reduce_spark.operators.minhash_index import (
        minhash_index_for,
    )

    shs, bands = minhash_index_for(spark, sf_dir, force=True)
    return bands


def _lsh_index_build(spark, sf_dir):
    from simpletons_map_reduce_spark.operators.ann_index import lsh_index_for

    return lsh_index_for(spark, sf_dir, force=True)


def _pq_index_build(spark, sf_dir):
    from simpletons_map_reduce_spark.operators.ann_index import pq_index_for

    _cb_path, codes = pq_index_for(spark, sf_dir, force=True)
    return codes


def _bm25_index_build(spark, sf_dir):
    from simpletons_map_reduce_spark.operators.bm25_index import bm25_index_for

    postings, dl, termstats, n_docs, avgdl = bm25_index_for(
        spark, sf_dir, force=True
    )
    return postings


# --- round-10 append-vs-rebuild timing (VERDICT r9 item 2) ----------------
# Each maintenance family gets TWO sweep rows: *_standing_build (ingest the
# 90% standing corpus into the sibling -app artifact) and *_append_batch
# (absorb the 10% batch).  Compare the append row against the family's
# full *_index_build row: the append should cost ~|batch|/|corpus| of the
# rebuild — THE production cost model for per-batch ingest at 100 TB.


def _app_dir(spark, sf_dir, table, family):
    import shutil

    from simpletons_map_reduce_spark.operators.ann_index import index_location

    base, n, fp = index_location(spark, sf_dir, None, table)
    # family-scoped: the standing build rmtrees its dir — a shared -app
    # dir would wipe the sibling family's artifact (round-10 bench bug)
    return f"{base}-app-{family}", n, fp, shutil


def _docs_split(spark, sf_dir):
    from pyspark.sql import functions as F

    from simpletons_map_reduce_spark.queries.dedup_ops import NEW_BATCH_MOD
    from simpletons_map_reduce_spark.sources.tables import load_table, spread

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        spread(docs.filter(F.col("doc_id") % NEW_BATCH_MOD != 0)),
        spread(docs.filter(F.col("doc_id") % NEW_BATCH_MOD == 0)),
    )


def _minhash_standing_build(spark, sf_dir):
    from simpletons_map_reduce_spark.operators.minhash_index import (
        load_minhash_index,
        write_minhash_index,
    )

    d, n, fp, shutil_ = _app_dir(spark, sf_dir, "documents", "mh")
    shutil_.rmtree(d, ignore_errors=True)
    standing, _batch = _docs_split(spark, sf_dir)
    write_minhash_index(standing, d, corpus_fp=fp)
    return load_minhash_index(spark, d)[1]


def _minhash_append_batch(spark, sf_dir):
    from simpletons_map_reduce_spark.operators.minhash_index import (
        append_minhash_batch,
        load_minhash_index,
    )

    d, n, fp, _ = _app_dir(spark, sf_dir, "documents", "mh")
    _standing, batch = _docs_split(spark, sf_dir)
    append_minhash_batch(spark, d, batch, new_corpus_fp=fp)
    return load_minhash_index(spark, d, expect_n=n, expect_fp=fp)[1]


def _bm25_standing_build(spark, sf_dir):
    from simpletons_map_reduce_spark.operators.bm25_index import (
        load_bm25_index,
        write_bm25_index,
    )

    d, n, fp, shutil_ = _app_dir(spark, sf_dir, "documents", "bm25")
    shutil_.rmtree(d, ignore_errors=True)
    standing, _batch = _docs_split(spark, sf_dir)
    write_bm25_index(standing, d, corpus_fp=fp)
    return load_bm25_index(spark, d)[0]


def _bm25_append_batch(spark, sf_dir):
    from simpletons_map_reduce_spark.operators.bm25_index import (
        append_bm25_batch,
        load_bm25_index,
    )

    d, n, fp, _ = _app_dir(spark, sf_dir, "documents", "bm25")
    _standing, batch = _docs_split(spark, sf_dir)
    append_bm25_batch(spark, d, batch, new_corpus_fp=fp)
    return load_bm25_index(spark, d, expect_n=n, expect_fp=fp)[0]


def _emb_split(spark, sf_dir):
    from pyspark.sql import functions as F

    from simpletons_map_reduce_spark.operators.ann_index import _persisted_emb

    emb = _persisted_emb(spark, sf_dir)
    return (
        emb.filter(F.col("vec_id") % 10 != 7),
        emb.filter(F.col("vec_id") % 10 == 7),
    )


def _ivf_standing_build(spark, sf_dir):
    from simpletons_map_reduce_spark.operators.ann_index import (
        load_ivf_index,
        write_ivf_index,
    )

    d, n, fp, shutil_ = _app_dir(spark, sf_dir, "embeddings", "ivf")
    shutil_.rmtree(d, ignore_errors=True)
    standing, _batch = _emb_split(spark, sf_dir)
    write_ivf_index(standing, d, corpus_fp=fp)
    return load_ivf_index(spark, d)[1]


def _ivf_append_batch(spark, sf_dir):
    from simpletons_map_reduce_spark.operators.ann_index import (
        append_ivf_batch,
        load_ivf_index,
    )

    d, n, fp, _ = _app_dir(spark, sf_dir, "embeddings", "ivf")
    _standing, batch = _emb_split(spark, sf_dir)
    append_ivf_batch(spark, d, batch, new_corpus_fp=fp)
    return load_ivf_index(spark, d, expect_n=n, expect_fp=fp)[1]


def _require_fresh_standing(spark, d, meta_file, family):
    """The *_append_pure rows measure THE FIRST append after a standing
    build; appending the same batch onto an already-appended artifact
    would silently duplicate its rows (the vector appends have no
    disjointness guard) and corrupt the shared -app artifact the
    registered probes load.  Refuse loudly instead — the sweep records
    the error as a finding and the fix is to run the family's
    standing_build row immediately before."""
    meta = spark.read.parquet(f"{d}/{meta_file}").collect()[0]
    if int(meta.segments) != 0:
        raise RuntimeError(
            f"{family}_append_pure needs a FRESH standing artifact "
            f"(segments=0) at {d}; found segments={int(meta.segments)} — "
            f"run {family}_standing_build first"
        )
    return meta


def _new_seg_path(spark, d, meta_file, base):
    """The segment the append just landed, read from the committed meta
    (never a hardcoded seg1 — robust to whatever state preceded)."""
    from simpletons_map_reduce_spark.operators.ann_index import (
        _meta_maint,
        _seg_path,
    )

    meta = spark.read.parquet(f"{d}/{meta_file}").collect()[0]
    gen, _, _ = _meta_maint(meta)
    return _seg_path(d, base, gen, int(meta.segments))


def _ivf_append_pure(spark, sf_dir):
    # round 11 (VERDICT r10 item 6): the r10 ivf_append_batch row was
    # dominated by the runner's full-union read-back; this row isolates
    # the APPEND itself — the returned frame reads ONLY the new segment,
    # so the count is |batch|-proportional.
    from simpletons_map_reduce_spark.operators.ann_index import (
        append_ivf_batch,
    )

    d, n, fp, _ = _app_dir(spark, sf_dir, "embeddings", "ivf")
    _require_fresh_standing(spark, d, "meta.parquet", "ivf")
    _standing, batch = _emb_split(spark, sf_dir)
    append_ivf_batch(spark, d, batch, new_corpus_fp=fp)
    return spark.read.parquet(
        _new_seg_path(spark, d, "meta.parquet", "assignments")
    )


def _pq_standing_build(spark, sf_dir):
    from simpletons_map_reduce_spark.operators.ann_index import (
        write_pq_index,
    )

    d, n, fp, shutil_ = _app_dir(spark, sf_dir, "embeddings", "pq")
    shutil_.rmtree(d, ignore_errors=True)
    standing, _batch = _emb_split(spark, sf_dir)
    write_pq_index(standing, d, corpus_fp=fp)
    return spark.read.parquet(f"{d}/pq_codes.parquet")


def _pq_append_pure(spark, sf_dir):
    from simpletons_map_reduce_spark.operators.ann_index import (
        append_pq_batch,
    )

    d, n, fp, _ = _app_dir(spark, sf_dir, "embeddings", "pq")
    _require_fresh_standing(spark, d, "pq_meta.parquet", "pq")
    _standing, batch = _emb_split(spark, sf_dir)
    append_pq_batch(spark, d, batch, new_corpus_fp=fp)
    return spark.read.parquet(
        _new_seg_path(spark, d, "pq_meta.parquet", "pq_codes")
    )


def _lsh_standing_build(spark, sf_dir):
    from simpletons_map_reduce_spark.operators.ann_index import (
        write_lsh_index,
    )

    d, n, fp, shutil_ = _app_dir(spark, sf_dir, "embeddings", "lsh")
    shutil_.rmtree(d, ignore_errors=True)
    standing, _batch = _emb_split(spark, sf_dir)
    write_lsh_index(standing, d, corpus_fp=fp)
    return spark.read.parquet(f"{d}/lsh_bands.parquet")


def _lsh_append_pure(spark, sf_dir):
    from simpletons_map_reduce_spark.operators.ann_index import (
        append_lsh_batch,
    )

    d, n, fp, _ = _app_dir(spark, sf_dir, "embeddings", "lsh")
    _require_fresh_standing(spark, d, "lsh_meta.parquet", "lsh")
    _standing, batch = _emb_split(spark, sf_dir)
    append_lsh_batch(spark, d, batch, new_corpus_fp=fp)
    return spark.read.parquet(
        _new_seg_path(spark, d, "lsh_meta.parquet", "lsh_bands")
    )


# --- round-11 delete + compaction timing (VERDICT r10 items 2-3) -----------
# Per family, against a SWEEP-OWNED ``-msw-`` artifact (NOT the -app dir
# the registered appended probes share: a delete+compact there would
# leave a loadable artifact — same n, same fingerprint — whose content
# silently differs from what the registered query's oracle expects):
# *_m_setup builds standing+append into the sweep dir, *_delete_batch
# tombstones the key % 17 == 3 slice (returned frame reads the tombstone
# relation — rows = tombstone count), *_probe_tombstoned times the probe
# against the segmented+tombstoned artifact, *_compact folds segments and
# tombstones into a new generation (returned frame is the 1-row meta —
# compaction cost is the wall, not a read-back), and *_probe_compacted
# re-times the same probe.  probe_tombstoned vs probe_compacted is the
# small-file/anti-join tax compaction removes.


def _msw_dir(spark, sf_dir, table, family):
    import shutil

    from simpletons_map_reduce_spark.operators.ann_index import index_location

    base, n, fp = index_location(spark, sf_dir, None, table)
    return f"{base}-msw-{family}", n, fp, shutil


def _msw_setup(spark, sf_dir, table, family):
    """Standing build + one appended batch into the sweep-owned dir —
    the artifact state every delete/compact row starts from."""
    d, n, fp, shutil_ = _msw_dir(spark, sf_dir, table, family)
    shutil_.rmtree(d, ignore_errors=True)
    if table == "documents":
        standing, batch = _docs_split(spark, sf_dir)
    else:
        standing, batch = _emb_split(spark, sf_dir)
    if family == "mh":
        from simpletons_map_reduce_spark.operators.minhash_index import (
            append_minhash_batch,
            write_minhash_index,
        )

        write_minhash_index(standing, d, corpus_fp=fp)
        append_minhash_batch(spark, d, batch, new_corpus_fp=fp)
        return spark.read.parquet(f"{d}/mh_bands_seg1.parquet")
    if family == "bm25":
        from simpletons_map_reduce_spark.operators.bm25_index import (
            append_bm25_batch,
            write_bm25_index,
        )

        write_bm25_index(standing, d, corpus_fp=fp)
        append_bm25_batch(spark, d, batch, new_corpus_fp=fp)
        return spark.read.parquet(f"{d}/postings_seg1.parquet")
    if family == "ivf":
        from simpletons_map_reduce_spark.operators.ann_index import (
            append_ivf_batch,
            write_ivf_index,
        )

        write_ivf_index(standing, d, corpus_fp=fp)
        append_ivf_batch(spark, d, batch, new_corpus_fp=fp)
        return spark.read.parquet(f"{d}/assignments_seg1.parquet")
    if family == "pq":
        from simpletons_map_reduce_spark.operators.ann_index import (
            append_pq_batch,
            write_pq_index,
        )

        write_pq_index(standing, d, corpus_fp=fp)
        append_pq_batch(spark, d, batch, new_corpus_fp=fp)
        return spark.read.parquet(f"{d}/pq_codes_seg1.parquet")
    if family == "lsh":
        from simpletons_map_reduce_spark.operators.ann_index import (
            append_lsh_batch,
            write_lsh_index,
        )

        write_lsh_index(standing, d, corpus_fp=fp)
        append_lsh_batch(spark, d, batch, new_corpus_fp=fp)
        return spark.read.parquet(f"{d}/lsh_bands_seg1.parquet")
    raise ValueError(family)


def _delete_table(spark, sf_dir, table, family, key):
    from pyspark.sql import functions as F

    from simpletons_map_reduce_spark.operators.ann_index import (
        _tombstone_path,
    )
    from simpletons_map_reduce_spark.operators.index_maintenance import (
        DELETE_MOD,
        DELETE_RESIDUE,
        FAMILIES,
        delete_from_index,
    )

    d, n, fp, _ = _msw_dir(spark, sf_dir, table, family)
    keys = (
        spark.read.parquet(f"{sf_dir}/{table}.parquet")
        .select(key)
        .filter(F.col(key) % DELETE_MOD == DELETE_RESIDUE)
    )
    delete_from_index(spark, d, family, keys)
    meta_df = spark.read.parquet(f"{d}/{FAMILIES[family]['meta_file']}")
    tombs = int(meta_df.collect()[0].tombs)
    if tombs == 0:
        # idempotent re-run against an already-compacted sweep artifact:
        # nothing left to tombstone — report the meta row instead
        return meta_df
    return spark.read.parquet(_tombstone_path(d, family, tombs))


def _compact(spark, sf_dir, table, family):
    from simpletons_map_reduce_spark.operators.index_maintenance import (
        FAMILIES,
        compact_index,
    )

    d, n, fp, _ = _msw_dir(spark, sf_dir, table, family)
    compact_index(spark, d, family)
    return spark.read.parquet(f"{d}/{FAMILIES[family]['meta_file']}")


def _mh_probe(spark, sf_dir):
    from simpletons_map_reduce_spark.operators.minhash_index import (
        load_minhash_index,
    )
    from simpletons_map_reduce_spark.queries.dedup_ops import (
        MAX_BAND_BUCKET,
        _assign_to_bucket,
        _bucket_verified,
        _incremental_collisions,
        kept_from_bands,
    )

    d, n, fp, _ = _msw_dir(spark, sf_dir, "documents", "mh")
    shs, bands = load_minhash_index(spark, d, expect_n=n, expect_fp=fp)
    kept = kept_from_bands(bands, MAX_BAND_BUCKET)
    assigned = _assign_to_bucket(
        _incremental_collisions(kept), kept, "new_doc", "corpus_doc"
    )
    return _bucket_verified(assigned, shs, "new_doc", "corpus_doc")


def _bm25_probe(spark, sf_dir):
    from simpletons_map_reduce_spark.operators.bm25_index import (
        load_bm25_index,
    )
    from simpletons_map_reduce_spark.queries.search_ops import (
        _bm25_index_probe,
    )

    d, n, fp, _ = _msw_dir(spark, sf_dir, "documents", "bm25")
    return _bm25_index_probe(*load_bm25_index(spark, d, expect_n=n, expect_fp=fp))


def _ivf_probe(spark, sf_dir):
    from simpletons_map_reduce_spark.operators.ann_index import (
        load_ivf_index,
    )
    from simpletons_map_reduce_spark.queries.similarity_ops import (
        _indexed_ivf_search,
    )

    d, n, fp, _ = _msw_dir(spark, sf_dir, "embeddings", "ivf")
    return _indexed_ivf_search(
        spark, sf_dir, load_ivf_index(spark, d, expect_n=n, expect_fp=fp)
    )


# Round-12 upsert rows: sweep-owned -usw dirs (NEVER the registered
# -ups dirs — same hazard as the -msw rule: a sweep mutation would leave
# a loadable artifact whose content diverges from the registered
# oracle).  *_u_setup builds the FULL corpus artifact; *_upsert_pure
# replaces the key % 17 == 3 slice with edited content through
# upsert_into_index (wall = tombstone write + stats adjust + one-segment
# append; the count reads only the new segment); *_probe_upserted times
# a probe against the superseded artifact (the versioned anti-join tax).
# Compare against the r11 maintenance rows: upsert_pure vs
# (delete_batch + compact + append) is the edit-path win.


def _usw_dir(spark, sf_dir, table, family):
    import shutil

    from simpletons_map_reduce_spark.operators.ann_index import index_location

    base, n, fp = index_location(spark, sf_dir, None, table)
    return f"{base}-usw-{family}", n, fp, shutil


_U_WRITERS = {
    "mh": ("simpletons_map_reduce_spark.operators.minhash_index",
           "write_minhash_index", "append_minhash_batch", "mh_bands"),
    "bm25": ("simpletons_map_reduce_spark.operators.bm25_index",
             "write_bm25_index", "append_bm25_batch", "postings"),
    "ivf": ("simpletons_map_reduce_spark.operators.ann_index",
            "write_ivf_index", "append_ivf_batch", "assignments"),
    "pq": ("simpletons_map_reduce_spark.operators.ann_index",
           "write_pq_index", "append_pq_batch", "pq_codes"),
    "lsh": ("simpletons_map_reduce_spark.operators.ann_index",
            "write_lsh_index", "append_lsh_batch", "lsh_bands"),
}


def _u_setup(spark, sf_dir, table, family):
    import importlib

    d, n, fp, shutil_ = _usw_dir(spark, sf_dir, table, family)
    shutil_.rmtree(d, ignore_errors=True)
    mod, writer, _, base = _U_WRITERS[family]
    write_fn = getattr(importlib.import_module(mod), writer)
    if table == "documents":
        rel = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
    else:
        from simpletons_map_reduce_spark.queries.similarity_ops import (
            _emb_with_norm,
        )

        rel = _emb_with_norm(spark, sf_dir).select("vec_id", "v", "nv")
    write_fn(rel, d, corpus_fp=fp)
    return spark.read.parquet(f"{d}/{base}.parquet")


def _edit_slice(spark, sf_dir, table):
    from pyspark.sql import functions as F

    from simpletons_map_reduce_spark.operators.index_maintenance import (
        DELETE_MOD,
        DELETE_RESIDUE,
        upsert_text_edit,
    )

    if table == "documents":
        return (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") % DELETE_MOD == DELETE_RESIDUE)
            .select("doc_id", upsert_text_edit(F.col("text")).alias("text"))
        )
    from simpletons_map_reduce_spark.queries.similarity_ops import (
        _emb_with_norm,
    )

    return (
        _emb_with_norm(spark, sf_dir)
        .filter(F.col("vec_id") % DELETE_MOD == DELETE_RESIDUE)
        .select(
            "vec_id",
            F.transform("v", lambda x: -x).alias("v"),
            "nv",
        )
    )


def _upsert_pure(spark, sf_dir, table, family):
    import importlib

    from simpletons_map_reduce_spark.operators.ann_index import _seg_path
    from simpletons_map_reduce_spark.operators.index_maintenance import (
        upsert_into_index,
    )

    d, n, fp, _ = _usw_dir(spark, sf_dir, table, family)
    mod, _, appender, base = _U_WRITERS[family]
    append_fn = getattr(importlib.import_module(mod), appender)
    kw = {"check_disjoint": False} if family == "bm25" else {}
    upsert_into_index(
        spark, d, family, _edit_slice(spark, sf_dir, table), append_fn,
        new_corpus_fp=fp, count_as_new=0, **kw,
    )
    meta_file = {
        "mh": "mh_meta.parquet", "bm25": "bm25_meta.parquet",
        "ivf": "meta.parquet", "pq": "pq_meta.parquet",
        "lsh": "lsh_meta.parquet",
    }[family]
    meta = spark.read.parquet(f"{d}/{meta_file}").collect()[0]
    return spark.read.parquet(
        _seg_path(d, base, int(meta.asDict().get("gen") or 0),
                  int(meta.segments))
    )


def _u_probe(spark, sf_dir, table, family):
    d, n, fp, _ = _usw_dir(spark, sf_dir, table, family)
    if family == "mh":
        from simpletons_map_reduce_spark.operators.minhash_index import (
            load_minhash_index,
        )
        from simpletons_map_reduce_spark.queries.dedup_ops import (
            MAX_BAND_BUCKET,
            _assign_to_bucket,
            _bucket_verified,
            _incremental_collisions,
            kept_from_bands,
        )

        shs, bands = load_minhash_index(spark, d, expect_n=n, expect_fp=fp)
        kept = kept_from_bands(bands, MAX_BAND_BUCKET)
        assigned = _assign_to_bucket(
            _incremental_collisions(kept), kept, "new_doc", "corpus_doc"
        )
        return _bucket_verified(assigned, shs, "new_doc", "corpus_doc")
    if family == "bm25":
        from simpletons_map_reduce_spark.operators.bm25_index import (
            load_bm25_index,
        )
        from simpletons_map_reduce_spark.queries.search_ops import (
            _bm25_index_probe,
        )

        return _bm25_index_probe(
            *load_bm25_index(spark, d, expect_n=n, expect_fp=fp)
        )
    raise ValueError(family)


def _pipeline_funnel_fused_sum(spark, sf_dir):
    # the capstone composition (VERDICT r9 item 8): the fused production
    # pipeline end-to-end at sf100 — aggregate the histogram behind a
    # value-dependent filter so the runner's count() cannot prune stages.
    from pyspark.sql import functions as F

    return (
        REGISTRY["pipeline_funnel_fused"].fn(spark, sf_dir)
        .agg(F.sum("docs").alias("s"), F.count("*").alias("n_stages"))
        .filter(F.coalesce(F.col("s"), F.lit(0)) >= -1)
    )


#: sweep-only variants that are NOT registry entries (ADVICE r8: keep the
#: runner table-driven — an op name in a SCALE/BENCH report either exists
#: in REGISTRY or is defined here, never as a loop special case).
EXTRA_OPS = {
    "embedding_dedup_ann_t95": _embedding_dedup_ann_t95,
    "ivf_index_build": _ivf_index_build,
    "embedding_dedup_ann_t95_indexed": _embedding_dedup_ann_t95_indexed,
    "substring_dedup_keep_one_sum": _substring_keep_one_sum,
    "repetition_signals_sum": _repetition_signals_sum,
    "minhash_index_build": _minhash_index_build,
    "lsh_index_build": _lsh_index_build,
    "pq_index_build": _pq_index_build,
    "dsir_weights_sum": _dsir_weights_sum,
    "bm25_index_build": _bm25_index_build,
    "minhash_standing_build": _minhash_standing_build,
    "minhash_append_batch": _minhash_append_batch,
    "bm25_standing_build": _bm25_standing_build,
    "bm25_append_batch": _bm25_append_batch,
    "ivf_standing_build": _ivf_standing_build,
    "ivf_append_batch": _ivf_append_batch,
    "pipeline_funnel_fused_sum": _pipeline_funnel_fused_sum,
    # round 11: read-back-free append rows (the wall is the append, the
    # count reads only the new segment) for the three vector families
    "ivf_append_pure": _ivf_append_pure,
    "pq_standing_build": _pq_standing_build,
    "pq_append_pure": _pq_append_pure,
    "lsh_standing_build": _lsh_standing_build,
    "lsh_append_pure": _lsh_append_pure,
    # round 11: delete + compaction timing against sweep-owned -msw dirs
    "mh_m_setup": lambda s, d: _msw_setup(s, d, "documents", "mh"),
    "mh_delete_batch": lambda s, d: _delete_table(s, d, "documents", "mh", "doc_id"),
    "mh_probe_tombstoned": _mh_probe,
    "mh_compact": lambda s, d: _compact(s, d, "documents", "mh"),
    "mh_probe_compacted": _mh_probe,
    "bm25_m_setup": lambda s, d: _msw_setup(s, d, "documents", "bm25"),
    "bm25_delete_batch": lambda s, d: _delete_table(s, d, "documents", "bm25", "doc_id"),
    "bm25_probe_tombstoned": _bm25_probe,
    "bm25_compact": lambda s, d: _compact(s, d, "documents", "bm25"),
    "bm25_probe_compacted": _bm25_probe,
    "ivf_m_setup": lambda s, d: _msw_setup(s, d, "embeddings", "ivf"),
    "ivf_delete_batch": lambda s, d: _delete_table(s, d, "embeddings", "ivf", "vec_id"),
    "ivf_probe_tombstoned": _ivf_probe,
    "ivf_compact": lambda s, d: _compact(s, d, "embeddings", "ivf"),
    "ivf_probe_compacted": _ivf_probe,
    "pq_m_setup": lambda s, d: _msw_setup(s, d, "embeddings", "pq"),
    "pq_delete_batch": lambda s, d: _delete_table(s, d, "embeddings", "pq", "vec_id"),
    "pq_compact": lambda s, d: _compact(s, d, "embeddings", "pq"),
    "lsh_m_setup": lambda s, d: _msw_setup(s, d, "embeddings", "lsh"),
    "lsh_delete_batch": lambda s, d: _delete_table(s, d, "embeddings", "lsh", "vec_id"),
    "lsh_compact": lambda s, d: _compact(s, d, "embeddings", "lsh"),
    # round 12: upsert timing against sweep-owned -usw dirs
    "mh_u_setup": lambda s, d: _u_setup(s, d, "documents", "mh"),
    "mh_upsert_pure": lambda s, d: _upsert_pure(s, d, "documents", "mh"),
    "mh_probe_upserted": lambda s, d: _u_probe(s, d, "documents", "mh"),
    "bm25_u_setup": lambda s, d: _u_setup(s, d, "documents", "bm25"),
    "bm25_upsert_pure": lambda s, d: _upsert_pure(s, d, "documents", "bm25"),
    "bm25_probe_upserted": lambda s, d: _u_probe(s, d, "documents", "bm25"),
    "ivf_u_setup": lambda s, d: _u_setup(s, d, "embeddings", "ivf"),
    "ivf_upsert_pure": lambda s, d: _upsert_pure(s, d, "embeddings", "ivf"),
    "pq_u_setup": lambda s, d: _u_setup(s, d, "embeddings", "pq"),
    "pq_upsert_pure": lambda s, d: _upsert_pure(s, d, "embeddings", "pq"),
    "lsh_u_setup": lambda s, d: _u_setup(s, d, "embeddings", "lsh"),
    "lsh_upsert_pure": lambda s, d: _upsert_pure(s, d, "embeddings", "lsh"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.benchdata/sf10")
    ap.add_argument("--ops", nargs="*", default=FAMILY)
    args = ap.parse_args()

    spark = get_session("stress-bigsf")
    # warm-up: footers + python worker pool (see bench.py); partial
    # fixtures (e.g. the embeddings-only --emb-dup-group set) just skip
    # the absent tables.
    for t in ("documents", "embeddings"):
        try:
            spark.read.parquet(f"{args.sf_dir}/{t}.parquet").count()
        except Exception:
            pass

    out = {}
    for name in args.ops:
        free_gb = round(shutil.disk_usage("/tmp").free / 2**30, 1)
        t0 = time.time()
        try:
            fn = EXTRA_OPS.get(name) or REGISTRY[name].fn
            df = fn(spark, args.sf_dir)
            n = df.count()
            out[name] = {"wall_s": round(time.time() - t0, 1), "rows": n}
        except Exception as exc:  # keep sweeping: one op's blowup is a
            # finding to record, not a reason to lose the rest of the sweep
            out[name] = {
                "wall_s": round(time.time() - t0, 1),
                "error": f"{type(exc).__name__}: {exc}"[:300],
            }
        out[name]["free_gb_before"] = free_gb
        out[name]["load1"] = round(os.getloadavg()[0], 1)
        release_persisted()
        # One long-lived JVM over ~20 shuffle-heavy ops accumulates shuffle
        # files: ContextCleaner only removes a ShuffleDependency's files once
        # the driver GCs its reference, and the periodic fallback GC fires
        # every 30 min by default — at this fixture scale the blockmgr dir
        # grew past 60 GB and two ops died on ENOSPC before the cleaner ever
        # ran.  Drop Python-side refs, then force a driver JVM GC so the
        # cleaner reclaims each op's shuffle before the next op starts.
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            # a task-thread OutOfMemoryError exits the local-mode JVM via
            # SparkUncaughtExceptionHandler — keep the already-collected
            # results printable instead of dying on a dead gateway.  (For
            # full isolation run one op per invocation; each gets its own
            # JVM.)
            out[name]["jvm_dead"] = True
            print(f"{name}: {out[name]}", file=sys.stderr, flush=True)
            break
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps({"sf_dir": args.sf_dir, "ops": out}))


if __name__ == "__main__":
    main()
