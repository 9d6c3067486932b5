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
row count) and validates the count on load (a parquet count() is
metadata-cheap), so a regenerated fixture of different size can never be
served a stale index; same-size content changes require an explicit
rebuild (``force=True``), exactly like re-CLUSTERing a table.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: default root for cached per-corpus index artifacts.
DEFAULT_INDEX_ROOT = str(Path(__file__).resolve().parents[2] / ".annindex")


def index_location(
    spark: SparkSession, sf_dir: str, root: str | None, table: str
) -> tuple[str, int]:
    """(index_dir, n): the shared per-corpus artifact directory under
    ``root`` (default ``<repo>/.annindex``; override with
    $SPARK_GRAFT_ANNINDEX for sweeps on other volumes).

    Keyed on (corpus dir BASENAME, an 8-hex digest of the corpus dir's
    ABSOLUTE path, row count of the indexed table): the path digest keeps
    two different corpora that happen to share a basename and a row
    count (e.g. /vol_a/sf001 vs /vol_b/sf001) from silently serving each
    other's artifacts.  Embedding-table artifacts (IVF/PQ/LSH) and
    document-table artifacts (MinHash/BM25) land in the same directory
    when the two tables have equal row counts (the fixtures' shape) and
    in sibling ``<name>-…`` directories otherwise — coexistence is a
    convenience, not a contract."""
    import hashlib

    root = root or os.environ.get("SPARK_GRAFT_ANNINDEX", DEFAULT_INDEX_ROOT)
    n = spark.read.parquet(f"{sf_dir}/{table}.parquet").count()
    resolved = str(Path(sf_dir).resolve())
    digest = hashlib.md5(resolved.encode()).hexdigest()[:8]
    name = Path(resolved.rstrip("/")).name or "corpus"
    return str(Path(root) / f"{name}-{digest}-n{n}"), n


def cache_or_build(index_dir: str, meta_name: str, force: bool, build, load):
    """Shared cache-or-build gate: build when forced or the meta file is
    absent; otherwise load, and if the load fails for ANY reason —
    staleness/scheme-fingerprint ValueError, a meta schema from an older
    engine version, or a corrupt/partially-written artifact (killed mid-
    overwrite) — rebuild ONCE and re-load.  A rebuild is always safe,
    and a permanent load error would brick every registered probe query
    until someone hand-deleted the artifact.  A genuine code bug in the
    load path costs one wasted rebuild and then surfaces unchanged from
    the second load."""
    if force or not Path(f"{index_dir}/{meta_name}").exists():
        build()
        return load()
    try:
        return load()
    except Exception:
        build()
        return load()


def write_ivf_index(emb: DataFrame, index_dir: str) -> None:
    """Build the IVF index over a (vec_id, v, nv) relation and persist it.

    ``emb`` should be persisted by the caller if it is expensive to
    recompute (the build scans it for the count, the Lloyd sample, and
    the assignment pass).
    """
    from ..queries.similarity_ops import EMB_DIM, _ivf_build

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
    meta = emb.sparkSession.createDataFrame(
        [(n, k, EMB_DIM)], "n BIGINT, k BIGINT, dim BIGINT"
    )
    meta.coalesce(1).write.mode("overwrite").parquet(
        f"{index_dir}/meta.parquet"
    )


def load_ivf_index(
    spark: SparkSession, index_dir: str, expect_n: int | None = None
) -> tuple[DataFrame, DataFrame, int]:
    """Load a written index as the (cents, assigned, k) triple the search
    paths take.  ``expect_n`` (the current corpus row count) makes the
    load refuse a stale artifact instead of silently probing it."""
    meta = spark.read.parquet(f"{index_dir}/meta.parquet").collect()[0]
    if expect_n is not None and meta.n != expect_n:
        raise ValueError(
            f"stale IVF index at {index_dir}: built over n={meta.n}, "
            f"corpus now has n={expect_n} — rebuild with write_ivf_index"
        )
    cents = spark.read.parquet(f"{index_dir}/centroids.parquet")
    assigned = spark.read.parquet(f"{index_dir}/assignments.parquet")
    return cents, assigned, int(meta.k)


def write_pq_index(emb: DataFrame, index_dir: str) -> None:
    """Build the PQ index over a (vec_id, v, nv) relation and persist it:
    the per-subspace codebooks plus the ENCODED corpus (PQ_M uint8-range
    codes per vector — the 64× compression that lets a 100 TB embedding
    corpus live in cluster memory).  The encode pass — the O(n·k) term —
    is paid here once; probes stream the 8-byte-code relation only."""
    from ..functions.vectorized import np_pq_encode, pq_train_codebook
    from ..queries.similarity_ops import PQ_K, PQ_M

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
    meta = emb.sparkSession.createDataFrame(
        [(n, PQ_M, PQ_K)], "n BIGINT, m BIGINT, k BIGINT"
    )
    meta.coalesce(1).write.mode("overwrite").parquet(
        f"{index_dir}/pq_meta.parquet"
    )


def load_pq_index(
    spark: SparkSession, index_dir: str, expect_n: int | None = None
) -> tuple[str, DataFrame]:
    """(codebook_path, codes relation) with the same staleness contract
    as :func:`load_ivf_index`."""
    meta = spark.read.parquet(f"{index_dir}/pq_meta.parquet").collect()[0]
    if expect_n is not None and meta.n != expect_n:
        raise ValueError(
            f"stale PQ index at {index_dir}: built over n={meta.n}, "
            f"corpus now has n={expect_n} — rebuild with write_pq_index"
        )
    return (
        f"{index_dir}/pq_codebook.parquet",
        spark.read.parquet(f"{index_dir}/pq_codes.parquet"),
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
    index_dir, n = index_location(spark, sf_dir, root, "embeddings")
    return cache_or_build(
        index_dir,
        "pq_meta.parquet",
        force,
        lambda: write_pq_index(_persisted_emb(spark, sf_dir), index_dir),
        lambda: load_pq_index(spark, index_dir, expect_n=n),
    )


def _hyperplane_checksum(planes: list[list[int]]) -> int:
    """Order-sensitive integer fingerprint of the ±1 hyperplane matrix —
    cheap, deterministic, and any seed/geometry change flips it."""
    acc = 0
    for i, row in enumerate(planes):
        for j, v in enumerate(row):
            acc = (acc * 1_000_003 + (i * len(row) + j + 2) * v) % (2**61 - 1)
    return acc


def write_lsh_index(emb: DataFrame, index_dir: str) -> None:
    """Build the sign-random-projection band relation over a (vec_id, v,
    nv) relation and persist it — the signature matmul (the only Arrow
    stage of the LSH path) is paid here once; probes are pure JVM."""
    from ..functions.vectorized import np_sign_bands
    from ..queries.similarity_ops import LSH_BAND_BITS, LSH_NBITS, _hyperplanes

    planes = _hyperplanes()
    (
        np_sign_bands(emb, planes, LSH_BAND_BITS)
        .repartition("band", "bkey")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/lsh_bands.parquet")
    )
    n = emb.count()
    meta = emb.sparkSession.createDataFrame(
        [(n, LSH_NBITS, LSH_BAND_BITS, _hyperplane_checksum(planes))],
        "n BIGINT, nbits BIGINT, band_bits BIGINT, plane_sum BIGINT",
    )
    meta.coalesce(1).write.mode("overwrite").parquet(
        f"{index_dir}/lsh_meta.parquet"
    )


def load_lsh_index(
    spark: SparkSession, index_dir: str, expect_n: int | None = None
) -> DataFrame:
    """The (vec_id, band, bkey) band relation, refusing stale artifacts:
    corpus-size mismatch AND hyperplane/geometry mismatch both raise."""
    from ..queries.similarity_ops import LSH_BAND_BITS, LSH_NBITS, _hyperplanes

    meta = spark.read.parquet(f"{index_dir}/lsh_meta.parquet").collect()[0]
    if expect_n is not None and meta.n != expect_n:
        raise ValueError(
            f"stale LSH index at {index_dir}: built over n={meta.n}, "
            f"corpus now has n={expect_n} — rebuild with write_lsh_index"
        )
    current = (LSH_NBITS, LSH_BAND_BITS, _hyperplane_checksum(_hyperplanes()))
    if (meta.nbits, meta.band_bits, meta.plane_sum) != current:
        raise ValueError(
            f"LSH index at {index_dir} was built under different "
            f"hyperplanes/geometry (nbits={meta.nbits}, "
            f"band_bits={meta.band_bits}) — rebuild"
        )
    return spark.read.parquet(f"{index_dir}/lsh_bands.parquet")


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
    index_dir, n = index_location(spark, sf_dir, root, "embeddings")
    return cache_or_build(
        index_dir,
        "lsh_meta.parquet",
        force,
        lambda: write_lsh_index(_persisted_emb(spark, sf_dir), index_dir),
        lambda: load_lsh_index(spark, index_dir, expect_n=n),
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
    index_dir, n = index_location(spark, sf_dir, root, "embeddings")
    return cache_or_build(
        index_dir,
        "meta.parquet",
        force,
        lambda: write_ivf_index(_persisted_emb(spark, sf_dir), index_dir),
        lambda: load_ivf_index(spark, index_dir, expect_n=n),
    )
