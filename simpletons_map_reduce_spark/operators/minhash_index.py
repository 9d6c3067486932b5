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
- ``mh_meta.parquet``      1 row (n, num_perm, band_rows) — staleness
  check + the signature-scheme fingerprint (an artifact built under a
  different permutation count refuses to load rather than silently
  producing wrong-band probes).

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


def write_minhash_index(docs: DataFrame, index_dir: str) -> None:
    """Compute shingle sets + LSH bands over (doc_id, text) and persist
    both relations.  ``docs`` is scanned once: the shingle projection is
    persisted DISK_ONLY (house rule for corpus-scale array rows) and
    feeds both writes."""
    from ..caching import tracked_persist
    from ..functions.hashing import minhash_params
    from ..functions.vectorized import np_minhash_bands
    from ..queries.dedup_ops import BAND_ROWS, NUM_PERM, shingle_projection

    from pyspark.storagelevel import StorageLevel

    shs = tracked_persist(
        shingle_projection(docs), level=StorageLevel.DISK_ONLY
    )
    (
        shs.select("doc_id", "shset")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/mh_shingles.parquet")
    )
    bands = np_minhash_bands(
        shs.select("doc_id", "hl"), minhash_params(NUM_PERM), BAND_ROWS
    )
    # cluster files by band so a probe's bucket-count window reads
    # band-colocated row groups (the exchange still happens — plain
    # parquet carries no partitioning metadata — but IO locality holds).
    (
        bands.repartition("band")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/mh_bands.parquet")
    )
    n = docs.count()
    meta = docs.sparkSession.createDataFrame(
        [(n, NUM_PERM, BAND_ROWS)], "n BIGINT, num_perm BIGINT, band_rows BIGINT"
    )
    meta.coalesce(1).write.mode("overwrite").parquet(
        f"{index_dir}/mh_meta.parquet"
    )


def load_minhash_index(
    spark: SparkSession, index_dir: str, expect_n: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """(shingles, bands) with the same staleness contract as the ANN
    artifacts: a count or signature-scheme mismatch raises instead of
    silently probing a stale index."""
    from ..queries.dedup_ops import BAND_ROWS, NUM_PERM

    meta = spark.read.parquet(f"{index_dir}/mh_meta.parquet").collect()[0]
    if expect_n is not None and meta.n != expect_n:
        raise ValueError(
            f"stale MinHash index at {index_dir}: built over n={meta.n}, "
            f"corpus now has n={expect_n} — rebuild with write_minhash_index"
        )
    if (meta.num_perm, meta.band_rows) != (NUM_PERM, BAND_ROWS):
        raise ValueError(
            f"MinHash index at {index_dir} was built with "
            f"num_perm={meta.num_perm}, band_rows={meta.band_rows}; the "
            f"engine now uses ({NUM_PERM}, {BAND_ROWS}) — rebuild"
        )
    return (
        spark.read.parquet(f"{index_dir}/mh_shingles.parquet"),
        spark.read.parquet(f"{index_dir}/mh_bands.parquet"),
    )


def minhash_index_for(
    spark: SparkSession,
    sf_dir: str,
    root: str | None = None,
    force: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Cache-or-build under the shared per-corpus artifact directory
    (``ann_index.index_location`` keying; a num_perm/band_rows scheme
    bump rebuilds automatically via ``cache_or_build``)."""
    from ..sources.tables import load_table, spread
    from .ann_index import cache_or_build, index_location

    index_dir, n = index_location(spark, sf_dir, root, "documents")

    def _build():
        docs = spread(
            load_table(spark, sf_dir, "documents").select("doc_id", "text")
        )
        write_minhash_index(docs, index_dir)

    return cache_or_build(
        index_dir,
        "mh_meta.parquet",
        force,
        _build,
        lambda: load_minhash_index(spark, index_dir, expect_n=n),
    )
