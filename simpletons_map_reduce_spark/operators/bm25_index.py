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
- ``bm25_meta.parquet``  1 row (n docs, avgdl, n_tokens) — the corpus
  constants + the staleness check.

The PROBE (``bm25_search_indexed``) reads term-pruned postings, joins
the broadcast per-term stats and the doc-keyed length relation, and
ranks with the same order-exact integer-unit score sum as the inline
operator — identical output, same DuckDB oracle, zero corpus scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bm25_index(
    docs: DataFrame, index_dir: str, n_corpus: int | None = None
) -> None:
    """Tokenize (doc_id, text) once and persist the postings, doc-length,
    and term-stats relations.  ``n_corpus`` lets callers that already
    counted the corpus (bm25_index_for via index_location) skip the
    redundant count job; standalone callers omit it."""
    from ..caching import tracked_persist
    from ..functions.text import tokens_lower

    e = docs.select(
        "doc_id", F.explode(tokens_lower(F.col("text"))).alias("tok")
    )
    postings = tracked_persist(
        e.groupBy("tok", "doc_id").agg(F.count("*").cast("long").alias("tf"))
    )
    (
        postings.repartition("tok")
        .sortWithinPartitions("tok")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/postings.parquet")
    )
    dl = postings.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("dl")
    )
    dl.write.mode("overwrite").parquet(f"{index_dir}/doclen.parquet")
    (
        postings.groupBy("tok")
        .agg(F.count("*").cast("long").alias("df"))
        .repartition("tok")
        .sortWithinPartitions("tok")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/termstats.parquet")
    )
    spark = docs.sparkSession
    stats = (
        spark.read.parquet(f"{index_dir}/doclen.parquet")
        .agg(
            F.count("*").alias("n"),
            F.avg("dl").alias("avgdl"),
            F.sum("dl").alias("n_tokens"),
        )
        .collect()[0]
    )
    # n (scoring) counts docs with >= 1 token — the population BM25's
    # N/avgdl are defined over (a letterless doc can never be a hit);
    # n_corpus (staleness) counts ALL documents, the same unit callers'
    # expect_n uses — conflating the two bricks the index on any corpus
    # containing an empty/letterless doc.
    if n_corpus is None:
        n_corpus = docs.count()
    meta = spark.createDataFrame(
        [(stats.n, float(stats.avgdl), stats.n_tokens, n_corpus)],
        "n BIGINT, avgdl DOUBLE, n_tokens BIGINT, n_corpus BIGINT",
    )
    meta.coalesce(1).write.mode("overwrite").parquet(
        f"{index_dir}/bm25_meta.parquet"
    )


def load_bm25_index(
    spark: SparkSession, index_dir: str, expect_n: int | None = None
) -> tuple[DataFrame, DataFrame, DataFrame, float, float]:
    """(postings, doclen, termstats, n_docs, avgdl), refusing a stale
    artifact on corpus-size mismatch."""
    meta = spark.read.parquet(f"{index_dir}/bm25_meta.parquet").collect()[0]
    if expect_n is not None and meta.n_corpus != expect_n:
        raise ValueError(
            f"stale BM25 index at {index_dir}: built over "
            f"n_corpus={meta.n_corpus}, corpus now has n={expect_n} — "
            f"rebuild with write_bm25_index"
        )
    return (
        spark.read.parquet(f"{index_dir}/postings.parquet"),
        spark.read.parquet(f"{index_dir}/doclen.parquet"),
        spark.read.parquet(f"{index_dir}/termstats.parquet"),
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

    index_dir, n = index_location(spark, sf_dir, root, "documents")

    def _build():
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        write_bm25_index(docs, index_dir, n_corpus=n)

    return cache_or_build(
        index_dir,
        "bm25_meta.parquet",
        force,
        _build,
        lambda: load_bm25_index(spark, index_dir, expect_n=n),
    )
