"""Streaming exact deduplication — the dedup family's streaming twin.

Batch dedup (queries/dedup_ops.py::exact_dedup) sees the whole corpus at
once; a streaming ingest pipeline instead sees documents arrive over time
and must emit each distinct content exactly once WITHOUT keeping state
forever.  ``dropDuplicatesWithinWatermark`` is the Spark operator for that
contract: the state store keeps one entry per content hash, sharded by hash
across executors like any keyed state, and the event-time watermark evicts
entries once no duplicate can still arrive — state tracks the active
ingest window, never stream history (same bounded-state posture as
streaming/stateful.py's TTL eviction).

The trade is explicit and pinned by tests/test_dedup_stream.py: a duplicate
arriving AFTER the watermark has evicted its key is re-emitted.  That is
the correct streaming answer — exact-once dedup over unbounded history is
impossible in bounded memory; production pipelines compose this operator
with a periodic batch `exact_dedup` compaction over the sink (the
lambda-architecture shape), which `dedup_apply` provides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import ensure_confs

#: documents.parquet physical schema (file streams need an explicit schema).
DOCS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def docs_raw_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the documents parquet, handling BOTH fixture
    layouts: the driver's single ``documents.parquet`` FILE (file-stream
    sources need a directory, so glob-filter the sf dir) and
    Spark-written ``documents.parquet/`` DIRECTORIES of part files
    (big-SF fixtures — load the directory itself; the glob would reject
    the ``part-*`` leaf names)."""
    import os

    ensure_confs(spark)
    reader = spark.readStream.format("parquet").schema(DOCS_RAW_SCHEMA)
    # micro-batch pacing knob for scale replays — same contract as
    # events_stream (tools/stress_streaming.py)
    max_files = os.environ.get("SPARK_GRAFT_STREAM_MAX_FILES")
    if max_files:
        reader = reader.option("maxFilesPerTrigger", int(max_files))
    path = f"{sf_dir}/documents.parquet"
    if os.path.isdir(path):
        return reader.load(path)
    return reader.option("pathGlobFilter", "documents.parquet").load(sf_dir)


def docs_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the documents parquet with a deterministic synthetic
    ingest timestamp (derived from doc_id so tests are replayable; a real
    ingest source carries its own event time)."""
    raw = docs_raw_stream(spark, sf_dir)
    return raw.select(
        "doc_id",
        F.md5("text").alias("content_hash"),
        # +1000 s offset: a row AT the stream's initial watermark (epoch 0)
        # would be discarded as late before dedup state even sees it.
        F.timestamp_micros((F.col("doc_id") + 1000) * 1_000_000).alias("ingest_ts"),
    )


def dedup_stream_from(docs: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """First-arrival winner per content hash within the watermark window.

    Append-mode output: one row per distinct content_hash per eviction
    window.  State size = |distinct hashes in window| × ~48 B, independent
    of stream length.
    """
    return (
        docs.withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
        .select("content_hash", "doc_id", "ingest_ts")
    )


def dedup_stream(
    spark: SparkSession, sf_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming twin of exact_dedup over the sf documents table."""
    return dedup_stream_from(docs_stream(spark, sf_dir), watermark)
