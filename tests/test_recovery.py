"""Checkpoint recovery: a restarted stream must neither lose nor duplicate.

The reference's at-least-once retry story (SURVEY §2.A′ R5/R6) is pinned for
batch by tests/test_chaos.py; these tests pin the STREAMING counterpart:
source offsets and operator state live in the checkpoint, the file sink's
commit log dedups output, so stop → restart replays nothing and forgets
nothing (exactly-once end-to-end for the parquet sink).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from simpletons_map_reduce_spark.streaming.dedup_stream import (
    DOCS_RAW_SCHEMA,
    dedup_stream_from,
)


def _write_docs(spark, path: str, rows, mtime: float) -> None:
    df = spark.createDataFrame(rows, DOCS_RAW_SCHEMA).coalesce(1)
    df.write.mode("overwrite").parquet(path)
    for f in os.listdir(path):
        os.utime(os.path.join(path, f), (mtime, mtime))


def _doc(doc_id: int, text: str) -> tuple:
    return (doc_id, text, "en", "srcR", len(text))


def _reader(spark, root: str):
    return (
        spark.readStream.format("parquet")
        .schema(DOCS_RAW_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .load(f"{root}/*")
    )


def _run_once(df, sink: str, ckpt: str) -> None:
    q = (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_restart_is_exactly_once_for_file_sink(spark, tmp_path):
    """Stateless projection: rows written before the stop must not be
    re-emitted after the restart, and new rows must all appear."""
    root = str(tmp_path / "in")
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    now = time.time()
    _write_docs(spark, f"{root}/b1", [_doc(i, f"t{i}") for i in range(5)], now - 100)
    proj = _reader(spark, root).select("doc_id", "text")
    _run_once(proj, sink, ckpt)

    # new data lands while the query is DOWN; restart from the checkpoint
    _write_docs(
        spark, f"{root}/b2", [_doc(i, f"t{i}") for i in range(5, 8)], now - 50
    )
    _run_once(_reader(spark, root).select("doc_id", "text"), sink, ckpt)

    got = sorted(r.doc_id for r in spark.read.parquet(sink).collect())
    assert got == list(range(8)), got  # nothing lost, nothing duplicated


def test_dedup_state_survives_restart(spark, tmp_path):
    """A duplicate of a pre-restart document arriving AFTER the restart must
    still be suppressed — the dropDuplicatesWithinWatermark state store is
    recovered from the checkpoint, not rebuilt empty."""
    root = str(tmp_path / "in")
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    now = time.time()
    _write_docs(
        spark, f"{root}/b1", [_doc(100, "alpha"), _doc(100, "beta")], now - 100
    )

    def dedup_df():
        docs = _reader(spark, root).select(
            "doc_id",
            F.md5("text").alias("content_hash"),
            F.timestamp_micros((F.col("doc_id") + 1000) * 1_000_000).alias(
                "ingest_ts"
            ),
        )
        return dedup_stream_from(docs, watermark="1 hour")

    _run_once(dedup_df(), sink, ckpt)
    # dup of "alpha" + one new doc arrive while the query is down
    _write_docs(
        spark, f"{root}/b2", [_doc(101, "alpha"), _doc(101, "gamma")], now - 50
    )
    _run_once(dedup_df(), sink, ckpt)

    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 3, rows  # alpha once, beta once, gamma once
    by_winner = sorted((r.doc_id) for r in rows)
    assert by_winner == [100, 100, 101], rows
