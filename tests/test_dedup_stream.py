"""Streaming dedup: batch equivalence on bounded input, cross-micro-batch
state, and the (deliberate) watermark-eviction re-emit contract."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from simpletons_map_reduce_spark.sources.tables import load_table
from simpletons_map_reduce_spark.streaming import run_to_memory
from simpletons_map_reduce_spark.streaming.dedup_stream import (
    DOCS_RAW_SCHEMA,
    dedup_stream,
    dedup_stream_from,
)
from tests.conftest import SF0001


def test_dedup_stream_matches_batch_distinct(spark):
    out = run_to_memory(dedup_stream(spark, SF0001), "t_dedup").collect()
    got = {r.content_hash for r in out}
    want = {
        r.h
        for r in load_table(spark, SF0001, "documents")
        .select(F.md5("text").alias("h"))
        .distinct()
        .collect()
    }
    assert got == want
    # exactly one emission per distinct hash on a bounded, in-window stream
    assert len(out) == len(want)


def _write_docs(spark, path: str, rows, mtime: float) -> None:
    df = spark.createDataFrame(rows, DOCS_RAW_SCHEMA).coalesce(1)
    df.write.mode("overwrite").parquet(path)
    for f in os.listdir(path):
        os.utime(os.path.join(path, f), (mtime, mtime))


def _doc(doc_id: int, text: str) -> tuple:
    return (doc_id, text, "en", "srcT", len(text))


def _streamed(spark, root: str, name: str):
    raw = (
        spark.readStream.format("parquet")
        .schema(DOCS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet")
        .load(f"{root}/*")
    )
    docs = raw.select(
        "doc_id",
        F.md5("text").alias("content_hash"),
        # ingest time: doc_id minutes — lets tests place docs on a timeline
        F.timestamp_micros(F.col("doc_id") * 60 * 1_000_000).alias("ingest_ts"),
    )
    return run_to_memory(
        dedup_stream_from(docs, watermark="10 minutes"), name
    ).collect()


def test_duplicate_across_micro_batches_is_dropped(spark, tmp_path):
    """A duplicate arriving in a LATER micro-batch (inside the watermark)
    must be suppressed by the state store."""
    root = str(tmp_path / "docs")
    now = time.time()
    # minute 100: A, B; minute 101: dup-of-A (different doc_id), C
    _write_docs(spark, f"{root}/b1", [_doc(100, "alpha"), _doc(100, "beta")], now - 100)
    _write_docs(spark, f"{root}/b2", [_doc(101, "alpha"), _doc(101, "gamma")], now - 50)
    out = _streamed(spark, root, "t_cross_batch")
    emitted = sorted((r.doc_id, r.content_hash) for r in out)
    # 3 distinct texts -> 3 emissions; the winner for "alpha" is doc 100
    assert len(out) == 3
    assert sum(1 for d, _ in emitted if d == 100) == 2
    assert sum(1 for d, _ in emitted if d == 101) == 1


def test_post_eviction_duplicate_reemits(spark, tmp_path):
    """Once the watermark passes a key's window the state is evicted and a
    late duplicate is re-emitted — the documented bounded-state trade
    (compose with batch dedup_apply compaction for global exactness)."""
    root = str(tmp_path / "docs")
    now = time.time()
    _write_docs(spark, f"{root}/b1", [_doc(100, "alpha")], now - 100)
    # minute 200 advances the watermark to 190 > "alpha"'s 110 expiry, but
    # state CLEANUP runs at end-of-batch — the key is only gone after the
    # NEXT batch completes, hence the extra filler batch before the dup.
    _write_docs(spark, f"{root}/b2", [_doc(200, "filler")], now - 80)
    _write_docs(spark, f"{root}/b3", [_doc(210, "filler2")], now - 60)
    _write_docs(spark, f"{root}/b4", [_doc(211, "alpha")], now - 40)
    out = _streamed(spark, root, "t_reemit")
    alpha_rows = [r for r in out if r.doc_id in (100, 211)]
    assert len(alpha_rows) == 2, out
