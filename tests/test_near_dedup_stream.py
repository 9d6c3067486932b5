"""Streaming near-dedup: twin ≡ batch on unsaturated corpora,
cross-micro-batch incremental probing, and the arrival-order cap."""

from __future__ import annotations

import os

from simpletons_map_reduce_spark.caching import release_persisted
from simpletons_map_reduce_spark.queries.dedup_ops import near_dedup_pairs
from simpletons_map_reduce_spark.sources.tables import load_table
from simpletons_map_reduce_spark.streaming import run_to_memory
from simpletons_map_reduce_spark.streaming.dedup_stream import DOCS_RAW_SCHEMA
from simpletons_map_reduce_spark.streaming.near_dedup_stream import (
    near_dedup_stream,
    near_dedup_stream_from,
)
from tests.conftest import SF0001


def test_near_dedup_stream_matches_batch(spark):
    """On a bounded in-window corpus with no saturated band buckets the
    streaming probe must find EXACTLY the batch operator's pairs, same
    4-dp jaccard values (per-band re-emissions dedup'd, as documented)."""
    out = run_to_memory(
        near_dedup_stream(spark, SF0001), "t_near_stream", mode="append"
    ).collect()
    got = {(r.doc_a, r.doc_b, r.jaccard) for r in out}
    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")
    try:
        want = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in near_dedup_pairs(docs).collect()
        }
    finally:
        release_persisted()
    assert got == want
    assert want, "fixture has no near-dup pairs — comparison vacuous"


def _write_docs(spark, path: str, rows, mtime: float) -> None:
    df = spark.createDataFrame(rows, DOCS_RAW_SCHEMA).coalesce(1)
    df.write.mode("overwrite").parquet(path)
    for f in os.listdir(path):
        os.utime(os.path.join(path, f), (mtime, mtime))


def _doc(doc_id: int, text: str) -> tuple:
    return (doc_id, text, "en", "srcT", len(text))


_BASE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa"
)


def test_near_dedup_stream_probes_across_micro_batches(spark, tmp_path):
    """A near-dup arriving in a LATER micro-batch must pair with state
    stored by an earlier one — the incremental property the batch op
    cannot express."""
    root = str(tmp_path / "stream_in")
    _write_docs(spark, f"{root}/b0", [_doc(1, _BASE)], mtime=1_000)
    _write_docs(
        spark,
        f"{root}/b1",
        [_doc(2, _BASE + " quebec")],  # near-dup of doc 1, arrives later
        mtime=2_000,
    )
    raw = (
        spark.readStream.format("parquet")
        .schema(DOCS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet")
        .load(f"{root}/*")
    )
    out = run_to_memory(
        near_dedup_stream_from(raw.select("doc_id", "text")),
        "t_near_inc",
        mode="append",
    ).collect()
    assert {(r.doc_a, r.doc_b) for r in out} == {(1, 2)}
    assert all(r.jaccard >= 0.5 for r in out)


def test_near_dedup_stream_ttl_evicts_stale_buckets(spark, tmp_path):
    """TTL variant: a near-dup arriving AFTER the bucket idled past the
    TTL (as observed via the watermark) finds evicted state and emits
    nothing; with a large TTL the same replay pairs across batches."""
    import pyspark.sql.functions as F

    from simpletons_map_reduce_spark.streaming.near_dedup_stream import (
        near_dedup_stream_ttl_from,
    )

    root = str(tmp_path / "ttl_in")
    # t=1000s: two near-dups seed the bucket state
    _write_docs(
        spark, f"{root}/b0",
        [_doc(1, _BASE), _doc(2, _BASE + " quebec")], mtime=1_000,
    )
    # t=100000s: unrelated doc advances the watermark far past ttl
    _write_docs(
        spark, f"{root}/b1",
        [_doc(50, "zulu yankee xray whiskey victor uniform tango sierra")],
        mtime=2_000,
    )
    # a late near-dup of doc 1 — arrives after the bucket's TTL fired
    _write_docs(
        spark, f"{root}/b2", [_doc(90, _BASE)], mtime=3_000,
    )

    def run(name, ttl):
        raw = (
            spark.readStream.format("parquet")
            .schema(DOCS_RAW_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "*.parquet")
            .load(f"{root}/*")
        )
        # event time: doc 50 at 100000 s places the watermark far past
        # docs 1/2 (at ~1000 s) + any reasonable ttl; doc 90 at 100090 s
        docs = raw.select(
            "doc_id",
            "text",
            F.timestamp_micros(
                (F.when(F.col("doc_id") < 10, F.col("doc_id") + 1000)
                 .otherwise(F.col("doc_id") + 100_000)) * 1_000_000
            ).alias("ingest_ts"),
        )
        return run_to_memory(
            near_dedup_stream_ttl_from(
                docs, ttl=ttl, watermark="10 seconds"
            ),
            name,
            mode="append",
        ).collect()

    evicted = {(r.doc_a, r.doc_b)
               for r in run("t_near_ttl_short", "10 minutes")}
    assert evicted == {(1, 2)}, evicted  # doc 90 probed an evicted bucket
    kept = {(r.doc_a, r.doc_b) for r in run("t_near_ttl_long", "100 hours")}
    assert kept == {(1, 2), (1, 90), (2, 90)}, kept


def test_near_dedup_stream_cap_is_arrival_order(spark, tmp_path):
    """With bucket_cap = 2, only the first two arrivals of a bucket are
    stored: a third identical doc still PROBES (pairs with both stored
    members) but is not stored, so a fourth pairs with the same two —
    state stays bounded at cap gram sets per bucket."""
    root = str(tmp_path / "cap_in")
    _write_docs(
        spark,
        f"{root}/b0",
        [_doc(i, _BASE) for i in range(1, 5)],  # 4 identical docs
        mtime=1_000,
    )
    raw = (
        spark.readStream.format("parquet")
        .schema(DOCS_RAW_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .load(f"{root}/*")
    )
    out = run_to_memory(
        near_dedup_stream_from(raw.select("doc_id", "text"), bucket_cap=2),
        "t_near_cap",
        mode="append",
    ).collect()
    pairs = {(r.doc_a, r.doc_b) for r in out}
    # stored: docs 1, 2.  doc 2 pairs with 1; docs 3 and 4 probe the two
    # stored members each; 3-4 never pair (neither is stored).
    assert pairs == {(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)}
