"""Streaming Bloom membership: arrival-order simulation parity, batch-twin
agreement on the split fixture, and the one-sided (no-false-negative)
contract surviving incrementality."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from simpletons_map_reduce_spark.queries import REGISTRY
from simpletons_map_reduce_spark.queries.sketch_ops import (
    BLOOM_BATCH_MOD,
    BLOOM_K,
    BLOOM_M_BITS,
)
from simpletons_map_reduce_spark.sources.tables import load_table
from simpletons_map_reduce_spark.streaming import run_to_memory
from simpletons_map_reduce_spark.streaming.bloom_stream import (
    bloom_stream,
    bloom_stream_from,
    decisions_from_hits,
)
from simpletons_map_reduce_spark.streaming.dedup_stream import DOCS_RAW_SCHEMA
from tests.conftest import SF0001


def _positions(text: str) -> list[int]:
    """Pure-Python mirror of the shared md5-int60 position arithmetic."""
    key = hashlib.sha256(text.encode()).hexdigest()
    return [
        int(hashlib.md5(f"{i}:{key}".encode()).hexdigest()[:15], 16)
        % BLOOM_M_BITS
        for i in range(BLOOM_K)
    ]


def _simulate(docs: list[tuple[int, str]]) -> dict[int, bool]:
    """Independent arrival-order reference: probe-then-insert a plain
    Python bit set, doc_id order."""
    bits: set[int] = set()
    out: dict[int, bool] = {}
    for doc_id, text in sorted(docs):
        pos = _positions(text)
        out[doc_id] = all(p in bits for p in pos)
        bits.update(pos)
    return out


def test_bloom_stream_matches_simulation(spark):
    """One micro-batch over the whole sf0.001 corpus: reassembled stream
    decisions must equal the pure-Python arrival-order simulation
    bit-for-bit."""
    hits = run_to_memory(bloom_stream(spark, SF0001), "t_bloom_sim", mode="append")
    got = {
        r.doc_id: (bool(r.bloom_hit), r.n_probes)
        for r in decisions_from_hits(hits).collect()
    }
    docs = [
        (r.doc_id, r.text)
        for r in load_table(spark, SF0001, "documents")
        .select("doc_id", "text")
        .collect()
    ]
    want = _simulate(docs)
    assert got.keys() == want.keys()
    for doc_id, (hit, n_probes) in got.items():
        assert n_probes == BLOOM_K, (doc_id, n_probes)
        assert hit == want[doc_id], doc_id


def test_bloom_stream_agrees_with_batch_on_split_fixture(spark, tmp_path):
    """Corpus docs in micro-batch 0, probe docs in micro-batch 1 — the
    batch op's exact setting.  Stream decisions for the probe batch must
    match batch bloom_probe except where arrival-time semantics see MORE
    (a probe doc duplicating an earlier probe doc): there stream=True is
    correct and documented; stream may never report False where batch
    reports True (no false negatives vs a subset filter)."""
    import os

    docs = (
        load_table(spark, SF0001, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .collect()
    )
    corpus = [tuple(r) for r in docs if r.doc_id % BLOOM_BATCH_MOD != 0]
    probe = [tuple(r) for r in docs if r.doc_id % BLOOM_BATCH_MOD == 0]

    root = str(tmp_path / "bloom_in")
    for sub, rows, mtime in (("b0", corpus, 1_000), ("b1", probe, 2_000)):
        df = spark.createDataFrame(rows, DOCS_RAW_SCHEMA).coalesce(1)
        df.write.mode("overwrite").parquet(f"{root}/{sub}")
        for f in os.listdir(f"{root}/{sub}"):
            os.utime(os.path.join(f"{root}/{sub}", f), (mtime, mtime))

    raw = (
        spark.readStream.format("parquet")
        .schema(DOCS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet")
        .load(f"{root}/*")
    )
    hits = run_to_memory(
        bloom_stream_from(raw.select("doc_id", "text")),
        "t_bloom_split",
        mode="append",
    )
    stream = {
        r.doc_id: bool(r.bloom_hit)
        for r in decisions_from_hits(hits).collect()
        if r.doc_id % BLOOM_BATCH_MOD == 0
    }
    batch = {
        r.doc_id: bool(r.bloom_hit)
        for r in REGISTRY["bloom_probe"].fn(spark, SF0001).collect()
    }
    assert stream.keys() == batch.keys()
    # Arrival-time truth for the probe batch: each probe doc sees the
    # corpus bits PLUS every earlier probe doc's bits (probe-then-insert
    # in doc_id order).  This covers both legal stream-only-hit causes —
    # an intra-probe exact duplicate AND a genuine FP collision against
    # probe-doc-inserted bits (ADVICE r6) — with one exact predicate.
    probe_texts: dict[int, str] = {r[0]: r[1] for r in probe}
    bits_at_arrival: set[int] = set()
    for _, text, *_rest in corpus:
        bits_at_arrival.update(_positions(text))
    arrival_hit: dict[int, bool] = {}
    for doc_id in sorted(probe_texts):
        pos = _positions(probe_texts[doc_id])
        arrival_hit[doc_id] = all(p in bits_at_arrival for p in pos)
        bits_at_arrival.update(pos)
    for doc_id, batch_hit in batch.items():
        if batch_hit:
            # stream state is a SUPERSET of the batch corpus filter at
            # probe time -> no false negatives possible
            assert stream[doc_id], doc_id
        else:
            # batch miss: the stream decision must equal the exact
            # arrival-time simulation over corpus + earlier probe bits
            assert stream[doc_id] == arrival_hit[doc_id], doc_id


def test_bloom_stream_cross_batch_membership(spark, tmp_path):
    """A document arriving in a later micro-batch must hit the bits a
    previous micro-batch inserted — the incremental property."""
    import os

    rows0 = [(1, "the quick brown fox", "en", "srcB", 19)]
    rows1 = [
        (2, "the quick brown fox", "en", "srcB", 19),  # exact dup of 1
        (3, "an entirely different document", "en", "srcB", 30),
    ]
    root = str(tmp_path / "bloom_inc")
    for sub, rows, mtime in (("b0", rows0, 1_000), ("b1", rows1, 2_000)):
        df = spark.createDataFrame(rows, DOCS_RAW_SCHEMA).coalesce(1)
        df.write.mode("overwrite").parquet(f"{root}/{sub}")
        for f in os.listdir(f"{root}/{sub}"):
            os.utime(os.path.join(f"{root}/{sub}", f), (mtime, mtime))
    raw = (
        spark.readStream.format("parquet")
        .schema(DOCS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet")
        .load(f"{root}/*")
    )
    hits = run_to_memory(
        bloom_stream_from(raw.select("doc_id", "text")),
        "t_bloom_inc",
        mode="append",
    )
    got = {
        r.doc_id: bool(r.bloom_hit)
        for r in decisions_from_hits(hits).collect()
    }
    assert got == {1: False, 2: True, 3: False}
