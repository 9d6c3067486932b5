"""Training-data assembly operators (queries/packing_ops.py).

The registry-wide oracle checks cover cross-engine parity on the driver
corpus; these tests pin the *semantic contracts* — pack boundaries, chunk
reconstruction, and the balanced-quota behavior the uniform driver corpus
cannot exercise (every source there has exactly 25 docs).
"""

from __future__ import annotations

import math

from simpletons_map_reduce_spark.queries.packing_ops import (
    CHUNK_LEN,
    CHUNK_STRIDE,
    PACK_CAPACITY,
    PACK_SHARDS,
    balance_equal,
    doc_chunks,
    pack_sequences,
)
from tests.conftest import SF0001


def test_pack_sequences_matches_greedy_replay(spark):
    """Every doc's pack is the window its first token lands in under a
    per-(lang, shard) running total — replayed doc-by-doc in Python."""
    rows = pack_sequences(spark, SF0001).collect()
    cum: dict[tuple, int] = {}
    for r in sorted(rows, key=lambda r: (r.lang, r.shard, r.doc_id)):
        key = (r.lang, r.shard)
        start = cum.get(key, 0)
        assert r.shard == r.doc_id % PACK_SHARDS
        assert r.pack_id == start // PACK_CAPACITY, r
        cum[key] = start + r.n_tokens


def test_pack_ids_are_dense_and_monotone(spark):
    """Within a shard, pack ids never decrease and never skip."""
    rows = pack_sequences(spark, SF0001).collect()
    by_shard: dict[tuple, list] = {}
    for r in rows:
        by_shard.setdefault((r.lang, r.shard), []).append(r)
    for grp in by_shard.values():
        grp.sort(key=lambda r: r.doc_id)
        prev = 0
        for r in grp:
            assert prev <= r.pack_id <= prev + max(
                1, math.ceil(r.n_tokens / PACK_CAPACITY)
            )
            prev = r.pack_id


def test_doc_chunks_reconstruct_original_text(spark):
    """Stitching chunk prefixes of length CHUNK_STRIDE (plus the last
    chunk's full text) reproduces every document exactly."""
    docs_df = spark.read.parquet(f"{SF0001}/documents.parquet")
    chunks = doc_chunks(spark, SF0001).collect()
    by_doc: dict[int, list] = {}
    for c in chunks:
        assert len(c.chunk_text) <= CHUNK_LEN
        assert c.chunk_start == c.chunk_idx * CHUNK_STRIDE + 1
        by_doc.setdefault(c.doc_id, []).append(c)
    originals = {r.doc_id: r.text for r in docs_df.collect()}
    assert set(by_doc) == {d for d, t in originals.items() if len(t) > 0}
    for doc_id, grp in by_doc.items():
        grp.sort(key=lambda c: c.chunk_idx)
        assert [c.chunk_idx for c in grp] == list(range(len(grp)))
        rebuilt = "".join(c.chunk_text[:CHUNK_STRIDE] for c in grp[:-1])
        rebuilt += grp[-1].chunk_text
        assert rebuilt == originals[doc_id], doc_id


def test_balance_equal_downsamples_skewed_sources(spark):
    """On a skewed corpus the quota is the smallest source's count and
    every source is cut to exactly that size, deterministically."""
    rows = [(i, "big") for i in range(40)] + [(100 + i, "small") for i in range(7)]
    docs = spark.createDataFrame(rows, "doc_id: bigint, source: string")
    out1 = balance_equal(docs).collect()
    out2 = balance_equal(docs).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    per_source = {}
    for r in out1:
        per_source[r.source] = per_source.get(r.source, 0) + 1
    assert per_source == {"big": 7, "small": 7}


def test_doc_chunks_plan_is_shuffle_free(spark):
    """Chunking must stay scan-local: no Exchange anywhere in the plan."""
    plan = doc_chunks(spark, SF0001)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
