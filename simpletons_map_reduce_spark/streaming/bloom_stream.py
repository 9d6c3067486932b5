"""Streaming Bloom-filter membership — arrival-time twin of bloom_probe.

Batch ``bloom_probe`` (queries/sketch_ops.py) folds a static corpus into
the (word, bits) filter relation and probes a batch against it.  The
ingest-time question is incremental: "does the document arriving NOW
exactly duplicate anything seen BEFORE it?"  This module keeps the SAME
filter — m = 2^22 bits in 32-bit words, k = 5 md5-int60 positions per
content key, identical constants imported from the batch op — as
*streaming state*: one state row per touched word, holding that word's
bits.  Each arriving document probes its k positions and then sets them
(probe-before-insert, in deterministic doc_id arrival order), so the
decision reflects exactly the documents that arrived earlier.

Sharding story: state is keyed by word, so the filter is hash-partitioned
across executors like any keyed state — no single-owner bottleneck, and
per-key state is ONE long.  A document's k probes land on k different
word keys; the per-position hits are reassembled into the per-doc
decision by the consumer (``decisions_from_hits`` — the same
"reassemble downstream" convention as near_dedup_stream's per-band-group
pair emissions).  The one-sided guarantee survives streaming: a position
row can only report miss if its bit was truly unset at arrival time, so
a false negative remains impossible.

Pinned in tests/test_bloom_stream.py: the reassembled decisions equal an
independent pure-Python arrival-order simulation (same md5 arithmetic)
AND, for the batch-split fixture (corpus micro-batch then probe
micro-batch), agree with batch ``bloom_probe`` everywhere the batch op's
static-corpus contract applies (probe docs that duplicate only EARLIER
probe docs are the documented semantic difference: arrival-time sees
them, the static filter does not).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.hashing import SPARK_MD5_INT60
from ..queries.sketch_ops import BLOOM_K, BLOOM_M_BITS, BLOOM_WORD_BITS
from .dedup_stream import docs_raw_stream

OUTPUT_SCHEMA = "doc_id long, word long, hit boolean"
STATE_SCHEMA = "bits long"


def _probe(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (bits,) = state.get if state.exists else (0,)
    rows: list[tuple[int, int]] = []
    for pdf in pdfs:
        rows.extend(
            (int(d), int(m)) for d, m in zip(pdf["doc_id"], pdf["mask"])
        )
    # deterministic arrival order within the micro-batch; rows of the SAME
    # doc are probed together before any of them inserts, so a document
    # can never hit its own bits (two positions of one doc may share a
    # word — e.g. k-hash collisions).
    rows.sort(key=lambda r: r[0])
    out_d: list[int] = []
    out_h: list[bool] = []
    i = 0
    while i < len(rows):
        j = i
        while j < len(rows) and rows[j][0] == rows[i][0]:
            j += 1
        for doc_id, mask in rows[i:j]:
            out_d.append(doc_id)
            out_h.append((bits & mask) != 0)
        for _, mask in rows[i:j]:
            bits |= mask
        i = j
    state.update((bits,))
    if out_d:
        yield pd.DataFrame(
            {"doc_id": out_d, "word": [int(key[0])] * len(out_d), "hit": out_h}
        )


def bloom_stream_from(docs: DataFrame) -> DataFrame:
    """Per-position hit stream over a streaming (doc_id, text) relation.

    Map side mirrors the batch op expression-for-expression: content key =
    sha2(text, 256); position i ∈ [0, k) → md5-int60("i:" || key) mod m;
    (word, mask) in 32-bit words.  Then the stateful per-word probe.
    """
    pos_of = (
        F.expr(SPARK_MD5_INT60.format(e="concat(cast(i as string), ':', key)"))
        % BLOOM_M_BITS
    )
    exploded = (
        docs.select("doc_id", F.sha2("text", 256).alias("key"))
        .select(
            "doc_id",
            F.explode(
                F.array(*[F.lit(i) for i in range(BLOOM_K)])
            ).alias("i"),
            "key",
        )
        .select("doc_id", pos_of.alias("pos"))
        .select(
            "doc_id",
            F.expr(f"pos div {BLOOM_WORD_BITS}").alias("word"),
            F.expr(
                f"shiftleft(cast(1 as bigint), cast(pos % {BLOOM_WORD_BITS} as int))"
            ).alias("mask"),
        )
    )
    return exploded.groupBy("word").applyInPandasWithState(
        _probe,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def bloom_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming membership probe over the sf documents table."""
    raw = docs_raw_stream(spark, sf_dir)
    return bloom_stream_from(raw.select("doc_id", "text"))


def decisions_from_hits(hits: DataFrame) -> DataFrame:
    """Reassemble per-position hit rows into per-doc decisions: a doc is a
    maybe-duplicate iff EVERY one of its position probes hit."""
    return hits.groupBy("doc_id").agg(
        F.min("hit").alias("bloom_hit"), F.count("*").alias("n_probes")
    )
