"""Streaming NEAR-duplicate detection — the LSH family's streaming twin.

Batch near-dup (queries/dedup_ops.py::near_dedup_pairs) sees the corpus at
once; a crawl-ingest pipeline must answer "which of the documents arriving
NOW near-duplicate something already ingested?" incrementally.  This module
runs the SAME signature pipeline as the batch operator — the shared
``shingle_projection`` (per-token md5 → polynomial 62-bit gram hashes) and
the SAME Arrow MinHash kernel (``np_minhash_bands``, here with the
verification sets carried through) — and replaces the batch bucket
self-join with a stateful probe: state keyed by ``(band, band_key)`` holds
that bucket's first ``bucket_cap`` members (doc_id + gram set), each
arriving document probes its buckets' stored members with the EXACT
jaccard verification, and every emitted pair is a true >= threshold pair.

Contracts (pinned in tests/test_near_dedup_stream.py):

- pairs are emitted on the LATER document's arrival, as (doc_a, doc_b) =
  (min id, max id) with the same 4-dp half-up jaccard as the batch op;
- a pair colliding in several bands is emitted once PER BAND GROUP (the
  state operator cannot see across keys); consumers dedup on
  (doc_a, doc_b) — the twin test does, and the batch candidate
  ``distinct`` is exactly that dedup done corpus-at-once;
- bucket-cap semantics are arrival-order: the first ``bucket_cap``
  members of a bucket are stored (and probed), later arrivals probe but
  are NOT stored — the streaming analog of the batch hot-bucket cap
  (which drops over-cap buckets whole); on corpora where no bucket
  saturates the two are equivalent and the twin test pins output
  equality with batch ``near_dedup_pairs``;
- state per bucket is bounded by ``bucket_cap`` gram sets.  A production
  deployment adds the event-time TTL eviction pattern of
  streaming/stateful.py (crawl dedup usually scopes to a recency
  window); kept out here so the twin comparison is exact.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.hashing import minhash_params
from ..functions.vectorized import np_minhash_bands
from ..queries.dedup_ops import (
    BAND_ROWS,
    JACCARD_THRESHOLD_DEN,
    JACCARD_THRESHOLD_NUM,
    MAX_BAND_BUCKET,
    NUM_PERM,
    shingle_projection,
)
from .dedup_stream import DOCS_RAW_SCHEMA

OUTPUT_SCHEMA = "doc_a long, doc_b long, jaccard double"
#: per-bucket state: parallel arrays of member ids and their gram sets.
STATE_SCHEMA = "ids array<long>, sets array<array<long>>"


def _rn4(x: float) -> float:
    """4-dp HALF-UP rounding — mirrors functions/rounding.rn (Spark
    ``round`` = BigDecimal.valueOf(double).setScale(4, HALF_UP), where
    valueOf goes through the double's SHORTEST decimal repr — exactly
    Python's ``repr``), not Python's banker's rounding."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
    )


def _make_probe(bucket_cap: int):
    def probe(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ids, sets = state.get if state.exists else ([], [])
        ids, sets = list(ids), [list(s) for s in sets]
        out_a: list[int] = []
        out_b: list[int] = []
        out_j: list[float] = []
        rows = []
        for pdf in pdfs:
            for doc_id, shset in zip(pdf["doc_id"], pdf["shset"]):
                rows.append((int(doc_id), [int(g) for g in shset]))
        # deterministic processing order within the micro-batch (file
        # streams don't guarantee row order inside a trigger)
        rows.sort(key=lambda r: r[0])
        for doc_id, shset in rows:
            sh = set(shset)
            for old_id, old_set in zip(ids, sets):
                if old_id == doc_id:
                    continue
                inter = len(sh.intersection(old_set))
                uni = len(sh) + len(old_set) - inter
                if inter * JACCARD_THRESHOLD_DEN >= uni * JACCARD_THRESHOLD_NUM:
                    a, b = min(old_id, doc_id), max(old_id, doc_id)
                    out_a.append(a)
                    out_b.append(b)
                    out_j.append(_rn4(inter / uni))
            if len(ids) < bucket_cap:
                ids.append(doc_id)
                sets.append(shset)
        state.update((ids, sets))
        if out_a:
            yield pd.DataFrame(
                {"doc_a": out_a, "doc_b": out_b, "jaccard": out_j}
            )

    return probe


def near_dedup_stream_from(
    docs: DataFrame, bucket_cap: int = MAX_BAND_BUCKET
) -> DataFrame:
    """Streaming near-dup pairs over a streaming (doc_id, text) relation.

    Map-side signature pipeline (identical expressions/kernel to batch),
    then the stateful per-bucket probe.  Output may repeat a pair across
    band groups — dedup on (doc_a, doc_b) downstream.
    """
    shs = shingle_projection(docs)
    bands = np_minhash_bands(
        shs, minhash_params(NUM_PERM), BAND_ROWS, carry="shset"
    )
    return bands.groupBy("band", "band_key").applyInPandasWithState(
        _make_probe(bucket_cap),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def near_dedup_stream(
    spark: SparkSession, sf_dir: str, bucket_cap: int = MAX_BAND_BUCKET
) -> DataFrame:
    """Streaming twin of near_dedup over the sf documents table."""
    from ..session import ensure_confs

    ensure_confs(spark)
    raw = (
        spark.readStream.format("parquet")
        .schema(DOCS_RAW_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )
    return near_dedup_stream_from(
        raw.select("doc_id", "text"), bucket_cap
    )
