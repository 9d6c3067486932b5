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
- state per bucket is bounded by ``bucket_cap`` gram sets.  The base
  twin keeps state forever so the batch comparison is exact;
  ``near_dedup_stream_ttl_from`` is the production variant — member
  expiry on probe (a document matches only members ingested within the
  TTL of its own event time) plus watermark-driven idle-bucket cleanup.
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
        shs,
        minhash_params(NUM_PERM),
        BAND_ROWS,
        carry={"shset": "array<bigint>"},
    )
    return bands.groupBy("band", "band_key").applyInPandasWithState(
        _make_probe(bucket_cap),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: TTL-variant state: member ids, gram sets, and ingest epoch-ms.
TTL_STATE_SCHEMA = "ids array<long>, sets array<array<long>>, tss array<long>"


def _make_ttl_probe(bucket_cap: int, ttl_ms: int):
    def probe(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # bucket idle past TTL: drop it whole — cleanup for buckets
            # that never receive another probe
            state.remove()
            return
        ids, sets, tss = state.get if state.exists else ([], [], [])
        ids, sets, tss = list(ids), [list(s) for s in sets], list(tss)
        out_a: list[int] = []
        out_b: list[int] = []
        out_j: list[float] = []
        rows = []
        max_ts_ms = 0
        for pdf in pdfs:
            for doc_id, shset, ts in zip(
                pdf["doc_id"], pdf["shset"], pdf["ingest_ts"]
            ):
                rows.append(
                    (int(doc_id), [int(g) for g in shset],
                     int(ts.value // 1_000_000))
                )
        rows.sort(key=lambda r: (r[2], r[0]))
        for doc_id, shset, ts_ms in rows:
            max_ts_ms = max(max_ts_ms, ts_ms)
            # member-level expiry ON PROBE: a document matches only
            # members ingested within ttl of ITS OWN event time — the
            # recency contract is data-driven, so it cannot depend on
            # micro-batch boundaries or timeout scheduling (expired
            # members also free their cap slots)
            live = [
                k for k in range(len(ids)) if tss[k] >= ts_ms - ttl_ms
            ]
            ids = [ids[k] for k in live]
            sets = [sets[k] for k in live]
            tss = [tss[k] for k in live]
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
                tss.append(ts_ms)
        state.update((ids, sets, tss))
        # idle-bucket cleanup: fires once the watermark passes the last
        # activity + TTL (watermark-driven ⇒ deterministic on replay —
        # the stateful.py pattern)
        state.setTimeoutTimestamp(max_ts_ms + ttl_ms)
        if out_a:
            yield pd.DataFrame(
                {"doc_a": out_a, "doc_b": out_b, "jaccard": out_j}
            )

    return probe


def near_dedup_stream_ttl_from(
    docs: DataFrame,
    bucket_cap: int = MAX_BAND_BUCKET,
    ttl: str = "10 minutes",
    watermark: str = "1 minute",
) -> DataFrame:
    """TTL-evicting streaming near-dup over a (doc_id, text, ingest_ts)
    streaming relation — the production shape the base twin documents.

    A document matches only members ingested within ``ttl`` of its OWN
    event time — member-level expiry applied on probe, so the recency
    contract is data-driven and independent of micro-batch boundaries
    (expired members also free their cap slots).  Buckets idle past the
    TTL (as observed via the watermark) are additionally dropped whole
    by an event-time timeout — cleanup for buckets that never receive
    another probe, the stateful.py idle pattern.  Exact-once dedup over
    unbounded history is impossible in bounded state; compose with a
    periodic batch near_dedup compaction for the lambda shape, exactly
    as dedup_stream.py documents for exact dedup.
    """
    from .stateful import _duration_ms

    bands = np_minhash_bands(
        shingle_projection_with(docs, extra=["ingest_ts"]),
        minhash_params(NUM_PERM),
        BAND_ROWS,
        carry={"shset": "array<bigint>", "ingest_ts": "timestamp"},
    )
    return (
        bands.withWatermark("ingest_ts", watermark)
        .groupBy("band", "band_key")
        .applyInPandasWithState(
            _make_ttl_probe(bucket_cap, _duration_ms(ttl)),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=TTL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def shingle_projection_with(docs: DataFrame, extra: list[str]) -> DataFrame:
    """``shingle_projection`` with extra source columns carried through
    the same map-side expressions (a stream cannot re-join the timestamp
    on doc_id without paying a second stateful operator)."""
    from pyspark.sql import functions as F

    from ..functions.hashing import MINHASH_PRIME
    from ..queries.dedup_ops import _GRAM_CASE, _P, _spark_toks_expr

    th = F.transform(
        F.expr(_spark_toks_expr()),
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
        % MINHASH_PRIME,
    )
    return (
        docs.select("doc_id", *extra, th.alias("th"))
        .select(
            "doc_id",
            *extra,
            F.array_distinct(F.expr(_GRAM_CASE)).alias("shset"),
        )
        .select(
            "doc_id",
            *extra,
            "shset",
            F.expr(f"transform(shset, g -> g DIV {_P})").alias("hl"),
        )
    )


def near_dedup_stream(
    spark: SparkSession, sf_dir: str, bucket_cap: int = MAX_BAND_BUCKET
) -> DataFrame:
    """Streaming twin of near_dedup over the sf documents table."""
    from .dedup_stream import docs_raw_stream

    raw = docs_raw_stream(spark, sf_dir)
    return near_dedup_stream_from(
        raw.select("doc_id", "text"), bucket_cap
    )
