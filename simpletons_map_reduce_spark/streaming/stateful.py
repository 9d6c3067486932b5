"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming at all (SURVEY §2.C); Spark's built-in
windowed aggregations cover the tumbling/session queries
(events_stream.py).  This module is the escape hatch the brief's custom
operators need: *arbitrary* per-key state evolved across micro-batches —
the Structured Streaming analog of the reference's reduce UDAF, but
incremental.

``running_user_totals`` keeps one (n_events, sum_value) state per user and
emits the updated running totals for every user seen in a micro-batch.
State is a tiny fixed-size tuple per key, partitioned by user hash across
executors — the same sharding the batch groupBy uses, so the operator
scales with key cardinality, not stream length.

``running_user_totals_ttl`` is the production variant: an event-time
GroupStateTimeout evicts users idle past a TTL (final totals emitted with
``evicted=true``, state removed), so state size tracks the *active* key
set, not every key ever seen — the property that keeps an unbounded
stream's state bounded at 100 TB/day ingest.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .events_stream import events_stream

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
STATE_SCHEMA = "n_events bigint, sum_value double"


def _update_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "sum_value": [s]})


def running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-user running (count, sum) with explicit state."""
    ev = events_stream(spark, sf_dir).select("user_id", "value")
    return ev.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TTL_OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, sum_value double, evicted boolean"
)


def _make_ttl_update(ttl_ms: int):
    """Close over the TTL (pickled to executors with the function)."""

    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # idle past TTL: emit final totals and EVICT — the state store
            # forgets this user until they produce new events
            n, s = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "n_events": [n],
                 "sum_value": [s], "evicted": [True]}
            )
            return
        n, s = state.get if state.exists else (0, 0.0)
        max_ts_ms = 0
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            max_ts_ms = max(
                max_ts_ms, int(pdf["ts"].max().value // 1_000_000)
            )
        state.update((n, s))
        # event-time timeout: fires once the watermark passes the user's
        # last activity + TTL (watermark-driven ⇒ deterministic on replay)
        state.setTimeoutTimestamp(max_ts_ms + ttl_ms)
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n],
             "sum_value": [s], "evicted": [False]}
        )

    return _update


def totals_ttl_from(
    ev: DataFrame, ttl: str = "10 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """TTL-evicting totals over any (user_id, ts, value) streaming DF
    (separated from the source so tests can drive multi-batch replays)."""
    ttl_ms = _duration_ms(ttl)
    return (
        ev.select("user_id", "ts", "value")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_ttl_update(ttl_ms),
            outputStructType=TTL_OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def running_user_totals_ttl(
    spark: SparkSession,
    sf_dir: str,
    ttl: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user running totals with idle-state eviction.

    Users silent for ``ttl`` of *event time* (as observed via the
    watermark) get one final ``evicted=true`` row and their state removed.
    """
    return totals_ttl_from(events_stream(spark, sf_dir), ttl, watermark)


_UNITS_MS = {
    "millisecond": 1, "second": 1_000, "minute": 60_000, "hour": 3_600_000,
}


def _duration_ms(spec: str) -> int:
    qty, unit = spec.split()
    return int(qty) * _UNITS_MS[unit.rstrip("s")]
