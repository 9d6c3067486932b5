"""Streaming funnel — a per-user stage state machine over the event stream.

Streaming twin of queries/behavior.py::funnel_analysis (ordered
view → click → purchase with a bounded conversion window).  Batch computes
the three stage anchors with chained windows over the full history; the
stream keeps ONE tiny (mv, mc, mp) state tuple per user and advances it as
micro-batches arrive:

- events inside a micro-batch are processed in event-time order, so
  within-batch disorder is free;
- anchors only ever move FORWARD (the first view is the min view when
  processing in time order), so in-order batch arrival reproduces the
  batch anchors exactly — pinned by the whole-history and the
  split-replay equivalence tests in tests/test_funnel_stream.py;
- a late event older than an already-set anchor cannot retract it — the
  standard streaming-funnel trade (retraction would require unbounded
  click/purchase history per user).  Bound lateness with a watermark +
  TTL eviction (same pattern as stateful.py::running_user_totals_ttl)
  when running against a real unbounded source.

State is 3 nullable bigints per user — state size tracks key cardinality,
not stream length, which is what keeps this viable at 100 TB/day.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..queries.behavior import FUNNEL_WINDOW_US
from .events_stream import events_stream

FUNNEL_OUTPUT_SCHEMA = (
    "user_id bigint, mv bigint, mc bigint, mp bigint, stage int"
)
FUNNEL_STATE_SCHEMA = "mv bigint, mc bigint, mp bigint"


def _make_funnel_update(window_us: int):
    """Close over the conversion window (pickled to executors)."""

    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        mv, mc, mp = state.get if state.exists else (None, None, None)
        batch = pd.concat(list(pdfs), ignore_index=True)
        # event-time order inside the batch: the first qualifying event IS
        # the min, so the sequential pass reproduces the batch window mins
        batch = batch.sort_values(["ts_us", "event_id"])
        for ts, et in zip(batch["ts_us"], batch["event_type"]):
            ts = int(ts)
            if et == "view":
                if mv is None:
                    mv = ts
            elif et == "click":
                if mc is None and mv is not None and mv < ts <= mv + window_us:
                    mc = ts
            elif et == "purchase":
                if mp is None and mc is not None and mc < ts <= mc + window_us:
                    mp = ts
        state.update((mv, mc, mp))
        stage = 3 if mp is not None else 2 if mc is not None else (
            1 if mv is not None else 0
        )
        yield pd.DataFrame(
            {"user_id": [user_id], "mv": [mv], "mc": [mc], "mp": [mp],
             "stage": [stage]}
        )

    return _update


def funnel_state_from(
    ev: DataFrame, window_us: int = FUNNEL_WINDOW_US
) -> DataFrame:
    """Per-user funnel state over any (user_id, event_id, event_type,
    ts_us) streaming DF (separated from the source so tests can drive
    multi-batch replays)."""
    return (
        ev.select("user_id", "event_id", "event_type", "ts_us")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_funnel_update(window_us),
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def funnel_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming funnel over the driver events table."""
    ev = events_stream(spark, sf_dir).withColumn(
        "ts_us", F.unix_micros(F.col("ts"))
    )
    return funnel_state_from(ev)
