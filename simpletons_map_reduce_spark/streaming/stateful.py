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
scales with key cardinality, not stream length.  A production variant
would add a GroupStateTimeout to evict idle users.
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
