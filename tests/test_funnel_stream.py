"""Streaming funnel ≡ batch funnel, plus cross-batch state evolution.

The equivalence oracle here is an INDEPENDENT pandas recomputation of the
stage anchors (not the Spark batch query), so a shared bug in the two
Spark implementations cannot self-certify.
"""

from __future__ import annotations

import os
import time

import pandas as pd
from pyspark.sql import functions as F

from simpletons_map_reduce_spark.queries.behavior import FUNNEL_WINDOW_US
from simpletons_map_reduce_spark.sources import load_table
from simpletons_map_reduce_spark.streaming.events_stream import (
    EVENTS_RAW_SCHEMA,
    run_to_memory,
)
from simpletons_map_reduce_spark.streaming.funnel_stream import (
    funnel_state_from,
    funnel_stream,
)
from tests.conftest import SF0001


def _expected_anchors(rows, window_us=FUNNEL_WINDOW_US):
    """Reference funnel per user: process events in (ts, id) order."""
    anchors = {}
    for r in sorted(rows, key=lambda r: (r["ts_us"], r["event_id"])):
        mv, mc, mp = anchors.get(r["user_id"], (None, None, None))
        if r["event_type"] == "view" and mv is None:
            mv = r["ts_us"]
        elif (r["event_type"] == "click" and mc is None and mv is not None
              and mv < r["ts_us"] <= mv + window_us):
            mc = r["ts_us"]
        elif (r["event_type"] == "purchase" and mp is None and mc is not None
              and mc < r["ts_us"] <= mc + window_us):
            mp = r["ts_us"]
        anchors[r["user_id"]] = (mv, mc, mp)
    return anchors


def test_funnel_stream_matches_independent_oracle(spark):
    out = run_to_memory(funnel_stream(spark, SF0001), "t_funnel", mode="update")
    # update mode: keep each user's LAST emitted state
    got = {
        r.user_id: (r.mv, r.mc, r.mp)
        for r in out.orderBy("user_id").collect()
    }
    ev = load_table(spark, SF0001, "events").select(
        "user_id", "event_id", "event_type", "ts_us"
    )
    rows = [r.asDict() for r in ev.collect()]
    want = _expected_anchors(rows)
    assert got == want
    # and the stage counts agree with the registered batch query
    from simpletons_map_reduce_spark.queries import REGISTRY

    batch = REGISTRY["funnel_analysis"].fn(spark, SF0001).collect()[0]
    assert sum(1 for v in want.values() if v[0] is not None) == batch.n_view
    assert sum(1 for v in want.values() if v[1] is not None) == batch.n_view_click
    assert sum(1 for v in want.values() if v[2] is not None) == batch.n_full_funnel


def _write_events(spark, path, rows, mtime):
    df = spark.createDataFrame(rows, EVENTS_RAW_SCHEMA).coalesce(1)
    df.write.mode("overwrite").parquet(path)
    for f in os.listdir(path):
        os.utime(os.path.join(path, f), (mtime, mtime))


def _raw(eid, minute, user, etype):
    # ts in nanoseconds (EVENTS_RAW_SCHEMA contract)
    return (eid, minute * 60 * 1_000_000_000, user, etype, 1.0, "{}")


def test_funnel_state_advances_across_batches(spark, tmp_path):
    """User 1 views in batch 1 and converts in batch 2 — the click must
    join the state carried over, not restart the funnel."""
    root = str(tmp_path / "fun")
    now = time.time()
    _write_events(spark, f"{root}/b1",
                  [_raw(1, 10, 1, "view"), _raw(2, 11, 2, "view")], now - 100)
    _write_events(spark, f"{root}/b2",
                  [_raw(3, 20, 1, "click"), _raw(4, 30, 1, "purchase")],
                  now - 50)
    raw = (
        spark.readStream.format("parquet")
        .schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet")
        .load(f"{root}/*")
    )
    ev = raw.withColumn("ts_us", F.expr("ts div 1000"))
    out = run_to_memory(funnel_state_from(ev), "t_funnel2", mode="update").collect()
    last = {}
    for r in out:  # memory sink appends per batch; later rows overwrite
        last[r.user_id] = (r.mv, r.mc, r.mp, r.stage)
    mv1 = 10 * 60 * 1_000_000
    assert last[1] == (mv1, 20 * 60 * 1_000_000, 30 * 60 * 1_000_000, 3)
    assert last[2] == (11 * 60 * 1_000_000, None, None, 1)
