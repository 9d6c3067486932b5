"""Stateful streaming: running per-user totals must converge to the batch
groupBy answer once the bounded stream is fully consumed, and the TTL
variant must EVICT idle users (final row + state removal) once the
watermark passes their last activity + TTL."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from simpletons_map_reduce_spark.sources.tables import load_table
from simpletons_map_reduce_spark.streaming import (
    run_to_memory,
    running_user_totals,
    totals_ttl_from,
)
from simpletons_map_reduce_spark.streaming.events_stream import EVENTS_RAW_SCHEMA
from tests.conftest import SF0001


def test_running_totals_converge_to_batch(spark):
    out = run_to_memory(running_user_totals(spark, SF0001), "t_state", mode="update")
    # update mode may emit a row per micro-batch per user; the LAST row per
    # user is the converged state
    final = (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("sum_value").alias("sum_value"),
        )
        .collect()
    )
    got = {r.user_id: (r.n_events, round(r.sum_value, 6)) for r in final}
    ev = load_table(spark, SF0001, "events")
    batch = ev.groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("value").alias("s")
    )
    want = {r.user_id: (r.n, round(r.s, 6)) for r in batch.collect()}
    assert got.keys() == want.keys()
    for u in want:
        assert got[u][0] == want[u][0]
        assert abs(got[u][1] - want[u][1]) < 1e-6


def _write_raw_events(spark, path: str, rows, mtime: float) -> None:
    """One parquet file of raw-schema events (ts in nanoseconds) whose
    mtime orders it for the file stream source."""
    df = spark.createDataFrame(rows, EVENTS_RAW_SCHEMA).coalesce(1)
    df.write.mode("overwrite").parquet(path)
    for f in os.listdir(path):
        os.utime(os.path.join(path, f), (mtime, mtime))


def _ev(eid: int, minute: int, user: int) -> tuple:
    # offset from epoch 0: a ts-0 row would be dropped as late against the
    # stream's initial watermark (0)
    return (eid, (1000 + minute) * 60 * 1_000_000_000, user, "click", 1.0, "{}")


def test_ttl_evicts_idle_user(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1).  Batch 1: user 1 active at
    t=0..1min, user 2 at t=60min → watermark after batch 1 = 55min, past
    user 1's timeout (1min + 10min TTL) but not user 2's (70min).  Batch 2
    triggers timeout processing: user 1 must be emitted evicted with final
    totals; user 2 must not be evicted."""
    root = str(tmp_path / "ev")
    now = time.time()
    _write_raw_events(
        spark, f"{root}/b1",
        [_ev(1, 0, 1), _ev(2, 1, 1), _ev(3, 60, 2)], now - 100,
    )
    _write_raw_events(spark, f"{root}/b2", [_ev(4, 61, 3)], now - 50)
    raw = (
        spark.readStream.format("parquet")
        .schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet")
        .load(f"{root}/*")
    )
    ev = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    out = run_to_memory(
        totals_ttl_from(ev, ttl="10 minutes", watermark="5 minutes"),
        "t_ttl",
        mode="update",
    ).collect()
    evicted = {r.user_id: (r.n_events, r.sum_value) for r in out if r.evicted}
    assert evicted == {1: (2, 2.0)}, out
    # user 1's pre-eviction update row also exists, with the same totals
    assert any(r.user_id == 1 and not r.evicted and r.n_events == 2 for r in out)
    # users 2 and 3 remain live (no eviction row)
    assert {r.user_id for r in out if not r.evicted} == {1, 2, 3}
