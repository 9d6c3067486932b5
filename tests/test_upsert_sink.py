"""foreachBatch upsert sink: stream-maintained snapshot ≡ batch latest
state, and batch replay is a no-op (the exactly-once contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from simpletons_map_reduce_spark.queries import REGISTRY
from simpletons_map_reduce_spark.streaming.events_stream import events_stream
from simpletons_map_reduce_spark.streaming.upsert_sink import (
    apply_batch,
    upsert_query,
)
from tests.conftest import SF0001


def _stream_cols(ev):
    return ev.select(
        "user_id",
        F.unix_micros("ts").alias("last_ts_us"),
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


def test_stream_upsert_snapshot_matches_batch_latest(spark, tmp_path):
    path = str(tmp_path / "snap")
    q = upsert_query(
        _stream_cols(events_stream(spark, SF0001)),
        path,
        key="user_id",
        order_cols=["last_ts_us", "last_event_id"],
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.user_id: (r.last_ts_us, r.last_event_id, r.last_event_type)
        for r in spark.read.parquet(path).collect()
    }
    want = {
        r.user_id: (r.last_ts_us, r.last_event_id, r.last_event_type)
        for r in REGISTRY["latest_events"].fn(spark, SF0001).collect()
    }
    assert got == want


def test_upsert_replay_is_idempotent(spark, tmp_path):
    """Replaying the same micro-batch (Spark's failure-recovery behavior)
    must leave the snapshot byte-identical — latest-wins is a semilattice."""
    path = str(tmp_path / "snap")
    ev = _stream_cols(
        spark.read.parquet(f"{SF0001}/events.parquet").select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
        if dict(
            spark.read.parquet(f"{SF0001}/events.parquet").dtypes
        )["ts"] != "bigint"
        else spark.read.parquet(f"{SF0001}/events.parquet").select(
            "event_id",
            F.timestamp_micros(F.expr("ts div 1000")).alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
    )
    apply_batch(ev, path, key="user_id", order_cols=["last_ts_us", "last_event_id"])
    first = sorted(map(tuple, spark.read.parquet(path).collect()))
    apply_batch(ev, path, key="user_id", order_cols=["last_ts_us", "last_event_id"])
    second = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert first == second
