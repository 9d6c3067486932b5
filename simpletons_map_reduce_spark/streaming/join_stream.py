"""Watermarked stream-stream interval join — click→purchase attribution.

The one Structured Streaming operator family the other streaming twins
don't exercise: joining TWO unbounded streams.  Spark keeps both sides'
unmatched rows in state; the join condition's event-time interval plus
per-side watermarks lets the state store evict rows that can no longer
match (clicks older than watermark + window, purchases older than
watermark), so state is bounded by the attribution window — the property
that makes a stream-stream join survive an unbounded run.

Batch twin (driver-facing contract): queries/temporal.py::click_attribution
— oracle-checked; tests/test_join_stream.py pins stream ≡ batch on the
driver fixtures.  Production swaps the parquet file source for kafka with
the same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.temporal import ATTR_WINDOW_US
from .events_stream import events_stream

#: watermark for both sides — late events beyond this are dropped from the
#: join state (1 h, matching the batch queries' tolerance on this data).
ATTR_WATERMARK = "1 hour"


def attribution_stream(
    spark: SparkSession, sf_dir: str, watermark: str = ATTR_WATERMARK
) -> DataFrame:
    """(user_id, click_id, purchase_id, lag_us) — stream-stream inner join
    of the click stream against the purchase stream within the 1 h
    attribution window.

    Self-join of one readStream source (Spark plans two stateful sides);
    the interval condition ``p.ts ∈ [c.ts, c.ts + window]`` is the
    event-time constraint the state store needs to GC both sides.
    """
    ev = events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (
            F.col("p_ts")
            <= F.col("c_ts") + F.expr(f"INTERVAL {ATTR_WINDOW_US} MICROSECOND")
        ),
    )
    return joined.select(
        "user_id",
        "click_id",
        "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("lag_us"),
    )


def enrich_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream joined against the static
    ``customer`` dimension (user_id = c_custkey) for market segment.

    The third streaming-join family next to stream-stream (above) and the
    batch twins: a stream-STATIC join is stateless — the static side is
    planned as an ordinary broadcast build (re-resolved per micro-batch,
    so a refreshed dimension snapshot is picked up without restarting),
    and no watermark is needed because nothing waits for the other side.
    At 100 TB of stream this is the standard enrichment path: dimension
    broadcast, zero state store usage, per-batch cost = probe only.

    Batch twin: the identical join on the batch events table
    (tests/test_join_stream.py pins stream ≡ batch row-for-row).
    """
    from ..sources.tables import load_table

    ev = events_stream(spark, sf_dir)
    dim = F.broadcast(
        load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        )
    )
    return ev.join(dim, "user_id", "left").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
    )
