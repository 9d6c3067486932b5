"""Structured Streaming variants of the event queries.

The reference is batch-only (SURVEY §2.C); these are the tier-C streaming
extensions: the same tumbling/session aggregations as queries/events.py,
expressed as ``readStream`` → watermark → windowed agg.  Late data beyond
the watermark is dropped by Spark's state store; in batch mode (the oracle
path) every row is on time, so the two agree on the test data — pinned by
tests/test_streaming.py.

The parquet file source drives local tests (one batch per file set via
``processAllAvailable``); production swaps in kafka with the same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import ensure_confs

def _events_raw_schema(ts_type: T.DataType) -> T.StructType:
    """events.parquet physical schema (file streams require an explicit
    schema — no inference pass); ``ts`` storage varies by driver round."""
    return T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", ts_type, True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )


#: ns-long variant — the schema tests use when synthesizing raw event files
#: (ts as raw nanoseconds, the reference driver's original storage).
EVENTS_RAW_SCHEMA = _events_raw_schema(T.LongType())


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with ts normalized to a
    microsecond timestamp (same convention as sources/tables.py).

    The ``ts`` storage type differs across driver generations (raw nanos
    as int64 vs parquet timestamp[us]); a one-off batch read probes the
    footer (driver-side metadata only) so the stream schema matches the
    files — a wrong explicit schema would silently misscale every
    timestamp by 1000×.
    """
    ensure_confs(spark)
    stored = dict(spark.read.parquet(f"{sf_dir}/events.parquet").dtypes)["ts"]
    if stored == "bigint":
        ts_type: T.DataType = T.LongType()
    elif stored == "timestamp_ntz":
        ts_type = T.TimestampNTZType()
    else:
        ts_type = T.TimestampType()
    # Both fixture layouts, mirroring dedup_stream.docs_raw_stream: the
    # driver's single ``events.parquet`` FILE (file-stream sources need a
    # directory, so glob-filter the sf dir) and Spark-written
    # ``events.parquet/`` DIRECTORIES of part files (big-SF fixtures —
    # load the directory itself; the glob filter matches LEAF file names,
    # so against a directory fixture it admits zero files and the stream
    # silently reads nothing — caught by stream_parity_chained's sf1 red).
    import os

    reader = spark.readStream.format("parquet").schema(
        _events_raw_schema(ts_type)
    )
    # Micro-batch sizing knob for scale runs (tools/stress_streaming.py):
    # the parquet file source otherwise swallows ALL available files in
    # one batch, which measures nothing about per-batch latency or
    # watermark-driven state eviction.  Production (kafka) paces batches
    # by trigger; the file-source equivalent is maxFilesPerTrigger.
    max_files = os.environ.get("SPARK_GRAFT_STREAM_MAX_FILES")
    if max_files:
        reader = reader.option("maxFilesPerTrigger", int(max_files))
    path = f"{sf_dir}/events.parquet"
    if os.path.isdir(path):
        raw = reader.load(path)
    else:
        raw = reader.option("pathGlobFilter", "events.parquet").load(sf_dir)
    if stored == "bigint":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # session tz is pinned UTC, so ntz→tz is the identity instant
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_stream(
    spark: SparkSession, sf_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming twin of queries/events.py::events_tumbling."""
    ev = events_stream(spark, sf_dir)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("w_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def hopping_stream(
    spark: SparkSession, sf_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming twin of queries/events.py::events_hopping: 10-minute
    windows sliding every 5 minutes.  Same Expand+partial-agg shape as the
    batch plan, with the watermark bounding state to ~len/slide live
    windows per key."""
    ev = events_stream(spark, sf_dir)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("w_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize_stream(
    spark: SparkSession, sf_dir: str, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Session windows per user (streaming-native sessionization).

    Uses ``session_window`` — Spark's stateful merging-window operator —
    rather than the lag/cumsum formulation of the batch query (window
    functions over unbounded history don't stream)."""
    ev = events_stream(spark, sf_dir)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


#: per-state-partition input-bytes target for the local parity twins —
#: mirrors the session's 64 MB split intent (session.py maxPartitionBytes).
_STATE_PARTITION_BYTES = 64 * 1024 * 1024


def scaled_state_partitions(
    spark: SparkSession, sf_dir: str, *tables: str
) -> int:
    """Input-size-derived state-store partition count for a streaming twin.

    A streaming stateful operator's shuffle/state partitioning is frozen at
    query start from ``spark.sql.shuffle.partitions`` — AQE never touches
    it, so the batch-side remedy ("let AQE coalesce tiny shuffles", guide
    §2.2) does not exist in streams.  Scale-adaptive instead: one state
    partition per 64 MB of source input, clamped to the session's
    configured shuffle partitions (a 100 TB source keeps the full
    configured width; the local parity fixtures collapse to a handful of
    partitions instead of spinning 32 state stores per stateful operator
    per micro-batch — measured 2.3 s → 1.5 s on one tumbling twin at
    sf0.1).  Floor of 2 keeps the plan shape (a real exchange) identical
    in kind to production.
    """
    import os as _os

    total = 0
    for t in tables:
        p = f"{sf_dir}/{t}.parquet"
        if _os.path.isdir(p):
            for root, _dirs, files in _os.walk(p):
                total += sum(
                    _os.path.getsize(_os.path.join(root, f)) for f in files
                )
        elif _os.path.exists(p):
            total += _os.path.getsize(p)
    configured = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    by_bytes = (total + _STATE_PARTITION_BYTES - 1) // _STATE_PARTITION_BYTES
    # floor 4: below it the per-micro-batch task savings flatten out
    # (measured: 8 and 4 partitions time identically on one twin, 2 starves
    # the concurrent twins), while the plan keeps a real exchange.
    return max(4, min(configured, int(by_bytes)))


class _state_partitions_conf:
    """Context manager: pin ``spark.sql.shuffle.partitions`` while streaming
    queries START (each StreamExecution clones the session at start, so the
    restored value never reaches a running query)."""

    def __init__(self, spark: SparkSession, n: int | None):
        self.spark, self.n = spark, n

    def __enter__(self):
        if self.n is not None:
            self.saved = self.spark.conf.get("spark.sql.shuffle.partitions")
            self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))

    def __exit__(self, *exc):
        if self.n is not None:
            self.spark.conf.set("spark.sql.shuffle.partitions", self.saved)


def run_to_memory(df: DataFrame, name: str, mode: str | None = None) -> DataFrame:
    """Drive a streaming DF to completion into an in-memory table and return
    the result as a batch DataFrame (local test harness).

    ``mode`` overrides the inferred output mode (stateful operators declare
    their own — applyInPandasWithState's "update" must match the sink's)."""
    q = (
        df.writeStream.outputMode(mode or ("complete" if _has_agg(df) else "append"))
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return df.sparkSession.table(name)


def run_all_to_memory(
    specs: list[tuple],
    state_partitions: int | None = None,
) -> list[DataFrame]:
    """Drive several INDEPENDENT streaming DFs to completion concurrently
    and return their memory tables, in input order.

    The parity-report queries each execute three unrelated streaming
    twins; running them back-to-back leaves the cluster idle through each
    twin's micro-batch planning/commit tail.  Spark's scheduler runs
    concurrent jobs fine (optimization guide §2.6 — actions are only
    sequential because driver code calls them sequentially), so the twins
    are driven from a small thread pool and their micro-batches back-fill
    each other's idle capacity.  Output-mode inference, sink tables, and
    ``processAllAvailable`` semantics are exactly ``run_to_memory``'s —
    per-twin results are bit-identical, only the wall-clock overlaps.
    """
    from concurrent.futures import ThreadPoolExecutor

    # Output-mode inference probes the analyzed plan; do it on the caller
    # thread so worker threads only await the queries.  All queries START
    # under the (optionally) pinned state-partition conf — StreamExecution
    # clones the session at start, so restoring the conf afterwards never
    # reaches a running query.
    spark = specs[0][0].sparkSession
    started = []
    for spec in specs:
        df, name, mode = spec[0], spec[1], spec[2]
        # optional per-spec state-partition override (4th element): a
        # compute-bound state machine keeps the session width while its
        # light siblings start narrow
        nparts = spec[3] if len(spec) > 3 else state_partitions
        with _state_partitions_conf(spark, nparts):
            q = (
                df.writeStream.outputMode(
                    mode or ("complete" if _has_agg(df) else "append")
                )
                .format("memory")
                .queryName(name)
                .start()
            )
        started.append((df, name, q))

    def drive(item) -> DataFrame:
        df, name, q = item
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return df.sparkSession.table(name)

    with ThreadPoolExecutor(max_workers=len(started)) as pool:
        return list(pool.map(drive, started))


def _has_agg(df: DataFrame) -> bool:
    return "Aggregate" in df._jdf.queryExecution().analyzed().toString()


def dau_stream(
    spark: SparkSession, sf_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming daily-active-users: per-day DISTINCT user counts.

    Two CHAINED stateful operators — watermark-bounded
    ``dropDuplicatesWithinWatermark`` on (user_id, day window) feeding a
    tumbling daily count — the multi-stateful-operator pipeline Spark
    supports since 3.5 (each stage keeps its own state store; dedup
    state evicts past the watermark, the day aggregate closes when the
    watermark passes the day's end).  Batch twin: distinct (user, day)
    then count per day (tests/test_streaming.py pins equivalence) — the
    streaming half of the batch `rolling_active_users` family.
    """
    ev = events_stream(spark, sf_dir)
    deduped = (
        ev.withWatermark("ts", watermark)
        # keep exactly ONE event-time column: the day window inherits the
        # watermark tag, so the raw ts must not ride along (Spark rejects
        # two tagged columns at the stateful operator)
        .select("user_id", F.window("ts", "1 day").alias("w"))
        .dropDuplicatesWithinWatermark(["user_id", "w"])
    )
    return (
        deduped.groupBy("w")
        .agg(F.count("*").alias("active_users"))
        .select(
            F.unix_micros(F.col("w.start")).alias("w_start"),
            F.col("active_users").cast("long").alias("active_users"),
        )
    )
