"""Readers for the driver test tables and for wholetext corpora.

The reference's only source is "one whole text file per map task", served as
raw bytes by the coordinator (mr/coordinator.go:167-183, mr/worker.go:67-71).
Spark-side that is ``spark.read.text(..., wholetext=True)`` with
``input_file_name()`` — no single-process byte-server bottleneck.

The driver tables (TESTDATA.md) are plain parquet; the only special case is
``events``, whose ``ts`` column is parquet ``timestamp[ns]``.  Spark rejects
nanosecond parquet timestamps by default, so we read nanos as long
(``legacy.parquet.nanosAsLong``) and convert to a microsecond timestamp —
exactly the ns→us truncation DuckDB applies, keeping the oracle comparable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_confs

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table; normalizes the events timestamp column.

    ``events`` gains:
      ts     — TimestampType instant, microsecond precision (ns truncated)
      ts_us  — epoch microseconds as bigint (timezone-free arithmetic)
    """
    ensure_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # parquet timestamp[ns] read as long (legacy.parquet.nanosAsLong).
            # Integer division: float division would lose precision at 2^60
            # and disagree with DuckDB's ns→us truncation by ±1us.
            ts_us = F.expr("ts div 1000")
            df = df.withColumn("ts_us", ts_us).withColumn(
                "ts", F.timestamp_micros(ts_us)
            )
        elif ts_type in ("timestamp", "timestamp_ntz"):
            # parquet timestamp[us] (driver generators vary by round) —
            # already microsecond precision; expose the bigint twin and pin
            # TimestampType (session tz is UTC, so ntz→tz changes nothing).
            ts = F.col("ts").cast("timestamp")
            df = df.withColumn("ts", ts).withColumn("ts_us", F.unix_micros(ts))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def spread(df: DataFrame) -> DataFrame:
    """Repartition up to the session's default parallelism when the source
    has fewer partitions than cores.

    Small local parquet files arrive as one partition, serializing any
    compute-heavy per-row operator; at production scale the scan already
    yields thousands of partitions so the check is pointless — and its
    ``df.rdd`` probe is itself a driver-side JavaRDD conversion per query
    build.  Both are therefore gated: only ``local[*]`` sessions (or an
    explicit ``SPARK_GRAFT_SPREAD=1``) ever run the probe; cluster
    deployments return the plan untouched.
    """
    spark = df.sparkSession
    forced = os.environ.get("SPARK_GRAFT_SPREAD")
    if forced == "0":
        return df
    if forced != "1" and not spark.sparkContext.master.startswith("local"):
        return df
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def read_wholetext(spark: SparkSession, path: str) -> DataFrame:
    """(filename, content) per file — the reference's input model.

    Mirrors mr/worker.go:67-71 where the map UDF receives the file name and
    the entire contents as one string; each file is one input row and Spark
    schedules them across executors instead of streaming every byte through a
    coordinator process.
    """
    df = spark.read.format("text").option("wholetext", "true").load(path)
    return df.select(
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("filename"),
        F.col("value").alias("content"),
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view so raw ``spark.sql``
    works against the same normalized schemas the DataFrame queries use
    (events keeps its ts/ts_us normalization — the views and the query
    library can never disagree on timestamp semantics)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run ANSI SQL over the driver tables (convenience wrapper: views are
    (re)registered first, then the statement is planned by Catalyst like
    any DataFrame query)."""
    register_views(spark, sf_dir)
    return spark.sql(query)
