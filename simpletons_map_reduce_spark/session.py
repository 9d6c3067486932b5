"""SparkSession factory and session-conf hygiene.

The reference hard-codes NReduce=10 partitions (main/mrcoordinator.go:23) and
intended 64 MB input splits (mr/coordinator.go:288-304); here those map to
``spark.sql.shuffle.partitions`` and ``spark.sql.files.maxPartitionBytes``.

``ensure_confs`` is also applied to *externally created* sessions (the
correctness driver owns its own SparkSession) so that every query behaves the
same regardless of who built the session:

- ``session.timeZone=UTC``: DuckDB timestamps are UTC-naive; pinning the Spark
  session TZ makes instant<->naive conversions deterministic.
- ``legacy.parquet.nanosAsLong=true``: the ``events`` table stores
  ``timestamp[ns]``, which Spark's parquet reader rejects by default
  (PARQUET_TYPE_ILLEGAL); reading nanos as long and converting explicitly is
  deterministic and matches DuckDB's ns->us truncation.
- ``parquet.inferTimestampNTZ.enabled=true``: ms-precision columns
  (o_orderdate, l_shipdate) read as TIMESTAMP_NTZ, the exact semantics DuckDB
  gives them — comparisons against literals become timezone-independent.
- AQE on: runtime coalescing + skew-join splitting is the 100 TB answer to
  static partition counts.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs safe to set at runtime on an existing session.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # A 64 MB broadcast is cheap on any modern executor, and it converts
    # the "big candidate relation ⋈ doc-sized side relation" joins (dedup
    # verification, dimension joins just over the 10 MB default) from
    # sort-merge — which sorts the *big* side — into map-side hash joins.
    # AQE applies it from measured sizes, so a genuinely huge side still
    # gets a shuffle join.
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "64m",
}


def ensure_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to any session (ours or the driver's).

    Best-effort: a conf that became static in some Spark build is skipped
    rather than failing the query.
    """
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            pass
    return spark


def get_session(
    app_name: str = "simpletons-map-reduce-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the local session used by tests and bench.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (driver contract) else all cores.
    """
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if str(cpus).isdigit() else 32

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # nod to the reference's 64 MB split intent (mr/coordinator.go:289);
        # also the right granularity for large parquet scans.
        .config("spark.sql.files.maxPartitionBytes", "64m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # local[32] on a 128 GiB box: 8g forced the dedup shingle persists
        # to spill once a long session had broadcasts/cache pressure
        # (near_dedup 71 s vs 33 s at sf1) — 16g restores headroom while
        # staying far under the machine.  Override: SPARK_GRAFT_DRIVER_MEM.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return ensure_confs(spark)
