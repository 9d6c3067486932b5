"""File sinks — the reference's output formats as distributed writers.

Reference sinks (SURVEY §1.3):
- final output  "<key> <value>\\n" per line in ``mr-out-<p>``, one file per
  reduce partition (mr/worker.go:187-191,233);
- result assembly: the harness reads the *sorted union* of all partition
  files (``sort mr-out-* | grep .``, main/test-mr.sh:103);
- intermediates: JSON-Lines ``mr-i-<p>`` (mr/worker.go:92-126) — in Spark
  these are internal shuffle files, but the format survives as an explicit
  checkpoint/export sink.

Spark-side, "one file per partition" falls out of the one-file-per-task
commit protocol, and the exactly-once OutputCommitter replaces the
reference's append-on-retry duplication hazard (mr/worker.go:95, SURVEY
§4.3.1).  Writers take ``num_files`` to control output fan-in explicitly
instead of relying on whatever the upstream partitioning happened to be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_kv_text(df: DataFrame, path: str, num_files: int | None = None) -> None:
    """mr-out sink: "<key> <value>" lines, one file per partition (A10).

    ``df`` must have (key, value)-shaped first two columns; everything is
    cast to string exactly like the reference's ``fmt.Fprintf("%v %v\\n")``.
    """
    k, v = df.columns[0], df.columns[1]
    out = df.select(
        F.concat_ws(
            " ", F.col(k).cast("string"), F.col(v).cast("string")
        ).alias("value")
    )
    if num_files is not None:
        out = out.repartition(num_files)
    out.write.mode("overwrite").text(path)


def write_kv_text_sorted(df: DataFrame, path: str, num_files: int = 1) -> None:
    """Globally sorted text output ≙ ``sort mr-out-* | grep .`` (A11).

    A global ``orderBy`` range-partitions into ``num_files`` sorted,
    non-overlapping files whose concatenation in filename order is the
    fully sorted result — the distributed form of the harness's driver-side
    sort.  num_files=1 reproduces the single sorted stream for small
    results; leave it >1 at scale.
    """
    k, v = df.columns[0], df.columns[1]
    lines = df.select(
        F.concat_ws(
            " ", F.col(k).cast("string"), F.col(v).cast("string")
        ).alias("value")
    ).filter(F.col("value") != "")
    # repartitionByRange gives num_files non-overlapping sorted ranges (the
    # same sampling-based range partitioner a global orderBy uses), so the
    # parameter actually bounds the file count instead of leaving it at
    # whatever spark.sql.shuffle.partitions the sort happened to produce.
    out = lines.repartitionByRange(num_files, "value").sortWithinPartitions("value")
    out.write.mode("overwrite").text(path)


def read_kv_text(spark: SparkSession, path: str) -> DataFrame:
    """Read an mr-out-format directory back to (key, value) strings.

    Split on the FIRST space only — values may contain spaces (the
    indexer's "<count> <doc,list>" output, mrapps/indexer.go:36-39)."""
    lines = spark.read.text(path).where(F.instr("value", " ") > 0)
    return lines.select(
        F.expr("substring(value, 1, instr(value, ' ') - 1)").alias("key"),
        F.expr("substring(value, instr(value, ' ') + 1)").alias("value"),
    )


def write_jsonl(df: DataFrame, path: str, num_files: int | None = None) -> None:
    """JSON-Lines export ≙ the mr-i-* intermediate format (A6), as an
    explicit checkpoint (Spark's shuffle replaces it as an internal)."""
    out = df if num_files is None else df.repartition(num_files)
    out.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """Read a JSON-Lines directory; pass ``schema`` to skip the inference
    scan (mandatory at 100 TB — inference reads the whole input twice)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    num_files: int | None = None,
) -> None:
    """Production columnar sink. ``partition_by`` creates hive-style
    directory partitions (enables partition pruning for downstream readers);
    ``num_files`` bounds files per partition via repartition on the
    partition columns (avoids the many-small-files failure mode when
    upstream parallelism is high)."""
    out = df
    if num_files is not None:
        out = (
            df.repartition(num_files, *partition_by)
            if partition_by
            else df.repartition(num_files)
        )
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    num_files: int | None = None,
    header: bool = True,
) -> None:
    """CSV export for interop with non-columnar consumers.

    Same exactly-once commit protocol as every other sink; ``num_files``
    bounds fan-in.  Prefer parquet for anything Spark reads back — CSV
    exists for the last hop out of the pipeline.
    """
    out = df if num_files is None else df.repartition(num_files)
    out.write.mode("overwrite").option("header", header).csv(path)


def read_csv(
    spark: SparkSession, path: str, schema: str, header: bool = True
) -> DataFrame:
    """Read a CSV directory.  ``schema`` is mandatory: inference scans the
    whole input once before the real read — never acceptable at 100 TB —
    and silently guesses types the writer didn't intend."""
    return (
        spark.read.schema(schema).option("header", header).csv(path)
    )


def write_parquet_clustered(
    df: DataFrame, path: str, cluster_by: list[str], num_files: int = 8
) -> None:
    """Layout-optimized columnar sink: range-partition into ``num_files``
    non-overlapping key ranges and sort rows inside each file.

    Parquet stores min/max statistics per row group; after this layout a
    downstream point or range predicate on the cluster keys prunes whole
    files AND row groups instead of scanning everything — the difference
    between a key lookup touching one file and touching 100 TB.  (The
    write itself costs one range-exchange + local sort; amortized over
    every subsequent read.)
    """
    out = df.repartitionByRange(num_files, *cluster_by).sortWithinPartitions(
        *cluster_by
    )
    out.write.mode("overwrite").parquet(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    num_files: int | None = None,
) -> None:
    """ORC columnar sink — interop with Hive/Trino-centric warehouses.

    Same layout levers as write_parquet (hive-style partition dirs,
    bounded files per partition).  ORC carries min/max + bloom-filter
    indexes natively; Spark's vectorized ORC reader makes the round-trip
    cost symmetric with parquet, so format choice is a warehouse-interop
    decision, not a performance one.
    """
    out = df
    if num_files is not None:
        out = (
            df.repartition(num_files, *partition_by)
            if partition_by
            else df.repartition(num_files)
        )
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC directory (schema from file metadata, like parquet —
    no inference scan needed)."""
    return spark.read.orc(path)


def write_parquet_zordered(
    df: DataFrame,
    path: str,
    cluster_by: tuple[str, str],
    num_files: int = 8,
) -> None:
    """Multi-dimensional layout sink: range-partition + sort on the
    Z-ORDER key of two columns instead of the columns themselves.

    ``write_parquet_clustered`` gives perfect zone maps on its leading
    key and useless ones on every other column; interleaving the bits of
    two range-bucketized keys (queries/layout_ops.py) makes each output
    file cover a small rectangle of the 2-D key space, so parquet
    min/max statistics prune scans on EITHER predicate.  The z-value is
    computed per-row in codegen (no Python), the write costs the same
    one range-exchange + local sort as the single-key layout, and the
    z-column itself is dropped before writing.

    tests/test_layout.py pins the resulting per-file spans: both
    dimensions' mean normalized span stays far below the single-key
    layout's secondary-column span.

    CONTRACT (ADVICE r6/r7): both cluster keys must be NON-NEGATIVE
    integers — the range-bucket arithmetic (queries/layout_ops.py
    ``_bucket_expr``) silently produces out-of-range z-values for
    negative keys (and Spark ``div`` truncation diverges from floor
    division there).  Enforced on the DRIVER before ``write`` is ever
    invoked: the 1-row min/max aggregate is collected first and a
    violation raises in Python, so ``mode("overwrite")`` cannot delete
    pre-existing data at ``path`` on a contract violation (an in-plan
    ``raise_error`` fires only after the overwrite has already cleared
    the target).  The same collected maxima feed the bucket expressions
    as literals, which also removes the broadcast cross join and the
    per-row IF branch from the write plan.  One extra 1-row job per
    write — negligible against the range-exchange the layout pays anyway.
    """
    from pyspark.sql import functions as F

    from ..queries.layout_ops import _bucket_expr, _interleave_expr

    a, b = cluster_by
    min_a, max_a, min_b, max_b = df.agg(
        F.min(a), F.max(a), F.min(b), F.max(b)
    ).first()
    if (min_a is not None and min_a < 0) or (
        min_b is not None and min_b < 0
    ):
        raise ValueError(
            "write_parquet_zordered: cluster keys must be non-negative "
            f"integers (min({a})={min_a}, min({b})={min_b})"
        )
    z = _interleave_expr(
        _bucket_expr(a, str(max_a or 0), "div"),
        _bucket_expr(b, str(max_b or 0), "div"),
        "div",
    )
    out = (
        df.withColumn("__z", F.expr(z))
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    out.write.mode("overwrite").parquet(path)
