"""Bucketed (co-located) joins — pre-shuffling a table ONCE at write time.

At 100 TB the dominant recurring cost of fact⋈fact joins is re-shuffling
both sides on every query.  Writing both tables bucketed (and sorted)
on the join key stores each key's rows in a deterministic bucket file,
so a join between two tables bucketed the same way needs NO exchange at
read time — Spark plans a SortMergeJoin straight over the bucket files.
The shuffle is paid once at ingest, amortized over every later join —
the reference's fixed NReduce=10 hash partitioning (mr/worker.go:41-45,
main/mrcoordinator.go:23) is exactly this idea, made persistent.

Caveats encoded here:
- bucket counts must MATCH (or divide) across join sides;
- ``spark.sql.sources.v1BucketingEnabled`` stays default;
- one output task can write one file per bucket, so writers repartition
  by the bucket key first (avoids small-file explosion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
) -> None:
    """Persist ``df`` as a managed table bucketed+sorted on ``key``.

    ``repartition(n_buckets, key)`` first, so each task owns whole
    buckets and the writer emits exactly n_buckets files, not
    n_tasks × n_buckets.
    """
    (
        df.repartition(n_buckets, key)
        .write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    With matching bucket specs Spark reads both sides bucket-by-bucket:
    the plan contains NO Exchange (pinned by tests/test_bucketing.py).
    The merge hint keeps the plan on the sort-merge path even when one
    side is small enough to broadcast — at the scale bucketing is FOR,
    neither side broadcasts, and the hint makes the local test see the
    same plan the cluster would.
    """
    return (
        spark.table(left_table)
        .hint("merge")
        .join(spark.table(right_table), key)
    )
