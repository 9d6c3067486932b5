"""foreachBatch upsert sink — maintain a latest-state snapshot from a stream.

The production pattern for "stream → queryable table": Structured
Streaming's exactly-once contract is per-micro-batch (a batch either
commits or replays WHOLE, identified by batch_id), so the sink function
must be IDEMPOTENT in the batch content — here, latest-wins merge by key,
which is a semilattice: replaying a batch leaves the snapshot unchanged
(pinned in tests/test_upsert_sink.py).  On a real deployment the swap
step is a transactional table format commit; the parquet tmp-dir swap
below is the local stand-in with the same read-merge-replace shape.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_wins_merge(
    snap: DataFrame | None, batch: DataFrame, key: str, order_cols: list[str]
) -> DataFrame:
    """max_by(struct(order, payload)) per key over snapshot ∪ batch —
    ONE aggregate, no join; the (order_cols) tuple must be a total order
    (ties impossible) for cross-run determinism."""
    pay = [c for c in batch.columns if c != key]
    src = batch if snap is None else snap.select(batch.columns).unionAll(batch)
    return src.groupBy(key).agg(
        F.max(F.struct(*order_cols, *[c for c in pay if c not in order_cols])).alias(
            "s"
        )
    ).select(key, *[F.col(f"s.{c}").alias(c) for c in pay])


def upsert_query(
    stream_df: DataFrame, path: str, key: str, order_cols: list[str]
):
    """Start a foreachBatch writeStream that maintains ``path`` as the
    latest-state parquet snapshot of the stream (latest-wins by key)."""

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        apply_batch(batch, path, key, order_cols)

    return (
        stream_df.writeStream.outputMode("update")
        .foreachBatch(merge_batch)
        .start()
    )


def apply_batch(
    batch: DataFrame, path: str, key: str, order_cols: list[str]
) -> None:
    """One merge commit: read current snapshot, latest-wins merge the
    batch, write to a tmp dir, swap.  Exposed separately so tests can
    replay a batch and pin idempotence."""
    spark = batch.sparkSession
    p = Path(path)
    snap = spark.read.parquet(path) if p.exists() else None
    merged = latest_wins_merge(snap, batch, key, order_cols)
    tmp = f"{path}.staging"
    merged.write.mode("overwrite").parquet(tmp)
    # local stand-in for a transactional commit: replace dir atomically
    # enough for a single writer (the streaming query is one).
    if p.exists():
        shutil.rmtree(path)
    shutil.move(tmp, path)
