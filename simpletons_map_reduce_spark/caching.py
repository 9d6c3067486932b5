"""Session-scoped persist tracking — cache blocks must not outlive queries.

Several queries persist shared subtrees (shingle sets, LSH band relations,
tf-idf terms) because multiple consumers would otherwise recompute them per
action.  A *lazy* result DataFrame cannot unpersist those subtrees inside
the query function — the cache must live until the caller runs an action.
So query code registers every persist here, and whoever runs the action
(tests, bench, tools/check_oracle) calls :func:`release_persisted` once the
result is consumed.  Without the release a long-lived session accumulates
dead cache blocks ("Asked to cache already cached data" warnings, memory
pressure at scale).

``tracked_checkpoint`` covers ``localCheckpoint``-materialized relations
(iterative algorithms): their blocks are pinned in the block manager with
no lineage to recompute from, so releasing them both unpersists the
DataFrame AND drops the materialized internal RDD.

CONTRACT: call ``release_persisted()`` only after consuming results —
a checkpointed relation loses its data (not just its cache) on release.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_PERSISTED: list[DataFrame] = []


def tracked_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """Persist ``df`` and register it for a later :func:`release_persisted`."""
    out = df.persist(level)
    _PERSISTED.append(out)
    return out


def tracked_checkpoint(df: DataFrame) -> DataFrame:
    """``localCheckpoint`` ``df`` (eager) and register the materialized
    result for release."""
    out = df.localCheckpoint()
    _PERSISTED.append(out)
    return out


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted/checkpointed DataFrame for release."""
    _PERSISTED.append(df)
    return df


def free_checkpoint(df: DataFrame) -> None:
    """Immediately drop a localCheckpoint'd DataFrame's materialized blocks
    (for superseded per-iteration state — do NOT call on data still in use).

    A checkpointed DataFrame's analyzed plan is a ``LogicalRDD`` wrapping
    the persisted internal RDD; that wrapped RDD is the thing to unpersist
    (``toRdd()``/``df.rdd`` would hand back a fresh *derived* RDD whose
    unpersist is a no-op).  Silently does nothing on non-checkpoint plans.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def release_persisted() -> None:
    """Unpersist every tracked relation (LIFO).  Call after the action.

    Blocking on purpose: an async unpersist leaves dead blocks competing
    with the NEXT query's memory until the executor gets around to
    dropping them — measured as multi-second spikes in long bench
    sessions.  The release runs between queries, so blocking costs
    nothing on any timed path."""
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist(True)
        except Exception:
            pass
        free_checkpoint(df)


def n_tracked() -> int:
    return len(_PERSISTED)
