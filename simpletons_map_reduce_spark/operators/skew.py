"""Skew-resilient operators.

Spark's partial aggregation and AQE's skew-join splitting cover skewed
aggregates and joins, but a *window* over a skewed key (top-k per key) still
funnels every row of a hot key through one task.  ``salted_topk`` is the
standard two-phase fix: rank within (key, salt) first — splitting a hot
key's rows across ``salt`` tasks and discarding all but k·salt rows — then
rank the tiny survivor set.  Correct for any k because a row in the true
global top-k of its key is necessarily in the top-k of its salt bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: default fan-out per key; tune to the hottest key's row count / task budget
DEFAULT_SALT = 16


def salted_topk(
    df: DataFrame,
    part_keys: list[str],
    order_by: list[Column],
    k: int,
    salt: int = DEFAULT_SALT,
    rank_col: str = "rk",
) -> DataFrame:
    """Top-k rows per key via two salted ranking phases.

    ``order_by`` must be a deterministic total order (include a tiebreaker
    column) — the same requirement a plain window has for stable results.
    Output = input columns + ``rank_col`` (1-based, ≤ k).
    """
    salt_col = F.floor(F.rand(seed=0) * salt).cast("int")
    # Phase 1: rank inside (key, salt); a hot key's rows split salt-ways.
    w1 = Window.partitionBy(*part_keys, "__salt").orderBy(*order_by)
    survivors = (
        df.withColumn("__salt", salt_col)
        .withColumn("__rk1", F.row_number().over(w1))
        .filter(F.col("__rk1") <= k)
        .drop("__salt", "__rk1")
    )
    # Phase 2: exact rank over ≤ k·salt rows per key.
    w2 = Window.partitionBy(*part_keys).orderBy(*order_by)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w2).cast("long"))
        .filter(F.col(rank_col) <= k)
    )
