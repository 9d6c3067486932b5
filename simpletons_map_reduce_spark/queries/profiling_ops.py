"""Data-profiling & semi-structured operators over ``events`` — tier C.

Three capabilities a pipeline engineer reaches for before any modeling run:
pull typed fields out of semi-structured payloads (JSON props), cross-tab a
categorical against an entity (pivot), and bin a numeric column into a
histogram.  All three are single-aggregation plans — map-side combined, one
shuffle on the group key, no UDFs — so they cost one pass over the fact
table at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import rn, sql_rn
from ..sources.tables import load_table
from .registry import register

PROPS_EXTRACT_ORACLE = f"""
WITH t AS (
    SELECT json_extract(props, '$.k')::BIGINT AS k, value
    FROM events
)
SELECT k,
       CAST(count(*) AS BIGINT) AS n_events,
       {sql_rn('avg(value)', 4)} AS avg_value
FROM t GROUP BY k
"""


@register("props_extract", PROPS_EXTRACT_ORACLE, tags=("profiling",))
def props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the JSON ``props`` payload + aggregate by it.

    ``get_json_object`` is a native expression (Jackson inside codegen, no
    Python); the JSON parse happens once in the scan stage and only the
    extracted bigint continues into the aggregate.  At 100 TB: prefer
    parsing ONCE into a typed column and persisting (schema-on-write); this
    operator is the schema-on-read path for payloads you don't control.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            F.get_json_object("props", "$.k").cast("long").alias("k"), "value"
        )
        .groupBy("k")
        .agg(
            F.count("*").alias("n_events"),
            rn(F.avg("value"), 4).alias("avg_value"),
        )
    )


#: Fixed pivot columns — an explicit list keeps the schema deterministic
#: (and skips Spark's extra distinct-values job; at scale an implicit pivot
#: is a full shuffle just to learn the column set).
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

EVENT_PIVOT_ORACLE = f"""
SELECT user_id,
       {", ".join(
           f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}"
           for t in EVENT_TYPES
       )}
FROM events GROUP BY user_id
"""


@register("event_pivot", EVENT_PIVOT_ORACLE, tags=("profiling",))
def event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type cross-tab (pivot with a declared column set).

    Spelled as conditional aggregates rather than ``.pivot()``: Spark's
    pivot — even with declared values — lowers to a (user, type) pre-
    aggregate plus a second pivotfirst aggregate, i.e. TWO shuffles.  One
    ``count(when(type = t))`` per declared column is the same result in a
    single map-side-combined exchange on user_id (pinned in test_plans),
    and is exactly the FILTER-aggregate plan the oracle spells.
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == t, 1))
            .cast("long")
            .alias(f"n_{t}")
            for t in EVENT_TYPES
        ]
    )


HIST_BIN = 25.0  # fixed-width bins over the value column

VALUE_HISTOGRAM_ORACLE = f"""
SELECT CAST(floor(value / {HIST_BIN}) * {HIST_BIN} AS DOUBLE) AS bin_start,
       CAST(count(*) AS BIGINT) AS n,
       {sql_rn('min(value)', 4)} AS bin_min,
       {sql_rn('max(value)', 4)} AS bin_max
FROM events GROUP BY 1
"""


@register("value_histogram", VALUE_HISTOGRAM_ORACLE, tags=("profiling",))
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values (bin width {HIST_BIN}).

    floor-division binning is a scan-stage expression; the aggregate groups
    on the bin id — cardinality = value-range/width regardless of row count,
    so the shuffle is constant-size at any SF.
    """
    events = load_table(spark, sf_dir, "events")
    bin_start = (F.floor(F.col("value") / HIST_BIN) * HIST_BIN).cast("double")
    return (
        events.select(bin_start.alias("bin_start"), "value")
        .groupBy("bin_start")
        .agg(
            F.count("*").alias("n"),
            rn(F.min("value"), 4).alias("bin_min"),
            rn(F.max("value"), 4).alias("bin_max"),
        )
    )
