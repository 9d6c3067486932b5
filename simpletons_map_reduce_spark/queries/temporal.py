"""Temporal join operators the reference (and stock Spark SQL) lack.

The reference has no joins at all (SURVEY §2.C: "Joins: absent"), so these
are tier-C extension operators, implemented as *compositions of built-in
DataFrame ops* — no UDFs, no driver-side loops — per the custom-operator
policy (composition first, Pandas UDF only when semantics demand it).

- asof_join:  for every left event, the most recent right event at-or-before
  it (same key).  Spark has no ASOF JOIN; the classic shuffle-efficient
  formulation is union-tag-then-window: ONE shuffle on the key, no join
  operator at all, no range explosion.  At 100 TB this beats any
  join-then-filter plan because state per key is a single "last seen right
  row" carried by a running window — the same trick a stream-stream as-of
  join would use.
- range_join: all same-key pairs within a time band.  A naive theta-join is
  O(n²) per key; bucketing ts into band-width buckets turns it into an
  equi-join on (key, bucket) with each left row probing exactly two buckets
  — shuffle volume 2·|rows|, and Catalyst plans a plain hash join.

Timestamps follow the events.py convention: epoch-microsecond bigints in all
outputs (timezone-free, oracle-stable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import rn, sql_rn
from ..sources.tables import load_table
from .registry import register

# ---------------------------------------------------------------------------
# asof_join: click → latest prior purchase per user
# ---------------------------------------------------------------------------

ASOF_JOIN_ORACLE = f"""
WITH clicks AS (
    SELECT user_id, event_id, epoch_us(ts) AS ts_us
    FROM events WHERE event_type = 'click'
),
purchases_dedup AS (
    -- one row per (user, instant): deterministic ASOF target
    SELECT user_id, epoch_us(ts) AS ts_us,
           max(event_id) AS p_event_id,
           max_by(value, event_id) AS p_value
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id, epoch_us(ts)
)
SELECT c.event_id AS click_id,
       c.user_id,
       c.ts_us AS click_ts_us,
       p.p_event_id AS purchase_id,
       {sql_rn('p.p_value', 2)} AS purchase_value,
       c.ts_us - p.ts_us AS lag_us
FROM clicks c
ASOF LEFT JOIN purchases_dedup p
  ON c.user_id = p.user_id AND c.ts_us >= p.ts_us
"""


@register("asof_join", ASOF_JOIN_ORACLE, tags=("temporal",))
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click matched to the user's latest prior purchase.

    Union both sides tagged (right rows sort before left rows at equal ts so
    ``>=`` semantics hold), then a running ``last(ignorenulls)`` window per
    user carries the most recent purchase forward onto every click row.
    Exactly one shuffle (on user_id); no join operator; state per key is one
    struct.  DuckDB's native ASOF LEFT JOIN is the oracle.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts_us",
        F.col("event_id").alias("click_id"),
        F.lit(1).alias("side"),
        F.lit(None).cast(
            "struct<p_ts_us:bigint,p_event_id:bigint,p_value:double>"
        ).alias("p"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts_us",
        F.lit(None).cast("bigint").alias("click_id"),
        F.lit(0).alias("side"),
        F.struct(
            F.col("ts_us").alias("p_ts_us"),
            F.col("event_id").alias("p_event_id"),
            F.col("value").alias("p_value"),
        ).alias("p"),
    )
    # Running max of the (ts, id, value) struct IS the as-of state: struct
    # ordering is lexicographic, so the max over all prior purchase rows is
    # the latest one, ties on instant resolved to max event_id — the same
    # dedup the oracle does with max_by, but without a separate pre-agg
    # shuffle.  max() skips nulls, so click rows pass through untouched and
    # the whole operator costs exactly ONE exchange (on user_id).
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("last_p", F.max("p").over(w))
        .filter(F.col("side") == 1)
        .select(
            "click_id",
            "user_id",
            F.col("ts_us").alias("click_ts_us"),
            F.col("last_p.p_event_id").alias("purchase_id"),
            rn(F.col("last_p.p_value"), 2).alias("purchase_value"),
            (F.col("ts_us") - F.col("last_p.p_ts_us")).alias("lag_us"),
        )
    )


# ---------------------------------------------------------------------------
# range_join: same-user event pairs within a 1-day band
# ---------------------------------------------------------------------------

BAND_US = 86_400_000_000  # 1 day in microseconds

RANGE_JOIN_ORACLE = f"""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events)
SELECT a.user_id,
       a.event_id AS a_id,
       b.event_id AS b_id,
       b.ts_us - a.ts_us AS gap_us
FROM e a JOIN e b
  ON a.user_id = b.user_id
 AND b.ts_us >= a.ts_us
 AND b.ts_us - a.ts_us <= {BAND_US}
 AND (b.ts_us > a.ts_us OR b.event_id > a.event_id)
"""


@register("range_join", RANGE_JOIN_ORACLE, tags=("temporal",))
def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join: unordered same-user event pairs at most one day apart.

    Each pair is emitted once, (earlier, later); ties on ts break by
    event_id.  Bucketing: the *earlier* row probes buckets {d, d+1} of width
    BAND_US, the later row sits in its own bucket — any pair within the band
    collides in exactly one bucket, so the theta-join becomes a hash
    equi-join on (user_id, bucket) with a residual band filter.  The oracle
    is the plain inequality join DuckDB can afford at sf0.01.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts_us")
    # integer division: a double-precision divide loses exactness past 2^53
    bucket = F.expr(f"ts_us div {BAND_US}")
    a = ev.select(
        F.col("user_id"),
        F.col("event_id").alias("a_id"),
        F.col("ts_us").alias("a_ts"),
        F.explode(F.array(bucket, bucket + 1)).alias("bkt"),
    )
    b = ev.select(
        F.col("user_id"),
        F.col("event_id").alias("b_id"),
        F.col("ts_us").alias("b_ts"),
        bucket.alias("bkt"),
    )
    return (
        a.join(b, ["user_id", "bkt"])
        .filter(
            (F.col("b_ts") >= F.col("a_ts"))
            & (F.col("b_ts") - F.col("a_ts") <= BAND_US)
            & (
                (F.col("b_ts") > F.col("a_ts"))
                | (F.col("b_id") > F.col("a_id"))
            )
        )
        .select(
            "user_id",
            "a_id",
            "b_id",
            (F.col("b_ts") - F.col("a_ts")).alias("gap_us"),
        )
    )


SCD_INTERVALS_ORACLE = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, value
  FROM events
),
changes AS (
  SELECT user_id, ts_us, value,
         lag(value) OVER (PARTITION BY user_id
                          ORDER BY ts_us, event_id) AS prev_value
  FROM e
),
kept AS (
  SELECT user_id, ts_us, value
  FROM changes
  WHERE prev_value IS NULL OR value <> prev_value
)
SELECT user_id, value,
       ts_us AS valid_from_us,
       lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS valid_to_us
FROM kept
"""


@register("scd_intervals", SCD_INTERVALS_ORACLE, tags=("temporal",))
def scd_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 interval construction from an event log: each
    value CHANGE opens a validity interval [valid_from, valid_to), the
    latest interval stays open (NULL valid_to).

    The standard warehouse build for slowly-changing dimensions from CDC /
    event streams.  Two stacked windows — change detection (lag) and
    interval close (lead) — share ONE user_id hash partitioning, so the
    fact shuffles once; the second window sorts the already-reduced change
    rows.  (ts_us, event_id) makes the change-detection order total, so
    lag is deterministic under per-user ts collisions; the surviving
    change rows have unique ts_us per user on this data, and downstream
    equality with the oracle is exact (value doubles compare bitwise).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts_us", "event_id", "value"
    )
    w_ord = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = ev.withColumn("prev_value", F.lag("value").over(w_ord))
    kept = changes.filter(
        F.col("prev_value").isNull() | (F.col("value") != F.col("prev_value"))
    )
    w_close = Window.partitionBy("user_id").orderBy("ts_us")
    return kept.select(
        "user_id",
        "value",
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(w_close).alias("valid_to_us"),
    )


ATTR_WINDOW_US = 3_600_000_000  # 1 h attribution window

CLICK_ATTRIBUTION_ORACLE = f"""
WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
           FROM events),
c AS (SELECT user_id, event_id AS click_id, ts_us AS c_ts
      FROM e WHERE event_type = 'click'),
p AS (SELECT user_id, event_id AS purchase_id, ts_us AS p_ts
      FROM e WHERE event_type = 'purchase')
SELECT c.user_id, click_id, purchase_id, p_ts - c_ts AS lag_us
FROM c JOIN p ON c.user_id = p.user_id
WHERE p_ts >= c_ts AND p_ts <= c_ts + {ATTR_WINDOW_US}
"""


@register("click_attribution", CLICK_ATTRIBUTION_ORACLE, tags=("temporal",))
def click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All (click, purchase) attribution pairs within a 1 h window —
    the BATCH twin of the watermarked stream-stream interval join
    (streaming/join_stream.py::attribution_stream).

    User-keyed equi-join carries the shuffle; the event-time interval
    rides as a probe-side filter (never a theta-join blowup — same shape
    as exists_orders).  Multi-touch by design: every qualifying click
    gets the purchase (last-touch collapse is asof_join's argmax).  All
    arithmetic is integer microseconds.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts_us"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts_us").alias("c_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts_us").alias("p_ts"),
    )
    return (
        c.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + ATTR_WINDOW_US),
        )
        .select(
            "user_id",
            "click_id",
            "purchase_id",
            (F.col("p_ts") - F.col("c_ts")).alias("lag_us"),
        )
    )


GAP_FILL_ORACLE = f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, {sql_rn('sum(value)', 4)} AS rev
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
bounds AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
spine AS (
  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
)
SELECT s.user_id,
       CAST(s.day - DATE '1970-01-01' AS BIGINT) AS day_ep,
       last_value(d.rev IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS revenue_filled,
       CAST(CASE WHEN d.rev IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_observed
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
"""


@register("gap_fill", GAP_FILL_ORACLE, tags=("temporal",))
def gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification + forward fill (gap-filled daily series).

    The row-GENERATING temporal operator the rest of the family lacks:
    each user's daily purchase revenue becomes a dense per-day series
    over [first_day, last_day], with missing days materialized by
    ``explode(sequence(...))`` and carried forward by
    ``last(ignorenulls)`` over a rows-unbounded-preceding window — the
    standard time-series "resample + ffill".

    Scale shape: the dense spine is O(groups × days) — generated from
    the O(groups) bounds aggregate, NOT by scanning the fact table per
    day.  The daily aggregate shuffles once on (user, day); the spine
    join and the forward-fill window both ride the user partitioning.
    Days are epoch-day bigints in the output (timestamps never appear
    raw — driver hash contract).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(rn(F.sum("value"), 4).alias("rev"))
    )
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.datediff("day", F.lit("1970-01-01")).cast("long").alias("day_ep"),
            F.last("rev", ignorenulls=True).over(w).alias("revenue_filled"),
            F.when(F.col("rev").isNull(), 0).otherwise(1).cast("long").alias(
                "is_observed"
            ),
        )
    )
