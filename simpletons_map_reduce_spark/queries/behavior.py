"""User-behavior analytics over ``events`` — funnel and cohort retention.

The reference's event-style processing is one grouped count per key
(mrapps/wc.go — SURVEY §2.C); rounds 1-2 added time windows, sessions and
pivots.  This module adds the two classic *sequential* behavior shapes —
ordered funnels and cohort retention — because both need an anchor computed
per user and then re-applied to that user's own rows, which is exactly the
pattern that turns into either (a) a self-join (two shuffles of the fact)
or (b) stacked window functions over ONE hash partitioning (one shuffle).
We pin shape (b):

- funnel_analysis   → three chained ``min(CASE …) OVER (PARTITION BY
  user_id)`` windows (view → click-after-view → purchase-after-click).
  All three windows share the user_id partitioning, so Catalyst plans ONE
  exchange and stacks the Window operators; a groupBy(user) dedup then a
  1-row conditional count finishes the funnel.
- cohort_retention  → the cohort anchor (first-seen day) is a window min
  per user reusing the same single shuffle; (cohort, week-offset) distinct
  user counts follow.

Timestamps are epoch-microsecond bigints end to end (ts_us), so every
derived day/week key is integer-exact in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import rn, sql_rn
from ..sources.tables import load_table
from .registry import register

US_PER_DAY = 86_400_000_000

#: conversion window between consecutive funnel stages (24 h in µs) —
#: unbounded stages saturate on a month of sparse per-user traffic.
FUNNEL_WINDOW_US = US_PER_DAY

FUNNEL_ORACLE = f"""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
w1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts_us END)
                 OVER (PARTITION BY user_id) AS mv FROM e),
w2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts_us > mv
                          AND ts_us <= mv + {FUNNEL_WINDOW_US} THEN ts_us END)
                 OVER (PARTITION BY user_id) AS mc FROM w1),
w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts_us > mc
                          AND ts_us <= mc + {FUNNEL_WINDOW_US} THEN ts_us END)
                 OVER (PARTITION BY user_id) AS mp FROM w2),
u AS (SELECT user_id, max(mv) AS mv, max(mc) AS mc, max(mp) AS mp
      FROM w3 GROUP BY user_id)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(count(mv) AS BIGINT) AS n_view,
       CAST(count(mc) AS BIGINT) AS n_view_click,
       CAST(count(mp) AS BIGINT) AS n_full_funnel
FROM u
"""


@register("funnel_analysis", FUNNEL_ORACLE, tags=("behavior",))
def funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase (24 h conversion windows),
    counted over users.

    Each stage anchor is the min event time that follows the previous
    stage's anchor for the SAME user within the conversion window.  The
    three window mins share one
    ``PARTITION BY user_id`` — a single exchange; the per-user dedup
    groupBy reuses that partitioning too (pinned in test_plans).  The
    alternative self-join-per-stage shape would shuffle events three
    times.
    """
    return funnel_user_anchors(spark, sf_dir).agg(
        F.count("*").alias("n_users"),
        F.count("mv").alias("n_view"),
        F.count("mc").alias("n_view_click"),
        F.count("mp").alias("n_full_funnel"),
    )


def funnel_user_anchors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user funnel stage anchors (user_id, mv, mc, mp) — the relation
    ``funnel_analysis`` aggregates, exposed separately so the streaming
    parity gate (queries/stream_parity.py::stream_parity_stateful) can
    compare ``funnel_stream``'s final state against it user by user."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_us"
    )
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "mv",
            F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(w),
        )
        .withColumn(
            "mc",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts_us") > F.col("mv"))
                    & (F.col("ts_us") <= F.col("mv") + FUNNEL_WINDOW_US),
                    F.col("ts_us"),
                )
            ).over(w),
        )
        .withColumn(
            "mp",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts_us") > F.col("mc"))
                    & (F.col("ts_us") <= F.col("mc") + FUNNEL_WINDOW_US),
                    F.col("ts_us"),
                )
            ).over(w),
        )
    )
    return staged.groupBy("user_id").agg(
        F.max("mv").alias("mv"), F.max("mc").alias("mc"), F.max("mp").alias("mp")
    )


COHORT_RETENTION_ORACLE = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
anchored AS (
  SELECT user_id, ts_us,
         min(ts_us) OVER (PARTITION BY user_id) AS first_us
  FROM e
)
SELECT first_us // {US_PER_DAY} AS cohort_day,
       (ts_us // {US_PER_DAY} - first_us // {US_PER_DAY}) // 7 AS week_offset,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM anchored
GROUP BY 1, 2
"""


@register("cohort_retention", COHORT_RETENTION_ORACLE, tags=("behavior",))
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort × week-offset retention counts.

    The cohort anchor (first-seen epoch day) is a window min on the same
    user_id partitioning the sessionizer uses — one shuffle of events; the
    (cohort, week) distinct-user count is the only further exchange.  Day
    and week keys are integer divisions of epoch-microseconds, so grouping
    keys match DuckDB bit-for-bit.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts_us")
    w = Window.partitionBy("user_id")
    anchored = ev.withColumn("first_us", F.min("ts_us").over(w))
    # integer division throughout (Spark `div` ≡ DuckDB `//` on bigints) —
    # float division would round, not floor, and drift on day boundaries.
    return (
        anchored.select(
            F.expr(f"first_us div {US_PER_DAY}").alias("cohort_day"),
            F.expr(
                f"(ts_us div {US_PER_DAY} - first_us div {US_PER_DAY}) div 7"
            ).alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


CUMULATIVE_USERS_ORACLE = f"""
WITH firsts AS (
  SELECT user_id, min(epoch_us(ts)) // {US_PER_DAY} AS first_day
  FROM events GROUP BY user_id
),
daily AS (
  SELECT first_day AS day, CAST(count(*) AS BIGINT) AS new_users
  FROM firsts GROUP BY first_day
)
SELECT day, new_users,
       CAST(sum(new_users) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       AS total_users
FROM daily
"""


@register("cumulative_users", CUMULATIVE_USERS_ORACLE, tags=("behavior",))
def cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new users and the running total ("growth curve").

    A naive running COUNT(DISTINCT) over events needs the full event set
    under one global sort.  Reducing first (per-user min day, then per-day
    counts) shrinks the window input to O(days) rows, so the global
    ORDER BY frame is a single tiny partition regardless of SF — the same
    pre-aggregate-then-window shape as moving_revenue.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts_us")
    firsts = ev.groupBy("user_id").agg(
        F.expr(f"min(ts_us) div {US_PER_DAY}").alias("first_day")
    )
    daily = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).alias("total_users"),
    )


US_PER_MINUTE = 60_000_000

USER_TREND_ORACLE = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us, value,
         min(epoch_us(ts)) OVER (PARTITION BY user_id) AS first_us
  FROM events
),
x AS (
  SELECT user_id, value AS y,
         CAST((ts_us - first_us) // {US_PER_MINUTE} AS DOUBLE) AS x
  FROM e
),
s AS (
  SELECT user_id,
         CAST(count(*) AS DOUBLE) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM x GROUP BY user_id
)
SELECT user_id,
       CAST(n AS BIGINT) AS n_events,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE {sql_rn('(n * sxy - sx * sy) / (n * sxx - sx * sx)', 4)}
       END AS slope,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE {sql_rn('(sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)'
                         ' / n', 4)}
       END AS intercept
FROM s
"""


@register("user_trend", USER_TREND_ORACLE, tags=("behavior",))
def user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user least-squares trend of event value over time.

    Slope/intercept from the explicit-sum normal equations — NOT the
    built-in covar_pop/var_pop, whose streaming-merge algorithms are
    engine-specific and catastrophically cancel at epoch-microsecond
    magnitudes.  x is rescaled to whole minutes since the user's first
    event, so n, Σx and Σx² are integer-exact doubles and the denominator
    is cross-engine EXACT; only Σy/Σxy carry order-dependent rounding,
    absorbed by the 4-dp floor-round.  One user_id shuffle (window min +
    aggregate share the partitioning).
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts_us", "value")
    w = Window.partitionBy("user_id")
    x = ev.withColumn("first_us", F.min("ts_us").over(w)).select(
        "user_id",
        F.expr(f"CAST((ts_us - first_us) div {US_PER_MINUTE} AS DOUBLE)").alias(
            "x"
        ),
        F.col("value").alias("y"),
    )
    s = x.groupBy("user_id").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / denom
    return s.select(
        "user_id",
        F.col("n").cast("long").alias("n_events"),
        F.when(denom != 0, rn(slope, 4)).alias("slope"),
        F.when(denom != 0, rn((F.col("sy") - slope * F.col("sx")) / F.col("n"), 4)).alias(
            "intercept"
        ),
    )


EVENT_TRANSITIONS_ORACLE = """
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
FROM s
WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
"""


@register("event_transitions", EVENT_TRANSITIONS_ORACLE, tags=("behavior",))
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition counts (the behavioral Markov
    matrix: what users do NEXT after each action).

    ``lag`` over the (user, time, event_id)-ordered stream pairs each
    event with its predecessor — the same single user_id shuffle every
    other behavior query rides — and the transition aggregate is
    O(|event_types|²) rows.  The event_id tiebreak totalizes the order,
    so simultaneous events pair identically in both engines.  At 100 TB
    the only cost is the one keyed shuffle; the matrix itself is tiny.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return (
        s.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
