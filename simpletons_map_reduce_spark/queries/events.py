"""Event-stream-shaped queries over the ``events`` table.

The reference is batch-only (SURVEY §2.C: streaming entirely absent) — these
are the tier-C extension ops.  Both run here as *batch* DataFrames so the
DuckDB oracle applies; streaming/ holds the Structured Streaming variants of
the same logic (withWatermark + window / session_window).

Timestamps: events.ts is parquet timestamp[ns]; sources/tables.py reads it as
epoch-nanos and exposes ``ts_us`` (bigint) + ``ts`` (microsecond instant).
Outputs use epoch-microsecond bigints — integer arithmetic that is identical
across Spark, DuckDB, and any session timezone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import rn, sql_rn
from ..sources.tables import load_table
from .registry import register

EVENTS_TUMBLING_ORACLE = f"""
SELECT epoch_us(time_bucket(INTERVAL 5 MINUTE, ts)) AS w_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       {sql_rn('sum(value)', 2)} AS sum_value
FROM events
GROUP BY 1, 2
"""


@register("events_tumbling", EVENTS_TUMBLING_ORACLE, tags=("events",))
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling-window aggregate (F.window, epoch-aligned)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), rn(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("w_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap

EVENTS_SESSIONIZE_ORACLE = f"""
WITH ordered AS (
    SELECT user_id, event_id, value,
           epoch_us(ts) AS ts_us,
           lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id) AS prev_us
    FROM events
),
flagged AS (
    SELECT *, CASE WHEN prev_us IS NULL
                     OR ts_us - prev_us > {_SESSION_GAP_US}
                   THEN 1 ELSE 0 END AS new_session
    FROM ordered
),
numbered AS (
    SELECT *, sum(new_session) OVER (PARTITION BY user_id
                                     ORDER BY ts_us, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
)
SELECT user_id,
       CAST(session_id AS BIGINT) AS session_id,
       min(ts_us) AS session_start,
       max(ts_us) - min(ts_us) AS duration_us,
       CAST(count(*) AS BIGINT) AS n_events,
       {sql_rn('sum(value)', 2)} AS sum_value
FROM numbered
GROUP BY user_id, session_id
"""


@register("events_sessionize", EVENTS_SESSIONIZE_ORACLE, tags=("events",))
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) via lag + cumulative session ids.

    One shuffle on user_id serves both window functions and the final
    aggregate (same partitioning reused across stages).  The streaming twin
    is session_window + watermark in streaming/events_stream.py.
    """
    ev = load_table(spark, sf_dir, "events")
    order = [F.col("ts_us"), F.col("event_id")]
    by_user = Window.partitionBy("user_id").orderBy(*order)
    new_session = (
        F.when(
            F.col("prev_us").isNull()
            | (F.col("ts_us") - F.col("prev_us") > _SESSION_GAP_US),
            1,
        ).otherwise(0)
    )
    return (
        ev.select("user_id", "event_id", "value", "ts_us")
        .withColumn("prev_us", F.lag("ts_us").over(by_user))
        .withColumn("new_session", new_session)
        .withColumn(
            "session_id",
            F.sum("new_session")
            .over(by_user.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts_us").alias("session_start"),
            (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
            F.count("*").alias("n_events"),
            rn(F.sum("value"), 2).alias("sum_value"),
        )
    )


_HOP_SLIDE_US = 5 * 60 * 1_000_000   # 5-minute slide
_HOP_LEN_US = 10 * 60 * 1_000_000    # 10-minute window → 2 windows per event

EVENTS_HOPPING_ORACLE = f"""
WITH e AS (SELECT event_type, value, epoch_us(ts) AS ts_us FROM events),
expanded AS (
    SELECT event_type, value,
           (ts_us // {_HOP_SLIDE_US}) * {_HOP_SLIDE_US} - k * {_HOP_SLIDE_US}
               AS w_start
    FROM e CROSS JOIN (SELECT unnest([0, 1]) AS k)
)
SELECT w_start, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       {sql_rn('sum(value)', 2)} AS sum_value
FROM expanded
GROUP BY w_start, event_type
"""


@register("events_hopping", EVENTS_HOPPING_ORACLE, tags=("events",))
def events_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) window aggregate: 10-minute windows every 5 minutes.

    ``F.window`` with a slide expands each event into len/slide = 2 window
    copies before the partial aggregate — the same Expand+HashAggregate
    shape as grouping sets, so the shuffle carries pre-combined partials,
    not 2× the raw events.  The oracle expands explicitly via a 2-row
    cross join on the epoch-aligned window starts (Spark's windows are
    epoch-aligned too, so the start sets agree exactly).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n_events"), rn(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("w_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


#: Exact distributional quantiles, discrete form: the q-quantile is the
#: element at rank ceil(q·n) under a total (value, event_id) order, so the
#: result is an actual data value — no interpolation arithmetic to diverge
#: between engines.  The scale path for looser needs is approx_percentile
#: (t-digest, one pass, mergeable); this operator is the exact batch twin.
_PCTS = (("p50", 50), ("p90", 90), ("p99", 99))

_pct_cases_sql = ", ".join(
    f"max(CASE WHEN rk = -((-{p} * n) // 100) THEN value END) AS {name}"
    for name, p in _PCTS
)

VALUE_PERCENTILES_ORACLE = f"""
WITH ranked AS (
    SELECT event_type, value,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS rk,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM events
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n_events, {_pct_cases_sql}
FROM ranked
GROUP BY event_type
"""


@register("value_percentiles", VALUE_PERCENTILES_ORACLE, tags=("events",))
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of event value per type by rank selection.

    One shuffle on event_type serves the ranking window, the count
    window, and the final aggregate (partitioning reuse); the selected
    rank is -(-q·n DIV 100) where Spark's DIV and DuckDB's // BOTH
    truncate toward zero (note: not Python's flooring //), picking the
    lower rank on fractional positions — bit-identical across engines.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    w = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number()
        .over(w.orderBy("value", "event_id"))
        .alias("rk"),
        F.count("*").over(w).alias("n"),
    )
    return ranked.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_events"),
        *[
            F.expr(
                f"max(CASE WHEN rk = -((-{p} * n) DIV 100) THEN value END)"
            ).alias(name)
            for name, p in _PCTS
        ],
    )


LATEST_EVENTS_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rk
  FROM events
)
SELECT user_id, ts_us AS last_ts_us, event_id AS last_event_id,
       event_type AS last_event_type, value AS last_value
FROM e WHERE rk = 1
"""


@register("latest_events", LATEST_EVENTS_ORACLE, tags=("events",))
def latest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest record per key (SCD-style "current state" extraction).

    ``max(struct(ts, id, …))`` in ONE map-side-combined aggregate pass
    (planned as a partial+final SortAggregate — struct isn't a fixed-size
    hash buffer) — each input partition forwards a single candidate per
    user, so the shuffle carries O(users) rows.  The row_number()-window
    rendering
    (what the oracle uses, and what most pipelines write) must instead
    shuffle EVERY event to sort full per-user partitions; at 100 TB the
    aggregate shape is the difference between moving keys and moving the
    table.  (ts_us, event_id) is unique, so the struct order is total and
    the winner deterministic.
    """
    ev = load_table(spark, sf_dir, "events")
    latest = ev.groupBy("user_id").agg(
        F.max(
            F.struct(
                F.col("ts_us"), F.col("event_id"), F.col("event_type"),
                F.col("value"),
            )
        ).alias("s")
    )
    return latest.select(
        "user_id",
        F.col("s.ts_us").alias("last_ts_us"),
        F.col("s.event_id").alias("last_event_id"),
        F.col("s.event_type").alias("last_event_type"),
        F.col("s.value").alias("last_value"),
    )


US_MIN = 60_000_000
US_HOUR = 3_600_000_000
US_DAY = 86_400_000_000

TIME_ROLLUP_ORACLE = f"""
WITH e AS (
  SELECT epoch_us(ts) // {US_DAY} AS day_id,
         epoch_us(ts) // {US_HOUR} AS hour_id,
         epoch_us(ts) // {US_MIN} AS minute_id,
         value
  FROM events
)
SELECT CASE WHEN minute_id IS NOT NULL THEN 'minute'
            WHEN hour_id IS NOT NULL THEN 'hour'
            ELSE 'day' END AS grain,
       day_id,
       coalesce(hour_id, -1) AS hour_id,
       coalesce(minute_id, -1) AS minute_id,
       CAST(count(*) AS BIGINT) AS n_events,
       {sql_rn('sum(value)', 2)} AS sum_value
FROM e
GROUP BY GROUPING SETS ((day_id), (day_id, hour_id),
                        (day_id, hour_id, minute_id))
"""


@register("time_rollup", TIME_ROLLUP_ORACLE, tags=("events",))
def time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity time rollup (minute / hour / day) in ONE pass —
    the continuous-aggregate / hypertable-rollup analog.

    Grouping sets plan a single Expand(×3) + one hash-aggregate exchange,
    so all three grains cost one scan and one shuffle — versus the naive
    three-query build that scans the fact three times.  Grain ids are
    integer divisions of epoch-microseconds (hierarchically nested, exact
    in both engines); the set-marker NULLs are disambiguated to -1 (never
    a valid grain for post-1970 data) after the grain label is derived
    from them.  At 100 TB this is the shape to materialize into a
    clustered sink (write_parquet_clustered on (grain, day_id)) for
    dashboard-latency reads.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.expr(f"ts_us div {US_DAY}").alias("day_id"),
        F.expr(f"ts_us div {US_HOUR}").alias("hour_id"),
        F.expr(f"ts_us div {US_MIN}").alias("minute_id"),
        "value",
    )
    return (
        e.groupingSets(
            [["day_id"], ["day_id", "hour_id"],
             ["day_id", "hour_id", "minute_id"]],
            "day_id",
            "hour_id",
            "minute_id",
        )
        .agg(
            F.count("*").alias("n_events"),
            rn(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.when(F.col("minute_id").isNotNull(), F.lit("minute"))
            .when(F.col("hour_id").isNotNull(), F.lit("hour"))
            .otherwise(F.lit("day"))
            .alias("grain"),
            "day_id",
            F.coalesce("hour_id", F.lit(-1)).alias("hour_id"),
            F.coalesce("minute_id", F.lit(-1)).alias("minute_id"),
            "n_events",
            "sum_value",
        )
    )


PEAK_CONCURRENCY_ORACLE = f"""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
lagged AS (
  SELECT user_id, ts_us,
         lag(ts_us) OVER (PARTITION BY user_id
                          ORDER BY ts_us, event_id) AS prev_us
  FROM e
),
marked AS (
  SELECT user_id, ts_us,
         CASE WHEN prev_us IS NULL
                   OR ts_us - prev_us > {_SESSION_GAP_US} THEN 1
              ELSE 0 END AS new_session
  FROM lagged
),
numbered AS (
  SELECT user_id, ts_us,
         sum(new_session) OVER (PARTITION BY user_id
                                ORDER BY ts_us
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
),
sessions AS (
  SELECT user_id, session_id,
         min(ts_us) // {US_MIN} AS start_min,
         max(ts_us) // {US_MIN} AS end_min
  FROM numbered GROUP BY user_id, session_id
),
deltas AS (
  SELECT start_min AS minute, 1 AS d FROM sessions
  UNION ALL
  SELECT end_min + 1 AS minute, -1 AS d FROM sessions
),
per_minute AS (
  SELECT minute, sum(d) AS net FROM deltas GROUP BY minute
),
running AS (
  SELECT minute,
         sum(net) OVER (ORDER BY minute ROWS UNBOUNDED PRECEDING) AS conc
  FROM per_minute
)
SELECT minute // {60 * 24} AS day_id,
       CAST(max(conc) AS BIGINT) AS peak_concurrency
FROM running
GROUP BY minute // {60 * 24}
"""


@register("peak_concurrency", PEAK_CONCURRENCY_ORACLE, tags=("events",))
def peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily peak concurrent sessions — the sweep-line interval-overlap
    aggregate (how many sessions are open at once, maxed per day).

    Sessions come from the same lag/cumsum sessionizer as
    events_sessionize (one user_id shuffle); each session then emits just
    TWO boundary deltas (+1 at its start minute, −1 after its end), the
    deltas pre-aggregate per minute, and the global running sum — the only
    ordered window — runs over the O(distinct minutes) relation, never the
    events (same pre-aggregate-then-window shape as cumulative_users).
    All keys are integer minute/day divisions of epoch-µs, engine-exact.
    """
    ev = load_table(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    new_session = F.when(
        F.col("prev_us").isNull()
        | (F.col("ts_us") - F.col("prev_us") > _SESSION_GAP_US),
        1,
    ).otherwise(0)
    sessions = (
        ev.select("user_id", "event_id", "ts_us")
        .withColumn("prev_us", F.lag("ts_us").over(by_user))
        .withColumn("new_session", new_session)
        .withColumn(
            "session_id",
            F.sum("new_session")
            .over(by_user.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.expr(f"min(ts_us) div {US_MIN}").alias("start_min"),
            F.expr(f"max(ts_us) div {US_MIN}").alias("end_min"),
        )
    )
    deltas = sessions.select(
        F.col("start_min").alias("minute"), F.lit(1).alias("d")
    ).unionAll(
        sessions.select(
            (F.col("end_min") + 1).alias("minute"), F.lit(-1).alias("d")
        )
    )
    per_minute = deltas.groupBy("minute").agg(F.sum("d").alias("net"))
    running = per_minute.withColumn(
        "conc",
        F.sum("net").over(
            Window.orderBy("minute").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return running.groupBy(
        F.expr(f"minute div {60 * 24}").alias("day_id")
    ).agg(F.max("conc").cast("long").alias("peak_concurrency"))


#: rolling-window width (days) for the active-user metric.
RAU_WINDOW_DAYS = 7

ROLLING_ACTIVE_USERS_ORACLE = f"""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
mx AS (SELECT max(day) AS max_day FROM ud),
contrib AS (
  SELECT user_id, day + CAST(i AS INTEGER) AS report_day
  FROM ud, unnest(range({RAU_WINDOW_DAYS})) AS t(i)
)
SELECT CAST(report_day - DATE '1970-01-01' AS BIGINT) AS day_ep,
       CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
FROM contrib CROSS JOIN mx
WHERE report_day <= max_day
GROUP BY report_day
"""


@register("rolling_active_users", ROLLING_ACTIVE_USERS_ORACLE, tags=("events",))
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling distinct active users per day (the WAU curve).

    Distinct-over-a-sliding-window cannot ride an ordinary window frame
    (COUNT(DISTINCT) is not frame-computable), and re-scanning the fact
    table once per day is the O(days × corpus) trap.  The scale shape:
    the raw stream first collapses to the DISTINCT (user, day) relation
    — partial-aggregated map-side, so the only full-stream shuffle
    carries at most |users|×|days| rows — then each user-day contributes
    itself to the {RAU_WINDOW_DAYS} report days it covers (a constant
    ≤{RAU_WINDOW_DAYS}× explode of the compact relation, NOT of the
    stream), and the per-day distinct count aggregates that.  The
    trailing edge caps at the corpus's max day via a 1-row broadcast
    scalar, never a driver round-trip.  Days are epoch-day bigints
    (timestamps never appear raw).
    """
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    mx = ud.agg(F.max("day").alias("max_day"))
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.date_add(F.col("day"), RAU_WINDOW_DAYS - 1),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("report_day"),
    )
    return (
        contrib.crossJoin(F.broadcast(mx))
        .filter(F.col("report_day") <= F.col("max_day"))
        .groupBy(
            F.datediff("report_day", F.lit("1970-01-01"))
            .cast("long")
            .alias("day_ep")
        )
        .agg(F.countDistinct("user_id").cast("long").alias("active_users"))
    )


#: MAD multiplier for the outlier cut (the conventional ~3-sigma analog).
MAD_K = 3

ANOMALY_MAD_ORACLE = """
WITH med AS (
  SELECT event_type,
         max(CASE WHEN rk = (n + 1) // 2 THEN value END) AS med
  FROM (SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rk,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events) r
  GROUP BY event_type
),
dev AS (
  SELECT e.event_id, e.event_type, e.value, med,
         abs(e.value - med) AS ad
  FROM events e JOIN med USING (event_type)
),
mad AS (
  SELECT event_type,
         max(CASE WHEN rk = (n + 1) // 2 THEN ad END) AS mad
  FROM (SELECT event_type, ad,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ad, event_id) AS rk,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM dev) r
  GROUP BY event_type
)
SELECT d.event_id, d.event_type,
       (FLOOR(d.value * 10000.0 + 0.5) / 10000.0) AS value,
       (FLOOR(d.ad * 10000.0 + 0.5) / 10000.0) AS abs_dev,
       (FLOOR(m.mad * 10000.0 + 0.5) / 10000.0) AS mad
FROM dev d JOIN mad m USING (event_type)
WHERE m.mad > 0 AND d.ad > 3 * m.mad
"""


@register("anomaly_mad", ANOMALY_MAD_ORACLE, tags=("events",))
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: events whose |value − median| exceeds
    MAD_K × the median absolute deviation of their event_type.

    Mean/stddev outlier cuts move with the outliers they hunt; the
    median/MAD pair is the standard robust alternative.  Both medians
    use the exact rank-selection ``rk = (n + 1) DIV 2`` — the true lower
    median (odd n selects THE median: n=3 → rank 2; even n selects the
    lower of the central pair) under the truncating integer division
    both engines share (Spark ``DIV``, DuckDB ``//``).  Selection picks
    a REAL data value, so every comparison downstream is between doubles
    both engines hold bit-identically — no float aggregation anywhere.
    (ADVICE r3: the previous ``-((-50*n) DIV 100)`` idiom selected rank
    floor(n/2) — one BELOW the median for odd n, the minimum at n=3 —
    biasing MAD low and over-flagging small groups.)

    Scale shape: three shuffles, ALL on event_type (median, re-join +
    MAD median, final join-filter) over O(groups) / O(rows) relations —
    the fact table never shuffles on anything wider.  The cut threshold
    compares raw doubles; the 4-dp floor-round applies only to the
    REPORTED columns, so rounding can't move a row across the boundary
    differently per engine.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    w = Window.partitionBy("event_type")

    def exact_median(df, col, out):
        ranked = df.select(
            "event_type",
            F.col(col),
            F.row_number().over(w.orderBy(col, "event_id")).alias("rk"),
            F.count("*").over(w).alias("n"),
        )
        return ranked.groupBy("event_type").agg(
            F.expr(f"max(CASE WHEN rk = (n + 1) DIV 2 THEN {col} END)")
            .alias(out)
        )

    med = exact_median(ev, "value", "med")
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("value") - F.col("med"))
    )
    mad = exact_median(dev.select("event_type", "event_id", "ad"), "ad", "mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad") > 0) & (F.col("ad") > MAD_K * F.col("mad")))
        .select(
            "event_id",
            "event_type",
            rn(F.col("value"), 4).alias("value"),
            rn(F.col("ad"), 4).alias("abs_dev"),
            rn(F.col("mad"), 4).alias("mad"),
        )
    )


#: reporting zone for the local-day rollup.
REPORT_TZ = "America/New_York"

TZ_ROLLUP_ORACLE = f"""
SELECT CAST(CAST(timezone('{REPORT_TZ}', ts::TIMESTAMPTZ) AS DATE)
            - DATE '1970-01-01' AS BIGINT) AS day_ep,
       CAST(count(*) AS BIGINT) AS n_events,
       {sql_rn('sum(value)', 2)} AS sum_value
FROM events
GROUP BY 1
"""


@register("tz_rollup", TZ_ROLLUP_ORACLE, tags=("events",))
def tz_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rollup on LOCAL calendar days of a reporting timezone.

    Day boundaries are a business rule, not a storage property: events
    are stored as UTC instants, and "Tuesday's revenue" in New York cuts
    those instants at 04:00/05:00 UTC depending on DST.  The conversion
    (`from_utc_timestamp` / DuckDB ``timezone(zone, TIMESTAMPTZ)``) is a
    per-row projection evaluated in the scan stage from the shared IANA
    tzdata, so the plan is still one map-side-combined aggregate with an
    O(days) exchange — timezone correctness costs nothing at 100 TB.
    Both engines run with a UTC session, pinning the instant semantics;
    the local day leaves the query as an epoch-day bigint (timestamps
    never appear raw).
    """
    ev = load_table(spark, sf_dir, "events")
    local_day = F.to_date(F.from_utc_timestamp("ts", REPORT_TZ))
    return (
        ev.groupBy(
            F.datediff(local_day, F.lit("1970-01-01")).cast("long").alias("day_ep")
        )
        .agg(
            F.count("*").alias("n_events"),
            rn(F.sum("value"), 2).alias("sum_value"),
        )
    )


WOW_GROWTH_ORACLE = f"""
WITH daily AS (
  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_ep,
         sum(CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT)) AS units
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
l AS (
  SELECT c.day_ep, c.units, p.units AS units_prev
  FROM daily c JOIN daily p ON p.day_ep = c.day_ep - 7
)
SELECT day_ep,
       {sql_rn('units / 10000.0', 2)} AS revenue,
       {sql_rn('units_prev / 10000.0', 2)} AS revenue_prev_week,
       {sql_rn('(units - units_prev) * 100.0 / units_prev', 4)} AS wow_pct
FROM l
WHERE units_prev <> 0
"""


@register("wow_growth", WOW_GROWTH_ORACLE, tags=("events",))
def wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue growth per day — the reporting staple.

    The fact stream collapses to the O(days) daily rollup FIRST (one
    map-side-combined shuffle, integer 10^-4 units so the comparison
    base is order-exact); the baseline is then a SELF-JOIN of the rollup
    on ``day_ep - 7`` — pinned to the CALENDAR, not row position.  A
    ``lag(units, 7)`` window would be a 7-ROW lag: any day absent from
    the rollup (zero purchases) silently shifts the "previous week" to
    the wrong date, and because an oracle written the same way drifts
    identically, the hash gate can never catch it (ADVICE r3).  The
    self-join is over the O(days) relation, so the equi-join is
    broadcast-sized at any corpus scale.  Growth is computed from the
    exact integer units on both engines; zero/absent baselines drop out
    of the inner join, not NaN-coded.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
            .cast("long")
            .alias("day_ep")
        )
        .agg(
            F.sum(
                F.floor(F.col("value") * 10000.0 + F.lit(0.5)).cast("long")
            ).alias("units")
        )
    )
    prev = daily.select(
        (F.col("day_ep") + 7).alias("day_ep"),
        F.col("units").alias("units_prev"),
    )
    l = daily.join(F.broadcast(prev), "day_ep")
    return l.filter(F.col("units_prev") != 0).select(
        "day_ep",
        rn(F.col("units") / 10000.0, 2).alias("revenue"),
        rn(F.col("units_prev") / 10000.0, 2).alias("revenue_prev_week"),
        rn(
            (F.col("units") - F.col("units_prev"))
            * 100.0
            / F.col("units_prev"),
            4,
        ).alias("wow_pct"),
    )
