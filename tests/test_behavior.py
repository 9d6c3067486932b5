"""Edge-case tests for user_trend (per-user least-squares trend).

The oracle diff pins sf0.01 parity; these tests pin the docstring's
cancellation argument on engineered inputs where the normal-equations
denominator is exactly zero or the fit is exactly known:

- single-event user          → denom 0 → NULL slope/intercept, n_events=1
- all events in one minute   → x variance 0 → NULL slope/intercept
- constant value over time   → slope exactly 0, intercept exactly the value
- exact linear value         → slope/intercept recovered exactly (the x
  rescale keeps n·Σx² − (Σx)² integer-exact, so y = 2x + 3 has no rounding)
- random user                → matches numpy lstsq to the 4-dp round
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from simpletons_map_reduce_spark.queries.behavior import US_PER_MINUTE, user_trend

BASE_US = 1_700_000_000_000_000  # arbitrary epoch anchor, µs


def _mk_events(spark, tmp_path, rows):
    """Write rows of (user_id, ts_us, value) as an events.parquet the
    loader accepts (timestamp[us] `ts` column, like current driver data)."""
    df = spark.createDataFrame(rows, "user_id bigint, ts_us bigint, value double")
    df = df.select(
        "user_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "value",
        F.lit("view").alias("event_type"),
        F.monotonically_increasing_id().alias("event_id"),
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_user_trend_edge_cases(spark, tmp_path):
    rng = np.random.default_rng(7)
    rand_x = np.arange(20)
    rand_y = rng.normal(size=20).round(3)
    rows = []
    # user 1: single event
    rows.append((1, BASE_US, 5.0))
    # user 2: three events inside ONE minute bucket (x all 0 → denom 0)
    for off in (0, 10_000_000, 50_000_000):  # 0s, 10s, 50s
        rows.append((2, BASE_US + off, float(off)))
    # user 3: constant value at distinct minutes
    for m in range(5):
        rows.append((3, BASE_US + m * US_PER_MINUTE, 7.5))
    # user 4: exact linear value = 2*minute + 3
    for m in (0, 1, 4, 9):
        rows.append((4, BASE_US + m * US_PER_MINUTE, 2.0 * m + 3.0))
    # user 5: random values, whole minutes
    for xm, y in zip(rand_x, rand_y):
        rows.append((5, BASE_US + int(xm) * US_PER_MINUTE, float(y)))

    sf_dir = _mk_events(spark, tmp_path, rows)
    got = {r.user_id: r for r in user_trend(spark, sf_dir).collect()}
    assert set(got) == {1, 2, 3, 4, 5}

    assert got[1].n_events == 1
    assert got[1].slope is None and got[1].intercept is None

    assert got[2].n_events == 3
    assert got[2].slope is None and got[2].intercept is None

    assert got[3].slope == 0.0
    assert got[3].intercept == 7.5

    assert got[4].slope == 2.0
    assert got[4].intercept == 3.0

    coef = np.polyfit(rand_x.astype(float), rand_y, 1)
    assert got[5].slope == np.floor(coef[0] * 10**4 + 0.5) / 10**4 or abs(
        got[5].slope - coef[0]
    ) <= 10**-4
    assert abs(got[5].intercept - coef[1]) <= 10**-4


def test_user_trend_minute_rescale_is_floor_division(spark, tmp_path):
    """Events 59 s apart share an x bucket; 61 s apart do not — the rescale
    is floor division on µs since the user's FIRST event, not calendar
    minutes."""
    rows = [
        (1, BASE_US + 30_000_000, 1.0),           # first event, x=0
        (1, BASE_US + 30_000_000 + 59_000_000, 2.0),  # +59 s → still x=0
        (1, BASE_US + 30_000_000 + 61_000_000, 3.0),  # +61 s → x=1
    ]
    sf_dir = _mk_events(spark, tmp_path, rows)
    r = user_trend(spark, sf_dir).collect()[0]
    # x = [0, 0, 1], y = [1, 2, 3] → lstsq: slope 1.5, intercept 1.5
    assert r.n_events == 3
    assert r.slope == 1.5
    assert r.intercept == 1.5
