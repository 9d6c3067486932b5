"""Semantic tests for the temporal joins and the prefix-filter dedup.

The oracle diff (tools/check_oracle.py) already pins value equality against
DuckDB; these tests pin the *algebraic* properties the bucketed/windowed
formulations must preserve — against brute-force theta-join formulations
that are only affordable at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from simpletons_map_reduce_spark.queries.dedup_ops import (
    NJ_THRESHOLD_DEN,
    NJ_THRESHOLD_NUM,
    ngram_jaccard,
)
from simpletons_map_reduce_spark.queries.temporal import (
    BAND_US,
    asof_join,
    range_join,
)
from simpletons_map_reduce_spark.sources.tables import load_table
from tests.conftest import SF0001


def test_asof_join_covers_every_click_and_is_causal(spark):
    ev = load_table(spark, SF0001, "events")
    out = asof_join(spark, SF0001)
    n_clicks = ev.filter(F.col("event_type") == "click").count()
    rows = out.collect()
    assert len(rows) == n_clicks  # left join: one row per click, always
    matched = [r for r in rows if r.purchase_id is not None]
    assert matched, "no prior purchases matched at sf0.001"
    assert all(r.lag_us >= 0 for r in matched)  # purchase at-or-before click
    assert all(r.lag_us is None for r in rows if r.purchase_id is None)


def test_asof_join_matches_bruteforce(spark):
    """The union+window formulation ≡ join-then-argmax, per (click, user)."""
    ev = load_table(spark, SF0001, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts_us").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_id"), F.col("ts_us").alias("p_ts")
    )
    brute = (
        clicks.join(purchases, "user_id", "left")
        .filter(F.col("p_ts").isNull() | (F.col("p_ts") <= F.col("c_ts")))
        .groupBy("click_id")
        .agg(F.max_by("p_id", F.struct("p_ts", "p_id")).alias("purchase_id"))
    )
    got = {
        r.click_id: r.purchase_id
        for r in asof_join(spark, SF0001).collect()
    }
    want = {r.click_id: r.purchase_id for r in brute.collect()}
    # clicks with no purchase row at all are absent from `brute` after the
    # left-join filter only when the user has zero purchases → align on keys
    for click_id, p in want.items():
        assert got[click_id] == p


def test_range_join_matches_bruteforce_theta_join(spark):
    """Bucketed band join ≡ plain inequality join (lossless, no dupes)."""
    ev = load_table(spark, SF0001, "events").select("user_id", "event_id", "ts_us")
    a = ev.select("user_id", F.col("event_id").alias("a_id"), F.col("ts_us").alias("a_ts"))
    b = ev.select("user_id", F.col("event_id").alias("b_id"), F.col("ts_us").alias("b_ts"))
    brute = a.join(b, "user_id").filter(
        (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") - F.col("a_ts") <= BAND_US)
        & ((F.col("b_ts") > F.col("a_ts")) | (F.col("b_id") > F.col("a_id")))
    )
    got = sorted(
        (r.a_id, r.b_id, r.gap_us) for r in range_join(spark, SF0001).collect()
    )
    want = sorted(
        (r.a_id, r.b_id, r.b_ts - r.a_ts) for r in brute.collect()
    )
    assert got == want
    assert len(got) == len(set(got)), "bucket probing emitted duplicate pairs"


def test_ngram_jaccard_prefix_filter_is_lossless(spark):
    """Prefix filtering must find EVERY pair above threshold (the guarantee
    LSH lacks) — compare against the all-pairs verification at sf0.001."""
    from simpletons_map_reduce_spark.queries.dedup_ops import _ngram_sets

    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")
    # brute force pairs EVERY doc over the same gram sets the operator
    # uses — only the candidate-generation strategy (prefix join vs
    # all-pairs) differs, which is exactly the property under test.
    ng = _ngram_sets(docs).select("doc_id", F.col("ngh").alias("s"))
    na = ng.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    nb = ng.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    brute = (
        na.join(nb, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sa", "sb")).alias("i"),
            F.size(F.array_union("sa", "sb")).alias("u"),
        )
        .filter(F.col("i") * NJ_THRESHOLD_DEN >= F.col("u") * NJ_THRESHOLD_NUM)
    )
    got = sorted((r.doc_a, r.doc_b) for r in ngram_jaccard(spark, SF0001).collect())
    want = sorted((r.doc_a, r.doc_b) for r in brute.collect())
    assert got == want


def test_gap_fill_semantics_on_planted_gaps(spark):
    """Dense spine, forward-carried values, observed flags."""
    from simpletons_map_reduce_spark.queries import REGISTRY

    rows = sorted(
        REGISTRY["gap_fill"].fn(spark, SF0001).collect(),
        key=lambda r: (r.user_id, r.day_ep),
    )
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user, "no users"
    saw_gap = False
    for series in by_user.values():
        days = [r.day_ep for r in series]
        # dense: every day between first and last present exactly once
        assert days == list(range(days[0], days[-1] + 1))
        # first day is always an observation (spine starts at first purchase)
        assert series[0].is_observed == 1
        last_obs = None
        for r in series:
            if r.is_observed:
                last_obs = r.revenue_filled
            else:
                saw_gap = True
                assert r.revenue_filled == last_obs  # carried forward
            assert r.revenue_filled is not None
    assert saw_gap, "fixture has no gaps — test is vacuous"


def test_weighted_median_hand_checked(spark):
    """w-median on a frame small enough to verify by hand."""
    from simpletons_map_reduce_spark.queries import REGISTRY
    from simpletons_map_reduce_spark.sources import tables as T

    df = spark.createDataFrame(
        [  # flag, discount, quantity
            ("A", 0.00, 1.0), ("A", 0.10, 98.0), ("A", 0.20, 1.0),
            ("B", 0.05, 50.0), ("B", 0.07, 50.0),
        ],
        "l_returnflag string, l_discount double, l_quantity double",
    )
    orig = T.load_table
    try:
        T.load_table = lambda spark, sf_dir, name: df
        import simpletons_map_reduce_spark.queries.profiling_ops as P

        orig_p = P.load_table
        P.load_table = T.load_table
        try:
            got = {
                r.l_returnflag: (r.weighted_median_discount, r.total_weight)
                for r in REGISTRY["weighted_median"].fn(spark, SF0001).collect()
            }
        finally:
            P.load_table = orig_p
    finally:
        T.load_table = orig
    assert got["A"] == (0.10, 100.0)   # 98% of mass sits at 0.10
    assert got["B"] == (0.05, 100.0)   # cw(0.05)=50 >= tw/2 → lower value


def test_rolling_active_users_brute_force(spark):
    """WAU(d) == distinct users with >=1 event in [d-6, d], by brute force."""
    from simpletons_map_reduce_spark.queries import REGISTRY
    from simpletons_map_reduce_spark.queries.events import RAU_WINDOW_DAYS
    from simpletons_map_reduce_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    got = {
        r.day_ep: r.active_users
        for r in REGISTRY["rolling_active_users"].fn(spark, SF0001).collect()
    }
    ud = (
        load_table(spark, SF0001, "events")
        .select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("d"),
        )
        .distinct()
        .collect()
    )
    days = {r.d for r in ud}
    for d in range(min(days), max(days) + 1):
        want = len(
            {r.user_id for r in ud if d - RAU_WINDOW_DAYS + 1 <= r.d <= d}
        )
        assert got.get(d, 0) == want, (d, got.get(d), want)
    # no report days beyond the observed range
    assert max(got) == max(days)


def test_tz_rollup_applies_dst_rules(spark, duck):
    """A UTC instant after the 1997 spring-forward must land on the EDT
    local day (UTC-4), not the EST one (UTC-5) — both engines agree via
    shared IANA tzdata."""
    import datetime

    # 1997-04-07 04:30 UTC = 00:30 EDT Apr 7 (EST would say 23:30 Apr 6)
    got = spark.sql(
        "SELECT CAST(from_utc_timestamp(TIMESTAMP '1997-04-07 04:30:00', "
        "'America/New_York') AS DATE) AS d"
    ).collect()[0].d
    assert got == datetime.date(1997, 4, 7)
    want = duck.sql(
        "SELECT CAST(timezone('America/New_York', "
        "(TIMESTAMP '1997-04-07 04:30:00')::TIMESTAMPTZ) AS DATE)"
    ).fetchone()[0]
    assert want == got
    # and before the switch the -5 h offset holds (23:30 EST Jan 6)
    got2 = spark.sql(
        "SELECT CAST(from_utc_timestamp(TIMESTAMP '1997-01-07 04:30:00', "
        "'America/New_York') AS DATE) AS d"
    ).collect()[0].d
    assert got2 == datetime.date(1997, 1, 6)
