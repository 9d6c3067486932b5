"""Streaming ≡ batch on bounded input.

With every row on time (no late data in a replayed file), the streaming
tumbling aggregate must produce exactly the batch query's answer, and
session_window must agree with the batch lag/cumsum sessionization on
session boundaries."""

from __future__ import annotations

from simpletons_map_reduce_spark.queries.registry import REGISTRY
from simpletons_map_reduce_spark.streaming import (
    hopping_stream,
    run_to_memory,
    sessionize_stream,
    tumbling_stream,
)
from tests.conftest import SF0001


def test_tumbling_stream_matches_batch(spark):
    stream_rows = {
        (r.w_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in run_to_memory(tumbling_stream(spark, SF0001), "t_tumble").collect()
    }
    batch_rows = {
        (r.w_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in REGISTRY["events_tumbling"].fn(spark, SF0001).collect()
    }
    # batch sum_value is floor-rounded to 2dp; compare counts exactly and
    # sums loosely
    assert stream_rows.keys() == batch_rows.keys()
    for k in batch_rows:
        assert stream_rows[k][0] == batch_rows[k][0]
        assert abs(stream_rows[k][1] - batch_rows[k][1]) < 0.02


def test_hopping_stream_matches_batch(spark):
    stream_rows = {
        (r.w_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in run_to_memory(hopping_stream(spark, SF0001), "t_hop").collect()
    }
    batch_rows = {
        (r.w_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in REGISTRY["events_hopping"].fn(spark, SF0001).collect()
    }
    assert stream_rows.keys() == batch_rows.keys()
    for k in batch_rows:
        assert stream_rows[k][0] == batch_rows[k][0]
        # batch sum_value is floor-rounded to 2dp
        assert abs(stream_rows[k][1] - batch_rows[k][1]) < 0.02


def test_session_stream_matches_batch_sessionization(spark):
    stream = {
        (r.user_id, r.session_start): r.n_events
        for r in run_to_memory(sessionize_stream(spark, SF0001), "t_sess").collect()
    }
    batch = {
        (r.user_id, r.session_start): r.n_events
        for r in REGISTRY["events_sessionize"].fn(spark, SF0001).collect()
    }
    assert stream == batch


def test_dau_stream_equals_batch_distinct_count(spark):
    """Chained stateful ops (dedup → daily agg) ≡ batch distinct count."""
    from pyspark.sql import functions as F

    from simpletons_map_reduce_spark.sources.tables import load_table
    from simpletons_map_reduce_spark.streaming.events_stream import (
        dau_stream,
        run_to_memory,
    )

    out = run_to_memory(dau_stream(spark, SF0001), "t_dau")
    got = {(r.w_start, r.active_users) for r in out.collect()}

    ev = load_table(spark, SF0001, "events")
    want = {
        (r.w_start, r.n)
        for r in ev.select(
            "user_id", F.window("ts", "1 day").alias("w")
        )
        .distinct()
        .groupBy(F.unix_micros(F.col("w.start")).alias("w_start"))
        .agg(F.count("*").cast("long").alias("n"))
        .collect()
    }
    assert got == want and got


def test_stream_parity_report_all_green(spark):
    """The driver-facing parity gate (VERDICT r7 item 3): on a bounded
    in-window corpus every twin must agree exactly with its batch query —
    zero mismatches and the pinned cardinalities."""
    from pyspark.sql import functions as F

    from simpletons_map_reduce_spark.sources.tables import load_table

    row = REGISTRY["stream_parity_report"].fn(spark, SF0001).collect()[0]
    assert row.tumbling_mismatch == 0
    assert row.hopping_mismatch == 0
    assert row.dedup_mismatch == 0
    assert (
        row.n_tumbling_windows
        == REGISTRY["events_tumbling"].fn(spark, SF0001).count()
    )
    assert (
        row.n_hopping_windows
        == REGISTRY["events_hopping"].fn(spark, SF0001).count()
    )
    n_hashes = (
        load_table(spark, SF0001, "documents")
        .select(F.md5("text"))
        .distinct()
        .count()
    )
    assert row.n_dedup_emits == n_hashes > 0


def test_stream_parity_mismatch_detects_drift(spark):
    """Negative control: the comparison the report runs must actually go
    nonzero when a twin drifts — a dropped window, an extra window, and a
    wrong count are each detected."""
    from pyspark.sql import functions as F

    from simpletons_map_reduce_spark.queries.events import events_tumbling
    from simpletons_map_reduce_spark.queries.stream_parity import (
        _window_mismatch,
    )

    batch = events_tumbling(spark, SF0001)
    ok = batch.select("w_start", "event_type", "n_events")
    assert _window_mismatch(ok, batch).collect()[0].m == 0
    dropped = ok.limit(ok.count() - 1)
    assert _window_mismatch(dropped, batch).collect()[0].m == 1
    extra = ok.union(
        spark.createDataFrame(
            [(1, "zz_not_a_type", 1)],
            "w_start BIGINT, event_type STRING, n_events BIGINT",
        )
    )
    assert _window_mismatch(extra, batch).collect()[0].m == 1
    wrong = ok.withColumn(
        "n_events",
        F.when(F.col("n_events") == ok.agg(F.max("n_events")).collect()[0][0],
               F.col("n_events") + 1).otherwise(F.col("n_events")),
    )
    assert _window_mismatch(wrong, batch).collect()[0].m >= 1


def test_stream_parity_stateful_all_green(spark):
    """The stateful-family gate (funnel / running totals / streaming
    near-dup) reports zero mismatches on sf0.001, and its cardinalities
    equal the independently-computed batch values."""
    from simpletons_map_reduce_spark.queries.dedup_ops import near_dedup
    from simpletons_map_reduce_spark.sources.tables import load_table

    row = REGISTRY["stream_parity_stateful"].fn(spark, SF0001).collect()[0]
    assert row.funnel_mismatch == 0
    assert row.totals_mismatch == 0
    assert row.neardup_mismatch == 0
    n_users = (
        load_table(spark, SF0001, "events").select("user_id").distinct().count()
    )
    assert row.n_funnel_users == n_users > 0
    assert row.n_totals_users == n_users
    assert row.n_neardup_pairs == near_dedup(spark, SF0001).count() > 0


def test_stream_parity_stateful_detects_funnel_drift(spark):
    """Negative control: a funnel twin with a DIFFERENT conversion window
    must disagree with the batch anchors — proving the per-user
    comparison the gate runs can actually go red."""
    from pyspark.sql import functions as F

    from simpletons_map_reduce_spark.queries.behavior import (
        funnel_user_anchors,
    )
    from simpletons_map_reduce_spark.streaming import run_to_memory
    from simpletons_map_reduce_spark.streaming.events_stream import (
        events_stream,
    )
    from simpletons_map_reduce_spark.streaming.funnel_stream import (
        funnel_state_from,
    )

    ev = events_stream(spark, SF0001).withColumn(
        "ts_us", F.unix_micros(F.col("ts"))
    )
    # 1-second conversion window: almost every click/purchase anchor
    # that the 24 h batch rule sets must now stay null in the stream.
    spark.catalog.dropTempView("sps_drift_funnel")
    fw = run_to_memory(
        funnel_state_from(ev, window_us=1_000_000),
        "sps_drift_funnel",
        mode="update",
    )
    f_final = fw.groupBy("user_id").agg(
        F.max("mv").alias("s_mv"),
        F.max("mc").alias("s_mc"),
        F.max("mp").alias("s_mp"),
    )
    batch = funnel_user_anchors(spark, SF0001)
    mismatches = (
        f_final.join(batch, "user_id", "full_outer")
        .filter(
            ~(
                F.col("s_mv").eqNullSafe(F.col("mv"))
                & F.col("s_mc").eqNullSafe(F.col("mc"))
                & F.col("s_mp").eqNullSafe(F.col("mp"))
            )
        )
        .count()
    )
    assert mismatches > 0


def test_stream_parity_chained_all_green(spark):
    """The chained/join/sketch gate (dau / attribution / CMS) reports
    zero mismatches on sf0.001, with cardinalities equal to the
    independently-computed batch values."""
    from pyspark.sql import functions as F

    from simpletons_map_reduce_spark.queries.temporal import (
        click_attribution,
    )
    from simpletons_map_reduce_spark.sources.tables import load_table

    row = REGISTRY["stream_parity_chained"].fn(spark, SF0001).collect()[0]
    assert row.dau_mismatch == 0
    assert row.attr_mismatch == 0
    assert row.cms_mismatch == 0
    n_days = (
        load_table(spark, SF0001, "events")
        .select(F.window("ts", "1 day"))
        .distinct()
        .count()
    )
    assert row.n_dau_days == n_days > 0
    assert row.n_attr_pairs == click_attribution(spark, SF0001).count() > 0
    assert row.n_cms_cells > 0


def test_stream_parity_extended_all_green(spark):
    """The session/enrichment/media gate reports zero mismatches on
    sf0.001, with cardinalities equal to the batch values."""
    from simpletons_map_reduce_spark.sources.tables import load_table

    row = REGISTRY["stream_parity_extended"].fn(spark, SF0001).collect()[0]
    assert row.session_mismatch == 0
    assert row.enrich_mismatch == 0
    assert row.media_mismatch == 0
    assert (
        row.n_sessions
        == REGISTRY["events_sessionize"].fn(spark, SF0001).count()
        > 0
    )
    assert row.n_enriched == load_table(spark, SF0001, "events").count()
    assert row.n_media == load_table(spark, SF0001, "documents").count()
