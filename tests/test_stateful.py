"""Stateful streaming: running per-user totals must converge to the batch
groupBy answer once the bounded stream is fully consumed."""

from __future__ import annotations

from pyspark.sql import functions as F

from simpletons_map_reduce_spark.sources.tables import load_table
from simpletons_map_reduce_spark.streaming import run_to_memory, running_user_totals
from tests.conftest import SF0001


def test_running_totals_converge_to_batch(spark):
    out = run_to_memory(running_user_totals(spark, SF0001), "t_state", mode="update")
    # update mode may emit a row per micro-batch per user; the LAST row per
    # user is the converged state
    final = (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("sum_value").alias("sum_value"),
        )
        .collect()
    )
    got = {r.user_id: (r.n_events, round(r.sum_value, 6)) for r in final}
    ev = load_table(spark, SF0001, "events")
    batch = ev.groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("value").alias("s")
    )
    want = {r.user_id: (r.n, round(r.s, 6)) for r in batch.collect()}
    assert got.keys() == want.keys()
    for u in want:
        assert got[u][0] == want[u][0]
        assert abs(got[u][1] - want[u][1]) < 1e-6
