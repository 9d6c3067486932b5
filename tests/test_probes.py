"""Task-accounting and parallelism probes (tier B8/B9).

Reference analogs:
- mrapps/jobcount.go:20-46 + main/test-mr.sh:211-235 — on a failure-free
  run, the number of map executions equals the number of inputs exactly
  (no spurious re-execution, no lost work).
- mrapps/mtiming.go:19-79 + main/test-mr.sh:151-208 — at least two map
  tasks (and two reduce groups) actually run concurrently; the framework
  must deliver parallelism, not just correctness.

The accounting probe counts user-function invocations with an accumulator
through the real ``run_job`` path (accumulator updates in a failure-free
run are applied exactly once per task).  The timing probes record each
task's wall-clock interval and assert overlap, exactly as mtiming does.
"""

from __future__ import annotations

import time

import pandas as pd

from simpletons_map_reduce_spark.mapreduce import run_job

N_FILES = 8


def _inputs(spark):
    rows = [(f"file-{i}", f"contents of file {i}") for i in range(N_FILES)]
    return spark.createDataFrame(rows, "filename string, contents string")


def test_jobcount_exact_task_accounting(spark):
    """8 inputs ⇒ exactly 8 map invocations and 8 reduce groups, no more
    (no duplicate execution), no fewer (no lost inputs)."""
    map_acc = spark.sparkContext.accumulator(0)
    reduce_acc = spark.sparkContext.accumulator(0)

    def probe_map(filename: str, contents: str):
        map_acc.add(1)
        return [(filename, "1")]

    def probe_reduce(key: str, values: list[str]) -> str:
        reduce_acc.add(1)
        return str(len(values))

    result = run_job(spark, probe_map, probe_reduce, _inputs(spark), 4).collect()
    assert map_acc.value == N_FILES
    assert reduce_acc.value == N_FILES  # one distinct key per input file
    assert len(result) == N_FILES


def _max_overlap(intervals: list[tuple[float, float]]) -> int:
    """Max number of intervals alive at once (sweep line)."""
    events = [(t0, 1) for t0, _ in intervals] + [(t1, -1) for _, t1 in intervals]
    live = best = 0
    for _, delta in sorted(events):
        live += delta
        best = max(best, live)
    return best


def test_mtiming_map_tasks_run_concurrently(spark):
    """≥2 map tasks overlap in wall-clock time (mtiming.go's check)."""

    def timed(batches):
        t0 = time.time()
        n = sum(len(b) for b in batches)
        time.sleep(1.0)
        yield pd.DataFrame({"n": [n], "t0": [t0], "t1": [time.time()]})

    rows = (
        spark.range(4)
        .repartition(4)
        .mapInPandas(timed, "n long, t0 double, t1 double")
        .collect()
    )
    assert len(rows) == 4
    assert _max_overlap([(r.t0, r.t1) for r in rows]) >= 2


def test_rtiming_reduce_groups_run_concurrently(spark):
    """≥2 reduce groups overlap in wall-clock time (the rtiming analog —
    grouped applyInPandas is the reduce stage of the fidelity layer)."""

    def slow_group(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        time.sleep(1.0)
        return pd.DataFrame(
            {"key": [int(pdf["key"].iloc[0])], "t0": [t0], "t1": [time.time()]}
        )

    # a tiny shuffle would be AQE-coalesced into ONE partition (sequential by
    # construction); turn coalescing off so the groups spread over tasks —
    # the very parallelism this probe exists to observe.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        df = spark.createDataFrame([(i, 1) for i in range(16)], "key int, v int")
        rows = (
            df.groupBy("key")
            .applyInPandas(slow_group, "key int, t0 double, t1 double")
            .collect()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    assert len(rows) == 16
    assert _max_overlap([(r.t0, r.t1) for r in rows]) >= 2
