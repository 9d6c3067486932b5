"""Chaos test — the reference's crash-test contract on Spark.

The reference injects 33% crashes / 33% stalls into map+reduce UDFs
(mrapps/crash.go:20-32) and asserts output equals the failure-free golden
run (main/test-mr.sh:298-346).  On Spark, task retry is the coordinator's
10-second requeue (mr/coordinator.go:202-266) done right: a task that dies
is re-executed from lineage, and committed output is exactly-once.

Local mode needs ``local[N, maxFailures]`` to retry at all, and a master
can't change inside a running JVM — so this test runs in a subprocess with
its own session, flips a failure file so each flaky task attempt crashes
exactly once, and diffs the chaotic run against the clean one.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SCRIPT = textwrap.dedent(
    """
    import os, sys, tempfile
    sys.path.insert(0, sys.argv[1])
    from pyspark.sql import SparkSession
    from simpletons_map_reduce_spark.mapreduce import run_job, wc_map, wc_reduce, sorted_output

    fail_dir = tempfile.mkdtemp(prefix="chaos-")

    spark = (SparkSession.builder.master("local[4, 4]")
             .appName("chaos")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "4")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .filter("doc_id < 40").selectExpr("CAST(doc_id AS STRING)", "text"))

    def flaky_map(filename, contents):
        # crash exactly once per task partition: the first attempt dies, the
        # retry succeeds — a deterministic version of mrapps/crash.go:20-32's
        # maybeCrash (33% os.Exit) that can't exhaust maxFailures.
        from pyspark import TaskContext
        marker = os.path.join(fail_dir, f"p{TaskContext.get().partitionId()}")
        if not os.path.exists(marker):
            open(marker, "w").close()
            os._exit(1)   # hard-kill the python worker mid-task
        return wc_map(filename, contents)

    golden = sorted_output(run_job(spark, wc_map, wc_reduce, docs, 4))
    chaotic = sorted_output(run_job(spark, flaky_map, wc_reduce, docs, 4))
    assert chaotic == golden, "retry changed results"
    print("CHAOS_OK", len(chaotic))
    spark.stop()
    """
)


def test_task_retry_preserves_output():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT, str(REPO)],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert "CHAOS_OK" in proc.stdout, f"stdout={proc.stdout[-2000:]}\nstderr={proc.stderr[-3000:]}"
