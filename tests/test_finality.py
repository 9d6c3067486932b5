"""Output finality: no partial sink output is visible before the job commits.

Reference analog: mrapps/early_exit.go:28-36 + main/test-mr.sh:240-295 — the
harness asserts the output set does not change between "one worker finished"
and "all workers finished", i.e. results only become visible atomically at
job completion.  Spark's equivalent guarantee is the OutputCommitter
protocol: tasks write under ``_temporary/`` and are moved into place only at
job commit.  We pin it by killing a slow write mid-flight (whole process
group, so the JVM dies too) and asserting nothing committed — then letting
the same write finish and asserting the committed shape (_SUCCESS + parts).
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

_SLOW_WRITER = """
import sys, time
import pandas as pd
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

def slow(batches):
    for b in batches:
        time.sleep(60)
        yield pd.DataFrame({"v": [str(len(b))]})

df = spark.range(4).repartition(4).mapInPandas(slow, "v string")
df.write.mode("overwrite").text(sys.argv[1])
"""


def _committed_files(target: Path) -> list[str]:
    if not target.exists():
        return []
    return [
        p.name
        for p in target.iterdir()
        if not p.name.startswith(("_temporary", "."))
    ]


def test_no_partial_output_before_commit(tmp_path):
    target = tmp_path / "out"
    script = tmp_path / "slow_writer.py"
    script.write_text(_SLOW_WRITER)
    proc = subprocess.Popen(
        [sys.executable, str(script), str(target)],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        start_new_session=True,  # own process group → we can kill the JVM too
    )
    try:
        # wait until the write has started (the committer creates the target
        # dir + _temporary staging immediately, long before any task commits)
        deadline = time.time() + 120
        while time.time() < deadline and not target.exists():
            time.sleep(0.5)
        assert target.exists(), "write job never started"
        time.sleep(3)  # tasks are now mid-flight inside the 60 s sleep
        assert proc.poll() is None, "slow writer finished unexpectedly fast"
    finally:
        os.killpg(proc.pid, signal.SIGKILL)
        proc.wait()
    # the job died mid-write: nothing may be visible outside _temporary
    assert _committed_files(target) == [], (
        "partial output escaped the commit protocol: "
        f"{_committed_files(target)}"
    )


def test_committed_output_shape(spark, tmp_path):
    """Positive control: a completed write commits _SUCCESS + part files."""
    target = tmp_path / "out"
    spark.range(4).repartition(2).selectExpr("cast(id as string) as v").write.mode(
        "overwrite"
    ).text(str(target))
    names = sorted(p.name for p in target.iterdir())
    assert "_SUCCESS" in names
    assert any(n.startswith("part-") for n in names)
    assert not any(n.startswith("_temporary") for n in names)
