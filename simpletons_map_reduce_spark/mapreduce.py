"""The reference's framework API, re-expressed on Spark.

Reference surface (SURVEY §3.3): a "query" is (Map fn, Reduce fn, input
files, NReduce) —

    mapf(filename string, contents string) []KeyValue   (mr/worker.go:48)
    reducef(key string, values []string) string         (mr/worker.go:49)

run as map → FNV-hash shuffle into NReduce buckets → sort → group → reduce
(mr/worker.go:54-246), with straggler re-execution and phase barriers
supplied by the coordinator (mr/coordinator.go).

Spark mapping: the entire distributed machinery — task queues, phase
barriers, shuffle files, 10 s straggler requeue (mr/coordinator.go:202-266),
at-least-once retries — IS Spark's scheduler/shuffle/retry, so ``run_job``
is just: Arrow-batched flatMap (``mapInPandas``) → ``repartition(n, key)`` →
``applyInPandas`` per key-group.  None of the reference's §4.3 hazards
(duplicate appends on re-execution, premature termination) can occur because
Spark's task commit is exactly-once per partition.

``run_sequential`` mirrors ``main/mrsequential.go:28-90`` (single-partition
execution, the golden-semantics oracle of the reference's differential test
harness, main/test-mr.sh:81-113): same pipeline forced onto one partition.

User functions here are arbitrary Python — this is the one deliberately
non-JVM surface (the reference's plugin loader, main/mrworker.go:32-49).
Queries with known semantics should use the native-expression query library
instead (queries/), which stays inside whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MapFn = Callable[[str, str], Iterable[tuple[str, str]]]
ReduceFn = Callable[[str, list[str]], str]

#: NReduce=10, hard-coded at the reference call site (main/mrcoordinator.go:23).
DEFAULT_NUM_PARTITIONS = 10

KV_SCHEMA = "key string, value string"


def _map_stage(df: DataFrame, mapf: MapFn) -> DataFrame:
    """flatMap over (key, value) rows via Arrow batches (A3: 1 row → N)."""

    def run_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys: list[str] = []
            values: list[str] = []
            for k, v in zip(pdf["key"], pdf["value"]):
                for ok, ov in mapf(k, v):
                    keys.append(ok)
                    values.append(ov)
            yield pd.DataFrame({"key": keys, "value": values})

    return df.mapInPandas(run_map, KV_SCHEMA)


def _reduce_stage(df: DataFrame, reducef: ReduceFn) -> DataFrame:
    """Grouped reduce: one output row per distinct key (A8+A9).

    Values arrive sorted so that ``reducef`` sees a deterministic order
    regardless of partitioning/retries — the guarantee the reference only
    gets when apps sort inside reduce themselves (the B7 idiom,
    mrapps/crash.go:45-55).
    """

    def run_reduce(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf["key"].iloc[0]
        values = sorted(pdf["value"].tolist())
        return pd.DataFrame({"key": [key], "value": [reducef(key, values)]})

    return df.groupBy("key").applyInPandas(run_reduce, KV_SCHEMA)


def run_job(
    spark: SparkSession,
    mapf: MapFn,
    reducef: ReduceFn,
    inputs: DataFrame,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> DataFrame:
    """Distributed MapReduce job over a (key, value) DataFrame.

    ``inputs`` must have 2 string columns; the first is the map key
    (reference: filename), the second the map value (reference: contents).
    Returns the (key, value) result, one row per distinct intermediate key.
    """
    kv = inputs.select(
        F.col(inputs.columns[0]).cast("string").alias("key"),
        F.col(inputs.columns[1]).cast("string").alias("value"),
    )
    mapped = _map_stage(kv, mapf)
    # Explicit hash shuffle into num_partitions buckets ≙ ihash(key)%NReduce
    # (mr/worker.go:41-45,77-86).  Which bucket a key lands in never affects
    # results (SURVEY §2.A A5), so Spark's hash replaces FNV-1a.
    partitioned = mapped.repartition(num_partitions, "key")
    return _reduce_stage(partitioned, reducef)


def run_sequential(
    spark: SparkSession,
    mapf: MapFn,
    reducef: ReduceFn,
    inputs: DataFrame,
) -> DataFrame:
    """Single-partition oracle ≙ main/mrsequential.go:28-90.

    Same user functions, same semantics, one partition, no shuffle — the
    differential-test golden path.  Only for small inputs/tests.
    """
    kv = inputs.select(
        F.col(inputs.columns[0]).cast("string").alias("key"),
        F.col(inputs.columns[1]).cast("string").alias("value"),
    ).coalesce(1)
    mapped = _map_stage(kv, mapf).coalesce(1)
    return _reduce_stage(mapped, reducef)


def to_text_output(df: DataFrame) -> DataFrame:
    """"<key> <value>" lines ≙ the mr-out-* sink format (mr/worker.go:233)."""
    return df.select(F.concat_ws(" ", "key", "value").alias("value"))


def sorted_output(df: DataFrame) -> list[str]:
    """Global sorted union ≙ ``sort mr-out-* | grep .``
    (main/test-mr.sh:103) — test helper, collects to the driver."""
    rows = to_text_output(df).filter(F.col("value") != "").orderBy("value").collect()
    return [r.value for r in rows]


# --- reference application library as plain Python map/reduce fns ----------
# (the plugin .so surface, main/mrworker.go:32-49; used by the differential
# tests to prove run_job ≡ run_sequential ≡ native query results)

import re  # noqa: E402


def _letters_split(text: str) -> list[str]:
    # Go strings.FieldsFunc(contents, !unicode.IsLetter) — mrapps/wc.go:21-24.
    # [\W\d_] with re.UNICODE ≡ "not a Unicode letter".
    return [t for t in re.split(r"[\W\d_]+", text, flags=re.UNICODE) if t]


def wc_map(filename: str, contents: str) -> list[tuple[str, str]]:
    """mrapps/wc.go:19-32 — emit (word, "1") per occurrence."""
    return [(w, "1") for w in _letters_split(contents)]


def wc_reduce(key: str, values: list[str]) -> str:
    """mrapps/wc.go:37-40 — count occurrences."""
    return str(len(values))


def indexer_map(filename: str, contents: str) -> list[tuple[str, str]]:
    """mrapps/indexer.go:20-31 — distinct words per document."""
    return [(w, filename) for w in sorted(set(_letters_split(contents)))]


def indexer_reduce(key: str, values: list[str]) -> str:
    """mrapps/indexer.go:36-39 — "<count> <sorted,doc,list>"."""
    docs = sorted(values)
    return f"{len(docs)} {','.join(docs)}"
