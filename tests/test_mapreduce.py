"""Differential tests for the MapReduce framework API.

The reference's entire correctness story is "distributed run ≡ sequential
oracle" (main/test-mr.sh:81-113, sorted-output cmp).  Reproduced here:
run_job (shuffled, partitioned) vs run_sequential (one partition) on the
same user functions, plus cross-checks against the native-expression query
library — three independent implementations of word count must agree.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simpletons_map_reduce_spark.mapreduce import (
    indexer_map,
    indexer_reduce,
    run_job,
    run_sequential,
    sorted_output,
    wc_map,
    wc_reduce,
)
from tests.conftest import SF0001


@pytest.fixture(scope="module")
def corpus(spark):
    # (doc_id, text) ≙ (filename, contents); 60 docs keeps the
    # applyInPandas paths fast while covering many keys.
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    return docs.filter(F.col("doc_id") < 60).select(
        F.col("doc_id").cast("string"), "text"
    )


def test_wordcount_distributed_vs_sequential(spark, corpus):
    dist = sorted_output(run_job(spark, wc_map, wc_reduce, corpus, num_partitions=10))
    seq = sorted_output(run_sequential(spark, wc_map, wc_reduce, corpus))
    assert dist == seq
    assert len(dist) > 0


def test_wordcount_framework_vs_native(spark, corpus):
    """The framework API and the native DataFrame query must agree."""
    dist = dict(
        (r.key, int(r.value))
        for r in run_job(spark, wc_map, wc_reduce, corpus).collect()
    )
    # recompute native counts on the same 60-doc slice
    from simpletons_map_reduce_spark.functions.text import tokens

    docs = spark.read.parquet(f"{SF0001}/documents.parquet").filter(
        F.col("doc_id") < 60
    )
    native = {
        r.word: r.cnt
        for r in docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert dist == native


def test_indexer_distributed_vs_sequential(spark, corpus):
    dist = sorted_output(
        run_job(spark, indexer_map, indexer_reduce, corpus, num_partitions=10)
    )
    seq = sorted_output(run_sequential(spark, indexer_map, indexer_reduce, corpus))
    assert dist == seq


def test_repartition_count_does_not_change_results(spark, corpus):
    """NReduce is a physical knob, not a semantic one (SURVEY §2.A A5)."""
    a = sorted_output(run_job(spark, wc_map, wc_reduce, corpus, num_partitions=3))
    b = sorted_output(run_job(spark, wc_map, wc_reduce, corpus, num_partitions=10))
    assert a == b


def test_output_format(spark, corpus):
    """mr-out format: "<key> <value>" lines, globally sorted (A10/A11)."""
    lines = sorted_output(run_job(spark, wc_map, wc_reduce, corpus))
    assert all(" " in line for line in lines)
    assert lines == sorted(lines)
