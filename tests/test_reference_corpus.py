"""End-to-end fidelity on the reference's OWN test corpus.

The reference proves correctness by diffing the distributed run against the
sequential oracle over 8 Project Gutenberg books (main/test-mr.sh:78-116,
~3.3 MB).  Same proof here: wholetext scan of the same files →
run_job (shuffled, 10 partitions, Python UDFs) ≡ run_sequential (one
partition) ≡ the native-expression wordcount, for both wc and indexer apps.

Skipped gracefully when the reference checkout isn't present.
"""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from simpletons_map_reduce_spark.functions.text import tokens
from simpletons_map_reduce_spark.mapreduce import (
    indexer_map,
    indexer_reduce,
    run_job,
    run_sequential,
    sorted_output,
    wc_map,
    wc_reduce,
)
from simpletons_map_reduce_spark.sources import read_wholetext

CORPUS_GLOB = "/root/reference/main/pg-*.txt"

pytestmark = pytest.mark.skipif(
    not glob.glob(CORPUS_GLOB), reason="reference corpus not available"
)


@pytest.fixture(scope="module")
def corpus(spark):
    df = read_wholetext(spark, CORPUS_GLOB)
    assert df.count() == 8  # the reference's 8 books
    return df


def test_wordcount_on_reference_corpus(spark, corpus):
    """Distributed ≡ sequential ≡ native on the real 3.3 MB corpus."""
    dist = sorted_output(run_job(spark, wc_map, wc_reduce, corpus, num_partitions=10))
    seq = sorted_output(run_sequential(spark, wc_map, wc_reduce, corpus))
    assert dist == seq
    native = (
        corpus.select(F.explode(tokens(F.col("content"))).alias("word"))
        .groupBy("word")
        .count()
    )
    native_lines = sorted(f"{r.word} {r['count']}" for r in native.collect())
    assert dist == native_lines
    # spot facts: every book mentions "the"; token count is substantial
    the = next(line for line in dist if line.startswith("the "))
    assert int(the.split()[1]) > 10_000
    assert len(dist) > 10_000  # distinct case-sensitive words across 8 books


def test_indexer_on_reference_corpus(spark, corpus):
    dist = sorted_output(
        run_job(spark, indexer_map, indexer_reduce, corpus, num_partitions=10)
    )
    seq = sorted_output(run_sequential(spark, indexer_map, indexer_reduce, corpus))
    assert dist == seq
    # "the" appears in all 8 documents: "<word> 8 <doc,...>" with 8 docs
    the = next(line for line in dist if line.startswith("the "))
    parts = the.split(" ", 2)
    assert parts[1] == "8"
    assert len(parts[2].split(",")) == 8
