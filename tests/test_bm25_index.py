"""Pins for the BM25 postings index artifact (operators/bm25_index.py).

Same contract battery as the other index artifacts: roundtrip, probe
plan (term predicate PUSHED to the postings scan, no corpus tokenize),
exact equality with the inline operator, staleness refusal.
"""

from __future__ import annotations

import pytest

from simpletons_map_reduce_spark.operators.bm25_index import (
    load_bm25_index,
    write_bm25_index,
)
from simpletons_map_reduce_spark.plans import has_pushed_filters
from simpletons_map_reduce_spark.queries import REGISTRY
from simpletons_map_reduce_spark.sources.tables import load_table

from tests.conftest import SF0001


def test_roundtrip_and_probe_plan(spark, tmp_path):
    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")
    n = docs.count()
    idx = str(tmp_path / "bm")
    write_bm25_index(docs, idx)
    postings, dl, termstats, n_docs, avgdl = load_bm25_index(
        spark, idx, expect_n=n
    )
    assert n_docs == n
    assert dl.count() == n
    # postings/termstats invariants: df = postings per term; Σtf = Σdl
    assert postings.count() == postings.select("tok", "doc_id").distinct().count()
    from pyspark.sql import functions as F

    sum_tf = postings.agg(F.sum("tf")).collect()[0][0]
    sum_dl = dl.agg(F.sum("dl")).collect()[0][0]
    assert sum_tf == sum_dl
    assert avgdl == pytest.approx(sum_dl / n)

    probe = REGISTRY["bm25_search_indexed"].fn(spark, SF0001)
    # the term predicate reaches the postings parquet scan
    assert has_pushed_filters(probe, "tok")
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_indexed_equals_inline(spark):
    a = sorted(
        map(tuple, REGISTRY["bm25_search_indexed"].fn(spark, SF0001).collect())
    )
    b = sorted(map(tuple, REGISTRY["bm25_search"].fn(spark, SF0001).collect()))
    assert a == b and len(a) > 0


def test_stale_index_refuses_to_load(spark, tmp_path):
    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")
    idx = str(tmp_path / "bm")
    write_bm25_index(docs.limit(50), idx)
    with pytest.raises(ValueError, match="stale BM25 index"):
        load_bm25_index(spark, idx, expect_n=999)
