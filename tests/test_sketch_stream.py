"""Streaming CMS: sketch relation ≡ batch bit-for-bit, incremental
cross-micro-batch accumulation, and the bounded-state property."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from simpletons_map_reduce_spark.functions.hashing import SPARK_MD5_INT60
from simpletons_map_reduce_spark.functions.text import tokens_lower
from simpletons_map_reduce_spark.queries.sketch_ops import CMS_D, CMS_W
from simpletons_map_reduce_spark.sources.tables import load_table
from simpletons_map_reduce_spark.streaming import run_to_memory
from simpletons_map_reduce_spark.streaming.dedup_stream import DOCS_RAW_SCHEMA
from simpletons_map_reduce_spark.streaming.sketch_stream import (
    cms_stream,
    cms_stream_from,
)
from tests.conftest import SF0001


def _batch_cms(spark, docs):
    e = docs.select(F.explode(tokens_lower(F.col("text"))).alias("tok"))
    depth = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("depth")
    bucket = (
        F.expr(
            SPARK_MD5_INT60.format(e="concat(cast(depth as string), ':', tok)")
        )
        % CMS_W
    )
    return (
        e.select("tok", depth)
        .select("depth", bucket.alias("bucket"))
        .groupBy("depth", "bucket")
        .agg(F.count("*").alias("c"))
    )


def test_cms_stream_equals_batch_sketch(spark):
    got = {
        (r.depth, r.bucket): r.c
        for r in run_to_memory(cms_stream(spark, SF0001), "t_cms_full").collect()
    }
    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")
    want = {(r.depth, r.bucket): r.c for r in _batch_cms(spark, docs).collect()}
    assert got == want
    assert len(got) <= CMS_D * CMS_W  # bounded state by construction


def test_cms_stream_accumulates_across_micro_batches(spark, tmp_path):
    """Counts from a later micro-batch must fold into the standing cells,
    not replace them."""
    rows0 = [(1, "alpha alpha beta", "en", "srcC", 16)]
    rows1 = [(2, "alpha gamma", "en", "srcC", 11)]
    root = str(tmp_path / "cms_in")
    for sub, rows, mtime in (("b0", rows0, 1_000), ("b1", rows1, 2_000)):
        df = spark.createDataFrame(rows, DOCS_RAW_SCHEMA).coalesce(1)
        df.write.mode("overwrite").parquet(f"{root}/{sub}")
        for f in os.listdir(f"{root}/{sub}"):
            os.utime(os.path.join(f"{root}/{sub}", f), (mtime, mtime))
    raw = (
        spark.readStream.format("parquet")
        .schema(DOCS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet")
        .load(f"{root}/*")
    )
    got = {
        (r.depth, r.bucket): r.c
        for r in run_to_memory(
            cms_stream_from(raw.select("doc_id", "text")), "t_cms_inc"
        ).collect()
    }
    both = spark.createDataFrame(rows0 + rows1, DOCS_RAW_SCHEMA).select(
        "doc_id", "text"
    )
    want = {(r.depth, r.bucket): r.c for r in _batch_cms(spark, both).collect()}
    assert got == want
    # the alpha cells must show all 3 occurrences (2 from batch 0 + 1 from
    # batch 1) — probe est = min over depths >= 3
    alpha_cells = []
    for d in range(CMS_D):
        b = spark.sql(
            f"SELECT {SPARK_MD5_INT60.format(e=repr(f'{d}:alpha'))} % {CMS_W}"
        ).collect()[0][0]
        alpha_cells.append(got[(d, b)])
    assert min(alpha_cells) >= 3
