"""Streaming Count-Min sketch — the sketch family's streaming twin.

The batch ``cms_heavy_hitters`` builds its Count-Min sketch as a (depth,
bucket, count) relation with one partial+final aggregate; the streaming
form is the SAME relation maintained incrementally — a watermark-free
running aggregate whose state is capped at d×w rows by construction
(2,048 here), which is the whole point of a sketch as streaming state:
the stream is unbounded, the state is not, and no eviction policy is ever
needed.  Each micro-batch folds its token counts into the standing
(depth, bucket) cells exactly like the batch op's map-side partials fold
into the final aggregate, so after the stream drains the sketch relation
is IDENTICAL to the batch one (pinned bit-for-bit in
tests/test_sketch_stream.py, along with incremental cross-micro-batch
accumulation).

Heavy-hitter *probing* stays a consumer-side batch step over the 2,048-row
sketch (the same split as bloom_stream's decision reassembly): streaming
maintains the state product; the report is cheap to derive whenever asked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import SPARK_MD5_INT60
from ..functions.text import tokens_lower
from ..queries.sketch_ops import CMS_D, CMS_W
from .dedup_stream import docs_raw_stream


def cms_stream_from(docs: DataFrame) -> DataFrame:
    """Running (depth, bucket, c) CMS relation over a streaming
    (doc_id, text) relation — same tokenizer, depth fan-out, and
    md5-int60 bucket hash as the batch operator."""
    e = docs.select(F.explode(tokens_lower(F.col("text"))).alias("tok"))
    depth = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias(
        "depth"
    )
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


def cms_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CMS over the sf documents table."""
    raw = docs_raw_stream(spark, sf_dir)
    return cms_stream_from(raw.select("doc_id", "text"))
