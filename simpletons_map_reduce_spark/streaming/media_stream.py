"""Streaming multimodal decode — the media pipeline's streaming twin.

Batch decode (queries/multimodal_ops.py::media_features) sees the corpus
at once; an ingest pipeline decodes media as it arrives.  The SAME Arrow
``mapInPandas`` kernel (operators/multimodal.py::extract_features) runs
unchanged on a streaming DataFrame — decode is a stateless narrow
transform, so there is no watermark, no state store, and append-mode
output: each arriving payload batch is decoded exactly once and the
per-batch Arrow shape is identical to the batch path's.

tests/test_media_stream.py pins the twin ≡ the batch operator row-for-row
— the property that matters: switching a corpus build from nightly batch
to continuous ingest cannot change a single feature value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import documents_as_media, extract_features


def media_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over documents → media schema → Arrow decode kernel.

    Returns the streaming (media_id, width, height, feature) relation;
    run it with events_stream.run_to_memory (append mode — no aggregation)."""
    from .dedup_stream import docs_raw_stream

    raw = docs_raw_stream(spark, sf_dir)
    return extract_features(documents_as_media(raw)).select(
        "media_id", "width", "height", F.col("feature")
    )
