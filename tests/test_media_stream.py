"""Streaming twin ≡ batch pin for the multimodal decode path."""

from __future__ import annotations

from simpletons_map_reduce_spark.queries import REGISTRY
from simpletons_map_reduce_spark.streaming.events_stream import run_to_memory
from simpletons_map_reduce_spark.streaming.media_stream import media_stream
from tests.conftest import SF0001


def test_media_stream_equals_batch(spark):
    """Continuous-ingest decode must equal the nightly-batch decode
    row-for-row: same media ids, same dims, same float32-exact pooled
    features (the kernel is shared, but this pins that the STREAMING
    execution path — file source batching, append mode — does not alter
    the Arrow batch arithmetic or drop/duplicate rows)."""
    streamed = {
        (r.media_id, r.width, r.height, tuple(r.feature))
        for r in run_to_memory(media_stream(spark, SF0001), "t_media").collect()
    }
    from simpletons_map_reduce_spark.operators.multimodal import (
        documents_as_media,
        extract_features,
    )
    from simpletons_map_reduce_spark.sources.tables import load_table

    batch = {
        (r.media_id, r.width, r.height, tuple(r.feature))
        for r in extract_features(
            documents_as_media(load_table(spark, SF0001, "documents"))
        )
        .select("media_id", "width", "height", "feature")
        .collect()
    }
    assert streamed == batch
    # and the declared registry entry agrees on the exposed columns
    declared = {
        (r.media_id, r.width, r.height)
        for r in REGISTRY["media_features"].fn(spark, SF0001).collect()
    }
    assert {(m, w, h) for m, w, h, _ in streamed} == declared
