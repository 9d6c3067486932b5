"""Multimodal columns: opaque binary payloads + typed metadata.

Data model for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or a reference into object storage) plus typed metadata
(mime, width/height, sample rate, …).  All Spark-side plumbing — schema,
partition sizing, Arrow batch shape, UDF signatures — is real and tested;
only the media *decode* itself is stubbed, because no image/audio libraries
exist in this container.  Each stub either raises NotImplementedError
(strict mode) or produces a deterministic fake (test mode), clearly marked.

Design notes for scale:
- decode/feature-extract run as ``mapInPandas`` so one Arrow batch of
  payloads is decoded per Python invocation (no per-row pickling);
- payload columns are dropped as early as possible (select metadata first,
  decode only the rows that survive filtering — Catalyst prunes the binary
  column out of the scan when untouched);
- batch size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  so a partition of large payloads cannot OOM a Python worker.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical multimodal record schema.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

#: Output of feature extraction: fixed-size float vector + dims.
FEATURES_SCHEMA = (
    "media_id long, mime string, width int, height int, feature array<float>"
)

FEATURE_DIM = 16


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into the media schema (payload = utf-8
    bytes) — the container has no real image fixtures, so text payloads
    exercise the identical plumbing."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text/plain").alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("meta"),
    )


def _pil():
    """Import gate for the real decoder — Pillow is the production
    dependency; None when absent (this container)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_image(payload: bytes, mime: str) -> np.ndarray:
    """Decode an image payload to an HxW[xC] uint8 array.

    Real path: Pillow (``PIL.Image``), used automatically when installed.
    Without it this raises — callers can't silently treat fake pixels as
    real; tests use ``fake_decode``.  The error message names the
    production dependency (pinned by tests/test_multimodal.py).
    """
    Image = _pil()
    if Image is None:
        raise NotImplementedError(
            "decode_image requires Pillow (pip install Pillow) — not "
            "installed in this container; use fake_decode for tests"
        )
    import io

    with Image.open(io.BytesIO(payload)) as img:
        return np.asarray(img.convert("L") if img.mode == "1" else img)


def fake_decode(payload: bytes, mime: str) -> np.ndarray:
    """Deterministic fake decode: payload bytes → pseudo-image.

    sha256 of the payload seeds a fixed 8x8 single-channel 'image', so tests
    get stable, content-dependent pixels without any media library.
    """
    digest = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer((digest * 2)[:64], dtype=np.uint8)
    return arr.reshape(8, 8)


def extract_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """mapInPandas feature extractor over media rows.

    Per Arrow batch: decode each payload (stub), emit (dims + FEATURE_DIM
    mean-pooled float features).  ``strict=True`` uses the real decoder stub
    (raises NotImplementedError — the documented production path).
    """
    decoder = decode_image if strict else fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "mime": [],
                "width": [],
                "height": [],
                "feature": [],
            }
            for media_id, mime, payload in zip(
                pdf["media_id"], pdf["mime"], pdf["payload"]
            ):
                img = decoder(bytes(payload) if payload is not None else b"", mime)
                h, w = img.shape[:2]
                flat = img.astype(np.float32).reshape(-1)
                pooled = flat[: FEATURE_DIM * (flat.size // FEATURE_DIM)].reshape(
                    FEATURE_DIM, -1
                ).mean(axis=1)
                out["media_id"].append(media_id)
                out["mime"].append(mime)
                out["width"].append(w)
                out["height"].append(h)
                out["feature"].append(pooled.tolist())
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Deterministic frame sampling for video-like media: keep rows whose
    media_id ≡ 0 (mod every_n).  A stand-in for per-file frame extraction —
    the *selection* (the distributed part) is real; frame decode is the
    stubbed step above."""
    return df.filter(F.col("media_id") % every_n == 0)
