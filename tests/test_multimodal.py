"""Multimodal plumbing: schema, Arrow batch shape, deterministic fake
decode, and the strict path raising as documented."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simpletons_map_reduce_spark.operators import multimodal as mm
from tests.conftest import SF0001


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF0001}/documents.parquet").limit(50)
    return mm.documents_as_media(docs)


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "mime",
        "payload",
        "meta",
    ]
    assert media.schema["payload"].dataType.typeName() == "binary"
    assert media.schema["meta"].dataType.typeName() == "map"


def test_feature_extraction_shape_and_determinism(media):
    feats = mm.extract_features(media)
    rows1 = {r.media_id: r.feature for r in feats.collect()}
    rows2 = {r.media_id: r.feature for r in mm.extract_features(media).collect()}
    assert rows1.keys() == rows2.keys()
    for mid in rows1:
        assert len(rows1[mid]) == mm.FEATURE_DIM
        assert rows1[mid] == rows2[mid]  # content-seeded, not random


def test_fake_decode_is_content_dependent():
    a = mm.fake_decode(b"payload-a", "image/png")
    b = mm.fake_decode(b"payload-b", "image/png")
    assert a.shape == (8, 8)
    assert (a != b).any()


def test_strict_decode_contract():
    """Without Pillow the strict decoder must raise and NAME the production
    dependency; with Pillow installed it must decode real bytes (the
    feature gate, not the stub, is the contract)."""
    if mm._pil() is None:
        with pytest.raises(NotImplementedError, match="Pillow"):
            mm.decode_image(b"\x89PNG", "image/png")
    else:  # pragma: no cover - container has no Pillow today
        import io

        img = mm._pil().new("L", (4, 3), color=7)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        arr = mm.decode_image(buf.getvalue(), "image/png")
        assert arr.shape == (3, 4) and (arr == 7).all()


def test_strict_pipeline_raises_at_action(media):
    feats = mm.extract_features(media, strict=True)
    with pytest.raises(Exception):  # PythonException wrapping NotImplementedError
        feats.collect()


def test_frame_sample(media):
    sampled = mm.frame_sample(media, every_n=10)
    ids = [r.media_id for r in sampled.select("media_id").collect()]
    assert ids and all(i % 10 == 0 for i in ids)


# ---- WAV codec (operators/wav.py): the real audio decode path ------------


def test_wav_roundtrip_exact():
    """decode(encode(x)) is sample-exact for mono int16 PCM."""
    import numpy as np

    from simpletons_map_reduce_spark.operators.wav import decode_wav, encode_wav

    rng = np.random.default_rng(7)
    samples = rng.integers(-32768, 32768, size=1000, dtype=np.int16)
    out, rate = decode_wav(encode_wav(samples, sample_rate=22050))
    assert rate == 22050
    assert np.array_equal(out, samples)


def test_wav_decoder_skips_unknown_chunks():
    """A LIST/INFO metadata chunk between fmt and data must be skipped."""
    import numpy as np

    from simpletons_map_reduce_spark.operators.wav import decode_wav, encode_wav

    samples = np.array([1, -2, 300, -32768], dtype=np.int16)
    raw = encode_wav(samples)
    # splice a 6-byte LIST chunk (odd size → word-aligned pad) before data
    data_at = raw.index(b"data")
    fake = b"LIST" + (5).to_bytes(4, "little") + b"INFOX" + b"\x00"
    spliced = raw[:data_at] + fake + raw[data_at:]
    out, rate = decode_wav(spliced)
    assert np.array_equal(out, samples)


def test_wav_decoder_rejects_non_pcm():
    import struct

    import numpy as np
    import pytest as _pytest

    from simpletons_map_reduce_spark.operators.wav import decode_wav, encode_wav

    raw = bytearray(encode_wav(np.array([0, 1], dtype=np.int16)))
    fmt_at = raw.index(b"fmt ")
    struct.pack_into("<H", raw, fmt_at + 8, 3)  # format tag 3 = IEEE float
    with _pytest.raises(NotImplementedError):
        decode_wav(bytes(raw))
    with _pytest.raises(ValueError):
        decode_wav(b"not a wav at all")


def test_wav_decoder_rejects_truncated_and_duplicate_data():
    """A data chunk whose declared size overruns the payload, or a second
    data chunk, must raise — never silently decode fewer/ambiguous samples
    (ADVICE r4)."""
    import numpy as np
    import pytest as _pytest

    from simpletons_map_reduce_spark.operators.wav import decode_wav, encode_wav

    samples = np.array([1, -2, 300, -32768], dtype=np.int16)
    raw = encode_wav(samples)
    with _pytest.raises(ValueError, match="truncated"):
        decode_wav(raw[:-2])  # data chunk now 2 bytes short of its size field
    data_at = raw.index(b"data")
    second = raw[:data_at] + raw[data_at:] + raw[data_at:]
    with _pytest.raises(ValueError, match="multiple data"):
        decode_wav(second)


def test_fake_pcm_matches_digest():
    """fake_pcm is exactly the sha256 digest as little-endian int16."""
    import hashlib

    import numpy as np

    payload = b"hello audio"
    want = np.frombuffer(hashlib.sha256(payload).digest(), dtype="<i2")
    assert np.array_equal(mm.fake_pcm(payload), want)
    assert len(mm.fake_pcm(payload)) == 16


def test_resize_image_area_and_nearest():
    """Area path: 2x2 block means, float32-exact; nearest path: index map."""
    import numpy as np

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    small = mm.resize_image(img, 4, 4)
    assert small.dtype == np.float32
    assert small[0, 0] == (0 + 1 + 8 + 9) / 4.0
    assert small[3, 3] == (54 + 55 + 62 + 63) / 4.0
    near = mm.resize_image(img, 3, 5)
    assert near.shape == (3, 5)
    assert near[0, 0] == img[0, 0]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mm.resize_image(img, 0, 4)
