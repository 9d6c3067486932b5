"""Vendored pure-stdlib WAV (RIFF PCM) codec — the real audio decode path.

Counterpart of ``operators/png.py`` for the audio modality: the container
has no media libraries, but 16-bit PCM WAV is fully expressible with the
standard library, so the decode step of the audio pipeline can be REAL
instead of stubbed.  The encoder delegates to stdlib ``wave`` (canonical
RIFF framing); the decoder is an independent hand-written RIFF chunk
parser — so a roundtrip exercises two separate implementations of the
container format, and the SQL digest oracle (queries/multimodal_ops.py)
independently proves ``decode(encode(x)) == x`` sample-exact.

Scope: uncompressed PCM (format tag 1), 16-bit, any channel count /
sample rate.  Anything else raises — same contract as the PNG codec:
decode what can be decoded exactly, never fake silently.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

#: RIFF container magic.
WAV_SIGNATURE = b"RIFF"


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono int16 samples → canonical WAV bytes (stdlib ``wave`` writer)."""
    if samples.dtype != np.int16:
        raise ValueError(f"expected int16 samples, got {samples.dtype}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 sample array [n] or [n, channels], sample_rate).

    Independent RIFF chunk walk (not stdlib ``wave``): validates the
    RIFF/WAVE header, reads ``fmt `` (PCM, 16-bit only), then ``data``.
    Unknown chunks are skipped by their declared size (word-aligned), so
    files with LIST/INFO metadata decode fine.  Declared sizes are
    validated against the payload length and a second ``data`` chunk is
    rejected — a truncated or ambiguous file raises instead of silently
    decoding fewer samples (the codec's never-fake-silently contract).
    """
    if payload[:4] != WAV_SIGNATURE or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + size > len(payload):
            raise ValueError(
                f"chunk {cid!r} declares {size} bytes but only "
                f"{len(payload) - pos - 8} remain (truncated payload)"
            )
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            tag, channels, rate, _byterate, _align, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if tag != 1 or bits != 16:
                raise NotImplementedError(
                    f"only 16-bit PCM supported (format tag {tag}, {bits} bits)"
                )
            fmt = (channels, rate)
        elif cid == b"data":
            if data is not None:
                raise ValueError("multiple data chunks (ambiguous payload)")
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    channels, rate = fmt
    samples = np.frombuffer(data, dtype="<i2")
    if channels > 1:
        samples = samples.reshape(-1, channels)
    return samples, rate
