"""Declared multimodal operator — the Arrow decode path, oracle-checked.

``operators/multimodal.py`` holds the production plumbing (binary payload
+ typed metadata schema, mapInPandas batch decode, Pillow-gated real
decoder).  This registry entry drives that EXACT pipeline — media
adaptation, Arrow batching, per-payload decode, pooled feature
extraction — end to end under the driver's hash gate, using the
clearly-marked deterministic fake decoder (sha256-seeded 8×8 pseudo
image; the container has no media libraries).

Why this can be hash-checked at all: the fake decode is pure integer
arithmetic on the payload's sha256 bytes, and the FEATURE_DIM pooling
means over 4 uint8 values are exact in float32 (sums ≤ 1020, division
by 4 is a power of two), so the Python kernel's float32 means equal
DuckDB's double arithmetic bit-for-bit.  The oracle reconstructs the
digest pipeline in SQL (sha256 hex → byte pairs → group means) — an
independent re-derivation, not a reuse of the kernel.

Scale shape: the payload column stays pruned until the mapInPandas
stage; one Arrow batch of payloads is decoded per Python call (batch
size bounded by arrow.maxRecordsPerBatch so large payloads can't OOM a
worker); output is O(media) rows of fixed-width features, no shuffle at
all — the decode is embarrassingly parallel, which is the whole point
at 100 TB of media.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import rn, sql_rn
from ..functions.vectors import sql_cosine
from ..operators.multimodal import documents_as_media, extract_features
from ..sources.tables import load_table
from .registry import register

#: number of leading pooled features exposed as columns (of FEATURE_DIM).
N_FEATS = 4

# DuckDB twin of fake_decode + mean-pooling: byte i of the digest is hex
# pair (2i+1, 2); pooled feature k averages bytes 4k..4k+3.  The digest is
# repeated to fill 64 bytes, so features 0..7 already cover the first copy
# and k < 8 needs no wraparound handling.
_BYTE = "(('0x' || substr(hx, {p}, 2))::BIGINT)"


def _feat_sql(k: int) -> str:
    terms = " + ".join(_BYTE.format(p=2 * (4 * k + j) + 1) for j in range(4))
    return f"(({terms}) / 4.0)"


MEDIA_FEATURES_ORACLE = f"""
WITH m AS (SELECT doc_id AS media_id, sha256(text) AS hx FROM documents)
SELECT media_id,
       CAST(8 AS INTEGER) AS width,
       CAST(8 AS INTEGER) AS height,
       {", ".join(f"{sql_rn(_feat_sql(k), 4)} AS f{k}" for k in range(N_FEATS))}
FROM m
"""


@register("media_features", MEDIA_FEATURES_ORACLE, tags=("multimodal",))
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched media decode + pooled feature extraction (declared).

    documents → media schema (payload = utf-8 bytes, typed metadata) →
    mapInPandas decode (deterministic fake — sha256-seeded pixels) →
    FEATURE_DIM mean-pooled features, first N_FEATS exposed as columns.
    """
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(documents_as_media(docs))
    return feats.select(
        "media_id",
        "width",
        "height",
        *[
            rn(F.element_at("feature", k + 1).cast("double"), 4).alias(f"f{k}")
            for k in range(N_FEATS)
        ],
    )


# Same oracle shape as media_features: the PNG roundtrip is exact, so the
# features must equal the direct sha256-derived ones — an independent SQL
# re-derivation that any codec bug (chunk framing, DEFLATE, unfiltering)
# breaks.
PNG_ROUNDTRIP_ORACLE = f"""
WITH m AS (SELECT doc_id AS media_id, sha256(text) AS hx FROM documents)
SELECT media_id,
       CAST(8 AS INTEGER) AS width,
       CAST(8 AS INTEGER) AS height,
       {", ".join(f"{sql_rn(_feat_sql(k), 4)} AS f{k}" for k in range(N_FEATS))}
FROM m
"""


@register("png_roundtrip", PNG_ROUNDTRIP_ORACLE, tags=("multimodal",))
def png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image-codec path under the hash gate: sha256-seeded pixels →
    genuine PNG bytes (vendored encoder) → production decode ladder
    (operators/png.py when Pillow is absent) → pooled features.

    Hash-matching the independent digest oracle proves the vendored
    codec's zlib framing, filters, and pixel layout are byte-exact — the
    roundtrip can only match if decode(encode(img)) == img.  Same
    embarrassingly-parallel scale shape as media_features (no shuffle).
    """
    from ..operators.multimodal import png_roundtrip_features

    docs = load_table(spark, sf_dir, "documents")
    feats = png_roundtrip_features(documents_as_media(docs))
    return feats.select(
        "media_id",
        "width",
        "height",
        *[
            rn(F.element_at("feature", k + 1).cast("double"), 4).alias(f"f{k}")
            for k in range(N_FEATS)
        ],
    )


# DuckDB twin of fake_pcm + the integer audio stats: sample j of the fake
# PCM is digest bytes (2j, 2j+1) little-endian two's complement; the REAL
# wav codec roundtrip (stdlib RIFF writer → independent chunk-parser
# reader) is sample-exact, so the stats must equal this independent hex
# re-derivation — any framing/endianness bug in operators/wav.py breaks
# the hash.
_N_SAMP = 16


def _samp_sql(j: int) -> str:
    lo = _BYTE.format(p=4 * j + 1)
    hi = _BYTE.format(p=4 * j + 3)
    return f"(CASE WHEN {hi} >= 128 THEN -65536 ELSE 0 END + {lo} + 256 * {hi})"


def _wav_oracle() -> str:
    samples = ", ".join(f"{_samp_sql(j)} AS s{j}" for j in range(_N_SAMP))
    peak = "greatest(" + ", ".join(f"abs(s{j})" for j in range(_N_SAMP)) + ")"
    energy = " + ".join(f"s{j} * s{j}" for j in range(_N_SAMP))
    zc = " + ".join(
        f"(CASE WHEN (s{j} >= 0) <> (s{j + 1} >= 0) THEN 1 ELSE 0 END)"
        for j in range(_N_SAMP - 1)
    )
    return f"""
WITH m AS (SELECT doc_id AS media_id, sha256(text) AS hx FROM documents),
s AS (SELECT media_id, {samples} FROM m)
SELECT media_id,
       CAST({_N_SAMP} AS INTEGER) AS n_samples,
       CAST(16000 AS INTEGER) AS sample_rate,
       CAST({peak} AS BIGINT) AS peak,
       CAST({energy} AS BIGINT) AS energy,
       CAST({zc} AS BIGINT) AS zero_cross
FROM s
"""


@register("wav_roundtrip", _wav_oracle(), tags=("multimodal",))
def wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio-codec path under the hash gate: sha256-seeded int16 PCM →
    genuine RIFF/WAVE bytes (stdlib writer) → independent RIFF chunk-parser
    decode (operators/wav.py) → integer audio stats (peak, energy, zero
    crossings — no float policy needed).

    Same embarrassingly-parallel scale shape as media_features: payload
    pruned until the mapInPandas stage, one Arrow batch of payloads per
    Python call, O(media) fixed-width output rows, zero shuffles.
    """
    from ..operators.multimodal import wav_roundtrip_stats

    docs = load_table(spark, sf_dir, "documents")
    return wav_roundtrip_stats(documents_as_media(docs))


FRAME_SAMPLE_ORACLE = """
SELECT doc_id AS media_id,
       'text/plain' AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
WHERE doc_id % 10 = 0
"""


@register("frame_sample", FRAME_SAMPLE_ORACLE, tags=("multimodal",))
def frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media sampling (every 10th item), declared.

    The selection is the distributed part of frame/clip extraction — a
    scan-stage modulo predicate, zero shuffles, payload column read only
    for the surviving rows (Catalyst prunes it behind the filter).  The
    per-item decode of the sampled rows is operators/multimodal.py's
    territory (Pillow-gated).
    """
    from ..operators.multimodal import documents_as_media, frame_sample

    docs = load_table(spark, sf_dir, "documents")
    media = frame_sample(documents_as_media(docs), every_n=10)
    return media.select(
        "media_id", "mime", F.octet_length("payload").cast("long").alias("n_bytes")
    )


# ---------------------------------------------------------------------------
# media_dedup: near-duplicate media via DECODED features — the
# multimodal → similarity composition an image-dedup pipeline runs
# (decode → pooled features → blocked pair cosine).
# ---------------------------------------------------------------------------

#: cosine threshold over the 8 leading pooled features (the digest repeats
#: after 32 bytes, so features 8..15 mirror 0..7 and carry no information).
#: All-positive mean-of-bytes vectors concentrate high: within-source p99
#: ≈ 0.986 at sf0.01, so 0.99 keeps ~the top percent of pairs.
MEDIA_DEDUP_TAU = 0.99
N_MEDIA_FEATS = 8

#: same quadratic-block contract as embedding_dedup: exact all-pairs per
#: source block refuses to run past this size (sf10 source blocks ~25k
#: would be O(B²); swap the block key for LSH/IVF exactly as the
#: embedding family does).
MEDIA_BLOCK_CAP = 5000


def _media_dedup_oracle() -> str:
    feats = ", ".join(f"{_feat_sql(k)} AS f{k}" for k in range(N_MEDIA_FEATS))
    arr = "[" + ", ".join(f"f{k}" for k in range(N_MEDIA_FEATS)) + "]"
    return f"""
WITH m AS (SELECT doc_id, source, sha256(text) AS hx FROM documents),
f AS (SELECT doc_id, source, {feats} FROM m),
v AS (SELECT doc_id, source, {arr}::DOUBLE[] AS v FROM f),
p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             {sql_cosine('a.v', 'b.v')} AS cos
      FROM v a JOIN v b ON a.source = b.source AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, {sql_rn('cos', 6)} AS cos_sim
FROM p WHERE cos >= {MEDIA_DEDUP_TAU}
"""


@register("media_dedup", _media_dedup_oracle(), tags=("multimodal", "dedup"))
def media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate media detection over DECODED pooled features,
    blocked by source — hash-checked end-to-end through the Arrow decode
    kernel.

    The pipeline an image-dedup job runs: decode payloads (mapInPandas,
    deterministic fake decoder — same contract as media_features),
    mean-pool to a feature vector, then pair vectors within a block and
    keep cosine >= MEDIA_DEDUP_TAU.  The pooled float32 means are exact
    (sums of 4 uint8, power-of-two divide), so the DuckDB oracle
    re-derives the SAME doubles from the digest hex and the sequential
    cosine folds agree bit-for-bit — the whole decode → feature → pair
    path sits under the hash gate.  Feature vectors are 64 bytes, so
    unlike raw-embedding pair joins the blocked self-join's payload is
    trivially shuffle-safe.

    Block propagation is join-free (VERDICT r4 item 3): ``source``
    already rides the media ``meta`` map, so the feature kernel echoes it
    as ``block_key`` — the O(docs) broadcast re-join this replaced was
    the plan's one unbounded broadcast.  The family's in-plan block-size
    guard (raise past MEDIA_BLOCK_CAP rows per source) is a window count
    over the SAME source partitioning the pair join shuffles on.
    """
    from ..caching import tracked_persist
    from ..functions.vectors import cosine_from_parts, dot, norm2
    from ..operators.multimodal import documents_as_media, extract_features

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(
        documents_as_media(docs), block_key="source"
    ).select(
        F.col("media_id").alias("doc_id"),
        F.col("block_key").alias("source"),
        F.transform(
            F.slice("feature", 1, N_MEDIA_FEATS), lambda x: x.cast("double")
        ).alias("v"),
    )
    guard_msg = F.concat(
        F.lit("media_dedup: source block '"),
        F.col("source"),
        F.lit("' has "),
        F.col("block_n").cast("string"),
        F.lit(
            f" media > cap {MEDIA_BLOCK_CAP}; exact all-pairs is O(B^2) "
            "per block — swap the source block for an LSH/IVF key (the "
            "embedding_dedup_ann shape) at this size"
        ),
    )
    block_w = Window.partitionBy("source")
    fv = tracked_persist(
        feats.withColumn("block_n", F.count("*").over(block_w))
        .filter(
            F.when(
                F.col("block_n") <= F.lit(MEDIA_BLOCK_CAP), F.lit(True)
            ).otherwise(F.raise_error(guard_msg))
        )
        .drop("block_n")
        .withColumn("nv", norm2(F.col("v")))
    )
    a = fv.select(
        "source",
        F.col("doc_id").alias("doc_a"),
        F.col("v").alias("va"),
        F.col("nv").alias("na"),
    )
    b = fv.select(
        F.col("source").alias("source_b"),
        F.col("doc_id").alias("doc_b"),
        F.col("v").alias("vb"),
        F.col("nv").alias("nb"),
    )
    cos = cosine_from_parts(
        dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb")
    )
    return (
        a.join(
            b,
            (F.col("source") == F.col("source_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b", cos.alias("cos"))
        .filter(F.col("cos") >= MEDIA_DEDUP_TAU)
        .select("doc_a", "doc_b", rn(F.col("cos"), 6).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# media_resize: the thumbnail stage (decode → area-mean downsample),
# hash-checked — pixel (r, c) of the 4×4 output averages the 2×2 input
# block, and the 8×8 fake image is the digest repeated, so output pixel
# values are re-derivable from hex (byte i of the image = digest byte
# i mod 32; means of 4 uint8 are float32-exact).
# ---------------------------------------------------------------------------

RESIZE_H = 4
RESIZE_W = 4


def _img_byte_sql(i: int) -> str:
    return _BYTE.format(p=2 * (i % 32) + 1)


def _resize_px_sql(r: int, c: int) -> str:
    idx = [16 * r + 2 * c, 16 * r + 2 * c + 1, 16 * r + 8 + 2 * c, 16 * r + 8 + 2 * c + 1]
    return "((" + " + ".join(_img_byte_sql(i) for i in idx) + ") / 4.0)"


def _media_resize_oracle() -> str:
    cols = ", ".join(
        f"{sql_rn(_resize_px_sql(r, c), 4)} AS p{r * RESIZE_W + c}"
        for r in range(RESIZE_H)
        for c in range(RESIZE_W)
    )
    return f"""
WITH m AS (SELECT doc_id AS media_id, sha256(text) AS hx FROM documents)
SELECT media_id, {cols} FROM m
"""


@register("media_resize", _media_resize_oracle(), tags=("multimodal",))
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail stage declared and hash-checked: Arrow decode → 2×2
    area-mean downsample (operators/multimodal.py::resize_media) → 4×4
    pixel grid as columns.

    Area-mean with power-of-two block area is float32-exact, so the
    DuckDB oracle re-derives every output pixel from the digest hex —
    an interpolation/indexing bug in resize_image breaks the hash, not
    just a unit test.  Same embarrassingly-parallel shape as the other
    kernels: payload pruned until the mapInPandas stage, O(media) output
    rows, zero shuffles.
    """
    from ..operators.multimodal import documents_as_media, resize_media

    docs = load_table(spark, sf_dir, "documents")
    small = resize_media(documents_as_media(docs), RESIZE_H, RESIZE_W)
    return small.select(
        "media_id",
        *[
            rn(F.element_at("px", k + 1).cast("double"), 4).alias(f"p{k}")
            for k in range(RESIZE_H * RESIZE_W)
        ],
    )
