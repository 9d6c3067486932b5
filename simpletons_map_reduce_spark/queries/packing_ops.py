"""Training-data assembly: sequence packing, chunking, corpus balancing.

The last mile of an LLM data pipeline (after cleaning + dedup) is turning a
document corpus into *training sequences*: pack short docs into fixed-size
context windows, split long docs into overlapping chunks, and rebalance the
domain mixture.  The reference has nothing in this space (its pipeline ends
at sorted key/value text, mr/worker.go:241-253); these operators extend the
engine the way SURVEY §2.D mandates, with exact ANSI-SQL oracles.

Scale design notes (the 100 TB shapes):

- ``pack_sequences`` needs a running token total, i.e. a total order — which
  is inherently sequential per ordering group.  The scale-correct rendering
  (used by real packing pipelines) is SHARDED packing: docs are bucketed into
  ``(lang, shard)`` groups and packed independently within each shard, so the
  cumulative sum parallelizes across ``langs × NSHARDS`` window partitions
  instead of serializing per lang.  The cost is ≤1 underfull pack per shard —
  noise at scale; shard count scales with the cluster, not the data.
- ``doc_chunks`` is scan-local (sequence + explode + substring): no shuffle,
  whole-stage codegen end-to-end, output size ~ input size × overlap factor.
- ``corpus_balance`` derives its per-source quota from the data (min source
  count), then keeps the hash-smallest quota docs per source: one count agg
  (broadcast back) + one window over source.  Selection is md5-ranked, so the
  sample is reproducible across runs, engines, and partitionings — same
  idiom as sampling_ops (SURVEY §2.D).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_mod_prime, sql_md5_mod_prime
from ..sources.tables import load_table
from .registry import register
from .text_ops import BPE_TOKEN_RE

#: Context-window capacity (tokens) for ``pack_sequences``.
PACK_CAPACITY = 512
#: Doc-id shards per lang — parallelism knob for the packing cumsum.
PACK_SHARDS = 8

#: ``doc_chunks`` geometry: window of CHUNK_LEN chars every CHUNK_STRIDE.
CHUNK_LEN = 200
CHUNK_STRIDE = 150

PACK_SEQUENCES_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, doc_id % {PACK_SHARDS} AS shard,
         CAST(len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS BIGINT)
           AS n_tokens
  FROM documents
),
cum AS (
  SELECT *, sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM toks
)
SELECT doc_id, lang, shard, n_tokens,
       CAST(FLOOR((cum_tokens - n_tokens) / {PACK_CAPACITY}.0) AS BIGINT)
         AS pack_id
FROM cum
"""


@register("pack_sequences", PACK_SEQUENCES_ORACLE, tags=("packing",))
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each doc to a fixed-capacity training pack (sharded greedy).

    A doc's pack is the window its FIRST token lands in under a running
    per-``(lang, shard)`` token total — deterministic boundary packing, no
    driver loop.  All arithmetic is integral doubles (< 2^53), so the
    assignment is bit-identical across engines and partitionings.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.regexp_extract_all("text", F.lit(BPE_TOKEN_RE), F.lit(0))
    ).cast("bigint")
    toks = docs.select(
        "doc_id",
        "lang",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        n_tokens.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return cum.select(
        "doc_id",
        "lang",
        "shard",
        "n_tokens",
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / float(PACK_CAPACITY))
        .cast("bigint")
        .alias("pack_id"),
    )


DOC_CHUNKS_ORACLE = f"""
WITH idx AS (
  SELECT doc_id, text,
         unnest(range(0, CAST(FLOOR((n_chars - 1) / {CHUNK_STRIDE}.0) AS BIGINT)
                         + 1)) AS chunk_idx
  FROM documents
)
SELECT doc_id, chunk_idx,
       CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS BIGINT) AS chunk_start,
       substring(text, CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS INT),
                 {CHUNK_LEN}) AS chunk_text
FROM idx
"""


@register("doc_chunks", DOC_CHUNKS_ORACLE, tags=("packing",))
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split docs into overlapping fixed-width char chunks with offsets.

    ``sequence → explode → substring`` is scan-local: no shuffle, stays in
    whole-stage codegen, and the parquet scan prunes to (doc_id, text,
    n_chars).  1-based substring offsets match DuckDB exactly.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_chunks_minus1 = F.floor(
        (F.col("n_chars") - 1) / float(CHUNK_STRIDE)
    ).cast("int")
    return (
        docs.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0), n_chunks_minus1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            (F.col("chunk_idx").cast("bigint") * CHUNK_STRIDE + 1).alias(
                "chunk_start"
            ),
            F.expr(
                f"substring(text, CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS INT),"
                f" {CHUNK_LEN})"
            ).alias("chunk_text"),
        )
    )


_HASH = "CAST(doc_id AS STRING)"
_SQL_HASH = sql_md5_mod_prime("CAST(doc_id AS VARCHAR)")

CORPUS_BALANCE_ORACLE = f"""
WITH quota AS (
  SELECT min(cnt) AS per_source
  FROM (SELECT count(*) AS cnt FROM documents GROUP BY source)
),
ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY {_SQL_HASH}, doc_id) AS rk
  FROM documents
)
SELECT doc_id, source
FROM ranked, quota
WHERE rk <= per_source
"""


def balance_equal(docs: DataFrame) -> DataFrame:
    """Core of ``corpus_balance`` over any (doc_id, source, ...) relation."""
    quota = (
        docs.groupBy("source")
        .agg(F.count("*").alias("cnt"))
        .agg(F.min("cnt").alias("per_source"))
    )
    w = Window.partitionBy("source").orderBy(
        md5_mod_prime(F.expr(_HASH)), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w))
        .crossJoin(F.broadcast(quota))
        .filter(F.col("rk") <= F.col("per_source"))
        .select("doc_id", "source")
    )


@register("corpus_balance", CORPUS_BALANCE_ORACLE, tags=("packing",))
def corpus_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the domain mixture: equal-size sample from every source.

    The quota is data-derived (the smallest source's count — a 1-row agg
    broadcast in), and each source keeps its ``quota`` hash-smallest docs,
    so the output is an exactly-balanced, reproducible mixture.  Unlike
    ``stratified_sample`` (fixed k), the quota here adapts to the corpus.
    One count-aggregate + one per-source window = two shuffles total, both
    on ``source``.  (The driver corpus is already uniform — 25 docs per
    source — so the skew path is pinned by tests/test_packing.py instead.)
    """
    return balance_equal(load_table(spark, sf_dir, "documents"))
