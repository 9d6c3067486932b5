"""DSIR — Data Selection via Importance Resampling (LLM-pipeline tier C).

Xie et al., "Data Selection for Language Models via Importance Resampling"
(NeurIPS 2023) is the standard published recipe for picking pretraining
documents that *look like* a target distribution (e.g. Wikipedia/books)
out of a raw crawl:

1. featurize every document into hashed n-gram buckets (unigrams +
   bigrams hashed into ``DSIR_B`` buckets — the paper's 10k-bucket
   bag-of-hashed-ngrams generative model, here 4096 so the bucket
   relation is trivially broadcastable at any corpus size);
2. fit two multinomials over buckets — ``p_target`` from the target
   slice, ``p_raw`` from the full corpus — with add-1 smoothing;
3. per-document importance weight ``log w(x) = Σ_g  log p_t[b(g)] −
   log p_r[b(g)]`` summed over the doc's gram *occurrences*;
4. resample ``DSIR_K`` documents WITHOUT replacement via the Gumbel
   top-k trick: ``argtop_k( log w(x) + Gumbel(0,1) )``.

The fixtures have no Wikipedia, so the target slice is ``lang = 'en'``
(documents.lang) — the estimator is the published one regardless of what
the target slice denotes.  Everything is deterministic: the Gumbel noise
derives from ``md5(doc_id)`` (same rerunnable-sampling convention as
sampling_ops.py), so the selection is a pure function of the data and
both engines agree row-for-row.

Scale shape (100 TB):
- ONE corpus scan builds the hashed-gram relation ``(doc_id, is_tgt,
  bucket)`` — persisted DISK_ONLY for its two consumers (distribution
  fit + scoring), the same spill-not-heap rule every corpus-scale
  relation in this repo follows; each row is a (long, bool, int) — the
  strings never leave the scan stage.
- The fitted distributions are exactly ``DSIR_B`` rows (one aggregate
  builds BOTH: count + conditional count), so the log-ratio lookup
  table broadcasts by construction — scoring is a map-side join + one
  doc-keyed partial-aggregated shuffle.
- Gumbel top-k is ORDER BY + LIMIT → TakeOrderedAndProject (per-
  partition top-k, never a global sort); the k winners then join back
  to ``documents`` for their attributes with a broadcast of the K-row
  side.  The whole score path is INTEGER: each bucket's log-ratio is
  quantized once to 10^-6 units (so the per-doc sum is an exact,
  order-free BIGINT — the rsum rule for mixed-sign float sums), and the
  per-doc Gumbel variate is quantized to the same units before adding.
  Summation-order divergence is fully eliminated; per-VALUE ``ln``
  parity still relies on both engines computing the same double for the
  same input (bit parity on this container, same contract as
  lm_ops/log2) — a 1-ulp ``ln`` difference landing exactly on a
  quantization boundary would shift one bucket by one unit, a far
  smaller surface than the per-sum last-ulp it replaces.

Reference parity: the reference's only data-selection facility is the
deterministic hash partition of mr/worker.go:41-45; DSIR is tier-C
surface the brief mandates beyond it (training-data pipeline ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..caching import tracked_persist
from ..functions.hashing import MINHASH_PRIME, md5_mod_prime, sql_md5_mod_prime
from ..functions.rounding import rn, sql_rn
from ..functions.text import sql_tokens, tokens_lower
from ..sources.tables import load_table
from .registry import register

#: hashed-ngram bucket count (paper: 10k; 4096 keeps the lookup relation
#: broadcast-trivial and loses nothing at fixture vocabulary sizes).
DSIR_B = 4096
#: target-slice predicate column value (documents.lang).
DSIR_TARGET_LANG = "en"
#: resample size (without replacement, Gumbel top-k).
DSIR_K = 100
#: Gumbel-key quantization scale: both engines rank on
#: floor(key * 1e6) so float last-ulp noise cannot reorder the cut.
DSIR_KEY_SCALE = 1_000_000.0

_DOC_HASH = "CAST(doc_id AS STRING)"
_SQL_DOC_HASH = sql_md5_mod_prime("CAST(doc_id AS VARCHAR)")

#: Spark bigram expression over a pre-tokenized ``toks`` array column —
#: same construction as text_ops.ngram_counts (1-based element_at).
_BIGRAMS = (
    "transform(sequence(1, size(toks) - 1),"
    " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
)


def _gram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, is_tgt, b) — one row per gram OCCURRENCE (unigrams +
    bigrams), b = md5 bucket in [0, DSIR_B)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        (F.col("lang") == DSIR_TARGET_LANG).alias("is_tgt"),
        tokens_lower(F.col("text")).alias("toks"),
    )
    grams = F.concat(
        F.col("toks"),
        F.when(F.size("toks") >= 2, F.expr(_BIGRAMS)).otherwise(
            F.expr("CAST(array() AS ARRAY<STRING>)")
        ),
    )
    return t.select(
        "doc_id", "is_tgt", F.explode(grams).alias("g")
    ).select(
        "doc_id",
        "is_tgt",
        (md5_mod_prime(F.col("g")) % DSIR_B).alias("b"),
    )


def _log_ratio(grams: DataFrame) -> DataFrame:
    """(b, lr_units) — add-1-smoothed log p_target/p_raw per bucket,
    PRE-quantized to integer 10^-6 units; DSIR_B rows.

    Quantizing per bucket (not per doc-sum) is what makes the per-doc
    weight an exact BIGINT sum: a float Σ over hundreds of mixed-sign lr
    addends is association-dependent (Spark partial/final vs DuckDB
    single-threaded can differ in the last ulp — see
    functions/rounding.py's rsum rationale), while integer units commute
    across any partial-aggregate tree."""
    dist = grams.groupBy("b").agg(
        F.count("*").alias("n_raw"),
        F.sum(F.col("is_tgt").cast("long")).alias("n_tgt"),
    )
    tot = dist.agg(
        F.sum("n_raw").alias("t_raw"), F.sum("n_tgt").alias("t_tgt")
    )
    lr = F.log(
        (F.col("n_tgt") + 1.0) / (F.col("t_tgt") + float(DSIR_B))
    ) - F.log((F.col("n_raw") + 1.0) / (F.col("t_raw") + float(DSIR_B)))
    return dist.crossJoin(F.broadcast(tot)).select(
        "b",
        F.floor(lr * DSIR_KEY_SCALE + F.lit(0.5)).cast("long").alias("lr_units"),
    )


def _doc_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_grams, lw_units) — importance log-weights in exact
    integer 10^-6 units (order-free BIGINT sum)."""
    grams = tracked_persist(
        _gram_buckets(spark, sf_dir), level=StorageLevel.DISK_ONLY
    )
    lr = _log_ratio(grams)
    return (
        grams.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum("lr_units").alias("lw_units"),
        )
    )


_GRAMS_SQL = f"""
t AS (SELECT doc_id, lang, (lang = '{DSIR_TARGET_LANG}') AS is_tgt,
             {sql_tokens('text', lower=True)} AS toks
      FROM documents),
grams AS (
    SELECT doc_id, is_tgt,
           ({sql_md5_mod_prime('g')} % {DSIR_B}) AS b
    FROM (SELECT doc_id, is_tgt,
                 unnest(toks || list_transform(
                     range(1, len(toks)),
                     i -> toks[i] || ' ' || toks[i + 1])) AS g
          FROM t)),
dist AS (SELECT b, count(*) AS n_raw,
                count(*) FILTER (WHERE is_tgt) AS n_tgt
         FROM grams GROUP BY b),
tot AS (SELECT sum(n_raw) AS t_raw, sum(n_tgt) AS t_tgt FROM dist),
lr AS (SELECT b,
              CAST(FLOOR((ln((n_tgt + 1.0) / (t_tgt + {float(DSIR_B)}))
                        - ln((n_raw + 1.0) / (t_raw + {float(DSIR_B)})))
                         * {DSIR_KEY_SCALE} + 0.5) AS BIGINT) AS lr_units
       FROM dist CROSS JOIN tot),
w AS (SELECT doc_id, count(*) AS n_grams,
             CAST(sum(lr_units) AS BIGINT) AS lw_units
      FROM grams JOIN lr USING (b) GROUP BY doc_id)
"""

DSIR_WEIGHTS_ORACLE = f"""
WITH {_GRAMS_SQL}
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       {sql_rn(f'(lw_units / {DSIR_KEY_SCALE})', 4)} AS logw
FROM w
"""


@register("dsir_weights", DSIR_WEIGHTS_ORACLE, tags=("lm", "sampling"))
def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance log-weight vs the ``lang='en'`` target.

    ``logw = Σ_grams ln p_target[bucket] − ln p_raw[bucket]`` (add-1
    smoothing over DSIR_B hashed unigram+bigram buckets) — documents that
    look like the target slice score high, out-of-distribution documents
    score low.  The hashed-gram relation is built once (DISK_ONLY), the
    bucket distributions come out of ONE aggregate over it, and scoring
    is a broadcast lookup join + one doc-keyed shuffle.  The per-doc sum
    runs in integer 10^-6 units (each bucket's log-ratio quantized once),
    so it is exact and order-free — the rsum rule for cancellation-heavy
    mixed-sign aggregates under the value-hash gate.
    """
    w = _doc_weights(spark, sf_dir)
    return w.select(
        "doc_id",
        "n_grams",
        rn(F.col("lw_units") / DSIR_KEY_SCALE, 4).alias("logw"),
    )


DSIR_SELECT_ORACLE = f"""
WITH {_GRAMS_SQL},
keyed AS (
    SELECT doc_id,
           lw_units + CAST(FLOOR(-ln(-ln(({_SQL_DOC_HASH} + 0.5)
                                         / {float(MINHASH_PRIME)}))
                                 * {DSIR_KEY_SCALE} + 0.5) AS BIGINT)
             AS key_scaled
    FROM w),
sel AS (SELECT doc_id, key_scaled FROM keyed
        ORDER BY key_scaled DESC, doc_id LIMIT {DSIR_K})
SELECT d.doc_id, d.lang, d.source, sel.key_scaled
FROM sel JOIN documents d USING (doc_id)
"""


@register("dsir_select", DSIR_SELECT_ORACLE, tags=("lm", "sampling"))
def dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel top-k importance resampling: the DSIR_K selected documents.

    ``key = logw + Gumbel(0,1)`` with the Gumbel variate derived from
    ``md5(doc_id)`` (u = (h + 0.5)/p ∈ (0,1) strictly — no ±inf edge).
    The key is a pure BIGINT: the weight is already an exact integer-unit
    sum, and the per-doc Gumbel variate is quantized to the same 10^-6
    units before adding — both engines rank identical integers, so no
    float last-ulp can flip the cut.  ORDER BY + LIMIT plans as
    TakeOrderedAndProject (per-partition top-k); the K winners broadcast
    back onto ``documents`` for their attributes.
    """
    u = (md5_mod_prime(F.expr(_DOC_HASH)) + 0.5) / float(MINHASH_PRIME)
    gumbel_units = F.floor(
        -F.log(-F.log(u)) * DSIR_KEY_SCALE + F.lit(0.5)
    ).cast("long")
    keyed = _doc_weights(spark, sf_dir).select(
        "doc_id",
        (F.col("lw_units") + gumbel_units).alias("key_scaled"),
    )
    sel = keyed.orderBy(F.desc("key_scaled"), "doc_id").limit(DSIR_K)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    return docs.join(F.broadcast(sel), "doc_id").select(
        "doc_id", "lang", "source", "key_scaled"
    )
