"""Deterministic sampling operators — LLM-pipeline tier C.

Training-data pipelines sample constantly (corpus downsampling, per-source
quotas, train/valid/test splits).  ``df.sample()`` is seed-and-partitioning
dependent, which makes results irreproducible across cluster layouts; these
operators instead derive every decision from ``md5(key)``, so the sample is
a pure function of the data — rerunnable, oracle-checkable, and identical on
1 executor or 1000 (the property the reference gets from deterministic
map/reduce functions, mr/worker.go:41-45, generalized to sampling).

Scale notes
-----------
* ``sample_hash`` / ``split_assign`` are scan-local predicates/projections:
  zero shuffle, filter evaluated inside whole-stage codegen next to the
  parquet reader.
* ``stratified_sample`` is a per-stratum exact-k uniform sample via
  ``row_number() <= k`` — Spark >= 3.5 rewrites that filter into a
  WindowGroupLimit, so each input partition forwards at most k candidate
  rows per stratum into the single shuffle (pinned by tests/test_plans.py);
  a hot stratum costs O(k · partitions), never O(|stratum|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import MINHASH_PRIME, md5_mod_prime, sql_md5_mod_prime
from ..sources.tables import load_table
from .registry import register

#: Bernoulli keep-rate for ``sample_hash`` (exact integer threshold so both
#: engines compare the same way).
SAMPLE_RATE = 0.2
SAMPLE_THRESH = int(SAMPLE_RATE * MINHASH_PRIME)

#: Exact per-stratum sample size for ``stratified_sample``.
STRATUM_K = 10

#: train/valid/test cut points (fractions of MINHASH_PRIME).
TRAIN_CUT = int(0.8 * MINHASH_PRIME)
VALID_CUT = int(0.9 * MINHASH_PRIME)

_HASH = "CAST(doc_id AS STRING)"
_SQL_HASH = sql_md5_mod_prime("CAST(doc_id AS VARCHAR)")


SAMPLE_HASH_ORACLE = f"""
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
FROM documents
WHERE {_SQL_HASH} < {SAMPLE_THRESH}
"""


@register("sample_hash", SAMPLE_HASH_ORACLE, tags=("sampling",))
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~20% Bernoulli sample of ``documents``.

    Keep iff ``md5(doc_id) mod p < 0.2·p`` — reproducible across runs,
    partitionings, and engines (unlike ``df.sample``), and the predicate is
    a scan-local expression: at 100 TB this is a full scan with zero shuffle
    and ~20% of rows surviving into downstream stages.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars")
    ).filter(md5_mod_prime(F.expr(_HASH)) < SAMPLE_THRESH)


STRATIFIED_ORACLE = f"""
WITH ranked AS (
    SELECT doc_id, source,
           row_number() OVER (PARTITION BY source
                              ORDER BY {_SQL_HASH}, doc_id) AS rk
    FROM documents
)
SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {STRATUM_K}
"""


@register("stratified_sample", STRATIFIED_ORACLE, tags=("sampling",))
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-source uniform sample (deterministic reservoir).

    Ordering each stratum by ``md5(doc_id)`` and keeping the first k is an
    exact-k uniform sample without replacement — the distributed, rerunnable
    equivalent of reservoir sampling.  The ``row_number() <= k`` filter
    becomes a WindowGroupLimit (partial top-k before the exchange), so the
    shuffle carries at most k rows per stratum per input partition.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        md5_mod_prime(F.expr(_HASH)), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= STRATUM_K)
    )


SPLIT_ASSIGN_ORACLE = f"""
WITH assigned AS (
    SELECT source, n_chars,
           CASE WHEN {_SQL_HASH} < {TRAIN_CUT} THEN 'train'
                WHEN {_SQL_HASH} < {VALID_CUT} THEN 'valid'
                ELSE 'test' END AS split
    FROM documents
)
SELECT source, split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM assigned GROUP BY source, split
"""


@register("split_assign", SPLIT_ASSIGN_ORACLE, tags=("sampling",))
def split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-assign every document to train/valid/test (80/10/10) and report
    per-(source, split) document and character counts.

    The assignment is a pure function of doc_id — adding or removing other
    documents never flips an existing document's split (the stability
    property training pipelines need for incremental re-crawls).  The only
    shuffle is the final (source, split) aggregate, map-side combined.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = md5_mod_prime(F.expr(_HASH))
    split = (
        F.when(h < TRAIN_CUT, "train").when(h < VALID_CUT, "valid").otherwise("test")
    )
    return (
        docs.select("source", "n_chars", split.alias("split"))
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


#: weighted sample size (Efraimidis–Spirakis exponential keys).
WEIGHTED_K = 50

WEIGHTED_SAMPLE_ORACLE = f"""
WITH keyed AS (
    SELECT doc_id,
           CAST(greatest(n_chars, 1) AS BIGINT) AS w,
           pow(({_SQL_HASH} + 1.0) / {MINHASH_PRIME + 1}.0,
               1.0 / greatest(n_chars, 1)) AS k
    FROM documents
)
SELECT doc_id, w, (FLOOR(k * 1000000.0 + 0.5) / 1000000.0) AS sample_key
FROM keyed
ORDER BY k DESC, doc_id
LIMIT {WEIGHTED_K}
"""


@register("weighted_sample", WEIGHTED_SAMPLE_ORACLE, tags=("sampling",))
def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-K weighted sample without replacement (Efraimidis–Spirakis):
    keep the K largest ``u^(1/w)`` keys, u deterministic from md5(doc_id),
    w = doc length — the reproducible, distributed form of weighted
    reservoir sampling (longer docs proportionally likelier).

    ORDER BY key LIMIT K plans TakeOrderedAndProject: per-partition top-K
    then a driver merge of partition tops — never a global sort, so the
    selection is O(K · partitions) rows moved at any corpus size (pinned).
    u is an exact integer hash scaled into (0, 1]; the pow key is libm on
    both engines, and adjacent order statistics on real data are separated
    by far more than a double ulp, so the selected SET is stable
    cross-engine (same stability argument as the log2 ops; the reported
    key is floor-rounded at 6 dp).
    """
    docs = load_table(spark, sf_dir, "documents")
    w = F.greatest(F.col("n_chars"), F.lit(1))
    u = (md5_mod_prime(F.expr(_HASH)) + 1.0) / float(MINHASH_PRIME + 1)
    keyed = docs.select(
        "doc_id",
        w.cast("long").alias("w"),
        F.pow(u, 1.0 / w).alias("k"),
    )
    return (
        keyed.orderBy(F.col("k").desc(), "doc_id")
        .limit(WEIGHTED_K)
        .select(
            "doc_id",
            "w",
            (F.floor(F.col("k") * 1000000.0 + 0.5) / 1000000.0).alias(
                "sample_key"
            ),
        )
    )


def _build_leakage_safe_oracle() -> str:
    from .dedup_ops import _build_clusters_oracle

    rep_hash = sql_md5_mod_prime("CAST(rep AS VARCHAR)")
    return f"""
WITH cl AS ({_build_clusters_oracle()}),
reps AS (
  SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS rep
  FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id
),
assigned AS (
  SELECT doc_id, rep,
         CASE WHEN {rep_hash} < {TRAIN_CUT} THEN 'train'
              WHEN {rep_hash} < {VALID_CUT} THEN 'valid'
              ELSE 'test' END AS split
  FROM reps
)
SELECT split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT rep) AS BIGINT) AS n_groups
FROM assigned GROUP BY split
"""


@register("leakage_safe_split", _build_leakage_safe_oracle(), tags=("sampling", "dedup"))
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/valid/test assignment that can NEVER split a near-dup
    cluster across splits — the leakage-safe version of split_assign.

    Hashing doc_id (split_assign) puts near-duplicate documents on
    independent coin flips, so ~2·p·(1−p) of every dup pair straddles
    train/test — which is eval contamination by construction.  Here the
    hashed key is the doc's near-dup CLUSTER REPRESENTATIVE (its
    dedup_clusters label; singletons represent themselves), so every
    member of a cluster inherits one flip.  Composes the registered
    cluster relation; the report counts docs and distinct groups per
    split (group counts prove the 80/10/10 applies at GROUP grain).

    Scale shape: the cluster relation is the dedup family's persisted
    output (tiny next to the corpus); the left join is broadcast-or-
    shuffle by size, the assignment is a scan-stage hash, and the
    aggregate is O(3) rows.  Same stability property as split_assign:
    a doc's split moves only if its cluster membership changes.
    """
    from .dedup_ops import dedup_clusters

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    cl = dedup_clusters(spark, sf_dir)
    reps = docs.join(cl, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("rep")
    )
    h = md5_mod_prime(F.expr("CAST(rep AS STRING)"))
    split = (
        F.when(h < TRAIN_CUT, "train").when(h < VALID_CUT, "valid").otherwise("test")
    )
    return (
        reps.select("rep", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("rep").alias("n_groups"),
        )
    )


# ---------------------------------------------------------------------------
# mixture_weights: temperature-flattened source sampling rates
# ---------------------------------------------------------------------------

#: temperature alpha = 0.5 (p_s^alpha reweighting).  Written as sqrt so both
#: engines evaluate the IEEE-correctly-rounded primitive instead of pow's
#: libm-dependent codepath; the weight is floored to integer micro-units so
#: the cross-source SUM is exact bigint arithmetic (float sums over a
#: GROUP BY have engine/order-dependent last ulps — the rsum lesson).
MIX_W_SCALE = 1_000_000

def _mixture_oracle() -> str:
    from ..functions.rounding import sql_rn

    return f"""
WITH t AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(regexp_extract_all(text,
              '[\\p{{L}}]+|[\\p{{N}}]+|[^\\p{{L}}\\p{{N}}\\s]'))) AS BIGINT) AS toks
  FROM documents GROUP BY source
),
w AS (
  SELECT *, CAST(floor(sqrt(toks * {MIX_W_SCALE}.0)) AS BIGINT) AS wgt FROM t
),
tot AS (
  SELECT CAST(sum(toks) AS BIGINT) AS total_toks,
         CAST(sum(wgt) AS BIGINT) AS total_w
  FROM w
)
SELECT source, n_docs, toks,
       {sql_rn('toks * 1.0 / total_toks', 6)} AS share,
       {sql_rn('wgt * 1.0 / total_w', 6)} AS target_share,
       {sql_rn('(wgt * 1.0 / total_w) / (toks * 1.0 / total_toks)', 6)} AS boost
FROM w CROSS JOIN tot
"""


MIXTURE_WEIGHTS_ORACLE = _mixture_oracle()


@register("mixture_weights", MIXTURE_WEIGHTS_ORACLE, tags=("sampling",))
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling weights for temperature-flattened data mixing.

    The standard multilingual/multi-domain trick (alpha-sampling): a
    source's natural token share p_s is flattened to q_s proportional to
    p_s^alpha (alpha = 0.5), boosting rare sources without letting any
    single domain dominate.  ``boost`` = q_s / p_s is the up/down-sampling
    factor a pipeline feeds into weighted_sample / split_assign.

    Plan shape: ONE corpus scan reduced by a partial+final aggregate on
    source (token counting is the shared BPE-regex expression from
    token_count, evaluated in the scan projection), then a 1-row total
    broadcast back over the |sources| relation — nothing after the first
    aggregate touches more than |sources| rows, so the operator is scan
    bound at any corpus size.

    Parity note: the temperature weight is floor(sqrt(toks*10^6)) as a
    BIGINT, so cross-source sums stay exact integers; every emitted ratio
    is a single double division + half-up rounding, written with identical
    association in both engines.
    """
    from ..functions.rounding import rn
    from .text_ops import token_count_expr

    docs = load_table(spark, sf_dir, "documents")
    t = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count_expr().cast("long")).cast("long").alias("toks"),
    )
    w = t.withColumn(
        "wgt",
        F.expr(f"CAST(floor(sqrt(toks * {MIX_W_SCALE}.0)) AS BIGINT)"),
    )
    tot = w.agg(
        F.sum("toks").cast("long").alias("total_toks"),
        F.sum("wgt").cast("long").alias("total_w"),
    )
    return w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "toks",
        rn(F.expr("toks * 1.0 / total_toks"), 6).alias("share"),
        rn(F.expr("wgt * 1.0 / total_w"), 6).alias("target_share"),
        rn(
            F.expr("(wgt * 1.0 / total_w) / (toks * 1.0 / total_toks)"), 6
        ).alias("boost"),
    )


# ---------------------------------------------------------------------------
# mixture_apply: execute the temperature-flattened sampling plan
# ---------------------------------------------------------------------------

#: global downsampling target for the demonstration: keep ~half the corpus
#: at natural share, scaled per source by its temperature boost.
MIX_BASE_RATE_NUM = 1
MIX_BASE_RATE_DEN = 2


#: shared threshold expression — ONE generated string evaluated by both
#: engines.  Every literal is CAST to DOUBLE explicitly: DuckDB types bare
#: `1.0` as DECIMAL and its decimal division loses ~1e-7 of precision,
#: which the *2^31 floor amplifies into an off-by-hundreds threshold (the
#: mixture_weights outputs hid this under 6-dp rounding; a floor cannot).
_THR_EXPR = (
    "CAST(floor(least(CAST(1 AS DOUBLE), "
    f"(CAST({MIX_BASE_RATE_NUM} AS DOUBLE) / CAST({MIX_BASE_RATE_DEN} AS DOUBLE))"
    " * ((CAST(wgt AS DOUBLE) / CAST(total_w AS DOUBLE))"
    " / (CAST(toks AS DOUBLE) / CAST(total_toks AS DOUBLE))))"
    f" * CAST({MINHASH_PRIME} AS DOUBLE)) AS BIGINT)"
)


def _mixture_apply_oracle() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(len(regexp_extract_all(text,
              '[\\p{{L}}]+|[\\p{{N}}]+|[^\\p{{L}}\\p{{N}}\\s]')) AS BIGINT)
           AS d_toks
  FROM documents
),
t AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(d_toks) AS BIGINT) AS toks
  FROM d GROUP BY source
),
w AS (
  SELECT *, CAST(floor(sqrt(toks * {MIX_W_SCALE}.0)) AS BIGINT) AS wgt FROM t
),
tot AS (
  SELECT CAST(sum(toks) AS BIGINT) AS total_toks,
         CAST(sum(wgt) AS BIGINT) AS total_w
  FROM w
),
thr AS (
  SELECT source, n_docs, toks, {_THR_EXPR} AS thr
  FROM w CROSS JOIN tot
),
kept AS (
  SELECT d.source, d.d_toks,
         CASE WHEN {sql_md5_mod_prime("d.doc_id::VARCHAR")} < t.thr
              THEN 1 ELSE 0 END AS keep
  FROM d JOIN thr t USING (source)
)
SELECT t.source, t.n_docs, t.toks, t.thr,
       CAST(sum(k.keep) AS BIGINT) AS n_kept,
       CAST(sum(k.keep * k.d_toks) AS BIGINT) AS kept_toks
FROM kept k JOIN thr t USING (source)
GROUP BY t.source, t.n_docs, t.toks, t.thr
"""


@register("mixture_apply", _mixture_apply_oracle(), tags=("sampling",))
def mixture_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute the mixture plan: per-source deterministic downsampling at
    the temperature-boosted rate, reported as kept docs/tokens per source.

    ``mixture_weights`` computes the policy; this op applies it the way
    every sampler in this module works — a pure md5-of-doc_id threshold,
    so the kept set is a function of the data alone (identical on any
    cluster layout, rerunnable, oracle-checkable).  The per-source
    threshold is floor(min(1, base_rate × boost) × P) computed once per
    source from exact integer sums, so over-represented sources are cut
    below the base rate and rare sources keep up to everything.

    Plan shape: the per-doc (source, token-count, hash) projection is
    scan-local; one aggregate builds the |sources| policy relation; the
    policy joins back (strategy AQE's — |sources| is corpus-growing in
    principle) and ONE final aggregate emits the ≤|sources| report rows.
    """
    from ..functions.text import sql_tokens  # noqa: F401  (oracle twin)
    from .text_ops import token_count_expr

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        token_count_expr().cast("long").alias("d_toks"),
    )
    t = d.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("d_toks").cast("long").alias("toks")
    )
    w = t.withColumn(
        "wgt", F.expr(f"CAST(floor(sqrt(toks * {MIX_W_SCALE}.0)) AS BIGINT)")
    )
    tot = w.agg(
        F.sum("toks").cast("long").alias("total_toks"),
        F.sum("wgt").cast("long").alias("total_w"),
    )
    thr = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "toks",
        F.expr(_THR_EXPR).alias("thr"),
    )
    kept = d.join(thr.select("source", "thr"), "source").select(
        "source",
        "d_toks",
        F.when(
            md5_mod_prime(F.col("doc_id").cast("string")) < F.col("thr"), 1
        )
        .otherwise(0)
        .alias("keep"),
    )
    return (
        kept.groupBy("source")
        .agg(
            F.sum("keep").cast("long").alias("n_kept"),
            F.sum(F.col("keep") * F.col("d_toks")).cast("long").alias("kept_toks"),
        )
        .join(thr, "source")
        .select("source", "n_docs", "toks", "thr", "n_kept", "kept_toks")
    )
