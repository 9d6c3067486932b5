"""Deduplication operators — LLM-pipeline tier C.

Three tiers of dedup, all designed so that at 100 TB no document text is ever
shuffled — only hashes, signatures and doc ids move:

- exact_dedup:    content hash (sha256) → groupBy hash.  The winner is
  min(doc_id), a deterministic choice (dropDuplicates alone would be
  partition-order-dependent).
- near_dedup:     MinHash + LSH banding over 3-token shingles with exact
  Jaccard verification of candidates.  Hashing is md5-derived
  (functions/hashing.py) so the *entire* pipeline — signatures, bands,
  candidate pairs, verification — is reproducible in ANSI SQL and the driver
  verifies it against DuckDB, not just row counts.
- simhash:        32-bit SimHash fingerprint per document (frequency-weighted
  bit votes), again md5-based and oracle-checkable.

Scale notes: LSH banding turns the O(n²) pair space into groupBy(band_key)
buckets; candidate verification joins arrays of shingles only for candidate
pairs.  Skewed buckets (boilerplate-heavy corpora) are handled by AQE skew
join; the band table is ~num_bands× the doc count of (bigint, string) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..caching import free_checkpoint, track, tracked_persist

from ..functions.hashing import (
    MINHASH_PRIME,
    SPARK_MD5_INT60,
    SQL_MD5_INT60,
    minhash_params,
    sql_md5_mod_prime,
)
from ..functions.rounding import sql_rn
from ..functions.text import sql_tokens, tokens
from ..functions.vectorized import np_bucket_verify, np_minhash_bands
from ..sources.tables import load_table, spread
from .registry import register

EXACT_DEDUP_ORACLE = """
SELECT sha256(text) AS content_hash,
       CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY sha256(text)
"""


@register("exact_dedup", EXACT_DEDUP_ORACLE, tags=("dedup",))
def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: hash → deterministic winner + multiplicity."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.sha2("text", 256).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# near_dedup: MinHash/LSH with exact verification
# ---------------------------------------------------------------------------

NUM_PERM = 32          # signature length
BAND_ROWS = 4          # rows per band → 8 bands; P(candidate) = 1-(1-j^4)^8
SHINGLE_K = 3          # 3-token shingles
JACCARD_THRESHOLD_NUM = 1  # keep pairs with jaccard >= 1/2 (integer compare)
JACCARD_THRESHOLD_DEN = 2
#: Hot-bucket cap: band buckets with more than this many members are dropped
#: before the candidate self-join.  A bucket of B docs contributes B(B-1)/2
#: candidate pairs, so one boilerplate-heavy bucket is the only O(B²) left in
#: the pipeline — AQE skew-join splits the physical task but cannot shrink
#: the logical pair explosion.  Recall argument: a capped bucket only loses a
#: true dup pair if EVERY band the pair shares is hot; genuinely unique
#: near-dup pairs still collide in their other (up to 7) bands, and
#: fully-identical boilerplate is exact_dedup's job, not LSH's.  The cap is
#: mirrored in the oracle SQL so correctness comparison is exact either way.
MAX_BAND_BUCKET = 256

# --- gram hashing: per-TOKEN md5, arithmetically combined per window ----
#
# Building each 3-token shingle STRING (array_join over a slice) measured
# ~10 s of the sf1 map stage — pure allocation, immediately hashed away.
# Instead each token is md5-hashed ONCE (31-bit, md5_mod_prime convention)
# and a window's gram hash is the polynomial combination of its 3 token
# hashes, computed twice with different multipliers and packed into one
# 62-bit value:  g = g1 * P + g2,  g_c = ((th_i*c + th_j) % P * c + th_k) % P.
# All intermediates stay < 2^62 (th < 2^31, c < 2^21), so signed-64
# arithmetic is exact and IDENTICAL on both engines — the hashed gram
# space is the declared dedup semantics (same contract as ngram_jaccard's
# int60 grams).  The minhash input is g1 = g DIV P (< 2^31, as the affine
# permutations require).  Short docs (< SHINGLE_K tokens) fold all their
# tokens with the same polynomial; empty docs get the sentinel gram 0 —
# each branch mirrored literally in the oracle.
GRAM_C1 = 1_000_003
GRAM_C2 = 999_983

_P = MINHASH_PRIME


def _gram_win(c: int, el: str) -> str:
    """One window's polynomial combo (Spark `element_at` / DuckDB `th[i]`,
    both 1-based)."""
    e = lambda j: el.format(j=j)  # noqa: E731
    return (
        f"((({e('i')} * {c} + {e('i + 1')}) % {_P})"
        f" * {c} + {e('i + 2')}) % {_P}"
    )


def _gram_two(c: int, el: str) -> str:
    e = lambda j: el.format(j=j)  # noqa: E731
    return f"(({e('1')} * {c} + {e('2')}) % {_P})"


_SPARK_EL = "element_at(th, {j})"
_SQL_EL = "th[{j}]"

_GRAM_CASE = f"""
CASE WHEN size(th) >= {SHINGLE_K}
     THEN transform(sequence(1, size(th) - {SHINGLE_K - 1}),
                    i -> ({_gram_win(GRAM_C1, _SPARK_EL)}) * CAST({_P} AS BIGINT)
                         + ({_gram_win(GRAM_C2, _SPARK_EL)}))
     WHEN size(th) = 2
     THEN array({_gram_two(GRAM_C1, _SPARK_EL)} * CAST({_P} AS BIGINT)
                + {_gram_two(GRAM_C2, _SPARK_EL)})
     WHEN size(th) = 1
     THEN array(element_at(th, 1) * CAST({_P} AS BIGINT) + element_at(th, 1))
     ELSE array(CAST(0 AS BIGINT)) END
"""

_SQL_GRAM_CASE = f"""
CASE WHEN len(th) >= {SHINGLE_K}
     THEN list_transform(range(1, len(th) - {SHINGLE_K - 2}),
                    i -> ({_gram_win(GRAM_C1, _SQL_EL)}) * CAST({_P} AS BIGINT)
                         + ({_gram_win(GRAM_C2, _SQL_EL)}))
     WHEN len(th) = 2
     THEN [{_gram_two(GRAM_C1, _SQL_EL)} * CAST({_P} AS BIGINT)
           + {_gram_two(GRAM_C2, _SQL_EL)}]
     WHEN len(th) = 1
     THEN [th[1] * CAST({_P} AS BIGINT) + th[1]]
     ELSE [CAST(0 AS BIGINT)] END
"""


def _perms_values_sql() -> str:
    rows = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(minhash_params(NUM_PERM))
    )
    return f"(VALUES {rows}) AS perms(i, a, b)"


def _sql_lsh_kept_ctes(
    bucket_cap: int = MAX_BAND_BUCKET, doc_where: str = "",
    text_expr: str = "text",
) -> str:
    """Shared SQL front half (shingle sets → MinHash bands → capped
    buckets); the symmetric (near_dedup) and asymmetric
    (dedup_incremental) oracles append their own cand/verify CTEs.
    ``doc_where`` restricts the corpus (the maintained-lifecycle oracle
    models deleted documents by filtering them out BEFORE banding, so
    bucket caps are computed over the survivors — exactly what the
    tombstone/compaction path serves); ``text_expr`` edits it (the
    upserted-lifecycle oracle models replaced documents by tokenizing a
    CASE over the edited slice — signatures, bands, and bucket caps all
    reflect the replacement text)."""
    where = f"WHERE {doc_where}" if doc_where else ""
    return f"""
WITH t AS (SELECT doc_id, {sql_tokens(text_expr)} AS toks
           FROM documents {where}),
tk AS (SELECT doc_id,
              list_transform(toks, s -> {sql_md5_mod_prime('s')}) AS th
       FROM t),
shs AS (SELECT doc_id, list_distinct({_SQL_GRAM_CASE}) AS shset FROM tk),
h AS (SELECT doc_id, unnest(shset) // {_P} AS h0 FROM shs),
mh AS (SELECT doc_id, perms.i AS i,
              min((perms.a * h0 + perms.b) % {MINHASH_PRIME}) AS mh
       FROM h CROSS JOIN {_perms_values_sql()}
       GROUP BY doc_id, perms.i),
bands AS (SELECT doc_id, i // {BAND_ROWS} AS band,
                 string_agg(CAST(mh AS VARCHAR), '-' ORDER BY i) AS band_key
          FROM mh GROUP BY doc_id, i // {BAND_ROWS}),
counted AS (SELECT doc_id, band, band_key,
                   count(*) OVER (PARTITION BY band, band_key) AS bsz
            FROM bands),
kept AS (SELECT doc_id, band, band_key FROM counted
         WHERE bsz BETWEEN 2 AND {bucket_cap})"""


_SQL_LSH_KEPT_CTES = _sql_lsh_kept_ctes()


def build_near_dedup_oracle(bucket_cap: int = MAX_BAND_BUCKET) -> str:
    """DuckDB oracle for ``near_dedup_pairs`` with an explicit bucket cap
    (registry uses the default; tests/test_fuzz_dedup.py pairs random
    caps with random corpora so the whole MinHash mirror — per-token
    md5, polynomial gram combination, affine permutations, band keys,
    bucket caps — is cross-engine-checked beyond the fixtures)."""
    return f"""
{_sql_lsh_kept_ctes(bucket_cap)},
cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         FROM kept x JOIN kept y
           ON x.band = y.band AND x.band_key = y.band_key
          AND x.doc_id < y.doc_id),
verified AS (
    SELECT doc_a, doc_b,
           len(list_intersect(sa.shset, sb.shset)) AS inter,
           len(list_distinct(list_concat(sa.shset, sb.shset))) AS uni
    FROM cand
    JOIN shs sa ON sa.doc_id = doc_a
    JOIN shs sb ON sb.doc_id = doc_b
)
SELECT doc_a, doc_b, {sql_rn('inter * 1.0 / uni', 4)} AS jaccard
FROM verified
WHERE inter * {JACCARD_THRESHOLD_DEN} >= uni * {JACCARD_THRESHOLD_NUM}
"""


NEAR_DEDUP_ORACLE = build_near_dedup_oracle()


@register("near_dedup", NEAR_DEDUP_ORACLE, tags=("dedup",))
def near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-duplicate pairs over ``documents`` (registry entry)."""
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return near_dedup_pairs(docs)


@register("near_dedup_indexed", NEAR_DEDUP_ORACLE, tags=("dedup",))
def near_dedup_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """near_dedup served off the persisted MinHash signature artifact.

    Identical output (and the SAME DuckDB oracle) as ``near_dedup``, but
    the shingle sets and LSH band relation come from the write-once
    parquet index (operators/minhash_index.py) instead of being
    recomputed — tokenization, per-token md5, gram combination, and the
    NUM_PERM min-permutation kernel do not run (no MapInPandas stage in
    the probe plan; pinned in tests/test_minhash_index.py).  This is the
    production shape at 100 TB: signatures are computed once at ingest,
    and every dedup/incremental-probe query reads them as ordinary
    parquet relations.
    """
    return near_dedup_pairs_indexed(spark, sf_dir)


def near_dedup_pairs_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The near-dup pair relation served off the persisted MinHash
    artifact — shared by ``near_dedup_indexed`` and every COMPOSITE that
    consumes the pair relation (``dedup_clusters`` and, through it,
    dedup_apply/report/weights, leakage_safe_split, the funnel pair).
    Output is identical to ``near_dedup_pairs`` by construction (the
    artifact is a materialization, not an approximation), so all
    consumers keep their oracles; the inline twins (``near_dedup``,
    ``dedup_incremental``) stay on the recompute path as the semantics
    evidence for the signature pipeline itself."""
    from ..operators.minhash_index import minhash_index_for

    shs, bands = minhash_index_for(spark, sf_dir)
    kept = kept_from_bands(bands, MAX_BAND_BUCKET)
    assigned = _assign_to_bucket(_band_collisions(kept), "doc_a", "doc_b")
    return _bucket_verified(assigned, shs, "doc_a", "doc_b")


def near_dedup_pairs(
    docs: DataFrame, bucket_cap: int = MAX_BAND_BUCKET
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs (jaccard >= 0.5), exact-verified.

    Signatures are computed *map-side* as pure array expressions — a
    document's shingles never leave their input partition; only (doc_id,
    band, band_key) rows shuffle into the LSH buckets.  That is the plan
    that survives 100 TB: shuffle volume is O(docs × num_bands × ~40 bytes)
    regardless of document size.  Band buckets hotter than ``bucket_cap``
    are dropped before the self-join (see MAX_BAND_BUCKET), bounding the
    candidate set at ~bucket_cap/2 pairs per doc per band instead of O(B²)
    on boilerplate-heavy corpora; singleton buckets are dropped too (they
    cannot produce a pair).  The threshold compare is integer
    (inter*2 >= uni) so no float boundary can disagree with the oracle.

    Verification (round 8) is BUCKET-LOCAL, not a per-pair join: each
    distinct candidate pair is assigned to ONE bucket (its minimum
    colliding band), shingle sets are delivered once per (doc, needed
    bucket), and ``np_bucket_verify`` cogroups pairs with sets so the
    per-pair set expansion happens in executor memory, never on the wire.
    The sf100 sweep caught the old join shape shipping each ~1.2 KB
    incompressible gram-hash set once per pair through TWO shuffles
    (O(pair-mass × |set|) ≈ 115 GB at 5M docs / 47.5M true pairs —
    ENOSPC); the bucket-local shape ships each set at most min(num_bands,
    pair-degree) times and O(1) times on clustered corpora.
    """
    shs = _shingle_sets(docs)
    kept = _lsh_kept(shs, bucket_cap)
    assigned = _assign_to_bucket(_band_collisions(kept), "doc_a", "doc_b")
    return _bucket_verified(assigned, shs, "doc_a", "doc_b")


def _band_collisions(kept: DataFrame) -> DataFrame:
    """(doc_a, doc_b, band, band_key) bucket-collision rows, pre-distinct —
    the raw LSH self-join output with the bucket identity retained so
    ``_assign_to_bucket`` can fold it through its aggregate without a
    join back to ``kept``."""
    left = kept.alias("x")
    right = kept.alias("y")
    return left.join(
        right,
        (F.col("x.band") == F.col("y.band"))
        & (F.col("x.band_key") == F.col("y.band_key"))
        & (F.col("x.doc_id") < F.col("y.doc_id")),
    ).select(
        F.col("x.doc_id").alias("doc_a"),
        F.col("y.doc_id").alias("doc_b"),
        F.col("x.band").alias("band"),
        F.col("x.band_key").alias("band_key"),
    )


def _assign_to_bucket(collisions: DataFrame, a: str, b: str) -> DataFrame:
    """Deduplicate collision rows to one row per pair, assigned to the
    pair's MINIMUM colliding band, carrying that bucket's band_key
    through the aggregate as ``min(struct(band, band_key))`` — band_key
    is functionally determined by (doc, band), so the struct-min picks
    the minimum band AND its key in one partial/final aggregate.  The
    previous shape aggregated min(band) and then JOINED back to the
    kept-bands relation to recover the key, paying a pair-mass exchange
    plus a (docs×bands) exchange; the struct-min's only cost is ~40
    extra bytes per partially-aggregated pair row in the one exchange
    that remains."""
    return (
        collisions.groupBy(a, b)
        .agg(F.min(F.struct("band", "band_key")).alias("bk"))
        .select(a, b, F.col("bk.band").alias("band"),
                F.col("bk.band_key").alias("band_key"))
    )


def _bucket_verified(
    assigned: DataFrame, shs: DataFrame, a: str, b: str
) -> DataFrame:
    """Exact-verify assigned pairs inside their buckets and apply the
    integer Jaccard threshold.  Set delivery: each doc's shingle set is
    joined to the distinct (doc, bucket) relation the assigned pairs
    reference — sets ship once per needed bucket, never per pair."""
    # three consumers (cogroup pairs side + both union legs of the set-
    # delivery relation) — persist or the self-join + pair-dedup exchange
    # run three times.  DISK_ONLY: pair-mass-sized, same rationale as the
    # exploded gram relations (dedup_ops._shingle_sets).
    assigned = tracked_persist(assigned, level=StorageLevel.DISK_ONLY)
    need = (
        assigned.select(F.col(a).alias("doc_id"), "band", "band_key")
        .union(assigned.select(F.col(b).alias("doc_id"), "band", "band_key"))
        .distinct()
    )
    sets = need.join(shs.select("doc_id", "shset"), "doc_id")
    iv = np_bucket_verify(
        assigned.select(
            F.col(a).alias("doc_a"), F.col(b).alias("doc_b"), "band", "band_key"
        ),
        sets,
    )
    from ..functions.rounding import rn

    return (
        iv.filter(
            F.col("inter") * JACCARD_THRESHOLD_DEN
            >= F.col("uni") * JACCARD_THRESHOLD_NUM
        )
        .select(
            F.col("doc_a").alias(a),
            F.col("doc_b").alias(b),
            rn(F.col("inter") * F.lit(1.0) / F.col("uni"), 4).alias("jaccard"),
        )
    )


#: dedup_incremental's deterministic batch split: doc_id % 10 == 0 plays
#: the "newly crawled batch" (~10%), the rest the standing corpus.
NEW_BATCH_MOD = 10

def build_dedup_incremental_oracle(
    bucket_cap: int = MAX_BAND_BUCKET, doc_where: str = "",
    text_expr: str = "text",
) -> str:
    """DuckDB oracle for the asymmetric new-batch-vs-corpus LSH probe
    with an explicit bucket cap (registry uses the default; fuzzed in
    tests/test_fuzz_dedup.py), an optional corpus filter (the
    maintained-lifecycle entry's deleted slice), and an optional text
    edit (the upserted-lifecycle entry's replaced slice)."""
    return f"""
{_sql_lsh_kept_ctes(bucket_cap, doc_where, text_expr)},
cand AS (SELECT DISTINCT x.doc_id AS new_doc, y.doc_id AS corpus_doc
         FROM kept x JOIN kept y
           ON x.band = y.band AND x.band_key = y.band_key
          AND x.doc_id % {NEW_BATCH_MOD} = 0
          AND y.doc_id % {NEW_BATCH_MOD} <> 0),
verified AS (
    SELECT new_doc, corpus_doc,
           len(list_intersect(sa.shset, sb.shset)) AS inter,
           len(list_distinct(list_concat(sa.shset, sb.shset))) AS uni
    FROM cand
    JOIN shs sa ON sa.doc_id = new_doc
    JOIN shs sb ON sb.doc_id = corpus_doc
)
SELECT new_doc, corpus_doc, {sql_rn('inter * 1.0 / uni', 4)} AS jaccard
FROM verified
WHERE inter * {JACCARD_THRESHOLD_DEN} >= uni * {JACCARD_THRESHOLD_NUM}
"""


DEDUP_INCREMENTAL_ORACLE = build_dedup_incremental_oracle()


@register("dedup_incremental", DEDUP_INCREMENTAL_ORACLE, tags=("dedup",))
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: which NEW documents near-duplicate the
    standing corpus (the decision a crawler makes before appending).

    Asymmetric LSH join: band signatures are computed for both sides (in
    production the corpus side is precomputed and stored bucketed on
    (band, band_key), so only the new batch is signed per ingest), then
    new-batch bucket rows probe corpus bucket rows — candidate volume is
    O(|new| × bucket), never corpus².  Bucket caps are computed over the
    combined relation, exactly as the oracle does.
    """
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return dedup_incremental_pairs(docs)


@register("dedup_incremental_indexed", DEDUP_INCREMENTAL_ORACLE, tags=("dedup",))
def dedup_incremental_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_incremental served off the MinHash signature artifact — the
    production ingest loop made literal: the standing corpus's signatures
    come from the write-once index (operators/minhash_index.py), and ONLY
    the bucket probe + bucket-local verification run per batch.  Identical
    output (and the SAME DuckDB oracle) as ``dedup_incremental``; no
    signature recomputation in the probe plan (MapInPandas-free, pinned in
    tests/test_minhash_index.py).

    On a real crawler the new batch would be signed fresh and the corpus
    side read from the artifact; the fixture's batch split is a doc_id
    predicate over ONE table, so here both sides read the same artifact —
    the plan shape (probe joins over precomputed band relations) is the
    production one either way.
    """
    from ..operators.minhash_index import minhash_index_for

    shs, bands = minhash_index_for(spark, sf_dir)
    kept = kept_from_bands(bands, MAX_BAND_BUCKET)
    assigned = _assign_to_bucket(
        _incremental_collisions(kept), "new_doc", "corpus_doc"
    )
    return _bucket_verified(assigned, shs, "new_doc", "corpus_doc")


@register(
    "dedup_incremental_appended", DEDUP_INCREMENTAL_ORACLE, tags=("dedup",)
)
def dedup_incremental_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_incremental served off an artifact that ABSORBED the new
    batch via ``append_minhash_batch`` instead of a rebuild — the round-10
    maintenance path: the standing corpus was signed once at build, the
    batch was signed alone at append, and the probe reads the segmented
    union (operators/minhash_index.py::appended_minhash_index_for).
    Because per-doc signatures are corpus-independent, append ≡ rebuild
    exactly, so this shares ``dedup_incremental``'s oracle — the driver
    hash gate verifies the append arithmetic (segment union, meta
    accounting) end-to-end, not just "it ran".
    """
    from ..operators.minhash_index import appended_minhash_index_for

    shs, bands = appended_minhash_index_for(spark, sf_dir)
    kept = kept_from_bands(bands, MAX_BAND_BUCKET)
    assigned = _assign_to_bucket(
        _incremental_collisions(kept), "new_doc", "corpus_doc"
    )
    return _bucket_verified(assigned, shs, "new_doc", "corpus_doc")


def _maintained_oracle() -> str:
    from ..operators.index_maintenance import DELETE_MOD, DELETE_RESIDUE

    return build_dedup_incremental_oracle(
        doc_where=f"doc_id % {DELETE_MOD} <> {DELETE_RESIDUE}"
    )


@register(
    "dedup_incremental_maintained", _maintained_oracle(), tags=("dedup",)
)
def dedup_incremental_maintained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """dedup_incremental served off an artifact that lived the FULL
    maintenance lifecycle (round 11): built over the standing corpus,
    ``append_minhash_batch``-ed the new ~10%, ``delete_from_index``-ed
    the ``doc_id % 17 == 3`` slice, then ``compact_index``-ed — segments
    merged into a new generation, tombstones folded into the physical
    rewrite.  The oracle is dedup_incremental's SQL with the deleted
    slice filtered from the corpus BEFORE banding, so the driver hash
    gate verifies append arithmetic, tombstone semantics (bucket caps
    over survivors only), and the compaction rewrite end-to-end: one
    resurrected row or one band lost in the generation swap breaks the
    hash.
    """
    from ..operators.minhash_index import maintained_minhash_index_for

    shs, bands = maintained_minhash_index_for(spark, sf_dir)
    kept = kept_from_bands(bands, MAX_BAND_BUCKET)
    assigned = _assign_to_bucket(
        _incremental_collisions(kept), "new_doc", "corpus_doc"
    )
    return _bucket_verified(assigned, shs, "new_doc", "corpus_doc")


def _upserted_oracle() -> str:
    from ..operators.index_maintenance import upsert_case_sql

    return build_dedup_incremental_oracle(text_expr=upsert_case_sql())


@register(
    "dedup_incremental_upserted", _upserted_oracle(), tags=("dedup",)
)
def dedup_incremental_upserted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """dedup_incremental served off an artifact whose ``doc_id % 17 ==
    3`` slice was REPLACED in place by ``upsert_into_index`` (round 12 —
    the O(|batch|) edit path): supersession tombstones kill the slice's
    old shingle/band rows at load, the edited text's signatures come
    from the appended segment, and the standing corpus is never
    re-signed.  The oracle is dedup_incremental's SQL over the EDITED
    corpus text, so the driver hash gate verifies the whole edit path —
    versioned anti-join, segment supersession, bucket caps over the
    edited population — end-to-end: one resurrected band or one missing
    replacement shingle moves a candidate pair and breaks the hash.
    """
    from ..operators.minhash_index import upserted_minhash_index_for

    shs, bands = upserted_minhash_index_for(spark, sf_dir)
    kept = kept_from_bands(bands, MAX_BAND_BUCKET)
    assigned = _assign_to_bucket(
        _incremental_collisions(kept), "new_doc", "corpus_doc"
    )
    return _bucket_verified(assigned, shs, "new_doc", "corpus_doc")


def _incremental_collisions(kept: DataFrame) -> DataFrame:
    """(new_doc, corpus_doc, band) — the asymmetric new-batch-vs-corpus
    bucket join, shared by the inline and artifact-probe paths so the
    batch-split and collision semantics cannot drift between the two
    entries registered under the SAME oracle."""
    new = kept.filter(F.col("doc_id") % NEW_BATCH_MOD == 0).alias("x")
    corp = kept.filter(F.col("doc_id") % NEW_BATCH_MOD != 0).alias("y")
    return new.join(
        corp,
        (F.col("x.band") == F.col("y.band"))
        & (F.col("x.band_key") == F.col("y.band_key")),
    ).select(
        F.col("x.doc_id").alias("new_doc"),
        F.col("y.doc_id").alias("corpus_doc"),
        F.col("x.band").alias("band"),
        F.col("x.band_key").alias("band_key"),
    )


def dedup_incremental_pairs(
    docs: DataFrame, bucket_cap: int = MAX_BAND_BUCKET
) -> DataFrame:
    """Asymmetric new-vs-corpus pairs over any (doc_id, text) relation
    (exposed so tests can plant corpora and fuzz the bucket cap).

    Verification is bucket-local via the same min-band assignment +
    cogrouped kernel as ``near_dedup_pairs`` (see ``np_bucket_verify``):
    the probe's pair mass is O(|new| × bucket), and each matched doc's
    shingle set ships once per needed bucket instead of once per pair."""
    shs = _shingle_sets(docs)
    kept = _lsh_kept(shs, bucket_cap)
    assigned = _assign_to_bucket(
        _incremental_collisions(kept), "new_doc", "corpus_doc"
    )
    return _bucket_verified(assigned, shs, "new_doc", "corpus_doc")


def near_dedup_candidates(
    docs: DataFrame, bucket_cap: int = MAX_BAND_BUCKET
) -> DataFrame:
    """The UNVERIFIED candidate-pair relation (doc_a, doc_b) the LSH bucket
    join produces — exposed so tests can pin that candidate volume stays
    ~linear on boilerplate-heavy corpora (the hot-bucket cap's contract)."""
    return _lsh_candidates(_shingle_sets(docs), bucket_cap)


def _shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, shset 62-bit gram-hash set, hl minhash-input hashes).

    The hash arrays are materialized map-side; gram strings are NEVER
    built and text never persists or shuffles:

    - ``shset``: the distinct 62-bit polynomial gram hashes (_GRAM_CASE
      — per-token md5 combined per window), the candidate-VERIFICATION
      sets.  Verifying on fixed-width longs instead of ~30-byte trigram
      strings cuts the verify join's shuffle ~3× and makes
      array_intersect long compares; skipping the gram-string
      construction (array_join over a slice per window) cut ~10 s off
      the sf1 map stage — together these were the volatile half of
      near_dedup's wall time (VERDICT r3 item 3).  A 62-bit in-doc
      collision (~|set|²/2⁶³) merges one element identically on both
      engines — the hashed gram space IS the declared semantics, as in
      ngram_jaccard.
    - ``hl``: g1 = gram DIV MINHASH_PRIME (< 2^31), the affine
      minhash-permutation inputs (see functions/hashing.py for why they
      must stay 31-bit).  Derived from shset, so duplicates collapse
      before the Arrow kernel — min() is unaffected.

    Persisted DISK_ONLY: the relation feeds band generation + both sides
    of verification, so tokenize/hash runs once — but building the
    columnar MEMORY cache for wide long-arrays measured 6-10 s of
    VOLATILE compression work at sf1, while local-disk write+reread of
    the same blocks is ~4 s flat.  At cluster scale DISK_ONLY also
    cannot evict under executor memory pressure; lineage recompute
    remains the fallback."""
    return tracked_persist(
        shingle_projection(docs), level=StorageLevel.DISK_ONLY
    )


def shingle_projection(docs: DataFrame) -> DataFrame:
    """The UNPERSISTED (doc_id, shset, hl) projection — a pure map-side
    expression, so it runs unchanged on a STREAMING DataFrame (persist is
    batch-only), which is what lets streaming/near_dedup_stream.py share
    the exact signature pipeline with the batch operator."""
    th = F.transform(
        F.expr(_spark_toks_expr()),
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
        % MINHASH_PRIME,
    )
    return (
        docs.select("doc_id", th.alias("th"))
        .select("doc_id", F.array_distinct(F.expr(_GRAM_CASE)).alias("shset"))
        .select(
            "doc_id",
            "shset",
            F.expr(f"transform(shset, g -> g DIV {_P})").alias("hl"),
        )
    )


def _lsh_candidates(shs: DataFrame, bucket_cap: int) -> DataFrame:
    """Distinct candidate pairs from the capped LSH bucket self-join."""
    return (
        _band_collisions(_lsh_kept(shs, bucket_cap))
        .select("doc_a", "doc_b")
        .distinct()
    )


def _lsh_kept(shs: DataFrame, bucket_cap: int) -> DataFrame:
    """(doc_id, band, band_key) rows surviving the hot-bucket cap — the
    shared front half of the symmetric (near_dedup) and asymmetric
    (dedup_incremental) LSH joins."""
    # The 32-bit md5-derived hashes (`hl`) were already materialized in
    # _shingle_sets' map stage; the NUM_PERM affine min-permutations run
    # in the Arrow numpy kernel (functions/vectorized.py::np_minhash_bands)
    # — pure int64 arithmetic, bit-identical to the per-permutation
    # interpreted min-folds AND to the oracle's SQL, but one vectorized
    # pass instead of NUM_PERM interpreted array traversals per document
    # (measured ~2× on the whole query at sf0.1; more at sf1 where
    # signatures dominate).
    bands = np_minhash_bands(
        shs.select("doc_id", "hl"), minhash_params(NUM_PERM), BAND_ROWS
    )
    return kept_from_bands(bands, bucket_cap)


def kept_from_bands(bands: DataFrame, bucket_cap: int) -> DataFrame:
    """Apply the hot-bucket cap to a (doc_id, band, band_key) relation —
    shared by the inline path above and the artifact probe path
    (operators/minhash_index.py), so both cut buckets identically.

    Count bucket membership with a window on the exact keys the self-join
    shuffles on (one exchange, reused by the join), then drop buckets
    outside [2, bucket_cap] — singletons can't pair, hot buckets would
    explode quadratically.  Persist the surviving relation: both sides of
    the self-join consume it, and (on the inline path) the md5 + NUM_PERM
    min-folds over every shingle are the dominant map-side cost —
    computing them once matters more than the shset cache.  Tiny payload:
    (doc_id, band, 4-hash key) × num_bands rows per doc."""
    bucket_w = Window.partitionBy("band", "band_key")
    return tracked_persist(
        bands.withColumn("bsz", F.count("*").over(bucket_w))
        .filter((F.col("bsz") >= 2) & (F.col("bsz") <= bucket_cap))
        .select("doc_id", "band", "band_key")
    )


def _spark_toks_expr() -> str:
    """Spark SQL expression string for the token array of ``text``."""
    return "filter(split(text, '[^\\\\p{L}]+'), x -> x <> '')"


# ---------------------------------------------------------------------------
# ngram_jaccard: token-n-gram Jaccard with prefix filtering (PPJoin-lite)
# ---------------------------------------------------------------------------

NGRAM_K = 3            # token trigrams (same gram space as near_dedup, so the
                       # two candidate strategies — lossless prefix join vs
                       # probabilistic LSH — are directly comparable)
NJ_THRESHOLD_NUM = 8   # keep pairs with jaccard >= 8/10 (integer compare)
NJ_THRESHOLD_DEN = 10
#: Prefix-join guard: a gram occurring in more than this many documents is
#: excluded from every prefix.  Rarest-gram ordering already keeps hot grams
#: out of prefixes on natural corpora, but a degenerate corpus (thousands of
#: exact-boilerplate docs) makes EVERY gram hot and the equi-join quadratic;
#: the cap bounds each gram's join bucket at NJ_MAX_DF rows.  A pair is lost
#: only when all its shared prefix grams are boilerplate-hot — mirrored in
#: the oracle SQL, so correctness comparison stays exact.
NJ_MAX_DF = 10_000
#: Prefix-BUCKET cap: even grams under NJ_MAX_DF can concentrate in many
#: documents' prefixes when the corpus vocabulary is small relative to its
#: size (every bucket of B prefix rows yields C(B,2) candidates — measured
#: 12M candidates for 250k true pairs on a 50k-doc replica-heavy corpus).
#: Buckets larger than the cap keep a deterministic hash-ordered SAMPLE of
#: ``cap`` members (row_number over md5(doc_id)) rather than being dropped
#: whole: candidate volume stays bounded at C(cap,2) per bucket, but on
#: extreme dup-mass corpora where every bucket saturates (sf10 replica
#: stress emitted 0 rows under whole-bucket drop) recall degrades
#: gracefully to the sampled pairs instead of collapsing to zero.  A true
#: pair is lost only if the two docs never co-survive sampling in ANY
#: shared prefix gram.  Mirrored in the oracle, so cross-engine comparison
#: stays exact.  Singletons are dropped — they cannot produce a pair.
NJ_BUCKET_CAP = 64

#: prefix size for Jaccard >= t over a set of size sz: sz - ceil(t*sz) + 1
#: (two sets with jaccard >= t MUST share an element within each other's
#: prefix under a global element ordering — the prefix-filter principle).
#: Integer form of ceil(NUM*sz/DEN): (NUM*sz + DEN - 1) div DEN.
_NJ_PREFIX = (
    f"sz - (({NJ_THRESHOLD_NUM} * sz + {NJ_THRESHOLD_DEN - 1})"
    f" DIV {NJ_THRESHOLD_DEN}) + 1"
)
_NJ_PREFIX_SQL = (
    f"sz - (({NJ_THRESHOLD_NUM} * sz + {NJ_THRESHOLD_DEN - 1})"
    f" // {NJ_THRESHOLD_DEN}) + 1"
)

#: Deterministic per-bucket sampling order for the prefix-bucket cap: md5
#: of the doc id's DECIMAL string (identical text on both engines),
#: uncorrelated with id assignment so a hot bucket keeps a hash-uniform
#: sample of its members instead of the lowest ids.
_DOC_ORD = SPARK_MD5_INT60.format(e="CAST(doc_id AS STRING)")
_DOC_ORD_SQL = SQL_MD5_INT60.format(e="CAST(doc_id AS VARCHAR)")

#: Shared oracle front half: the polynomial gram sets (SAME gram space as
#: near_dedup's shingles — per-token md5 combined per window, see
#: _GRAM_CASE) exploded with sizes.
_SQL_NGRAM_CTES = f"""
WITH t AS (SELECT doc_id, {sql_tokens('text')} AS toks FROM documents),
tk AS (SELECT doc_id,
              list_transform(toks, s -> {sql_md5_mod_prime('s')}) AS th
       FROM t),
ng AS (SELECT doc_id, list_distinct({_SQL_GRAM_CASE}) AS ngh FROM tk),
x AS (SELECT doc_id, len(ngh) AS sz, unnest(ngh) AS g FROM ng),
df AS (SELECT g, count(*) AS dfreq FROM x GROUP BY g)"""

def build_ngram_jaccard_oracle(
    max_df: int = NJ_MAX_DF, bucket_cap: int = NJ_BUCKET_CAP
) -> str:
    """DuckDB oracle for ``ngram_jaccard_pairs`` with explicit caps — the
    registry uses the defaults; the fuzz family
    (tests/test_fuzz_dedup.py) pairs random caps with random corpora so
    the md5-ordered bucket sampling and the saturation-aware positional
    CASE are cross-engine-checked far beyond the fixtures."""
    return f"""
{_SQL_NGRAM_CTES},
ranked AS (
    SELECT x.doc_id, x.sz, x.g, df.dfreq,
           row_number() OVER (PARTITION BY x.doc_id ORDER BY df.dfreq, x.g) AS rn
    FROM x JOIN df USING (g)
    WHERE df.dfreq <= {max_df}
),
pref AS (SELECT doc_id, sz, g, rn FROM ranked WHERE rn <= {_NJ_PREFIX_SQL}),
prefb AS (SELECT doc_id, sz, g, rn,
                 count(*) OVER (PARTITION BY g) AS bsz,
                 row_number() OVER (PARTITION BY g
                                    ORDER BY {_DOC_ORD_SQL}, doc_id) AS brn
          FROM pref),
pref2 AS (SELECT doc_id, sz, g, rn, (bsz > {bucket_cap}) AS sat
          FROM prefb WHERE bsz >= 2 AND brn <= {bucket_cap}),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM pref2 a JOIN pref2 b ON a.g = b.g AND a.doc_id < b.doc_id
         AND (CASE WHEN a.sat OR b.sat
              THEN least(a.sz, b.sz) * {NJ_THRESHOLD_DEN}
                   >= greatest(a.sz, b.sz) * {NJ_THRESHOLD_NUM}
              ELSE (1 + least(a.sz - a.rn, b.sz - b.rn))
                   * {NJ_THRESHOLD_NUM + NJ_THRESHOLD_DEN}
                   >= (a.sz + b.sz) * {NJ_THRESHOLD_NUM} END)),
verified AS (
    SELECT doc_a, doc_b,
           len(list_intersect(na.ngh, nb.ngh)) AS inter,
           len(na.ngh) + len(nb.ngh) - len(list_intersect(na.ngh, nb.ngh))
               AS uni
    FROM cand
    JOIN ng na ON na.doc_id = doc_a
    JOIN ng nb ON nb.doc_id = doc_b
)
SELECT doc_a, doc_b, {sql_rn('inter * 1.0 / uni', 4)} AS jaccard
FROM verified
WHERE inter * {NJ_THRESHOLD_DEN} >= uni * {NJ_THRESHOLD_NUM}
"""


NGRAM_JACCARD_ORACLE = build_ngram_jaccard_oracle()


@register("ngram_jaccard", NGRAM_JACCARD_ORACLE, tags=("dedup",))
def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-trigram Jaccard near-dup pairs over ``documents`` (registry
    entry)."""
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return ngram_jaccard_pairs(docs)


def ngram_jaccard_candidates(
    docs: DataFrame,
    max_df: int = NJ_MAX_DF,
    bucket_cap: int = NJ_BUCKET_CAP,
) -> DataFrame:
    """The UNVERIFIED candidate-pair relation the capped prefix join
    produces — exposed so tests can pin that candidate volume stays
    ~linear on small-vocabulary / boilerplate-heavy corpora."""
    return _prefix_candidates(_ngram_sets(docs), max_df, bucket_cap)


def _ngram_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, ngh): distinct 62-bit polynomial gram hashes — the SAME
    gram space as near_dedup's shingles (_GRAM_CASE: per-token md5
    combined per window), so the lossless prefix join and probabilistic
    LSH are directly comparable AND the map stage never builds trigram
    strings (the array_join-per-window + per-gram-md5 shape this replaced
    measured ~2× of the tokenize/hash cost — the same saving the r4
    near_dedup rewrite banked).  Persisted: the relation feeds dfreq,
    ranking, and both verification sides.  A 62-bit in-doc collision
    merges one element identically on both engines — the hashed gram
    space IS the declared semantics."""
    th = F.transform(
        F.expr(_spark_toks_expr()),
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
        % MINHASH_PRIME,
    )
    return tracked_persist(
        docs.select("doc_id", th.alias("th")).select(
            "doc_id", F.array_distinct(F.expr(_GRAM_CASE)).alias("ngh")
        ),
        level=StorageLevel.DISK_ONLY,  # same rationale as _shingle_sets
    )


def _prefix_candidates(
    ng: DataFrame, max_df: int, bucket_cap: int
) -> DataFrame:
    x = ng.select(
        "doc_id", F.size("ngh").alias("sz"), F.explode("ngh").alias("g")
    )
    dfreq = x.groupBy("g").agg(F.count("*").alias("dfreq"))
    # NO broadcast hint on dfreq (VERDICT r4 item 2): distinct-gram count
    # grows with the corpus (Heaps' law — billions of rows at 100 TB), so
    # an unconditional broadcast is a guaranteed executor OOM at scale.
    # AQE picks the join strategy at runtime instead: broadcast when the
    # aggregated relation is actually small (every local SF — measured
    # neutral at sf0.1/sf1), skew-aware sort-merge when it is not.  The
    # groupBy keeps map-side combine, so the agg exchange moves ~distinct
    # grams per partition, not the full explode.  Filtering hot grams
    # BEFORE the window is rank-neutral: ORDER BY (dfreq, g) sorts every
    # dfreq>max_df row strictly after every kept row, so kept rows'
    # row_numbers (and hence the prefix set) are unchanged — it just keeps
    # hot-gram rows out of the window sort.
    ranked = (
        x.join(dfreq, "g")
        .filter(F.col("dfreq") <= max_df)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("dfreq", "g")
            ),
        )
    )
    # Prefix-bucket cap (see NJ_BUCKET_CAP), sampling form: rank bucket
    # members by a deterministic doc-id hash and keep the first
    # ``bucket_cap`` (plus drop singletons — they cannot pair).  Both
    # windows share one exchange on g — the exact key the self-join
    # shuffles on.  Sampling replaces the old whole-bucket drop (VERDICT
    # r4 item 6): when EVERY bucket saturates (extreme dup-mass corpora —
    # sf10 emitted 0 rows), recall now degrades gracefully to the sampled
    # pairs instead of to zero, and candidate volume stays bounded at
    # C(cap,2) per bucket.  Mirrored in the oracle, so the comparison is
    # exact either way.  Persist the survivors: both join sides consume
    # them.
    bucket_w = Window.partitionBy("g")
    order_w = Window.partitionBy("g").orderBy(F.expr(_DOC_ORD), "doc_id")
    pref = tracked_persist(
        ranked.filter(F.expr(f"rn <= {_NJ_PREFIX}"))
        .select("doc_id", "sz", "g", "rn")
        .withColumn("bsz", F.count("*").over(bucket_w))
        .withColumn("brn", F.row_number().over(order_w))
        .filter((F.col("bsz") >= 2) & (F.col("brn") <= bucket_cap))
        .select(
            "doc_id", "sz", "g", "rn",
            (F.col("bsz") > bucket_cap).alias("sat"),
        )
    )
    # PPJoin POSITIONAL filter, applied INSIDE the bucket join: jaccard
    # >= t forces overlap o >= ceil(t/(1+t)·(sza+szb)) = ceil(NUM·(sza+
    # szb)/(NUM+DEN)), and a match on a gram at global ranks (rna, rnb)
    # bounds the remaining overlap at 1 + min(sza-rna, szb-rnb) — every
    # OTHER shared element a true pair could still have sits strictly
    # later in BOTH sets under the global (dfreq, g) order, PROVIDED no
    # earlier shared gram exists.  rn IS the global rank: dropped hot
    # grams (dfreq > max_df) sort strictly after every kept row, so kept
    # ranks are unchanged by the df filter.  Lossless at any true pair's
    # FIRST shared gram (the prefix-filter principle guarantees that gram
    # lies within both prefixes, and at it the bound holds by definition
    # of the overlap).  SAMPLING CAVEAT: when a bucket is sampled (bsz >
    # cap), a pair's first shared gram may have been dropped and its
    # surviving matches sit late — there the "nothing shared earlier"
    # premise breaks and the positional test would wrongly reject
    # (measured at sf10 dup-mass: pairs 3.1M → 1.5M), so matches where
    # EITHER side came through a saturated bucket fall back to the plain
    # length filter (min·DEN >= max·NUM — the rna = rnb = 1 relaxation,
    # which the positional test subsumes elsewhere).  Candidate volume in
    # saturated buckets is already bounded by the cap itself.  Measured at
    # sf1: candidates 4.33M → 2.48M, emitted pairs −0.05% (pairs whose
    # first shared gram died in a SATURATED bucket but whose surviving
    # match sits in an unsaturated one — undetectable locally, inside the
    # sampling contract); sf10 dup-mass pairs identical (3,108,835).
    pos_ok = (
        F.lit(1)
        + F.least(
            F.col("a.sz") - F.col("a.rn"), F.col("b.sz") - F.col("b.rn")
        )
    ) * (NJ_THRESHOLD_NUM + NJ_THRESHOLD_DEN) >= (
        F.col("a.sz") + F.col("b.sz")
    ) * NJ_THRESHOLD_NUM
    len_ok = (
        F.least(F.col("a.sz"), F.col("b.sz")) * NJ_THRESHOLD_DEN
        >= F.greatest(F.col("a.sz"), F.col("b.sz")) * NJ_THRESHOLD_NUM
    )
    return (
        pref.alias("a")
        .join(
            pref.alias("b"),
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & F.when(F.col("a.sat") | F.col("b.sat"), len_ok).otherwise(
                pos_ok
            ),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    max_df: int = NJ_MAX_DF,
    bucket_cap: int = NJ_BUCKET_CAP,
) -> DataFrame:
    """Token-trigram Jaccard near-dup pairs (>= 0.8) via prefix filtering.

    The scale story is the PPJoin family rather than LSH: order every n-gram
    by ascending global document frequency, keep only each set's
    ``sz - ceil(t*sz) + 1`` rarest n-grams as its *prefix*, and generate
    candidates by equi-joining prefixes.  Any pair with true Jaccard >= t is
    guaranteed to collide on a prefix element, so the join is lossless
    (unlike MinHash-LSH's probabilistic recall in ``near_dedup``), yet the
    join input shrinks to ~(1-t)·|set| of the exploded n-grams, and because
    prefixes hold the *rarest* grams the equi-join buckets stay tiny —
    boilerplate n-grams ("of the") never enter the join.  Exact
    verification then runs only on candidates.  All joins are equi-joins on
    hashed keys; shuffle volume is O(docs · prefix) + O(candidates).
    Two guards keep the candidate join ~linear on degenerate corpora:
    grams hotter than ``max_df`` documents never enter a prefix (NJ_MAX_DF),
    and prefix-gram buckets larger than ``bucket_cap`` keep only a
    deterministic hash-ordered sample of ``bucket_cap`` members
    (NJ_BUCKET_CAP — small-vocabulary corpora concentrate prefixes on few
    grams even under the df guard; sampling degrades recall gracefully
    where whole-bucket drop collapsed it to zero).  The threshold compare
    is integer (inter*10 >= uni*8), float-free.
    """
    ng = _ngram_sets(docs)
    cand = _prefix_candidates(ng, max_df, bucket_cap)
    na = ng.select(
        F.col("doc_id").alias("doc_a"),
        F.col("ngh").alias("set_a"),
        F.size("ngh").alias("sz_a"),
    )
    nb = ng.select(
        F.col("doc_id").alias("doc_b"),
        F.col("ngh").alias("set_b"),
        F.size("ngh").alias("sz_b"),
    )
    # uni = sz_a + sz_b - inter (arithmetic) — no array_union allocation
    # per pair; only the intersect walks the two sorted-set arrays.
    verified = (
        cand.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("set_a", "set_b")).alias("inter"),
            (F.col("sz_a") + F.col("sz_b")).alias("szsum"),
        )
        .withColumn("uni", F.col("szsum") - F.col("inter"))
    )
    from ..functions.rounding import rn

    return (
        verified.filter(
            F.col("inter") * NJ_THRESHOLD_DEN >= F.col("uni") * NJ_THRESHOLD_NUM
        )
        .select(
            "doc_a",
            "doc_b",
            rn(F.col("inter") * F.lit(1.0) / F.col("uni"), 4).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def _build_simhash_oracle() -> str:
    bit_sums = ", ".join(
        f"sum(CASE WHEN (h0 // {1 << b}) % 2 = 1 THEN cnt ELSE -cnt END) AS s{b}"
        for b in range(SIMHASH_BITS)
    )
    recombine = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(SIMHASH_BITS)
    )
    return f"""
WITH toks AS (SELECT doc_id, unnest({sql_tokens('text')}) AS tok FROM documents),
tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS cnt
       FROM toks GROUP BY doc_id, tok),
h AS (SELECT doc_id, cnt, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h0 FROM tf),
bits AS (SELECT doc_id, {bit_sums} FROM h GROUP BY doc_id),
fp AS (SELECT doc_id, CAST({recombine} AS BIGINT) AS simhash FROM bits)
SELECT d.doc_id, CAST(coalesce(fp.simhash, 0) AS BIGINT) AS simhash
FROM documents d LEFT JOIN fp USING (doc_id)
"""


@register("simhash", _build_simhash_oracle(), tags=("dedup",))
def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per doc: frequency-weighted bit votes over md5-hashed
    tokens; docs with no tokens fingerprint to 0."""
    return _simhash_frame(load_table(spark, sf_dir, "documents"))


def _simhash_frame(docs: DataFrame) -> DataFrame:
    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    h = tf.select(
        "doc_id",
        "cnt",
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long").alias("h0"),
    )
    bit_sums = [
        F.sum(
            F.when((F.col("h0").bitwiseAND(1 << b)) != 0, F.col("cnt")).otherwise(
                -F.col("cnt")
            )
        ).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    bits = h.groupBy("doc_id").agg(*bit_sums)
    fingerprint = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fingerprint = term if fingerprint is None else fingerprint + term
    fp = bits.select("doc_id", fingerprint.cast("long").alias("simhash"))
    return (
        docs.select("doc_id")
        .join(fp, "doc_id", "left")
        .select("doc_id", F.coalesce("simhash", F.lit(0)).cast("long").alias("simhash"))
    )


#: simhash_pairs: 4 bands × 8 bits over the 32-bit fingerprint.  By
#: pigeonhole, any pair within hamming distance ≤ SIMHASH_HAM_MAX = 3 agrees
#: exactly on at least one band, so the banded candidate join is LOSSLESS
#: for the emitted distance range.  Band buckets hotter than the cap are
#: dropped (same contract as the MinHash band cap, mirrored in the oracle).
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS
SIMHASH_HAM_MAX = SIMHASH_BANDS - 1
SIMHASH_BUCKET_CAP = 256


def _build_simhash_pairs_oracle() -> str:
    band_rows = ", ".join(str(b) for b in range(SIMHASH_BANDS))
    mask = (1 << SIMHASH_BAND_BITS) - 1
    return f"""
WITH fpx AS (SELECT doc_id, simhash AS f FROM ({_build_simhash_oracle()})),
bands AS (SELECT doc_id, f, b.band,
                 (f // (1 << ({SIMHASH_BAND_BITS} * b.band))) & {mask} AS bkey
          FROM fpx CROSS JOIN (SELECT unnest([{band_rows}]) AS band) b),
counted AS (SELECT doc_id, band, bkey,
                   count(*) OVER (PARTITION BY band, bkey) AS bsz
            FROM bands),
kept AS (SELECT doc_id, band, bkey FROM counted
         WHERE bsz BETWEEN 2 AND {SIMHASH_BUCKET_CAP}),
cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         FROM kept x JOIN kept y
           ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
scored AS (
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(fa.f, fb.f)) AS BIGINT) AS hamming
    FROM cand
    JOIN fpx fa ON fa.doc_id = doc_a
    JOIN fpx fb ON fb.doc_id = doc_b
)
SELECT doc_a, doc_b, hamming FROM scored WHERE hamming <= {SIMHASH_HAM_MAX}
"""


@register("simhash_pairs", _build_simhash_pairs_oracle(), tags=("dedup",))
def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: banded fingerprint join + hamming verify.

    The third candidate-generation strategy in the dedup family (after
    MinHash-LSH and prefix filtering): constant-size per-doc state (one
    64-bit int), candidates from 4×8-bit band equality — lossless for
    hamming ≤ 3 — then exact bit_count verification.  Only (doc_id,
    band, 8-bit key) rows shuffle; fingerprints re-join by id.
    """
    return simhash_pairs_from(spark, load_table(spark, sf_dir, "documents"))


def simhash_pairs_from(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Banded-hamming pair pipeline over any (doc_id, text) relation."""
    fpx = tracked_persist(
        _simhash_frame(docs).select("doc_id", F.col("simhash").alias("f"))
    )
    mask = (1 << SIMHASH_BAND_BITS) - 1
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright("f", SIMHASH_BAND_BITS * b)
            .bitwiseAND(F.lit(mask))
            .alias("bkey"),
        )
        for b in range(SIMHASH_BANDS)
    ]
    bands = fpx.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))
    bucket_w = Window.partitionBy("band", "bkey")
    kept = tracked_persist(
        bands.withColumn("bsz", F.count("*").over(bucket_w))
        .filter((F.col("bsz") >= 2) & (F.col("bsz") <= SIMHASH_BUCKET_CAP))
        .select("doc_id", "band", "bkey")
    )
    cand = (
        kept.alias("x")
        .join(
            kept.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bkey") == F.col("y.bkey"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    fa = fpx.select(F.col("doc_id").alias("doc_a"), F.col("f").alias("fa"))
    fb = fpx.select(F.col("doc_id").alias("doc_b"), F.col("f").alias("fb"))
    return (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
            .cast("long")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_HAM_MAX)
    )


# ---------------------------------------------------------------------------
# dedup_clusters: connected components over the near-dup pair graph
# ---------------------------------------------------------------------------

def _build_clusters_oracle(near_oracle: str | None = None) -> str:
    """Recursive-CTE twin of the iterative label propagation: cluster id =
    min doc_id reachable through near-dup pairs.  Reuses NEAR_DEDUP_ORACLE's
    CTE list verbatim so the two queries can never disagree on the graph
    (pass a ``build_near_dedup_oracle(cap)`` body to fuzz other caps)."""
    body = (near_oracle or NEAR_DEDUP_ORACLE).strip()
    assert body.startswith("WITH ")
    idx = body.rindex("SELECT doc_a")
    ctes = body[len("WITH "):idx].rstrip().rstrip(",")
    final_select = body[idx:]
    return f"""
WITH RECURSIVE {ctes},
pairs AS ({final_select}),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
reach(doc_id, r) AS (
    SELECT doc_id, doc_id FROM nodes
    UNION
    SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.doc_id
)
SELECT doc_id, CAST(min(r) AS BIGINT) AS cluster_id
FROM reach GROUP BY doc_id
"""


MAX_CC_ITERATIONS = 20


# ---------------------------------------------------------------------------
# dedup_apply: materialize the deduplicated corpus
# ---------------------------------------------------------------------------

def _clusters_cte_parts() -> tuple[str, str]:
    """(ctes, final_select) of the recursive cluster oracle — the ONE
    place that performs the string surgery on _build_clusters_oracle, so
    the three composed oracles (apply/report/weights) cannot diverge if
    its final SELECT is ever reworded."""
    body = _build_clusters_oracle().strip()
    assert body.startswith("WITH RECURSIVE ")
    idx = body.rindex("SELECT doc_id")
    ctes = body[len("WITH RECURSIVE "):idx].rstrip().rstrip(",")
    return ctes, body[idx:]


def _build_apply_oracle() -> str:
    """Survivor oracle = exact-dedup winners minus near-dup cluster losers,
    composed from the SAME recursive-CTE cluster oracle dedup_clusters uses
    (so the two queries can never disagree on the cluster graph)."""
    ctes, final_select = _clusters_cte_parts()
    return f"""
WITH RECURSIVE {ctes},
clusters AS ({final_select}),
near_losers AS (SELECT doc_id FROM clusters WHERE cluster_id <> doc_id),
exact_keep AS (
    SELECT doc_id, source, n_chars,
           min(doc_id) OVER (PARTITION BY sha256(text)) AS keep_id
    FROM documents
)
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
FROM exact_keep
WHERE doc_id = keep_id
  AND doc_id NOT IN (SELECT doc_id FROM near_losers)
"""


@register("dedup_apply", _build_apply_oracle(), tags=("dedup",))
def dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SURVIVING corpus after dedup — what a pipeline actually writes out.

    exact_dedup yields groups, near_dedup yields pairs, dedup_clusters
    yields clusters; this operator composes them into the deliverable:
    every document that is (a) the deterministic min-doc_id winner of its
    exact-content group and (b) not a loser of its near-dup cluster
    (cluster_id != doc_id).  Exact winners come from one window over the
    content hash (no self-join); near losers are removed with a left-anti
    join — at 100 TB both shuffle only (hash, id)-sized keys, never text,
    and the anti join's right side (losers) is tiny relative to the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.sha2("text", 256))
    winners = (
        docs.withColumn("keep_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "source", F.col("n_chars").cast("long").alias("n_chars"))
    )
    near_losers = (
        dedup_clusters(spark, sf_dir)
        .filter(F.col("cluster_id") != F.col("doc_id"))
        .select("doc_id")
    )
    return winners.join(near_losers, "doc_id", "left_anti")


@register("dedup_clusters", _build_clusters_oracle(), tags=("dedup",))
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS from near-dup PAIRS: hash-to-min label propagation
    with pointer jumping.

    The scalable connected-components formulation (no driver-side graph):
    every node starts labeled with its own id; each round, (1) labels flow
    across edges and every node keeps the min of (own, neighbors'), then
    (2) a *pointer-jumping* step replaces each node's label with its label's
    label (every label value is itself a node id, so the doc_id→cluster_id
    relation doubles as a parent-pointer table).  Shortcutting halves the
    remaining path each round, so convergence takes ~log2(diameter) rounds —
    a diameter-2^20 chain finishes inside MAX_CC_ITERATIONS=20, where plain
    one-hop propagation would silently stop at diameter 20.  If the labels
    still change after the last round we *raise* rather than return a
    partially-propagated (wrong) clustering.

    Each round is two equi-joins + one partial/final min-aggregate;
    ``localCheckpoint`` cuts lineage so plans don't grow with iteration
    count (the standard Spark iterative-algorithm discipline).  The
    convergence check is a count action per round — the data never collects
    to the driver.

    All three per-round joins carry an explicit SHUFFLE_HASH hint: the
    label relation is corpus-sized, so letting AQE broadcast it builds a
    label-table-sized heap hash relation per join per round, and broadcast
    cleanup waits on driver GC — at the sf100 sweep (5M labels, 45M edges,
    up to 20 rounds) the accumulated broadcasts OOM'd a 24 GB heap mid-
    iteration (SCALE.md round 8).  On a real cluster broadcasting the
    corpus-sized side is wrong regardless of heap: shuffle cost is the
    honest per-round price of label propagation.

    Pair source (round 13, guide §6): the PERSISTED MinHash artifact
    (``near_dedup_pairs_indexed``), not an inline re-signing of the
    corpus — the production pipeline computes signatures once at ingest,
    and every composite that consumes the pair relation (this one plus,
    through it, dedup_apply/report/weights, leakage_safe_split,
    pipeline_funnel) reads them as parquet.  Output is identical by
    construction and the oracle is unchanged; ``near_dedup`` itself
    stays inline as the signature pipeline's semantics evidence.
    """
    pairs = near_dedup_pairs_indexed(spark, sf_dir).select("doc_a", "doc_b")
    return clusters_from_pairs(pairs)


def clusters_from_pairs(pairs: DataFrame) -> DataFrame:
    """Pointer-doubling connected components over any (doc_a, doc_b) pair
    relation (exposed so composed queries — pipeline_funnel_fused — can
    cluster pairs built from an already-persisted corpus relation)."""
    fwd = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    rev = pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    edges = fwd.union(rev).distinct().persist()
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint()
    )
    try:
        converged = False
        for _ in range(MAX_CC_ITERATIONS):
            msgs = edges.join(
                labels.hint("shuffle_hash"), edges.src == labels.doc_id
            ).select(F.col("dst").alias("doc_id"), "cluster_id")
            hopped = (
                msgs.union(labels.select("doc_id", "cluster_id"))
                .groupBy("doc_id")
                .agg(F.min("cluster_id").alias("cluster_id"))
            )
            # pointer jump: label := label(label).  Inner join is safe —
            # every cluster_id is the id of a node present in `labels`.
            parents = labels.select(
                F.col("doc_id").alias("cluster_id"),
                F.col("cluster_id").alias("grand"),
            )
            new_labels = (
                hopped.join(parents.hint("shuffle_hash"), "cluster_id")
                .select("doc_id", F.least("cluster_id", "grand").alias("cluster_id"))
                .localCheckpoint()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o").hint("shuffle_hash"), "doc_id")
                .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
                .count()
            )
            # round N-1's materialized label blocks are superseded — drop
            # them now so iteration memory stays O(1) rounds, not O(N)
            free_checkpoint(labels)
            labels = new_labels
            if changed == 0:
                converged = True
                break
        if not converged:
            raise RuntimeError(
                f"dedup_clusters: label propagation did not converge within "
                f"{MAX_CC_ITERATIONS} rounds — component diameter exceeds "
                f"2^{MAX_CC_ITERATIONS}; raise MAX_CC_ITERATIONS"
            )
    finally:
        edges.unpersist()
    # the final checkpointed labels ARE the result data (no lineage) — they
    # stay pinned until the caller consumes the result and releases caches
    track(labels)
    return labels.select(
        "doc_id", F.col("cluster_id").cast("long").alias("cluster_id")
    )


# ---------------------------------------------------------------------------
# ngram_containment: asymmetric near-dup — "A is (mostly) contained in B"
# ---------------------------------------------------------------------------

#: containment threshold C(A→B) = |g(A) ∩ g(B)| / |g(A)| >= 9/10.
NC_THRESHOLD_NUM = 9
NC_THRESHOLD_DEN = 10

#: containee-side prefix: if C >= t then A shares >= ceil(t·|A|) grams with
#: B, so any |A| - ceil(t·|A|) + 1 grams of A (by the global (dfreq, g)
#: order) must hit B — same prefix-filter principle as ngram_jaccard, but
#: only the CONTAINEE side can be prefix-pruned (a container may hold A's
#: grams anywhere in its set, so the container side keeps all capped grams).
_NC_PREFIX = (
    f"sz - (({NC_THRESHOLD_NUM} * sz + {NC_THRESHOLD_DEN - 1})"
    f" DIV {NC_THRESHOLD_DEN}) + 1"
)
_NC_PREFIX_SQL = (
    f"sz - (({NC_THRESHOLD_NUM} * sz + {NC_THRESHOLD_DEN - 1})"
    f" // {NC_THRESHOLD_DEN}) + 1"
)

def build_ngram_containment_oracle(
    max_df: int = NJ_MAX_DF, bucket_cap: int = NJ_BUCKET_CAP
) -> str:
    """DuckDB oracle for ``ngram_containment_pairs`` with explicit caps
    (registry uses the defaults; tests/test_fuzz_dedup.py pairs random
    caps with random corpora — same rationale as
    build_ngram_jaccard_oracle)."""
    return f"""
{_SQL_NGRAM_CTES},
kept AS (SELECT x.doc_id, x.sz, x.g, df.dfreq
         FROM x JOIN df USING (g) WHERE df.dfreq <= {max_df}),
fullb AS (SELECT doc_id, sz, g,
                 count(*) OVER (PARTITION BY g) AS bsz,
                 row_number() OVER (PARTITION BY g
                                    ORDER BY {_DOC_ORD_SQL}, doc_id) AS brn
          FROM kept),
fullg AS (SELECT doc_id, sz, g FROM fullb
          WHERE bsz >= 2 AND brn <= {bucket_cap}),
ranked AS (SELECT doc_id, sz, g,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY dfreq, g) AS rn
           FROM kept),
pref AS (SELECT doc_id, sz, g FROM ranked WHERE rn <= {_NC_PREFIX_SQL}),
cand AS (SELECT DISTINCT a.doc_id AS doc_small, b.doc_id AS doc_big
         FROM pref a JOIN fullg b ON a.g = b.g
         WHERE (a.sz < b.sz OR (a.sz = b.sz AND a.doc_id < b.doc_id))
           AND b.sz * {NC_THRESHOLD_DEN} >= a.sz * {NC_THRESHOLD_NUM}),
verified AS (
    SELECT doc_small, doc_big,
           len(list_intersect(na.ngh, nb.ngh)) AS inter, na.ngh, nb.ngh
    FROM cand
    JOIN ng na ON na.doc_id = doc_small
    JOIN ng nb ON nb.doc_id = doc_big
)
SELECT doc_small, doc_big,
       {sql_rn('inter * 1.0 / len(ngh)', 4)} AS containment
FROM verified
WHERE inter * {NC_THRESHOLD_DEN} >= len(ngh) * {NC_THRESHOLD_NUM}
"""


NGRAM_CONTAINMENT_ORACLE = build_ngram_containment_oracle()


@register("ngram_containment", NGRAM_CONTAINMENT_ORACLE, tags=("dedup",))
def ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup: documents whose trigram set is >= 90%
    CONTAINED in a (larger) document's set — the quote/subset relation
    Jaccard misses (a page embedded in a 10× digest has J ≈ 0.1 but
    C ≈ 1.0; dedup pipelines drop or down-weight such containees).

    Same exact-within-declared-caps contract as ngram_jaccard (df cap +
    hash-sampled [2, cap] buckets, mirrored in the oracle), but the
    prefix filter is
    one-sided: only the containee can be prefix-pruned (its grams must
    ALL hit the container, so missing any prefix gram refutes C >= t),
    while the container side keeps all capped grams.  The direction and
    the length filter |B| >= t·|A| ride the bucket join; verification is
    the exact set intersection, normalized by the CONTAINEE size, with
    the (dfreq, g)-ordered prefix identical in both engines.

    At 100 TB: the container-side relation is the full capped gram
    explode — bounded per gram by the bucket cap, so worst-case join
    work is O(|grams| × cap), the same envelope the Jaccard join has.
    """
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return ngram_containment_pairs(docs)


def ngram_containment_pairs(
    docs: DataFrame,
    max_df: int = NJ_MAX_DF,
    bucket_cap: int = NJ_BUCKET_CAP,
) -> DataFrame:
    """Containment pairs over an arbitrary (doc_id, text) relation —
    exposed so tests can plant contained/quoting corpora and fuzz the
    caps."""
    from ..functions.rounding import rn

    ng = _ngram_sets(docs)
    x = ng.select("doc_id", F.size("ngh").alias("sz"), F.explode("ngh").alias("g"))
    dfreq = x.groupBy("g").agg(F.count("*").alias("dfreq"))
    # no broadcast hint: dfreq is unbounded (Heaps' law) — AQE picks the
    # strategy at runtime; see _prefix_candidates for the full rationale.
    kept = x.join(dfreq, "g").filter(F.col("dfreq") <= max_df)
    # hash-ordered bucket sampling (not whole-bucket drop) — same graceful
    # recall contract as _prefix_candidates, mirrored in the oracle.
    bucket_w = Window.partitionBy("g")
    order_w = Window.partitionBy("g").orderBy(F.expr(_DOC_ORD), "doc_id")
    fullg = tracked_persist(
        kept.select("doc_id", "sz", "g")
        .withColumn("bsz", F.count("*").over(bucket_w))
        .withColumn("brn", F.row_number().over(order_w))
        .filter((F.col("bsz") >= 2) & (F.col("brn") <= bucket_cap))
        .select("doc_id", "sz", "g")
    )
    pref = (
        kept.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("dfreq", "g")),
        )
        .filter(F.expr(f"rn <= {_NC_PREFIX}"))
        .select("doc_id", "sz", "g")
    )
    cand = (
        pref.alias("a")
        .join(
            fullg.alias("b"),
            (F.col("a.g") == F.col("b.g"))
            & (
                (F.col("a.sz") < F.col("b.sz"))
                | (
                    (F.col("a.sz") == F.col("b.sz"))
                    & (F.col("a.doc_id") < F.col("b.doc_id"))
                )
            )
            & (
                F.col("b.sz") * NC_THRESHOLD_DEN
                >= F.col("a.sz") * NC_THRESHOLD_NUM
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_small"),
            F.col("b.doc_id").alias("doc_big"),
        )
        .distinct()
    )
    na = ng.select(F.col("doc_id").alias("doc_small"), F.col("ngh").alias("na"))
    nb = ng.select(F.col("doc_id").alias("doc_big"), F.col("ngh").alias("nb"))
    inter = F.size(F.array_intersect(F.col("na"), F.col("nb")))
    return (
        cand.join(na, "doc_small")
        .join(nb, "doc_big")
        .select(
            "doc_small",
            "doc_big",
            inter.alias("inter"),
            F.size("na").alias("sza"),
        )
        .filter(F.col("inter") * NC_THRESHOLD_DEN >= F.col("sza") * NC_THRESHOLD_NUM)
        .select(
            "doc_small",
            "doc_big",
            rn(F.col("inter") / F.col("sza"), 4).alias("containment"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_report: cluster-size histogram — the dedup run's observability
# ---------------------------------------------------------------------------

_SIZE_BUCKET_SQL = """CASE WHEN s = 2 THEN '2'
     WHEN s = 3 THEN '3'
     WHEN s = 4 THEN '4'
     WHEN s <= 8 THEN '5-8'
     WHEN s <= 16 THEN '9-16'
     ELSE '17+' END"""


def _build_report_oracle() -> str:
    ctes, final_select = _clusters_cte_parts()
    return f"""
WITH RECURSIVE {ctes},
clusters AS ({final_select}),
sizes AS (SELECT cluster_id, count(*) AS s FROM clusters GROUP BY cluster_id)
SELECT {_SIZE_BUCKET_SQL} AS size_bucket,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(s) AS BIGINT) AS n_docs,
       CAST(sum(s) - count(*) AS BIGINT) AS n_losers
FROM sizes
GROUP BY 1
"""


@register("dedup_report", _build_report_oracle(), tags=("dedup",))
def dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size histogram: how much of the corpus is
    duplicate mass, and in what cluster shapes.

    The report every dedup run ships with — a few huge clusters mean
    boilerplate/templates (fix extraction upstream), many pairs mean
    true near-dups (dedup is working).  Composes the registered
    dedup_clusters relation (so the report can never disagree with the
    clustering) and reduces it to an O(clusters) size table, then a
    ≤6-row bucket histogram — after the CC iterations everything here
    is a rounding error in cost.
    """
    clusters = dedup_clusters(spark, sf_dir)
    sizes = clusters.groupBy("cluster_id").agg(F.count("*").alias("s"))
    return (
        sizes.select(F.expr(_SIZE_BUCKET_SQL).alias("size_bucket"), "s")
        .groupBy("size_bucket")
        .agg(
            F.count("*").alias("n_clusters"),
            F.sum("s").alias("n_docs"),
            (F.sum("s") - F.count("*")).alias("n_losers"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_weights: SOFT dedup — downweight duplicates instead of dropping them
# ---------------------------------------------------------------------------

def _build_weights_oracle() -> str:
    ctes, final_select = _clusters_cte_parts()
    return f"""
WITH RECURSIVE {ctes},
clusters AS ({final_select}),
sizes AS (SELECT cluster_id, count(*) AS s FROM clusters GROUP BY cluster_id),
w AS (SELECT d.doc_id,
             coalesce(c.cluster_id, d.doc_id) AS cluster_id,
             coalesce(s.s, 1) AS s
      FROM documents d
      LEFT JOIN clusters c ON c.doc_id = d.doc_id
      LEFT JOIN sizes s ON s.cluster_id = c.cluster_id)
SELECT doc_id, cluster_id, CAST(s AS BIGINT) AS cluster_size,
       {sql_rn('CAST(1 AS DOUBLE) / s', 6)} AS weight
FROM w
"""


@register("dedup_weights", _build_weights_oracle(), tags=("dedup",))
def dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT dedup: per-document sampling weight 1/|cluster| instead of
    hard removal — every near-dup GROUP contributes exactly unit mass to
    training, so no content is lost but boilerplate stops dominating the
    token distribution (the down-weighting alternative pipelines use when
    duplicates carry legitimate signal, e.g. popular quotations; feeds
    straight into ``weighted_sample``/``mixture_apply``).

    Composes the registered cluster relation (weights can never disagree
    with the clustering) plus its O(clusters) size table; singletons —
    docs in no near-dup pair — get cluster_id = doc_id and weight 1.
    Plan shape: the CC iterations dominate; the weighting itself is two
    doc-keyed left joins against cluster-bounded relations (AQE picks
    broadcast whenever dup mass is small, the common case).
    """
    from ..functions.rounding import rn

    clusters = dedup_clusters(spark, sf_dir)
    sizes = clusters.groupBy("cluster_id").agg(F.count("*").alias("s"))
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    w = (
        docs.join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        )
        .join(sizes, "cluster_id", "left")
        .select(
            "doc_id",
            "cluster_id",
            F.coalesce("s", F.lit(1)).cast("long").alias("cluster_size"),
            rn(
                F.lit(1.0) / F.coalesce("s", F.lit(1)).cast("double"), 6
            ).alias("weight"),
        )
    )
    return w
