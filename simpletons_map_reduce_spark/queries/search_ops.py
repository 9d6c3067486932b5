"""Full-text retrieval over ``documents`` — LLM-pipeline tier C.

The reference's inverted index (mrapps/indexer.go — B3/B4) stops at
term → [documents]; this module completes the retrieval path a data
pipeline actually runs on top of that index: BM25-ranked search, the
standard bag-of-words relevance model (Robertson & Spärck Jones;
the BM25 constants follow the Okapi defaults k1=1.2, b=0.75).

Scale shape (100 TB):

- The corpus is scanned EXACTLY ONCE: a single map-side-combined
  aggregate over the exploded tokens produces the per-doc stat relation
  (doc length + one conditional tf column per query term), which is
  persisted at O(docs) rows.  avgdl/N, the per-term document
  frequencies, and the scoring all read that persisted relation — no
  second corpus pass, no second corpus shuffle.
- df / N / avgdl are O(|terms|) and O(1) aggregates — broadcast back;
  the unpivoted postings (``stack``) stay co-partitioned by doc_id, so
  the final per-doc score aggregate reuses the same partitioning.
- Top-k plans TakeOrderedAndProject (per-partition heap + driver merge
  of k rows), not a global sort.

Cross-engine determinism: the per-term BM25 contribution is pure IEEE
double arithmetic on integer-derived inputs (tf, dl, df, N are counts;
avgdl divides two exact integers), identical on both engines; log2 has
bit parity on this container (same contract as lm_ops.unigram_logprob).
The per-doc SUM of contributions uses the order-exact integer-unit sum
(functions/rounding.py::rsum) and the top-k boundary orders on the
ROUNDED score, so neither partial-aggregation order nor a last-ulp tie
can move a document across the k-th rank (same trick as
shipping_priority).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import tracked_persist
from ..functions.rounding import rsum, sql_rsum
from ..functions.text import sql_tokens, tokens_lower
from ..sources.tables import load_table
from .registry import register

#: the fixed keyword query (mid-frequency terms of the synthetic corpus).
QUERY_TERMS = ("spark", "merge", "vector")

# The terms are interpolated raw into both the oracle SQL and the Spark
# ``stack()`` expression (and become column names ``tf_<t>``) — a quote,
# space, or non-identifier character would break both engines silently at
# registration time, so reject it loudly at import (ADVICE r3).
for _t in QUERY_TERMS:
    if not re.fullmatch(r"[a-z]+", _t):
        raise ValueError(
            f"QUERY_TERMS must match [a-z]+ (raw SQL/identifier "
            f"interpolation): {_t!r}"
        )
#: Okapi BM25 defaults.
BM25_K1 = 1.2
BM25_B = 0.75
#: result size.
SEARCH_K = 20

_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)

# Per-(doc, term) BM25 contribution, shared verbatim by both engines:
#   idf(t)  = log2(1 + (N - df + 0.5) / (df + 0.5))
#   w(t, d) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
_CONTRIB_SQL = (
    f"log2(1 + (n_docs - df + 0.5) / (df + 0.5))"
    f" * tf * ({BM25_K1} + 1.0)"
    f" / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl))"
)

def build_bm25_search_oracle(doc_where: str = "", text_expr: str = "text") -> str:
    """The BM25 top-k oracle, optionally over a filtered corpus
    (``bm25_search_deleted`` models tombstoned documents by excluding
    them BEFORE every statistic — dl, avgdl, N, df — exactly the
    population the delete-maintained artifact serves) and/or an EDITED
    corpus (``bm25_search_upserted`` models upserted documents by
    tokenizing ``text_expr`` — a CASE over the edited slice — so every
    statistic reflects the replacement text)."""
    where = f"WHERE {doc_where}" if doc_where else ""
    return f"""
WITH e AS (SELECT doc_id, unnest({sql_tokens(text_expr, lower=True)}) AS tok
           FROM documents {where}),
dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM e GROUP BY doc_id),
stats AS (SELECT avg(dl) AS avgdl, CAST(count(*) AS DOUBLE) AS n_docs FROM dl),
hits AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
         FROM e WHERE tok IN ({_TERMS_SQL}) GROUP BY doc_id, tok),
df AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM hits GROUP BY tok)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_terms,
       {sql_rsum(_CONTRIB_SQL, 4, 6)} AS score
FROM hits JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats
GROUP BY doc_id
ORDER BY score DESC, doc_id
LIMIT {SEARCH_K}
"""


BM25_SEARCH_ORACLE = build_bm25_search_oracle()


@register("bm25_search", BM25_SEARCH_ORACLE, tags=("search", "text"))
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-ranked top-k document retrieval for a fixed keyword query.

    One corpus pass builds the persisted per-doc stat relation (dl +
    conditional tf per term — the plan's only corpus-wide shuffle);
    df/avgdl/N broadcast back as O(|terms|)/O(1) relations, and the
    ranked cut is TakeOrderedAndProject on the rounded score.
    Generalizes the reference's inverted index (mrapps/indexer.go:16-40)
    from term lookup to relevance ranking.
    """
    docs = load_table(spark, sf_dir, "documents")
    e = docs.select("doc_id", F.explode(tokens_lower(F.col("text"))).alias("tok"))

    # ONE corpus pass: doc length + a conditional tf per query term, all in
    # a single map-side-combined aggregate.  The persisted result is the
    # O(docs) per-doc stat relation every downstream step reads — the
    # 100 TB corpus is scanned exactly once.
    per_doc = tracked_persist(
        e.groupBy("doc_id").agg(
            F.count("*").cast("double").alias("dl"),
            *[
                F.sum((F.col("tok") == t).cast("int")).cast("double").alias(f"tf_{t}")
                for t in QUERY_TERMS
            ],
        )
    )
    stats = per_doc.agg(
        F.avg("dl").alias("avgdl"), F.count("*").cast("double").alias("n_docs")
    )
    stack_expr = "stack({n}, {args}) AS (tok, tf)".format(
        n=len(QUERY_TERMS),
        args=", ".join(f"'{t}', tf_{t}" for t in QUERY_TERMS),
    )
    hits = per_doc.select("doc_id", "dl", F.expr(stack_expr)).filter(
        F.col("tf") > 0
    )
    df_t = hits.groupBy("tok").agg(F.count("*").cast("double").alias("df"))

    contrib = F.expr(_CONTRIB_SQL)
    return (
        hits.join(F.broadcast(df_t), "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            rsum(contrib, 4, 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(SEARCH_K)
    )


# ---------------------------------------------------------------------------
# hybrid_search: BM25 lexical recall + dense cosine rerank (RAG retrieval)
# ---------------------------------------------------------------------------

#: rerank cut (top-k of the BM25 candidate set).
HYBRID_K = 10
#: the dense query: the designated query vector vec_id 0 (FIXTURES.md
#: reserves vec_id < 10 as query vectors; documents and embeddings share
#: the id space — doc_id ≙ vec_id).
HYBRID_QUERY_VEC = 0


def _build_hybrid_oracle() -> str:
    """Composes BM25_SEARCH_ORACLE verbatim as the candidate CTE (the
    lexical stage and the rerank can never disagree on the candidate
    set) + the shared cosine/rounding macros for the dense stage."""
    from ..functions.rounding import sql_rn
    from ..functions.vectors import sql_cosine

    return f"""
WITH bm AS ({BM25_SEARCH_ORACLE}),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
      WHERE vec_id = {HYBRID_QUERY_VEC}),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
    SELECT bm.doc_id, bm.score AS bm25_score,
           {sql_rn(sql_cosine('e.v', 'q.qv'), 6)} AS cos_sim
    FROM bm JOIN e ON e.vec_id = bm.doc_id CROSS JOIN q
)
SELECT * FROM (
    SELECT doc_id, bm25_score, cos_sim,
           CAST(row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS BIGINT)
             AS rk
    FROM scored
) WHERE rk <= {HYBRID_K}
"""


HYBRID_SEARCH_ORACLE = _build_hybrid_oracle()


@register("hybrid_search", HYBRID_SEARCH_ORACLE, tags=("search", "similarity"))
def hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-k lexical candidates re-ranked by dense
    cosine similarity — the standard two-stage RAG retrieval shape
    (lexical recall, semantic precision).

    Stage 1 is the registered ``bm25_search`` relation verbatim (one
    corpus scan, SEARCH_K candidates); stage 2 joins the candidates to
    their embeddings on the shared id space and re-ranks by 6-dp-rounded
    cosine against the designated query vector.  Both stages are exact
    and deterministic, so the whole pipeline sits under the value-hash
    gate — the oracle composes BM25's own CTE, making candidate-set
    drift between the engines impossible by construction.

    Scale shape at 100 TB: the lexical stage is the only corpus-wide
    work (already single-scan, see bm25_search); the rerank touches
    SEARCH_K rows — the candidate relation broadcasts into the embedding
    scan (one pushed-down pass, no shuffle), the cosine is the JVM fold,
    and the final window orders SEARCH_K rows in one partition.  Swap
    the brute candidate join for the IVF index artifact
    (operators/ann_index.py) when the dense stage must itself search —
    here it only scores named candidates.
    """
    bm = bm25_search(spark, sf_dir).select(
        "doc_id", F.col("score").alias("bm25_score")
    )
    return _dense_rerank(spark, sf_dir, bm)


def _dense_rerank(spark: SparkSession, sf_dir: str, bm: DataFrame) -> DataFrame:
    """Stage 2 shared by hybrid_search / hybrid_search_indexed: cosine
    re-rank of a (doc_id, bm25_score) candidate relation against the
    designated query vector."""
    from pyspark.sql import Window

    from ..functions.rounding import rn
    from ..functions.vectors import cosine_from_parts, dot
    from .similarity_ops import _emb_with_norm

    emb = _emb_with_norm(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == HYBRID_QUERY_VEC).select(
        F.col("v").alias("qv"), F.col("nv").alias("nq")
    )
    cand = (
        bm.join(
            emb.select(
                F.col("vec_id").alias("doc_id"), "v", "nv"
            ),
            "doc_id",
        )
        .crossJoin(F.broadcast(q))
        .select(
            "doc_id",
            "bm25_score",
            rn(
                cosine_from_parts(
                    dot(F.col("v"), F.col("qv")), F.col("nv"), F.col("nq")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.orderBy(F.col("cos_sim").desc(), "doc_id")
    return (
        cand.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= HYBRID_K)
    )


@register("bm25_search_indexed", BM25_SEARCH_ORACLE, tags=("search", "text"))
def bm25_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bm25_search served off the persisted postings index — identical
    output (and the SAME DuckDB oracle), zero corpus scans at query time.

    The probe's ``tok IN (...)`` predicate is PUSHED into the postings
    parquet scan (pinned in tests/test_bm25_index.py): the build sorted
    postings by term, so row-group min/max stats prune everything but the
    queried terms' blocks — the plan reads O(df) postings rows, not
    O(corpus tokens).  idf comes from the broadcast term-stats relation;
    length normalization joins the doc-keyed length relation only for
    the hit docs; the corpus constants (N, avgdl) inline from the meta
    row as literals.  Scoring and the top-k cut are shared verbatim with
    the inline operator (order-exact integer-unit sum, rank on the
    rounded score), so the two paths cannot diverge.
    """
    from ..operators.bm25_index import bm25_index_for

    return _bm25_index_probe(*bm25_index_for(spark, sf_dir))


def _bm25_index_probe(
    postings: DataFrame,
    dl: DataFrame,
    termstats: DataFrame,
    n_docs: float,
    avgdl: float,
) -> DataFrame:
    """The artifact-served BM25 probe plan, shared by the full-build and
    appended index paths so the scoring arithmetic cannot drift."""
    hits = postings.filter(F.col("tok").isin(*QUERY_TERMS)).select(
        "tok", "doc_id", F.col("tf").cast("double").alias("tf")
    )
    df_t = termstats.filter(F.col("tok").isin(*QUERY_TERMS)).select(
        "tok", F.col("df").cast("double").alias("df")
    )
    contrib = F.expr(_CONTRIB_SQL)
    return (
        hits.join(F.broadcast(df_t), "tok")
        .join(dl.select("doc_id", F.col("dl").cast("double").alias("dl")),
              "doc_id")
        .withColumn("n_docs", F.lit(n_docs))
        .withColumn("avgdl", F.lit(avgdl))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            rsum(contrib, 4, 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(SEARCH_K)
    )


@register("bm25_search_appended", BM25_SEARCH_ORACLE, tags=("search", "text"))
def bm25_search_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bm25_search served off an index that ABSORBED the last ~10% of the
    corpus via ``append_bm25_batch`` (round-10 incremental maintenance)
    instead of a rebuild: batch postings/doclen land as segments, term
    dfs merge at vocabulary grain, and the scoring constants re-derive
    from the segmented doclen — per-batch cost O(|batch| + vocab), never
    a corpus re-tokenize.  Append ≡ rebuild exactly (pytest-pinned), so
    this shares ``bm25_search``'s oracle: the driver hash gate verifies
    the merged df counts, the re-derived N/avgdl, and the segment-union
    read — the entire append path — against DuckDB on the full corpus.
    """
    from ..operators.bm25_index import appended_bm25_index_for

    return _bm25_index_probe(*appended_bm25_index_for(spark, sf_dir))


def _deleted_oracle() -> str:
    from ..operators.index_maintenance import DELETE_MOD, DELETE_RESIDUE

    return build_bm25_search_oracle(
        doc_where=f"doc_id % {DELETE_MOD} <> {DELETE_RESIDUE}"
    )


@register("bm25_search_deleted", _deleted_oracle(), tags=("search", "text"))
def bm25_search_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bm25_search served off an index with OUTSTANDING tombstones
    (round-11 delete maintenance): the artifact was built over the full
    corpus, then ``delete_from_index`` tombstoned the ``doc_id % 17 ==
    3`` slice — no compaction, so this probes the live tombstone path:
    postings/doclen broadcast-anti-joined against the tombstone relation
    at load, per-term dfs decremented exactly from the dying docs' own
    postings rows, N/avgdl re-derived over the survivors.  The oracle is
    bm25_search's SQL over the filtered corpus, so the driver hash gate
    verifies the delete arithmetic end-to-end — one wrong df decrement
    or a stale avgdl moves a score and breaks the hash.  This is the
    GDPR-shaped operation a 100 TB corpus cannot answer with a rebuild.
    """
    from ..operators.bm25_index import deleted_bm25_index_for

    return _bm25_index_probe(*deleted_bm25_index_for(spark, sf_dir))


def _upserted_oracle() -> str:
    from ..operators.index_maintenance import upsert_case_sql

    return build_bm25_search_oracle(text_expr=upsert_case_sql())


@register("bm25_search_upserted", _upserted_oracle(), tags=("search", "text"))
def bm25_search_upserted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bm25_search served off an index whose ``doc_id % 17 == 3`` slice
    was REPLACED in place by ``upsert_into_index`` (round 12): the old
    rows die under born_seg-versioned supersession tombstones, the
    edited text lands as a new segment, dfs decrement-then-increment
    exactly, and N/avgdl re-derive — all in O(|slice|), with NO
    compaction and NO rebuild.  This is the edit path a live 100 TB
    corpus actually needs (fix one document, serve the correction
    immediately); before round 12 it cost a full-generation compaction.
    The oracle is bm25_search's SQL over the EDITED corpus text, so the
    driver hash gate verifies the supersession arithmetic end-to-end:
    a resurrected old posting, a missed df step, or a stale avgdl moves
    a score and breaks the hash.
    """
    from ..operators.bm25_index import upserted_bm25_index_for

    return _bm25_index_probe(*upserted_bm25_index_for(spark, sf_dir))


@register(
    "hybrid_search_indexed", HYBRID_SEARCH_ORACLE, tags=("search", "similarity")
)
def hybrid_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hybrid_search with the lexical stage served off the BM25 postings
    artifact — the full two-stage retrieval with ZERO corpus text scans
    at query time (the rerank still reads only the candidates' embedding
    rows).  Same oracle and identical output as ``hybrid_search``: the
    candidate stage is ``bm25_search_indexed`` (output-identical to
    ``bm25_search`` under its own gate), and stage 2 is shared verbatim.
    This is the deployed RAG shape: both stages probe ingest-time
    artifacts; nothing re-derives corpus state per query.
    """
    bm = bm25_search_indexed(spark, sf_dir).select(
        "doc_id", F.col("score").alias("bm25_score")
    )
    return _dense_rerank(spark, sf_dir, bm)
