"""End-to-end training-corpus materialization — what the pipeline is FOR.

A real LLM-data pipeline doesn't stop at per-document metrics: it writes
out the corpus that survives language ID, quality scoring, token-length
bounds and deduplication.  ``corpus_filter`` composes the registered
per-doc operators (lang_id, quality_score, token_count, exact_dedup)
into exactly that materializer, and its oracle nests the SAME per-op SQL
the driver already validates, so the composition can never drift from
its parts.

Plan shape: quality/token metrics are per-row projections, lang and
dedup-winner are aggregates; everything re-joins on doc_id (the natural
partition key at 100 TB — AQE picks broadcast vs shuffle per side).  No
Python UDFs anywhere.

Reference analog: none — the reference stops at wordcount-style apps
(mrapps/), which is precisely the gap SURVEY §2.D mandates closing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .dedup_ops import EXACT_DEDUP_ORACLE, exact_dedup
from .registry import register
from .text_ops import (
    LANG_ID_ORACLE,
    QUALITY_SCORE_ORACLE,
    TOKEN_COUNT_ORACLE,
    lang_id,
    quality_score,
    token_count,
)

#: Survival thresholds.  quality compares on the 4-dp-rounded score both
#: engines emit, so the boundary is cross-engine exact.
MIN_QUALITY = 0.5
MIN_TOKENS = 10
MAX_TOKENS = 100_000

CORPUS_FILTER_ORACLE = f"""
WITH q AS ({QUALITY_SCORE_ORACLE}),
l AS ({LANG_ID_ORACLE}),
tc AS ({TOKEN_COUNT_ORACLE}),
w AS (SELECT keep_doc_id FROM ({EXACT_DEDUP_ORACLE}))
SELECT d.doc_id, d.source, l.pred_lang, tc.n_tokens, q.quality
FROM documents d
JOIN w ON w.keep_doc_id = d.doc_id
JOIN q ON q.doc_id = d.doc_id
JOIN l ON l.doc_id = d.doc_id
JOIN tc ON tc.doc_id = d.doc_id
WHERE q.quality >= {MIN_QUALITY}
  AND l.pred_lang <> 'und'
  AND tc.n_tokens BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}
"""


@register("corpus_filter", CORPUS_FILTER_ORACLE, tags=("pipeline",))
def corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the training-ready corpus: exact-dedup winners that
    pass language, quality, and token-length gates."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    winners = exact_dedup(spark, sf_dir).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    q = quality_score(spark, sf_dir).select("doc_id", "quality")
    lang = lang_id(spark, sf_dir)
    tok = token_count(spark, sf_dir).select("doc_id", "n_tokens")
    return (
        docs.join(winners, "doc_id")
        .join(q, "doc_id")
        .join(lang, "doc_id")
        .join(tok, "doc_id")
        .filter(
            (F.col("quality") >= MIN_QUALITY)
            & (F.col("pred_lang") != "und")
            & F.col("n_tokens").between(MIN_TOKENS, MAX_TOKENS)
        )
        .select("doc_id", "source", "pred_lang", "n_tokens", "quality")
    )
