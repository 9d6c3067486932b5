"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in ``simpletons_map_reduce_spark.queries`` — each module
registers callables plus the equivalent DuckDB SQL in one place so the two
sides can never drift apart silently.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from simpletons_map_reduce_spark.queries import REGISTRY

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Word count is the reference's own flagship application
    (mrapps/wc.go) — tokenize, shuffle on word, count.
    """
    return REGISTRY["wordcount"].fn(spark, SF0001)


# Priority order for the driver's correctness window.  The driver checks
# queries in dict insertion order and truncates at entry 50, so the window
# ROTATES each round to extend cumulative driver evidence: rounds 1-10
# covered all 183 then-registered queries (see CORRECTNESS_r*.json), and
# after round 10 no query's latest driver row predates round 4.
# Round 11's window (VERDICT r10 item 7) leads with the three new
# maintenance-lifecycle ops (first-time evidence outranks re-checks; two
# of them hash-gate the round's delete/compaction arithmetic), keeps the
# three long-lived sentinels, then re-tours the full 39-query r7 cohort
# (the oldest remaining evidence: text/LM battery, dedup family, inline
# similarity, sampling, sketches, search) and spends the last five slots
# on the re-parameterized contamination ops (their outputs CHANGED this
# round — bounded-suite benchmark, VERDICT r10 item 4) plus the oldest
# r8 items.  Every query off the window stays exact-oracle-checked by
# tools/check_oracle.py --all and by pytest on every run.
_PRIORITY = [
    # round-11 new ops: index delete + compaction (tombstone arithmetic
    # and the generation swap hash-gated via filtered shared oracles;
    # the LSH/PQ lifecycles rows-only with the arithmetic pytest-pinned)
    "dedup_incremental_maintained", "bm25_search_deleted",
    "ann_ivf_maintained", "ann_lsh_maintained", "ann_pq_maintained",
    # sentinels: framework core + flagship LSH dedup
    "wordcount", "mr_wordcount", "near_dedup",
    # freshness tour: the full r7 cohort (oldest remaining evidence)
    "per_file_count", "file_stats", "text_stats", "ngram_counts",
    "tfidf_topterms", "token_count", "lang_id", "quality_score",
    "doc_fingerprint", "repetition_stats", "pii_redact",
    "quality_calibrate", "exact_dedup", "dedup_incremental",
    "ngram_jaccard", "simhash", "dedup_apply", "dedup_clusters",
    "ngram_containment", "dedup_report", "similarity_topk",
    "embedding_dedup", "ann_recall_report", "embedding_dedup_ann",
    "semantic_prune", "corpus_filter", "contamination_check",
    "pipeline_funnel", "stratified_sample", "weighted_sample",
    "cms_heavy_hitters", "bloom_probe", "pack_sequences",
    "unigram_logprob", "vocab_coverage", "zipf_fit", "token_fertility",
    "bm25_search", "zorder_layout",
    # re-parameterized contamination twins (outputs changed this round)
    # + the oldest r8 item (two r8 fill slots ceded to the LSH/PQ
    # maintained lifecycles — first-time driver evidence outranks a
    # re-check; substring_dedup[_apply] stay covered by check_oracle
    # and their r8 driver rows)
    "contamination_13gram", "contamination_apply", "stream_parity_report",
    # past the 50-slot window (kept for stable ordering of the tail):
    # the round-10 cohort re-checked last round + the next r8 items
    "substring_dedup", "substring_dedup_apply",
    "dedup_incremental_appended", "bm25_search_appended",
    "ann_ivf_appended", "ann_lsh_appended", "ann_pq_appended",
    "table_profile_approx", "histogram_equi_depth_approx",
]


def _ordered_names() -> list[str]:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    assert not missing, f"priority list names unknown queries: {missing}"
    tail = [n for n in REGISTRY if n not in set(_PRIORITY)]
    return _PRIORITY + tail


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; ops without an entry (approximate
    algorithms) accept the driver's weaker rows-only check."""
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
