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
    # round-12 new ops: the O(|batch|) upsert path (supersession
    # tombstones, hash-gated against EDITED-corpus oracles) and the
    # maintained-ANN recall report (the r11 rows-only lifecycles now
    # hash-gated through pinned recall floors)
    "bm25_search_upserted", "dedup_incremental_upserted",
    "ann_maintained_recall_report", "ann_retrain_report",
    "ann_upserted_recall_report",
    # sentinels: framework core + flagship LSH dedup
    "wordcount", "mr_wordcount", "near_dedup",
    # freshness tour: the r8 cohort (oldest remaining driver evidence —
    # 42 of its 45 stale entries; volume_shipping, waiting_orders, and
    # substring_dedup_apply lead the tail for round 13, their families
    # covered here by the order-shape cohort / substring_dedup)
    "basket_pairs", "big_orders", "bpe_encode", "bpe_merges",
    "char_entropy", "churned_customers", "cohort_retention",
    "corpus_balance", "cumulative_users", "customer_distribution",
    "disjunctive_filter", "doc_chunks", "event_transitions",
    "exists_orders", "frame_sample", "funnel_analysis", "hll_rollup",
    "knn_classify", "knn_classify_ann", "market_share",
    "min_cost_supplier", "mixture_apply", "mixture_weights",
    "moving_revenue", "nation_pagerank", "overstocked_suppliers",
    "perplexity_buckets", "pipeline_funnel_fused", "priority_pivot",
    "product_profit", "props_extract", "returned_items", "sample_hash",
    "scalar_avg_filter", "simhash_pairs", "span_dedup", "substring_dedup",
    "supplier_classes", "top_supplier", "top_value_parts",
    "triangle_count", "user_trend",
    # past the 50-slot window (stable tail ordering): the r8 leftovers,
    # then the r9 cohort — next rotation's tour
    "volume_shipping", "waiting_orders", "substring_dedup_apply",
    "ann_ivf_indexed", "ann_lsh_indexed", "ann_pq_indexed",
    "approx_distinct", "approx_quantiles", "asof_join",
    "bm25_search_indexed", "click_attribution", "customer_deciles",
    "dedup_incremental_indexed", "dedup_weights", "dsir_select",
    "dsir_weights", "embedding_dedup_ann_indexed", "embedding_stats",
    "event_pivot", "events_hopping", "events_sessionize",
    "events_tumbling", "gap_fill", "histogram_equi_depth",
    "hybrid_search", "hybrid_search_indexed", "key_skew_profile",
    "knn_classify_ann_indexed", "latest_events", "near_dedup_indexed",
    "peak_concurrency", "pricing_summary", "range_join",
    "region_revenue", "repetition_signals", "rolling_active_users",
    "stats_moments", "stream_parity_chained", "stream_parity_extended",
    "stream_parity_stateful", "substring_dedup_keep_one", "table_checks",
    "table_profile", "time_rollup", "topk_orders", "value_histogram",
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
