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
# ROTATES each round to extend cumulative driver evidence: rounds 1-7
# covered 97/152 distinct queries (see CORRECTNESS_r0*.json); round 8's
# window covers the 44 highest-value never-driver-checked queries plus
# this round's new operators, keeping three long-lived sentinels
# (wordcount, mr_wordcount, near_dedup) as regression canaries.  The
# 11-query profiling battery rotates in next round; every query off the
# window stays exact-oracle-checked by tools/check_oracle.py --all and
# by pytest on every run.
_PRIORITY = [
    # sentinels: framework core + flagship LSH dedup
    "wordcount", "mr_wordcount", "near_dedup",
    # round-7 op (never windowed) + round-8 companions: the span-removal
    # apply and the streaming-surface parity gate
    "substring_dedup", "substring_dedup_apply", "stream_parity_report",
    # round-6 ops, never windowed
    "bpe_merges", "bpe_encode", "mixture_weights", "mixture_apply",
    "knn_classify", "perplexity_buckets", "hll_rollup",
    # round-8 ANN vote path (rows-only)
    "knn_classify_ann",
    # LM / text / pipeline tails never windowed
    "span_dedup", "char_entropy", "simhash_pairs", "pipeline_funnel_fused",
    "contamination_13gram",
    "sample_hash", "doc_chunks", "corpus_balance", "frame_sample",
    # TPC-H-shaped decision battery (decision.py)
    "exists_orders", "scalar_avg_filter", "big_orders", "priority_pivot",
    "churned_customers", "moving_revenue", "min_cost_supplier",
    "supplier_classes", "overstocked_suppliers", "disjunctive_filter",
    "waiting_orders",
    # TPC-H-shaped trade battery (trade.py)
    "volume_shipping", "market_share", "returned_items", "top_value_parts",
    "customer_distribution", "top_supplier", "product_profit",
    # behavior / events / graph tails (event_pivot rotates into round 9's
    # window with the profiling battery — exactly 50 entries here)
    "basket_pairs", "funnel_analysis", "cohort_retention", "cumulative_users",
    "user_trend", "event_transitions", "nation_pagerank", "triangle_count",
    "props_extract",
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
