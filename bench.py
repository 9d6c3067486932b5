"""Benchmark harness — one JSON line per run (driver contract).

Runs EVERY registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
{"metric": ..., "value": headline_total_sec, "unit": "sec",
 "queries": {...all queries...}, "full_total": ..., "sf": ...}.
``value`` stays the headline-set total so rounds compare like-for-like;
``queries`` carries per-query times for the whole registry (superlinear
candidate-pair ops included — sf0.01 can't expose those).

Each query is forced through the noop sink (computes every output column,
unlike count() which lets Catalyst prune the plan), timed after a session
warm-up query so JVM/codegen startup isn't billed to the first entry.

Set SPARK_GRAFT_BENCH_SET=headline to restrict to the headline set (used
for the big-SF run driven by tools/make_bigdata.py — see SCALE.md).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from simpletons_map_reduce_spark.caching import release_persisted  # noqa: E402
from simpletons_map_reduce_spark.queries import REGISTRY  # noqa: E402
from simpletons_map_reduce_spark.session import get_session  # noqa: E402

#: Headline set: one per operator family (scan, agg, star join, window,
#: sessionization, dedup exact/near/set-similarity, temporal joins, text,
#: tf-idf, similarity).
HEADLINE = [
    "wordcount",
    "pricing_summary",
    "region_revenue",
    "window_rank",
    "events_sessionize",
    "exact_dedup",
    "near_dedup",
    "ngram_jaccard",
    "asof_join",
    "range_join",
    "tfidf_topterms",
    "similarity_topk",
    "token_count",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("bench")
    sf_match = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(sf_match.group(1)) if sf_match else None

    # warm-up: session + codegen + parquet footer caches
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    if os.environ.get("SPARK_GRAFT_BENCH_SET") == "headline":
        names = list(HEADLINE)
    else:
        # headline first (their timings are the round-over-round metric),
        # then the rest of the registry alphabetically
        names = list(HEADLINE) + sorted(set(REGISTRY) - set(HEADLINE))

    timings: dict[str, float] = {}
    for name in names:
        q = REGISTRY[name]
        t0 = time.time()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        release_persisted()  # cache hygiene: blocks die with their query

    total = round(sum(timings[n] for n in HEADLINE if n in timings), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "full_total": round(sum(timings.values()), 3),
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
