"""Benchmark harness — short final JSON line (driver contract).

Runs EVERY registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].  The FINAL stdout line is
{"metric": "headline_queries_total", "value": headline_total_sec,
 "unit": "sec", "sf": ..., "full_total": ..., "sf1_value": ...};
per-query timings for the whole registry (superlinear candidate-pair ops
included — sf0.01 can't expose those) are printed as earlier
``queries_detail`` / ``sf1_detail`` JSON lines.
``value`` stays the headline-set total so rounds compare like-for-like.

Each query is forced through the noop sink (computes every output column,
unlike count() which lets Catalyst prune the plan), timed after a session
warm-up query so JVM/codegen startup isn't billed to the first entry.

Set SPARK_GRAFT_BENCH_SET=headline to restrict to the headline set (used
for the big-SF run driven by tools/make_bigdata.py — see SCALE.md).

When the primary run is the default sf0.1, a ``"sf1"`` detail line carries
the headline set at sf1 (fixtures built once into .benchdata/sf1 via
tools/make_bigdata.build — ~10× sf0.1, replica docs form planted near-dup
groups, a deliberate dedup stress).  Set SPARK_GRAFT_SF1=0 to skip the extra.

Output protocol (VERDICT r4 item 1 — two rounds of bench evidence were lost
to output truncation): the full per-query detail objects are printed as
EARLIER lines, and the LAST line is a SHORT (<200 byte) JSON object carrying
only the scalar metrics.  The driver keeps a bounded tail of stdout, so only
a short final line is truncation-proof; round 3's "everything on one line"
fix made the single line longer than the tail window and its head (with
``"metric"``/``"value"``) was cut off.
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
#: tf-idf, similarity; round 8 adds the rounds-5/7 families — tokenizer,
#: mixture sampling, layout, substring dedup — so their regressions are
#: visible round-over-round, VERDICT r6 item 6 / r7 item 6).
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
    "bpe_encode",
    "mixture_apply",
    "zorder_layout",
    "substring_dedup",
    # round 9: profiling-family slot (VERDICT r8 item 8) — the battery
    # rotates through the driver window this round; a HEADLINE seat keeps
    # its round-over-round trend alive after the window moves on.
    "table_profile",
    # round 9: data-selection family seat (DSIR) — two corpus passes over
    # the hashed-gram relation + a broadcast lookup join; trend-tracked
    # from the round it shipped.
    "dsir_weights",
    # round 10: index-maintenance family seat — the ingest-loop probe over
    # the appended (build-then-absorb-a-batch) MinHash artifact; first run
    # per corpus pays the build+append into .annindex, later runs (and
    # rounds — the artifact dir persists) time the pure probe.
    "dedup_incremental_appended",
]


def run_set(spark, names: list[str], sf_dir: str) -> dict[str, float]:
    timings: dict[str, float] = {}
    for name in names:
        q = REGISTRY[name]
        t0 = time.time()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        release_persisted()  # cache hygiene: blocks die with their query
    return timings


def _sf1_dir(spark) -> str | None:
    """Path of the sf1 fixture set, building it on first use; None if the
    build fails (the primary bench line must never die on the sf1 extra)."""
    out_dir = Path(__file__).resolve().parent / ".benchdata" / "sf1"
    if not (out_dir / "lineitem.parquet").exists():
        try:
            sys.path.insert(0, str(Path(__file__).resolve().parent / "tools"))
            from make_bigdata import build  # noqa: PLC0415

            build(spark, "/root/testdata/sf0.1", 10, str(out_dir), quiet=True)
        except Exception as e:  # pragma: no cover
            print(f"sf1 fixture build failed: {e!r}", file=sys.stderr)
            return None
    return str(out_dir)


def _round_no() -> int:
    """Current build round, inferred as max committed BENCH_r{N}.json + 1
    (the driver writes BENCH_r{N}.json AFTER this bench runs)."""
    here = Path(__file__).resolve().parent
    rounds = [
        int(m.group(1))
        for p in here.glob("BENCH_r*.json")
        for m in [re.fullmatch(r"BENCH_r(\d+)\.json", p.name)]
        if m
    ]
    return max(rounds, default=0) + 1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("bench")
    sf_match = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(sf_match.group(1)) if sf_match else None
    load_start = os.getloadavg()

    # warm-up: session + codegen + parquet footer caches, AND the Python
    # worker pool — the first mapInPandas in a fresh local[32] session
    # forks 32 workers that all import numpy/pandas at once (~10-30 s of
    # contended spin-up that would otherwise be billed to whichever Arrow
    # kernel query runs first; reused workers amortize it everywhere else).
    from simpletons_map_reduce_spark.sources.tables import TABLES

    for t in TABLES:  # footer + page-cache warm for every input table
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    def _noop_kernel(batches):
        import numpy  # noqa: F401  (worker-side import priming)
        import pandas  # noqa: F401

        yield from batches

    (
        spark.range(0, 4096, 1, 32)
        .mapInPandas(_noop_kernel, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    if os.environ.get("SPARK_GRAFT_BENCH_SET") == "headline":
        names = list(HEADLINE)
    else:
        # headline first (their timings are the round-over-round metric),
        # then the rest of the registry alphabetically
        names = list(HEADLINE) + sorted(set(REGISTRY) - set(HEADLINE))

    timings = run_set(spark, names, sf_dir)
    total = round(sum(timings[n] for n in HEADLINE if n in timings), 3)
    full_total = round(sum(timings.values()), 3)
    # Committed on-disk record of the full per-query detail (VERDICT r7
    # item 6b: the stdout queries_detail line is truncated out of the
    # driver's bounded tail, so official per-query timings existed for only
    # the headline subset).  loadavg bounds make environmental inflation
    # self-diagnosing (r7's 2.2× "regression" was box contention).
    detail_record: dict = {
        "sf": sf,
        "loadavg_start": [round(x, 2) for x in load_start],
        "queries": timings,
    }
    detail_path = Path(__file__).resolve().parent / (
        f"BENCH_r{_round_no():02d}_detail.json"
    )
    # Per-query detail FIRST (may exceed the driver's stdout-tail window —
    # that's fine, it is diagnostic); the short headline line goes LAST.
    print(
        json.dumps(
            {"metric": "queries_detail", "sf": sf, "queries": timings}
        ),
        flush=True,
    )
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "full_total": full_total,
        # the driver record is self-describing about machine contention
        # (VERDICT r10 item 8): a loadavg_start > ~3 means the timings
        # carry environmental inflation, not plan regressions
        "loadavg_start": round(load_start[0], 2),
    }

    # sf1 extra: headline set at sf1, only after a default sf0.1 primary
    # run (local smoke runs at other SFs skip the 10× build).  Detail is
    # its own earlier line; only the scalar total rides the final line.
    if sf == 0.1 and os.environ.get("SPARK_GRAFT_SF1") != "0":
        sf1 = _sf1_dir(spark)
        if sf1 is not None:
            # Fresh context for the sf1 extra: after the 134-query primary
            # pass the old context's heap/GC state taxes the first big
            # queries ~2-3× (measured: near_dedup 39 s stale vs 8 s fresh).
            # Logging OFF across the restart: the dying context's async
            # teardown (shuffle cleanup / RpcEndpointVerifier probes)
            # otherwise races a truncated ERROR stack into the artifact's
            # stdout tail, which reads like a crash (VERDICT r8 item 2) —
            # it is benign (rc=0, all timings present), so suppress it and
            # say so in one line instead.
            print(
                "restarting Spark context for the sf1 extra "
                "(teardown log noise suppressed)",
                flush=True,
            )
            spark.sparkContext.setLogLevel("OFF")
            spark.stop()
            time.sleep(2)  # let the old context's teardown threads drain
            spark = get_session("bench-sf1")
            for t in TABLES:  # sf1 scans are cold — same warm-up as primary
                spark.read.parquet(f"{sf1}/{t}.parquet").count()
            (
                spark.range(0, 4096, 1, 32)
                .mapInPandas(_noop_kernel, "id long")
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            t1 = run_set(spark, list(HEADLINE), sf1)
            print(
                json.dumps(
                    {"metric": "sf1_detail", "sf": 1.0, "queries": t1}
                ),
                flush=True,
            )
            result["sf1_value"] = round(sum(t1.values()), 3)
            detail_record["sf1_queries"] = t1
    # Second-to-last: the HEADLINE subset's per-query times as a compact
    # (~400 B) line — the round-over-round comparison evidence — close
    # enough to the end to survive a bounded stdout tail even when the
    # full-registry detail line above does not.
    print(
        json.dumps(
            {
                "metric": "headline_detail",
                "sf": sf,
                "queries": {n: timings[n] for n in HEADLINE if n in timings},
            }
        ),
        flush=True,
    )
    # The LAST line: short, scalar-only, truncation-proof (~140 bytes).
    detail_record["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    result["load"] = detail_record["loadavg_end"][0]
    try:
        detail_path.write_text(json.dumps(detail_record, indent=1) + "\n")
    except OSError as e:  # pragma: no cover — never fail the bench line
        print(f"detail file write failed: {e!r}", file=sys.stderr)
    print(json.dumps(result), flush=True)
    # final teardown after the last (truncation-proof) line: same async
    # log-noise suppression as the sf1 restart above.
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()


if __name__ == "__main__":
    main()
