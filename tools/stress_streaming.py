"""Scale stress for the STREAMING twins (VERDICT r9 item 4).

The batch side has 100M-event sweep numbers (SCALE.md); the streaming
twins only ever ran at fixture scale, yet the stateful family
(`applyInPandasWithState` over 1.5M users, chained stateful DAU,
session windows) is exactly where state-store growth and per-batch
latency decide whether the operator survives production.  This tool
drives the registered streaming pipelines over a big event fixture as a
REAL multi-micro-batch replay and records, per op:

- per-batch trigger latency (min/mean/max) and rows/s throughput,
- state-store rows (final + peak) and state memory from Spark's own
  StateOperatorProgress,
- total wall and row counts,

so unbounded state growth or a latency cliff shows up as a number.

Replay realism: the fixture is restaged ONCE into ``--batches``
chronologically ordered chunk files (event-time order is what advances
the watermark and triggers evictions/window closes between batches —
shuffled files would hold ALL state to the end and measure a different,
easier problem).  The file source processes chunks oldest-mtime-first
with SPARK_GRAFT_STREAM_MAX_FILES pacing one chunk per micro-batch —
the file-source equivalent of kafka's trigger pacing.

    python tools/stress_streaming.py \
        --sf-dir /root/repo/.benchdata/sf100ev --batches 10 \
        --ops tumbling dau sessionize totals totals_ttl funnel
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from simpletons_map_reduce_spark.session import get_session  # noqa: E402


def stage_chunks(
    spark, sf_dir: str, stage_dir: str, n_chunks: int, table: str = "events"
) -> int:
    """Rewrite {sf_dir}/{table}.parquet as n_chunks chronological chunk
    files under {stage_dir}/{table}.parquet with strictly increasing
    mtimes (the file source's processing order).  Chronology column:
    ``ts`` for events, ``doc_id`` for documents (the dedup streams derive
    their synthetic ingest_ts from doc_id).  Returns files per chunk.
    Idempotent: reuses an existing staging of the same shape."""
    out = Path(stage_dir) / f"{table}.parquet"
    marker = Path(stage_dir) / f".staged-{n_chunks}"
    if marker.exists() and out.exists():
        files = [p for p in out.iterdir() if p.suffix == ".parquet"]
        return max(1, len(files) // n_chunks)
    shutil.rmtree(stage_dir, ignore_errors=True)
    out.mkdir(parents=True)
    ev = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    # chronological boundaries on the stored ts: raw bigint nanos stay as
    # is; timestamp/timestamp_ntz go through unix_micros (ntz→tz is the
    # identity instant under the pinned UTC session tz)
    if table == "documents":
        tnum = F.col("doc_id")
    elif dict(ev.dtypes)["ts"] == "bigint":
        tnum = F.col("ts")
    else:
        tnum = F.unix_micros(F.col("ts").cast("timestamp"))
    tsl = ev.select(tnum.alias("t"))
    qs = [i / n_chunks for i in range(1, n_chunks)]
    bounds = tsl.approxQuantile("t", qs, 0.001)
    edges = [None, *bounds, None]
    files_per_chunk = 2
    t0 = time.time()
    for i in range(n_chunks):
        c = ev
        if edges[i] is not None:
            c = c.filter(tnum >= edges[i])
        if edges[i + 1] is not None:
            c = c.filter(tnum < edges[i + 1])
        tmp = tempfile.mkdtemp(dir=stage_dir)
        # repartition, not coalesce: a chunk read from one source file has
        # one partition, and coalesce cannot raise the file count — the
        # trigger would then swallow several chunks per batch
        c.repartition(files_per_chunk).write.mode("overwrite").parquet(tmp)
        stamp = time.time()
        for j, p in enumerate(sorted(Path(tmp).glob("*.parquet"))):
            dst = out / f"c{i:03d}-{j}.parquet"
            p.rename(dst)
            os.utime(dst, (stamp + i, stamp + i))
        shutil.rmtree(tmp, ignore_errors=True)
        print(f"staged chunk {i + 1}/{n_chunks}", file=sys.stderr, flush=True)
    marker.write_text(str(time.time() - t0))
    return files_per_chunk


def _op_table():
    from simpletons_map_reduce_spark.streaming.events_stream import (
        dau_stream,
        sessionize_stream,
        tumbling_stream,
    )
    from simpletons_map_reduce_spark.streaming.funnel_stream import (
        funnel_stream,
    )
    from simpletons_map_reduce_spark.streaming.bloom_stream import (
        bloom_stream,
    )
    from simpletons_map_reduce_spark.streaming.dedup_stream import (
        dedup_stream,
    )
    from simpletons_map_reduce_spark.streaming.join_stream import (
        attribution_stream,
    )
    from simpletons_map_reduce_spark.streaming.sketch_stream import cms_stream
    from simpletons_map_reduce_spark.streaming.stateful import (
        running_user_totals,
        running_user_totals_ttl,
    )

    # (builder, sink output mode) — append for watermarked aggregates and
    # stream-stream joins (state EVICTS as the watermark passes: the
    # production mode), update for unwatermarked bounded-state aggregates
    # and the applyInPandasWithState operators (their declared mode).
    return {
        "tumbling": (tumbling_stream, "append"),
        "sessionize": (sessionize_stream, "append"),
        "dau": (dau_stream, "append"),
        "totals": (running_user_totals, "update"),
        "totals_ttl": (running_user_totals_ttl, "update"),
        "funnel": (funnel_stream, "update"),
        # round 11 (VERDICT r10 item 5): the last four untoured twins.
        # attribution buffers BOTH sides' stream-stream join state (the
        # riskiest remaining shape: two watermarked state stores + the
        # interval condition driving their GC).
        "attribution": (attribution_stream, "append"),
        # documents-table streams (--table documents)
        "near_dedup_base": (_near_dedup_base, "append"),
        "near_dedup_ttl": (_near_dedup_ttl, "append"),
        # exact dedup: dropDuplicatesWithinWatermark — state = distinct
        # hashes inside the watermark window, evicted as it advances
        "dedup": (dedup_stream, "append"),
        # sketches: state bounded by GEOMETRY (CMS d×w cells; Bloom m/32
        # words) — the tour verifies the bound holds, not that it exists
        "cms": (cms_stream, "update"),
        "bloom": (bloom_stream, "append"),
    }


def _docs_text_stream(spark, sf_dir):
    """(doc_id, text, ingest_ts) stream with the dedup family's synthetic
    deterministic ingest time (ingest_ts ≙ doc_id seconds — replayable,
    same convention as dedup_stream.docs_stream)."""
    from simpletons_map_reduce_spark.streaming.dedup_stream import (
        docs_raw_stream,
    )

    raw = docs_raw_stream(spark, sf_dir)
    return raw.select(
        "doc_id",
        "text",
        F.timestamp_micros((F.col("doc_id") + 1000) * 1_000_000).alias(
            "ingest_ts"
        ),
    )


def _near_dedup_base(spark, sf_dir):
    # the batch-exact twin: state holds every bucket's capped member sets
    # FOREVER (NoTimeout, mirrors corpus-at-once semantics) — state is
    # O(corpus) BY CONTRACT, so this runs at the smaller doc SF; the TTL
    # variant below is the bounded-state production shape for big SF.
    from simpletons_map_reduce_spark.streaming.near_dedup_stream import (
        near_dedup_stream,
    )

    return near_dedup_stream(spark, sf_dir)


def _near_dedup_ttl(spark, sf_dir):
    # TTL sized to the sf100 fixture's dup-block geometry: replicas of an
    # original sit 5001 synthetic-seconds apart (the coprime doc stride),
    # a 10-replica block spans ~45,009 s, so a 14 h (50,400 s) member TTL
    # keeps within-block pairs findable while buckets idle past the TTL
    # are dropped whole by the event-time timeout — bounded state AND
    # non-vacuous pair emission.
    from simpletons_map_reduce_spark.streaming.near_dedup_stream import (
        near_dedup_stream_ttl_from,
    )

    return near_dedup_stream_ttl_from(
        _docs_text_stream(spark, sf_dir), ttl="14 hours", watermark="1 minute"
    )


def run_op(spark, staged_dir: str, name: str, builder, mode: str) -> dict:
    ckpt = tempfile.mkdtemp(prefix=f"ckpt-{name}-")
    df = builder(spark, staged_dir)
    t0 = time.time()
    q = (
        df.writeStream.outputMode(mode)
        .format("noop")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        wall = time.time() - t0
        prog = [json.loads(p.json) for p in q.recentProgress]
    finally:
        q.stop()
    shutil.rmtree(ckpt, ignore_errors=True)
    # latency/throughput over DATA batches only; state metrics over ALL
    # progress entries — the trailing zero-input DRAIN batch is where the
    # watermark-driven eviction of the last data batch lands (missing it
    # misreads "state evicts correctly" as "state never evicts")
    batches = [p for p in prog if p.get("numInputRows", 0) > 0]
    lat = [p["durationMs"]["triggerExecution"] / 1000 for p in batches]
    rows_in = sum(p["numInputRows"] for p in batches)
    stateful = [p for p in prog if p.get("stateOperators")]
    state_rows = [
        sum(s.get("numRowsTotal", 0) for s in p["stateOperators"])
        for p in stateful
    ]
    state_mem = [
        sum(s.get("memoryUsedBytes", 0) for s in p["stateOperators"])
        for p in stateful
    ]
    removed = sum(
        s.get("numRowsRemoved", 0)
        for p in stateful
        for s in p["stateOperators"]
    )
    updated = sum(
        s.get("numRowsUpdated", 0)
        for p in stateful
        for s in p["stateOperators"]
    )
    sink_rows = sum(
        p.get("sink", {}).get("numOutputRows", 0) or 0 for p in prog
    )
    return {
        "wall_s": round(wall, 1),
        "batches": len(batches),
        "rows_in": rows_in,
        "rows_per_s": int(rows_in / wall) if wall else None,
        "batch_s_min": round(min(lat), 1) if lat else None,
        "batch_s_mean": round(sum(lat) / len(lat), 1) if lat else None,
        "batch_s_max": round(max(lat), 1) if lat else None,
        "state_rows_final": state_rows[-1] if state_rows else 0,
        "state_rows_peak": max(state_rows) if state_rows else 0,
        "state_mem_peak_mb": round(max(state_mem) / 2**20, 1) if state_mem else 0,
        "state_rows_updated": updated,
        "state_rows_removed": removed,
        "sink_rows": sink_rows,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.benchdata/sf100ev")
    ap.add_argument("--stage-dir", default=None)
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--table", default="events", choices=["events", "documents"])
    ap.add_argument("--ops", nargs="*", default=None)
    args = ap.parse_args()
    docs_ops = {"near_dedup_base", "near_dedup_ttl", "dedup", "cms", "bloom"}
    if args.ops is None:
        args.ops = [
            n for n in _op_table()
            if (n in docs_ops) == (args.table == "documents")
        ]
    stage_dir = args.stage_dir or str(
        Path(args.sf_dir).parent
        / (Path(args.sf_dir).name + f"-staged-{args.table}")
    )

    spark = get_session("stress-streaming")
    files_per_chunk = stage_chunks(
        spark, args.sf_dir, stage_dir, args.batches, table=args.table
    )
    os.environ["SPARK_GRAFT_STREAM_MAX_FILES"] = str(files_per_chunk)

    table = _op_table()
    out = {}
    for name in args.ops:
        builder, mode = table[name]
        try:
            out[name] = run_op(spark, stage_dir, name, builder, mode)
        except Exception as exc:  # a blowup is a finding, not a crash
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
        out[name]["load1"] = round(os.getloadavg()[0], 1)
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            out[name]["jvm_dead"] = True
            print(f"{name}: {out[name]}", file=sys.stderr, flush=True)
            break
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps({"sf_dir": args.sf_dir, "batches": args.batches,
                      "ops": out}))


if __name__ == "__main__":
    main()
