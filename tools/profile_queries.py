"""Per-query profiling harness for the optimization rounds (guide §1).

Times individual registered queries through the SAME noop-sink methodology
as bench.py (fresh warmed session, setJobDescription labels, cache hygiene
between queries), optionally repeating each and dumping
``.explain("formatted")`` per query to a plans directory.

Usage:
    python tools/profile_queries.py --sf /root/testdata/sf0.1 \
        --only near_dedup dedup_clusters --repeat 2 \
        --plans plans/r12 --suffix before
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from simpletons_map_reduce_spark.caching import release_persisted  # noqa: E402
from simpletons_map_reduce_spark.plans.checks import physical_plan  # noqa: E402
from simpletons_map_reduce_spark.queries import REGISTRY  # noqa: E402
from simpletons_map_reduce_spark.session import get_session  # noqa: E402
from simpletons_map_reduce_spark.sources.tables import TABLES  # noqa: E402


def _steal() -> int:
    """Cumulative hypervisor steal jiffies (measurement hygiene: a run with
    a large steal delta was throttled and should be repeated)."""
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def warmup(spark, sf_dir: str) -> None:
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    def _noop_kernel(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from batches

    (
        spark.range(0, 4096, 1, 32)
        .mapInPandas(_noop_kernel, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--plans", default=None, help="dump explain() here")
    ap.add_argument(
        "--suffix", default="before", help="plan file suffix (before/after)"
    )
    args = ap.parse_args()

    names = args.only or list(REGISTRY)
    unknown = [n for n in names if n not in REGISTRY]
    assert not unknown, f"unknown queries: {unknown}"

    spark = get_session("profile")
    print(f"loadavg_start {os.getloadavg()[0]:.2f}", file=sys.stderr)
    warmup(spark, args.sf)

    out: dict[str, list[float]] = {}
    for name in names:
        q = REGISTRY[name]
        if args.plans:
            df = q.fn(spark, args.sf)
            plan = physical_plan(df)
            pdir = Path(args.plans)
            pdir.mkdir(parents=True, exist_ok=True)
            (pdir / f"{name}_{args.suffix}.txt").write_text(plan)
            release_persisted()
        runs = []
        steals = []
        for _ in range(args.repeat):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            s0 = _steal()
            t0 = time.time()
            q.fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            steals.append(_steal() - s0)
            spark.sparkContext.setJobDescription(None)
            release_persisted()
        out[name] = runs
        print(
            f"{name:40s} {' '.join(f'{r:7.3f}' for r in runs)}"
            f"   steal {steals}",
            flush=True,
        )
    print(json.dumps({"sf": args.sf, "timings": out}))
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()


if __name__ == "__main__":
    main()
