"""Local mimic of the driver's correctness gate.

For every registered query: run the Spark DataFrame and the DuckDB oracle on
the same sf dir, then compare row count, column names, and order-insensitive
values (exact equality after canonicalization — stricter than a hash, and it
prints the first differing rows so parity bugs are debuggable).

Usage:
    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [--only name ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

from simpletons_map_reduce_spark.caching import release_persisted  # noqa: E402
from simpletons_map_reduce_spark.queries import REGISTRY  # noqa: E402
from simpletons_map_reduce_spark.session import get_session  # noqa: E402
from simpletons_map_reduce_spark.sources.tables import TABLES  # noqa: E402


def canon(v):
    """Canonicalize a cell for comparison across engines."""
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, int):
        return v
    return str(v)


def rows_key(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument(
        "--skip-no-oracle",
        action=argparse.BooleanOptionalAction,
        default=False,
        help="skip queries without an oracle instead of running their "
        "rows-only check",
    )
    args = ap.parse_args()

    spark = get_session("check-oracle")
    con = duckdb.connect()
    # Pin the DuckDB session timezone: ts::TIMESTAMPTZ oracles (tz_rollup)
    # otherwise inherit the HOST OS zone, while Spark is pinned to UTC by
    # the session factory — on a non-UTC host the gate would spuriously
    # fail (ADVICE r3).
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        # driver fixtures are single files; Spark-written fixtures (e.g. the
        # bench's .benchdata/sf1) are directories of part files — glob those
        p = f"{args.sf}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    names = args.only or sorted(REGISTRY)
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        q = REGISTRY[name]
        if q.oracle is None and args.skip_no_oracle:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, args.sf)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        finally:
            release_persisted()  # cache blocks must not outlive the query
        if q.oracle is None:
            print(f"ROWS  {name}: rows-only check, spark rows={len(srows)} "
                  f"({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            rel = con.sql(q.oracle)
            drows = rel.fetchall()
            dcols = list(rel.columns)
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"row count spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            sk = rows_key([tuple(r) for r in srows], scols)
            dk = rows_key(drows, dcols)
            if sk != dk:
                diffs = [
                    (a, b) for a, b in zip(sk, dk) if a != b
                ][:3]
                problems.append(f"values differ; first diffs (spark,duckdb): {diffs}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"OK    {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
