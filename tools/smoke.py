"""Pre-commit smoke gate — the round-2 failure must be impossible to repeat.

Round 2 shipped a NameError at import time in the final commit, which
zeroed every driver artifact (empty CORRECTNESS, traceback BENCH).  This
gate catches that class of failure in seconds:

1. import ``__spark_entry__`` (module-level oracle f-strings evaluate here —
   exactly where round 2 died);
2. build EVERY registered query's DataFrame at sf0.001 (100 today) (catches analysis
   errors: bad columns, unresolved refs, missing tables);
3. run one action end-to-end (``entry(spark)``) on a DEFAULT-config session,
   like the driver does;
4. compile every oracle SQL string with DuckDB ``EXPLAIN`` (catches oracle
   syntax errors without paying for execution).

Run before EVERY commit (wired as .git/hooks/pre-commit via
``python tools/install_hooks.py``):

    python tools/smoke.py

Exit 0 = safe to commit. Runtime ~30 s (dominated by JVM startup).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    t0 = time.time()
    try:
        import __spark_entry__ as entrymod
    except Exception as e:
        print(f"SMOKE FAIL: import __spark_entry__ raised "
              f"{type(e).__name__}: {e}")
        return 1
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = set(oracles) - set(queries)
    if missing:
        print(f"SMOKE FAIL: oracle_sql() has keys absent from queries(): "
              f"{sorted(missing)}")
        return 1
    print(f"import ok: {len(queries)} queries, {len(oracles)} oracles "
          f"({time.time()-t0:.1f}s)")

    # Oracle syntax check: EXPLAIN compiles without executing.
    import duckdb

    from simpletons_map_reduce_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    bad = []
    for name, sql in oracles.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:
            bad.append(f"{name}: {type(e).__name__}: {str(e)[:200]}")
    if bad:
        print("SMOKE FAIL: oracle SQL does not compile:\n  " + "\n  ".join(bad))
        return 1
    print(f"oracles compile ok ({time.time()-t0:.1f}s)")

    # Driver-like default session: NOT our session factory.
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("smoke")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    try:
        n_built = 0
        fails = []
        for name, fn in queries.items():
            try:
                df = fn(spark, SF_DIR)
                _ = df.schema  # forces analysis
                n_built += 1
            except Exception as e:
                fails.append(f"{name}: {type(e).__name__}: {str(e)[:200]}")
        if fails:
            print("SMOKE FAIL: query DataFrames do not analyze:\n  "
                  + "\n  ".join(fails))
            return 1
        print(f"built {n_built} DataFrames ok ({time.time()-t0:.1f}s)")

        rows = entrymod.entry(spark).collect()
        if len(rows) < 1:
            print("SMOKE FAIL: entry(spark) returned 0 rows")
            return 1
        print(f"entry() action ok: {len(rows)} rows ({time.time()-t0:.1f}s)")
    finally:
        spark.stop()
    print(f"SMOKE OK ({time.time()-t0:.1f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
