"""Scale the driver's sf0.1 fixtures up for big-SF benchmarking.

Replicates each table ``--copies`` times (default 10 → "sf1") with
consistent key offsets, so joins keep their selectivity: copy k of an
order still references copy k of its customer, etc.  Dimension tables
(region, nation) are NOT scaled — TPC-H keeps them fixed, and scaling
them would change join semantics.

Documents get a per-copy marker token appended, so replicas are exact-
distinct but remain NEAR-duplicates of their original — at sf1 the dedup
family therefore runs against a corpus where every doc has 9 near-dup
replicas (10-doc groups): a deliberate dedup stress, shaped like a
mirror-heavy web crawl.  Embedding vectors are unchanged (vec_id
offset), so only copy 0 contributes ANN query vectors while the corpus
grows 10×.

Output goes under /root/repo/.benchdata/sf<sf> (gitignored); bench it
with:

    SPARK_GRAFT_BENCH_SET=headline \
    SPARK_GRAFT_SF_DIR=/root/repo/.benchdata/sf1 python bench.py
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from simpletons_map_reduce_spark.session import get_session  # noqa: E402

#: key columns to offset per table: (column, stride-source table, stride key)
KEYED = {
    "customer": [("c_custkey", "customer", "c_custkey")],
    "supplier": [("s_suppkey", "supplier", "s_suppkey")],
    "part": [("p_partkey", "part", "p_partkey")],
    "orders": [
        ("o_orderkey", "orders", "o_orderkey"),
        ("o_custkey", "customer", "c_custkey"),
    ],
    "lineitem": [
        ("l_orderkey", "orders", "o_orderkey"),
        ("l_partkey", "part", "p_partkey"),
        ("l_suppkey", "supplier", "s_suppkey"),
    ],
    "events": [
        ("event_id", "events", "event_id"),
        ("user_id", "events", "user_id"),
    ],
    "documents": [("doc_id", "documents", "doc_id")],
    "embeddings": [("vec_id", "embeddings", "vec_id")],
}
UNSCALED = ["region", "nation"]
OUT_FILES = {"lineitem": 16, "orders": 8, "events": 8}  # default 4


def _strides(spark: SparkSession, src: str) -> dict[tuple[str, str], int]:
    """stride = max(key)+1 per referenced (table, key)."""
    needed = {(t, k) for cols in KEYED.values() for _, t, k in cols}
    out = {}
    for t, k in needed:
        mx = (
            spark.read.parquet(f"{src}/{t}.parquet")
            .agg(F.max(k).alias("m"))
            .collect()[0]
            .m
        )
        out[(t, k)] = int(mx) + 1
    return out


def _scaled(df: DataFrame, table: str, copies: int, strides) -> DataFrame:
    out = df.withColumn(
        "__k", F.explode(F.sequence(F.lit(0), F.lit(copies - 1)))
    )
    for col, st, sk in KEYED[table]:
        out = out.withColumn(
            col, (F.col(col) + F.col("__k").cast("long") * strides[(st, sk)])
        )
    if table == "documents":
        # replicas stay NEAR-dups of their original but are exact-distinct
        out = out.withColumn(
            "text", F.concat(F.col("text"), F.lit(" zz"), F.col("__k"))
        )
    return out.drop("__k")


def build(
    spark: SparkSession, src: str, copies: int, out_dir: str, quiet: bool = False
) -> None:
    """Write the scaled fixture set under ``out_dir`` (importable entry —
    bench.py builds .benchdata/sf1 on first use through this)."""
    strides = _strides(spark, src)
    for table in UNSCALED:
        df = spark.read.parquet(f"{src}/{table}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet"
        )
        if not quiet:
            print(f"{table}: copied unscaled")
    for table in KEYED:
        t0 = time.time()
        df = spark.read.parquet(f"{src}/{table}.parquet")
        scaled = _scaled(df, table, copies, strides)
        scaled.repartition(OUT_FILES.get(table, 4)).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{table}.parquet")
        if not quiet:
            print(f"{table}: x{copies} in {time.time() - t0:.1f}s")
    if not quiet:
        print(f"wrote {out_dir}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--out", default=None, help="default .benchdata/sf<sf>")
    args = ap.parse_args()
    sf = 0.1 * args.copies
    out_dir = args.out or str(
        Path(__file__).resolve().parent.parent
        / ".benchdata"
        / f"sf{sf:g}"
    )

    spark = get_session("make-bigdata")
    build(spark, args.src, args.copies, out_dir)
    spark.stop()


if __name__ == "__main__":
    main()
