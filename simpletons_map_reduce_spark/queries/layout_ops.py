"""Data-layout operators — multi-dimensional clustering for scan pruning.

At 100 TB the cheapest predicate is the one that never reads a file: parquet
zone maps (per-file min/max) prune scans, but a table sorted by ONE key has
useless zone maps for every OTHER key.  Z-ordering interleaves the bits of
several bucketized keys into one sort key so that a range-sorted layout keeps
*all* interleaved dimensions locally clustered — each output file covers a
small rectangle of the key space and its min/max prunes on any dimension.

``zorder_layout`` computes the interleaved key per row (pure 20-term bit
arithmetic, embarrassingly parallel, no shuffle) and reports the resulting
zone-map geometry: per z-range bucket, the min/max span of BOTH underlying
keys.  The spans are what a scan planner would prune on; the pruning factor
they imply is pinned in tests/test_layout.py against the single-key sort's
spans (z-order keeps both dimensions' average spans small; a single-key sort
degenerates one of them to the full key range).

Everything — range bucketization via the scalar max, the interleave
polynomial, the z-range grouping — is integer arithmetic mirrored literally
in the oracle SQL (the interleave expression is *generated* once in Python
and formatted into both engines), so the report is fully hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

#: bits per dimension (2 dimensions → 20-bit z-values, 2^10 buckets each).
Z_BITS = 10
#: z-range buckets in the report: top Z_BITS bits of the 2·Z_BITS-bit
#: z-value — i.e. 1024 zones, the "files" whose zone maps we inspect.
Z_ZONE_SHIFT = Z_BITS


def _interleave_expr(bx: str, by: str, idiv: str) -> str:
    """``bx``/``by`` are Z_BITS-wide ints; returns the SQL expression for
    bit-interleaved z(bx, by) with bx in the odd (high) positions.  Plain
    +/%/integer-division arithmetic — the one operator the engines spell
    differently is integer division (Spark ``div``, DuckDB ``//``), passed
    in as ``idiv``; everything else is the same generated string."""
    terms = []
    for i in range(Z_BITS):
        # ((bx >> i) & 1) << (2i+1)  without shift operators:
        terms.append(f"(({bx} {idiv} {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"(({by} {idiv} {1 << i}) % 2) * {1 << (2 * i)}")
    return "(" + " + ".join(terms) + ")"


def _bucket_expr(col: str, mx: str, idiv: str) -> str:
    """Range bucket of ``col`` into [0, 2^Z_BITS) given max value ``mx``
    (inclusive).  Integer arithmetic only; same string both engines modulo
    the ``idiv`` spelling.

    CONTRACT (ADVICE r6): ``col`` must be a NON-NEGATIVE integer.  For
    negative values the bucket leaves [0, 2^Z_BITS) and the generated
    string stops being engine-identical (Spark ``div`` truncates toward
    zero, DuckDB ``//`` floors).  zorder_layout's keys are TPC-H surrogate
    keys (>= 1 by construction); write_parquet_zordered enforces the
    contract in-plan via min-key assertions."""
    return f"CAST(({col} * {1 << Z_BITS}) {idiv} ({mx} + 1) AS BIGINT)"


def _z_expr(idiv: str) -> str:
    bx = _bucket_expr("l_orderkey", "max_ok", idiv)
    by = _bucket_expr("l_partkey", "max_pk", idiv)
    return _interleave_expr(bx, by, idiv)


_Z_DUCK = _z_expr("//")
_Z_SPARK = _z_expr("div")

ZORDER_ORACLE = f"""
WITH mx AS (SELECT max(l_orderkey) AS max_ok, max(l_partkey) AS max_pk
            FROM lineitem),
z AS (
  SELECT l_orderkey, l_partkey,
         {_Z_DUCK} // {1 << Z_ZONE_SHIFT} AS zone
  FROM lineitem CROSS JOIN mx
)
SELECT CAST(zone AS BIGINT) AS zone,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(l_orderkey) AS BIGINT) AS min_ok,
       CAST(max(l_orderkey) AS BIGINT) AS max_ok,
       CAST(min(l_partkey) AS BIGINT) AS min_pk,
       CAST(max(l_partkey) AS BIGINT) AS max_pk
FROM z
GROUP BY zone
"""


@register("zorder_layout", ZORDER_ORACLE, tags=("layout",))
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering key + zone-map geometry report over lineitem.

    Plan shape: one scan computes the per-row z-value (20-term integer
    polynomial over the two range-bucketized keys — whole-stage-codegen
    arithmetic, no Python, no shuffle), then ONE hash aggregate groups by
    the 1024 z-zones.  The scalar (max_ok, max_pk) row is a broadcast of a
    1-row aggregate — the same bounded-scalar pattern the other range
    bucketizers use.

    In production the z-value feeds ``df.repartitionByRange(zval).
    sortWithinPartitions(zval).write...`` to lay the table out; this query
    reports the layout's quality instead of writing 100 TB in a test: per
    zone, the min/max span of BOTH keys — exactly the parquet zone-map a
    planner would prune with.  tests/test_layout.py pins that the z-layout
    keeps both dimensions' mean normalized span ≪ 1 while a single-key
    sort leaves the secondary dimension's span ≈ the full key range.
    """
    li = load_table(spark, sf_dir, "lineitem")
    mx = li.agg(
        F.max("l_orderkey").alias("max_ok"), F.max("l_partkey").alias("max_pk")
    )
    z = (
        li.select("l_orderkey", "l_partkey")
        .crossJoin(F.broadcast(mx))
        .select(
            "l_orderkey",
            "l_partkey",
            F.expr(f"{_Z_SPARK} div {1 << Z_ZONE_SHIFT}").alias("zone"),
        )
    )
    return z.groupBy(F.col("zone").cast("long").alias("zone")).agg(
        F.count("*").alias("n_rows"),
        F.min("l_orderkey").cast("long").alias("min_ok"),
        F.max("l_orderkey").cast("long").alias("max_ok"),
        F.min("l_partkey").cast("long").alias("min_pk"),
        F.max("l_partkey").cast("long").alias("max_pk"),
    )
