"""Tier-C relational battery over the TPC-H-ish driver tables.

The reference has *no* joins, windows, set-ops, limits or rollups anywhere
(SURVEY §2.C — its only relational shape is sort-based group-aggregate,
mr/worker.go:212-236).  These queries close every gap category with built-in
DataFrame ops so Catalyst/Tungsten own the physical strategy:

- scans push filters/projections into parquet (PushedFilters / ReadSchema);
- small dims are broadcast (`F.broadcast`) — no shuffle of the fact table;
- aggregations get automatic partial+final HashAggregate (the map-side
  combine the reference lacks);
- AQE re-plans partition counts and skew at runtime, which is the strategy
  that survives 1000 executors × 100 TB.

Every query aliases its columns identically to its DuckDB oracle, rounds
doubles with the cross-engine-stable floor idiom (functions/rounding.py), and
casts count-like ints to BIGINT on both sides (DuckDB sum(INTEGER) would
otherwise widen to HUGEINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import rn, rsum, sql_rn, sql_rsum
from ..operators.skew import salted_topk
from ..sources.tables import load_table, load_tables
from .registry import register

FILTER_SCAN_ORACLE = f"""
SELECT l_orderkey, l_linenumber, l_quantity,
       {sql_rn('l_extendedprice * (1 - l_discount)', 2)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount > 0.05
"""


@register("filter_scan", FILTER_SCAN_ORACLE, tags=("relational",))
def filter_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + predicate — both push down to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") > 0.05)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        rn(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("revenue"),
    )


PRICING_SUMMARY_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {sql_rn('sum(l_quantity)', 2)} AS sum_qty,
       {sql_rn('sum(l_extendedprice)', 2)} AS sum_base_price,
       {sql_rn('sum(l_extendedprice * (1 - l_discount))', 2)} AS sum_disc_price,
       {sql_rn('sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))', 2)} AS sum_charge,
       {sql_rn('avg(l_quantity)', 4)} AS avg_qty,
       {sql_rn('avg(l_extendedprice)', 4)} AS avg_price,
       {sql_rn('avg(l_discount)', 4)} AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("pricing_summary", PRICING_SUMMARY_ORACLE, tags=("relational",))
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical wide group-aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rn(F.sum("l_quantity"), 2).alias("sum_qty"),
            rn(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            rn(F.sum(disc_price), 2).alias("sum_disc_price"),
            rn(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            rn(F.avg("l_quantity"), 4).alias("avg_qty"),
            rn(F.avg("l_extendedprice"), 4).alias("avg_price"),
            rn(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


HASH_JOIN_ORACLE = """
SELECT o_orderkey, c_name, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderstatus = 'O'
"""


@register("hash_join", HASH_JOIN_ORACLE, tags=("relational",))
def hash_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join orders ⋈ customer; Catalyst/AQE pick broadcast vs shuffle
    by size (customer ≪ orders at every SF, so this broadcasts)."""
    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    return (
        orders.filter(F.col("o_orderstatus") == "O")
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select("o_orderkey", "c_name", "o_totalprice")
    )


BROADCAST_JOIN_ORACLE = """
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, r_name
FROM nation JOIN region ON n_regionkey = r_regionkey
"""


@register("broadcast_join", BROADCAST_JOIN_ORACLE, tags=("relational",))
def broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the 5-row dim — zero shuffle at any scale."""
    nation, region = load_tables(spark, sf_dir, "nation", "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(F.col("n_nationkey").cast("long").alias("n_nationkey"), "n_name", "r_name")
    )


SEMI_JOIN_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


@register("semi_join", SEMI_JOIN_ORACLE, tags=("relational",))
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


ANTI_JOIN_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


@register("anti_join", ANTI_JOIN_ORACLE, tags=("relational",))
def anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


WINDOW_RANK_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS BIGINT) AS rk
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rk
    FROM orders
)
WHERE rk <= 3
"""


@register("window_rank", WINDOW_RANK_ORACLE, tags=("relational",))
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — deterministic tiebreak on o_orderkey."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


SALTED_WINDOW_RANK_ORACLE = """
SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rk
FROM (
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
           row_number() OVER (PARTITION BY l_suppkey
                              ORDER BY l_extendedprice DESC,
                                       l_orderkey, l_linenumber) AS rk
    FROM lineitem
)
WHERE rk <= 5
"""


@register("salted_window_rank", SALTED_WINDOW_RANK_ORACLE, tags=("relational", "skew"))
def salted_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient top-5 lineitems per supplier via two-phase salted
    ranking (operators/skew.py).  Result-identical to a plain window — the
    oracle is the plain-window SQL — but a hot supplier's rows are split
    ``salt`` ways in phase 1, so no single task ever sees a whole hot key.
    This is the shape `window_rank` degrades into at 100 TB with skew."""
    li = load_table(spark, sf_dir, "lineitem")
    return salted_topk(
        li.select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice"),
        ["l_suppkey"],
        [F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")],
        k=5,
    )


ROLLUP_AGG_ORACLE = f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       {sql_rn('sum(l_quantity)', 2)} AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("rollup_agg", ROLLUP_AGG_ORACLE, tags=("relational",))
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"), rn(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
    )


CUBE_AGG_ORACLE = f"""
SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
       coalesce(o_orderpriority, 'ALL') AS orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       {sql_rn('sum(o_totalprice)', 2)} AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@register("cube_agg", CUBE_AGG_ORACLE, tags=("relational",))
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), rn(F.sum("o_totalprice"), 2).alias("sum_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n_orders",
            "sum_price",
        )
    )


UNION_EXCEPT_ORACLE = """
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
UNION
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
"""


@register("union_except", UNION_EXCEPT_ORACLE, tags=("relational",))
def union_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set semantics: UNION (distinct) then EXCEPT (distinct)."""
    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    rich = customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    finished = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return rich.union(finished).distinct().subtract(building)


INTERSECT_ORACLE = """
SELECT o_custkey AS c_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
INTERSECT
SELECT o_custkey AS c_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
"""


@register("intersect_op", INTERSECT_ORACLE, tags=("relational",))
def intersect_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — completes the set-op family with union/except.

    Catalyst plans intersect as a left-semi join over distinct inputs; the
    year predicates push into one shared parquet scan per branch.
    """
    orders = load_table(spark, sf_dir, "orders")
    y96 = orders.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select(F.col("o_custkey").alias("c_custkey"))
    y97 = orders.filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select(F.col("o_custkey").alias("c_custkey"))
    return y96.intersect(y97)


TOPK_ORDERS_ORACLE = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@register("topk_orders", TOPK_ORDERS_ORACLE, tags=("relational",))
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k — Spark plans TakeOrderedAndProject (per-partition heap +
    driver merge), never a full sort of the table."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


DISTINCT_AGG_ORACLE = """
SELECT o_orderpriority,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


@register("distinct_agg", DISTINCT_AGG_ORACLE, tags=("relational",))
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.count("*").alias("n_orders"),
    )


REGION_REVENUE_ORACLE = f"""
SELECT n_name, {sql_rn('sum(l_extendedprice * (1 - l_discount))', 2)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


@register("region_revenue", REGION_REVENUE_ORACLE, tags=("relational",))
def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way star join + filtered region + group agg.

    The tiny dims (region, nation) are broadcast into customer; customer
    itself scales with SF, so customer⋈orders and lineitem⋈orders stay
    shuffle joins on their keys and AQE upgrades them to broadcast only when
    the filtered side is genuinely small.
    """
    li, orders, customer, nation, region = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region"
    )
    dims = (
        customer.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                    nation.n_regionkey == region.r_regionkey,
                )
            ),
            customer.c_nationkey == nation.n_nationkey,
        )
        .select("c_custkey", "n_name")
    )
    return (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1998-01-01")
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(dims, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(
            rn(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


GROUPING_SETS_ORACLE = f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       {sql_rn('sum(l_quantity)', 2)} AS sum_qty,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register("grouping_sets", GROUPING_SETS_ORACLE, tags=("relational",))
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary grouping sets — the general form of rollup/cube.

    Single-pass Expand+HashAggregate (one scan serves every set), not a
    union of re-scans.  Grouping keys are never null in the data, so
    coalesce('ALL') disambiguates the set-marker nulls identically in both
    engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            rn(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


PROMO_REVENUE_ORACLE = f"""
SELECT {sql_rn("100.0 * sum(CASE WHEN p_type = 'PROMO' "
               "THEN l_extendedprice * (1 - l_discount) ELSE 0 END) "
               "/ sum(l_extendedprice * (1 - l_discount))", 4)} AS promo_pct,
       {sql_rn('sum(l_extendedprice * (1 - l_discount))', 2)} AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1997-04-01'
"""


@register("promo_revenue", PROMO_REVENUE_ORACLE, tags=("relational",))
def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: fact⋈dimension with conditional aggregation.

    ``part`` scales with SF but stays dimension-small relative to lineitem;
    broadcast is declared explicitly, and only (p_partkey, p_type) is read
    from the part scan (column pruning pinned in test_plans).
    """
    li, part = load_tables(spark, sf_dir, "lineitem", "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        .join(F.broadcast(part.select("p_partkey", "p_type")),
              F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            rn(F.lit(100.0) * F.sum(promo) / F.sum(rev), 4).alias("promo_pct"),
            rn(F.sum(rev), 2).alias("total_revenue"),
        )
    )


SUPPLIER_REVENUE_ORACLE = f"""
SELECT n_name,
       CAST(count(DISTINCT s_suppkey) AS BIGINT) AS n_suppliers,
       {sql_rsum('l_extendedprice * (1 - l_discount)', 2)} AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name
"""


@register("supplier_revenue", SUPPLIER_REVENUE_ORACLE, tags=("relational",))
def supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue and active-supplier count per supplier nation (Q9-lite).

    supplier⋈nation reduces to a broadcast pair; the fact join carries only
    (l_suppkey, revenue) into the aggregate, and the distinct-count rides
    the same (n_name) shuffle as the sum.
    """
    li, supplier, nation = load_tables(spark, sf_dir, "lineitem", "supplier", "nation")
    dims = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", "n_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.select("l_suppkey", rev.alias("rev"))
        .join(F.broadcast(dims), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("n_name")
        .agg(
            F.countDistinct("s_suppkey").alias("n_suppliers"),
            # order-exact units: nation-wide sums at sf1 drifted a last ulp
            # across the 2-dp boundary vs DuckDB (sf1 oracle sweep)
            rsum(F.col("rev"), 2).alias("revenue"),
        )
    )


QUARTER_RECON_ORACLE = f"""
WITH q1 AS (
  SELECT o_custkey, sum(o_totalprice) AS rev
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate <  TIMESTAMP '1997-04-01'
  GROUP BY o_custkey
),
q2 AS (
  SELECT o_custkey, sum(o_totalprice) AS rev
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-04-01'
    AND o_orderdate <  TIMESTAMP '1997-07-01'
  GROUP BY o_custkey
)
SELECT coalesce(q1.o_custkey, q2.o_custkey) AS custkey,
       {sql_rn('q1.rev', 2)} AS q1_rev,
       {sql_rn('q2.rev', 2)} AS q2_rev
FROM q1 FULL OUTER JOIN q2 ON q1.o_custkey = q2.o_custkey
"""


@register("quarter_recon", QUARTER_RECON_ORACLE, tags=("relational",))
def quarter_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer reconciliation of two quarters' per-customer revenue.

    The outer join runs over the two PRE-AGGREGATED quarter rollups
    (O(customers) each), not raw orders — and both rollups and the join
    hash-partition on the same customer key, so AQE coalesces the whole
    thing into one partitioning chain.  Customers active in only one
    quarter surface with a NULL on the other side (the reason full outer
    is the right join type for reconciliation reports).
    """
    orders = load_table(spark, sf_dir, "orders")

    def quarter(lo: str, hi: str, out: str) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
            )
            .groupBy("o_custkey")
            .agg(rn(F.sum("o_totalprice"), 2).alias(out))
        )

    q1 = quarter("1997-01-01", "1997-04-01", "q1_rev")
    q2 = quarter("1997-04-01", "1997-07-01", "q2_rev").withColumnRenamed(
        "o_custkey", "custkey2"
    )
    return (
        q1.join(q2, q1.o_custkey == F.col("custkey2"), "full_outer")
        .select(
            F.coalesce("o_custkey", "custkey2").alias("custkey"),
            "q1_rev",
            "q2_rev",
        )
    )


REVENUE_UNPIVOT_ORACLE = f"""
WITH wide AS ({QUARTER_RECON_ORACLE})
SELECT custkey, 'q1_rev' AS quarter, q1_rev AS revenue FROM wide
UNION ALL
SELECT custkey, 'q2_rev' AS quarter, q2_rev AS revenue FROM wide
"""


@register("revenue_unpivot", REVENUE_UNPIVOT_ORACLE, tags=("relational",))
def revenue_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long melt of the quarter reconciliation (the unpivot
    operator, inverse of the conditional-aggregate pivots).

    ``DataFrame.unpivot`` lowers to a single Expand projection — one row
    in, k rows out, no shuffle, no re-scan per measure column (the UNION
    ALL rendering the oracle uses would re-scan the wide relation k
    times).  NULL measures are kept: a missing quarter is information in
    a reconciliation, and both twins agree on that contract.
    """
    wide = quarter_recon(spark, sf_dir)
    return wide.unpivot(
        ["custkey"], ["q1_rev", "q2_rev"], "quarter", "revenue"
    )


SHIPPING_PRIORITY_ORACLE = f"""
WITH j AS (
  SELECT l.l_orderkey,
         epoch_us(o.o_orderdate) AS odate_us,
         o.o_orderpriority,
         sum(l.l_extendedprice * (1 - l.l_discount)) AS rev
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1997-06-30'
    AND l.l_shipdate  > TIMESTAMP '1997-06-30'
  GROUP BY l.l_orderkey, epoch_us(o.o_orderdate), o.o_orderpriority
)
SELECT l_orderkey, {sql_rn('rev', 2)} AS revenue, odate_us, o_orderpriority
FROM j
ORDER BY {sql_rn('rev', 2)} DESC, l_orderkey
LIMIT 10
"""


@register("shipping_priority", SHIPPING_PRIORITY_ORACLE, tags=("relational",))
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered 3-way join, revenue aggregate per
    order, top-10 by revenue.

    The segment filter runs on the customer DIM and reaches the orders
    fact as a broadcast hash join probe; lineitem's shipdate filter is
    pushed to its scan.  Ranking happens on the ROUNDED revenue with
    orderkey tiebreak in BOTH engines, so the top-10 boundary can never
    split on a float ulp; the limit plans TakeOrderedAndProject over the
    aggregated (order-grain) relation.
    """
    cust, orders, li = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem"
    )
    c = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = orders.filter(F.col("o_orderdate") < "1997-06-30").select(
        "o_orderkey",
        "o_custkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("odate_us"),
        "o_orderpriority",
    )
    l = li.filter(F.col("l_shipdate") > "1997-06-30").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    j = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"), "semi")
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "odate_us", "o_orderpriority")
        .agg(
            rn(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    return (
        j.orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "odate_us", "o_orderpriority")
    )


UPSERT_MOD = 7       # every 7th customer gets an update
INSERT_MOD = 13      # every 13th customer seeds an inserted row
UPSERT_DELTA = 100.0

MERGE_UPSERT_ORACLE = f"""
WITH stride AS (SELECT max(c_custkey) + 1 AS s FROM customer),
changes AS (
  SELECT c_custkey AS key, c_name, c_acctbal + {UPSERT_DELTA} AS c_acctbal
  FROM customer WHERE c_custkey % {UPSERT_MOD} = 0
  UNION ALL
  SELECT c_custkey + stride.s AS key, c_name, {UPSERT_DELTA} AS c_acctbal
  FROM customer CROSS JOIN stride WHERE c_custkey % {INSERT_MOD} = 0
),
snap AS (SELECT c_custkey AS key, c_name, c_acctbal FROM customer)
SELECT coalesce(ch.key, snap.key) AS key,
       coalesce(ch.c_name, snap.c_name) AS c_name,
       {sql_rn('coalesce(ch.c_acctbal, snap.c_acctbal)', 2)} AS c_acctbal,
       CASE WHEN snap.key IS NULL THEN 'inserted'
            WHEN ch.key IS NULL THEN 'kept'
            ELSE 'updated' END AS merge_action
FROM snap FULL OUTER JOIN changes ch ON snap.key = ch.key
"""


@register("merge_upsert", MERGE_UPSERT_ORACLE, tags=("relational",))
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (upsert) as a plan: snapshot ⟗ changes on the key,
    changes win, unmatched changes insert, unmatched snapshot rows keep.

    The write path every warehouse needs and the reference lacks
    entirely.  The changes batch here is derived deterministically from
    the snapshot itself (every 7th key updated, every 13th seeding an
    insert beyond the key stride) so the oracle can rebuild it — in
    production it is the CDC batch.  Plan: ONE key-equi full outer join;
    with the snapshot maintained via write_parquet_clustered /
    bucketing, the join side is pre-partitioned and the merge never
    re-shuffles the snapshot (operators/bucketing.py pins that plan).
    """
    cust = load_table(spark, sf_dir, "customer")
    snap = cust.select(
        F.col("c_custkey").alias("key"), "c_name", "c_acctbal"
    )
    stride = cust.agg((F.max("c_custkey") + 1).alias("s"))
    updates = cust.filter(F.col("c_custkey") % UPSERT_MOD == 0).select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_name").alias("ch_name"),
        (F.col("c_acctbal") + UPSERT_DELTA).alias("ch_acctbal"),
    )
    inserts = (
        cust.filter(F.col("c_custkey") % INSERT_MOD == 0)
        .crossJoin(F.broadcast(stride))
        .select(
            (F.col("c_custkey") + F.col("s")).alias("ckey"),
            F.col("c_name").alias("ch_name"),
            F.lit(UPSERT_DELTA).alias("ch_acctbal"),
        )
    )
    changes = updates.unionAll(inserts)
    merged = snap.join(changes, snap.key == changes.ckey, "full_outer")
    return merged.select(
        F.coalesce("ckey", "key").alias("key"),
        F.coalesce("ch_name", "c_name").alias("c_name"),
        rn(F.coalesce("ch_acctbal", "c_acctbal"), 2).alias("c_acctbal"),
        F.when(F.col("key").isNull(), "inserted")
        .when(F.col("ckey").isNull(), "kept")
        .otherwise("updated")
        .alias("merge_action"),
    )


DELTA_MOD = 10  # the "new batch" stripe for incremental maintenance

INCREMENTAL_AGG_ORACLE = f"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       {sql_rn('sum(o_totalprice)', 2)} AS total_price
FROM orders
GROUP BY o_orderpriority
"""


@register("incremental_agg", INCREMENTAL_AGG_ORACLE, tags=("relational",))
def incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance: merge yesterday's
    aggregate with the new batch's PARTIAL aggregate instead of
    recomputing from all history.

    count/sum are commutative monoids, so
    agg(base) ⊕ agg(delta) = agg(base ∪ delta) — the property that turns
    a 100 TB daily recompute into an O(batch) refresh.  The oracle is the
    DIRECT full aggregate: the driver hash-compare proves the merged
    incremental result equals the from-scratch answer (the 2-dp floor
    round absorbs the re-associated float sum).  Both stripes prune to
    their scan predicate; the merge aggregates O(groups) rows.
    """
    orders = load_table(spark, sf_dir, "orders")

    def partial(df):
        return df.groupBy("o_orderpriority").agg(
            F.count("*").alias("n"), F.sum("o_totalprice").alias("t")
        )

    base = partial(orders.filter(F.col("o_orderkey") % DELTA_MOD != 0))
    delta = partial(orders.filter(F.col("o_orderkey") % DELTA_MOD == 0))
    return (
        base.unionAll(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n").cast("long").alias("n_orders"),
            rn(F.sum("t"), 2).alias("total_price"),
        )
    )


FORECAST_REVENUE_ORACLE = f"""
SELECT {sql_rn('sum(l_extendedprice * l_discount)', 2)} AS lost_revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


@register("forecast_revenue", FORECAST_REVENUE_ORACLE, tags=("relational",))
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate revenue forecast.

    The simplest decision-support query and the purest pushdown test: all
    four predicates (date range, discount band, quantity cap) reach the
    parquet scan as PushedFilters, the scan reads only the 4 referenced
    columns, and the whole plan is one WholeStageCodegen span feeding a
    single-row final aggregate — zero joins, one partial+final exchange of
    O(partitions) rows.  At 100 TB this is bounded by scan bandwidth alone
    (min/max row-group statistics prune most files on l_shipdate when the
    table is date-clustered, which write_parquet_clustered provides).
    Completes the 22/22 TPC-H shape battery (SURVEY §2.E).

    Reference ceiling: a predicate lives inside a map UDF and every byte
    still flows through the coordinator (mr/coordinator.go:167-183); here
    the predicate prunes I/O before it happens.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            rn(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "lost_revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


INCREMENTAL_JOIN_ORACLE = f"""
SELECT o_orderkey, o_custkey, c_mktsegment,
       {sql_rn('o_totalprice', 2)} AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
"""


@register("incremental_join", INCREMENTAL_JOIN_ORACLE, tags=("relational",))
def incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view: refresh with the delta,
    prove equality to the from-scratch join.

    The join half of incremental view maintenance (incremental_agg is
    the aggregate half): for a materialized V = A ⋈ B, a new batch ΔA
    refreshes V as V ∪ (ΔA ⋈ B) — the general formula adds A ⋈ ΔB and
    ΔA ⋈ ΔB when both sides change; here B (customer) is a slowly-
    changing dimension treated as static for the batch.  The oracle is
    the DIRECT join of all of A, so the driver's hash-compare IS the
    maintenance-correctness proof: V_base ∪ (ΔA ⋈ B) ≡ (A ∪ ΔA) ⋈ B.

    At 100 TB this is the difference between re-joining all history
    every batch and an O(|ΔA|) probe: the base view is already
    materialized (write_parquet_clustered on the join key in
    production); only the delta shuffles — and with the dimension
    broadcast, the refresh is shuffle-FREE.  Union-then-read keeps one
    partitioning; no dedup step is needed because orderkey stripes are
    disjoint by construction (append-only CDC).
    """
    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    dim = F.broadcast(customer.select("c_custkey", "c_mktsegment"))

    def enrich(df):
        return df.join(dim, F.col("o_custkey") == F.col("c_custkey")).select(
            "o_orderkey",
            "o_custkey",
            "c_mktsegment",
            rn(F.col("o_totalprice"), 2).alias("total_price"),
        )

    base_view = enrich(orders.filter(F.col("o_orderkey") % DELTA_MOD != 0))
    delta = orders.filter(F.col("o_orderkey") % DELTA_MOD == 0)
    return base_view.unionAll(enrich(delta))


#: salt fan-out for the skew-resilient join demo.
JOIN_SALT = 8

SALTED_JOIN_ORACLE = f"""
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       {sql_rsum('o_totalprice', 2)} AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@register("salted_join", SALTED_JOIN_ORACLE, tags=("relational", "skew"))
def salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient shuffle join via key salting — proven against the
    plain-join oracle.

    When the build side is too big to broadcast AND one join key is hot,
    a plain shuffle join sends the hot key's entire fact volume to one
    task.  Salting splits it: the fact side appends salt =
    pmod(hash(row), S) to its key, the dimension side replicates each
    row S ways (explode over 0..S-1), and the join runs on
    (key, salt) — the hot key now spreads across S tasks.  The oracle is
    the UNSALTED join, so the driver hash-compare proves the rewrite is
    semantics-preserving; the salted sum uses order-exact integer units
    (rsum) so the S-way re-association cannot move a rounding boundary.

    AQE's skew-join handles mid-sized skew automatically (pinned in
    tests/test_skew.py); explicit salting is the portable fallback for
    extreme single-key skew and for engines/joins AQE can't split.
    Replication cost: S× the DIMENSION (small side) only — never the
    fact.
    """
    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    fact = orders.select(
        "o_custkey",
        "o_totalprice",
        F.pmod(F.hash("o_orderkey"), F.lit(JOIN_SALT)).alias("salt"),
    )
    dim = customer.select(
        "c_custkey",
        "c_mktsegment",
        F.explode(F.sequence(F.lit(0), F.lit(JOIN_SALT - 1))).alias("salt"),
    )
    return (
        fact.join(
            dim,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (fact.salt == dim.salt),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            rsum(F.col("o_totalprice"), 2).alias("total_price"),
        )
    )


NESTED_LINES_ORACLE = """
WITH g AS (
  SELECT l_orderkey,
         CAST(count(*) AS BIGINT) AS n_lines,
         string_agg(
           CAST(l_linenumber AS VARCHAR) || ':' ||
           CAST(CAST(l_quantity AS BIGINT) AS VARCHAR),
           ';' ORDER BY l_linenumber, CAST(l_quantity AS BIGINT)
         ) AS lines_sig
  FROM lineitem
  GROUP BY l_orderkey
)
SELECT l_orderkey, n_lines, lines_sig FROM g
"""


@register("nested_lines", NESTED_LINES_ORACLE, tags=("relational",))
def nested_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nest the order's lineitems into an ordered array-of-struct and
    serialize it canonically — the document-assembly shape (orders with
    nested line arrays is how a lake hands relational data to JSON/
    protobuf consumers and how training pipelines pack structured
    records into documents).

    ``collect_list(struct(...))`` gathers in ONE partial+final aggregate
    (no window, no second shuffle), ``array_sort`` orders by the struct's
    leading field, and ``transform`` renders the canonical string both
    engines can hash — nested VALUES never cross the engine boundary
    raw, only their deterministic serialization (quantities are integral
    doubles, so the int cast is exact).  At 100 TB this is one
    orderkey-keyed shuffle carrying (linenumber, quantity) pairs.
    """
    li = load_table(spark, sf_dir, "lineitem")
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("l_linenumber").alias("ln"),
                F.col("l_quantity").cast("long").alias("q"),
            )
        )
    )
    return (
        li.groupBy("l_orderkey")
        .agg(F.count("*").alias("n_lines"), arr.alias("lines"))
        .select(
            "l_orderkey",
            "n_lines",
            F.array_join(
                F.transform(
                    "lines",
                    lambda s: F.concat_ws(":", s["ln"].cast("string"),
                                          s["q"].cast("string")),
                ),
                ";",
            ).alias("lines_sig"),
        )
    )
