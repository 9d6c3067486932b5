"""Decision-support shapes the round-1 battery did not yet cover.

The reference's only relational shape is sort-based group-aggregate
(mr/worker.go:212-236 — SURVEY §2.C); rounds 1-2 added joins, windows,
set-ops and rollups.  This module closes the remaining *classic
decision-support* shapes — correlated EXISTS / NOT EXISTS, scalar
subqueries, HAVING, conditional CASE pivots, and moving-window frames —
each expressed the way a Spark engine should run them at 100 TB:

- correlated EXISTS      → left-semi join with a composite (equi + range)
  condition: the equi part keys the shuffle, the range part is a post-probe
  filter, so no cartesian ever materializes;
- correlated NOT EXISTS  → left-anti join on the same shape;
- scalar subquery per group → a window aggregate over the grouping key
  (one shuffle, no second scan of the fact table);
- global scalar subquery → a 1-row aggregate broadcast-cross-joined into
  the probe side (no driver round-trip, no collect);
- HAVING                 → filter over a pre-aggregated relation, keeping
  the partial/final HashAggregate pair Catalyst already plans;
- moving frame           → ROWS BETWEEN k PRECEDING AND CURRENT ROW over a
  date-grain rollup, i.e. the window input is already reduced from O(rows)
  to O(days) before any sort.

All quantity sums stay exact across engines (`l_quantity` is integral in
double — sums < 2^53 are order-independent), so quantity thresholds are
safe cross-engine filters; money aggregates use the shared floor-rounding
idiom (functions/rounding.py) in both twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import rn, sql_rn
from ..sources.tables import load_table, load_tables
from .registry import register

EXISTS_ORDERS_ORACLE = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""


@register("exists_orders", EXISTS_ORDERS_ORACLE, tags=("decision",))
def exists_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with a non-equi correlate.

    Left-semi join keyed on ``l_orderkey = o_orderkey`` (the shuffle key);
    the ``l_shipdate > o_orderdate + 30 days`` part rides along as a probe
    filter, so the plan is a plain shuffled/broadcast semi-join — the
    100 TB-safe rendering of EXISTS.  Our lineitem has no commitdate /
    receiptdate columns, so "late" is ship > order-date + 30 days.
    """
    orders, li = load_tables(spark, sf_dir, "orders", "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, on=late, how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


SCALAR_AVG_FILTER_ORACLE = f"""
WITH branded AS (
  SELECT l_quantity, l_extendedprice,
         avg(l_quantity) OVER (PARTITION BY l_partkey) AS part_avg_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#12'
)
SELECT {sql_rn('sum(l_extendedprice) / 7.0', 2)} AS avg_yearly
FROM branded
WHERE l_quantity < 0.2 * part_avg_qty
"""


@register("scalar_avg_filter", SCALAR_AVG_FILTER_ORACLE, tags=("decision",))
def scalar_avg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: per-group scalar subquery as a window aggregate.

    The textbook rendering re-aggregates lineitem per part and joins back
    — two scans, two shuffles.  One window over ``l_partkey`` computes the
    correlated scalar in the same shuffle that the filter then consumes.
    The threshold compare is exact cross-engine: quantities are integral
    doubles, so the partition avg is identical regardless of add order.
    """
    li, part = load_tables(spark, sf_dir, "lineitem", "part")
    branded = li.join(
        F.broadcast(part.filter(F.col("p_brand") == "Brand#12").select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
    )
    w = Window.partitionBy("l_partkey")
    return (
        branded.withColumn("part_avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("part_avg_qty"))
        .agg(rn(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


BIG_ORDERS_ORACLE = """
SELECT c_name, o_orderkey, o_totalprice, sum_qty
FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 300) big
JOIN orders   ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey  = o_custkey
"""


@register("big_orders", BIG_ORDERS_ORACLE, tags=("decision",))
def big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a pre-aggregate, then enrich.

    Aggregate-then-filter runs partial+final HashAggregate and shrinks
    lineitem to the qualifying orderkeys *before* any join — at 100 TB the
    two enrichment joins see only the survivors (AQE turns them into
    broadcasts at runtime).  The >300 threshold is exact (integral sums).
    """
    li, orders, customer = load_tables(spark, sf_dir, "lineitem", "orders", "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(orders, orders.o_orderkey == big.l_orderkey)
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_name", "o_orderkey", "o_totalprice", "sum_qty")
    )


PRIORITY_PIVOT_ORACLE = """
SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_lines,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY year(l_shipdate)
"""


@register("priority_pivot", PRIORITY_PIVOT_ORACLE, tags=("decision",))
def priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional CASE pivot after a fact-fact join.

    Both CASE branches are counted in ONE aggregate pass — the
    anti-pattern is two filtered aggregations unioned together (two
    shuffles of the same join output).  Our lineitem has no shipmode
    column, so the pivot splits on order priority by ship year.
    """
    li, orders = load_tables(spark, sf_dir, "lineitem", "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.year("l_shipdate").cast("bigint").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_lines"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_lines"),
        )
    )


CHURNED_CUSTOMERS_ORACLE = f"""
SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
       {sql_rn('sum(c_acctbal)', 2)} AS totacctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY n_name
"""


@register("churned_customers", CHURNED_CUSTOMERS_ORACLE, tags=("decision",))
def churned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global scalar subquery + correlated NOT EXISTS.

    High-balance customers with no order since 1999, counted per nation.
    The scalar (avg positive balance) is a 1-row aggregate cross-joined in
    — Catalyst broadcasts it, so the probe side never moves.  NOT EXISTS
    is a left-anti join against the date-filtered orders (filter pushed
    below the join).  Every customer has *some* order in the synthetic
    data, which is why the correlate is date-bounded.
    """
    customer, nation, orders = load_tables(
        spark, sf_dir, "customer", "nation", "orders"
    )
    threshold = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = orders.filter(F.col("o_orderdate") >= "1999-01-01").select("o_custkey")
    return (
        customer.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            rn(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


MOVING_REVENUE_ORACLE = f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) AS day_us,
         sum(o_totalprice) AS revenue
  FROM orders GROUP BY o_orderdate
)
SELECT day_us, {sql_rn('revenue', 2)} AS daily_revenue,
       {sql_rn('avg(revenue) OVER (ORDER BY day_us '
               'ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)', 2)} AS ma7
FROM daily
"""


@register("moving_revenue", MOVING_REVENUE_ORACLE, tags=("decision",))
def moving_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-frame window: 7-day trailing average of daily revenue.

    The frame runs over the *date-grain rollup* (O(days) rows), not raw
    orders — the pre-aggregation is what makes a global ORDER BY window
    affordable at 100 TB (2.4k rows here; ~constant at any SF).  Day keys
    are epoch-microsecond bigints so ordering and grouping are integer-
    exact in both engines.
    """
    orders = load_table(spark, sf_dir, "orders")
    # o_orderdate is TIMESTAMP_NTZ; the session pins timeZone=UTC, so the
    # cast to TIMESTAMP is the identity instant DuckDB's epoch_us() sees.
    daily = orders.groupBy(
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("day_us")
    ).agg(F.sum("o_totalprice").alias("revenue"))
    w = Window.orderBy("day_us").rowsBetween(-6, 0)
    return daily.select(
        "day_us",
        rn(F.col("revenue"), 2).alias("daily_revenue"),
        rn(F.avg("revenue").over(w), 2).alias("ma7"),
    )


MIN_COST_SIZE = 30  # Q2's p_size selectivity filter, adapted to our parts

MIN_COST_SUPPLIER_ORACLE = f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
best AS (
  SELECT l_partkey, l_suppkey, cost,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY cost, l_suppkey) AS rk
  FROM ps
)
SELECT p.p_partkey, p.p_name, s.s_name, n.n_name,
       {sql_rn('b.cost', 4)} AS min_cost
FROM best b
JOIN part p ON p.p_partkey = b.l_partkey AND p.p_size >= {MIN_COST_SIZE}
JOIN supplier s ON s.s_suppkey = b.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE b.rk = 1
"""


@register("min_cost_supplier", MIN_COST_SUPPLIER_ORACLE, tags=("decision",))
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part (correlated scalar MIN).

    Q2's correlated subquery ("supplycost = (SELECT min(...) ...)") is the
    textbook case for rewriting into a single-pass argmin: the catalog
    relation (min unit price per part × supplier, our partsupp stand-in
    derived from lineitem) is aggregated ONCE per part with
    ``min_by(struct(supplier...), struct(cost, suppkey))`` — no second
    scan, no self-join, and the (cost, suppkey) struct ordering makes the
    tie-break deterministic in both engines.  Dimension enrichment
    (part/supplier/nation) is all broadcast.  Unit price is one IEEE
    divide, bit-identical across engines, so the argmin compares equal
    doubles equally.
    """
    li, part, supp, nation = load_tables(
        spark, sf_dir, "lineitem", "part", "supplier", "nation"
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
    )
    best = ps.groupBy("l_partkey").agg(
        F.min_by(
            F.struct("l_suppkey", "cost"),
            F.struct("cost", "l_suppkey"),
        ).alias("b")
    )
    return (
        best.select(
            "l_partkey",
            F.col("b.l_suppkey").alias("l_suppkey"),
            F.col("b.cost").alias("cost"),
        )
        .join(
            F.broadcast(part.filter(F.col("p_size") >= MIN_COST_SIZE)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            rn(F.col("cost"), 4).alias("min_cost"),
        )
    )


SUPPLIER_CLASSES_ORACLE = """
WITH ok_supp AS (
  SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0
),
ps AS (
  SELECT DISTINCT l_partkey, l_suppkey
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM ok_supp)
)
SELECT p.p_brand, p.p_type,
       CAST(count(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps JOIN part p ON p.p_partkey = ps.l_partkey
GROUP BY p.p_brand, p.p_type
"""


@register("supplier_classes", SUPPLIER_CLASSES_ORACLE, tags=("decision",))
def supplier_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part class, with a
    supplier blacklist as NOT-IN.

    The blacklist (negative account balance, our stand-in for Q16's
    complaint filter) is applied as a broadcast LEFT-SEMI join on the
    distinct part×supplier relation — Q16's ``NOT IN (SELECT ...)``
    never becomes a shuffle because the supplier dimension broadcasts.
    The distinct-then-count-distinct pair collapses into adjacent
    hash-aggregates over the same (brand, type) exchange.
    """
    li, part, supp = load_tables(spark, sf_dir, "lineitem", "part", "supplier")
    ok = supp.filter(F.col("s_acctbal") >= 0).select("s_suppkey")
    ps = (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(ok), F.col("l_suppkey") == F.col("s_suppkey"), "semi")
        .distinct()
    )
    return (
        ps.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


#: dominance = a supplier's share of a part exceeds OVERSTOCK_FACTOR × the
#: part's fair share (1 / its supplier count) — scale-robust, unlike a fixed
#: share cut-off, which vacuously empties as supplier counts grow with SF.
OVERSTOCK_FACTOR = 2

OVERSTOCKED_SUPPLIERS_ORACLE = f"""
WITH pq AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
tot AS (
  SELECT l_partkey, sum(qty) AS total_qty, count(*) AS n_supp
  FROM pq GROUP BY l_partkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(count(*) AS BIGINT) AS n_parts_dominated
FROM pq JOIN tot USING (l_partkey)
JOIN supplier s ON s.s_suppkey = pq.l_suppkey
WHERE pq.qty * tot.n_supp > {OVERSTOCK_FACTOR} * tot.total_qty
GROUP BY s.s_suppkey, s.s_name
"""


@register(
    "overstocked_suppliers", OVERSTOCKED_SUPPLIERS_ORACLE, tags=("decision",)
)
def overstocked_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers above a correlated share-of-part
    threshold (shipped > OVERSTOCK_FACTOR × their fair share of the part).

    Q20's nested "quantity > 0.5 * (SELECT sum(...))" correlate becomes
    ONE aggregate pass (per part×supplier sums) with the per-part total
    and supplier count as window aggregates OVER that aggregate — not a
    second aggregate joined back, which would make Catalyst scan lineitem
    twice (the two consumers of pq don't share the subplan).  Both window
    expressions stack on the same l_partkey partitioning: one fact scan,
    two exchanges total (pinned).  Quantity sums are integral doubles
    (< 2^53) and the supplier count is an int, so the fair-share compare
    (qty·n_supp > 2·total) is exact in both engines — no float division
    anywhere.
    """
    li, supp = load_tables(spark, sf_dir, "lineitem", "supplier")
    pq = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    w = Window.partitionBy("l_partkey")
    dominated = (
        pq.withColumn("total_qty", F.sum("qty").over(w))
        .withColumn("n_supp", F.count("*").over(w))
        .filter(
            F.col("qty") * F.col("n_supp")
            > OVERSTOCK_FACTOR * F.col("total_qty")
        )
    )
    return (
        dominated.join(
            F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").cast("long").alias("n_parts_dominated"))
    )
