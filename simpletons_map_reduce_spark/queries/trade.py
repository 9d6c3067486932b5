"""Cross-nation trade and catalog decision-support shapes (TPC-H Q7/Q8/Q10/
Q11/Q13/Q15/Q19 analogs over the driver schema).

The reference's relational ceiling is one sort-based group-aggregate per job
(mr/worker.go:212-236 — SURVEY §2.C); this module completes the classic
decision-support battery that rounds 1-2 started in relational.py /
decision.py.  Each query is written the way a Spark engine should run it at
100 TB:

- Q7  volume_shipping     → the two nation lookups are ONE broadcast joined
  twice (supplier side, customer side); the fact-fact joins shuffle on their
  keys; the symmetric nation-pair predicate rides the broadcast probe.
- Q8  market_share        → conditional-share aggregation: numerator and
  denominator in a single HashAggregate pass (no self-join, no re-scan).
- Q10 returned_items      → filter the fact FIRST (returnflag + quarter), so
  the customer enrichment join sees only returned lines.
- Q11 top_value_parts     → global scalar threshold as a 1-row broadcast
  cross-join over the persisted per-part aggregate (the rollup is computed
  once and feeds both the scalar and the probe; no driver collect).
- Q13 customer_distribution → left outer join with a *join-condition*
  predicate (not a WHERE — customers with zero qualifying orders must
  survive), then the double aggregate.
- Q15 top_supplier        → argmax-by-window over the supplier rollup: one
  extra exchange over O(suppliers) rows instead of a second scan of
  lineitem.
- Q19 disjunctive_filter  → OR-of-conjunctions pushed into a single
  broadcast-join probe; the brand/size part filter prunes the build side
  before broadcast.

Money sums follow the shared floor-rounding idiom (functions/rounding.py) so
both engines emit bit-identical doubles for the driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..caching import tracked_persist
from ..functions.rounding import rn, rsum, sql_rn, sql_rsum
from ..sources.tables import load_table, load_tables
from .registry import register

REVENUE = "l_extendedprice * (1 - l_discount)"


VOLUME_SHIPPING_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year, {sql_rn('sum(volume)', 2)} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         {REVENUE} AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("volume_shipping", VOLUME_SHIPPING_ORACLE, tags=("trade",))
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by year.

    ``nation`` is broadcast twice (once keyed to the supplier side, once to
    the customer side) — at 100 TB the only shuffles are the two fact-fact
    joins on (l_suppkey→s) and (l_orderkey→o→c), both on their natural keys.
    The symmetric pair predicate is applied after both nation probes, where
    it is a cheap column compare, and the nation filter itself prunes each
    broadcast build side to 2 rows first.
    """
    supplier, li, orders, customer, nation = load_tables(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    pair = nation.filter(F.col("n_name").isin("NATION_3", "NATION_7"))
    supp = supplier.join(
        F.broadcast(pair.select(F.col("n_nationkey").alias("s_nk"),
                                F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("s_nk"),
    ).select("s_suppkey", "supp_nation")
    cust = customer.join(
        F.broadcast(pair.select(F.col("n_nationkey").alias("c_nk"),
                                F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("c_nk"),
    ).select("c_custkey", "cust_nation")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            rn(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


MARKET_SHARE_ORACLE = f"""
SELECT o_year,
       {sql_rn("sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)"
               " / sum(volume)", 6)} AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         {REVENUE} AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
"""


@register("market_share", MARKET_SHARE_ORACLE, tags=("trade",))
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's market share inside a region, by year.

    Share = conditional sum / total sum computed in ONE aggregate pass over
    the joined fact — never a numerator query joined to a denominator query
    (two scans of a 100 TB join).  Dimension chain (part filter, supplier
    nation, customer nation→region) is all broadcast; lineitem⋈orders is the
    lone large shuffle.
    """
    part, li, supplier, orders, customer, nation, region = load_tables(
        spark, sf_dir,
        "part", "lineitem", "supplier", "orders", "customer", "nation", "region",
    )
    promo = part.filter(F.col("p_type") == "PROMO").select("p_partkey")
    supp_nation = supplier.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"),
                                  F.col("n_name").alias("nation"))),
        F.col("s_nationkey") == F.col("s_nk"),
    ).select("s_suppkey", "nation")
    asia_cust = customer.join(
        F.broadcast(
            nation.join(
                F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                nation.n_regionkey == region.r_regionkey,
            ).select("n_nationkey")
        ),
        customer.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("nation") == "NATION_5", volume).otherwise(0.0)
    return (
        li.join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(rn(F.sum(target) / F.sum(volume), 6).alias("mkt_share"))
    )


RETURNED_ITEMS_ORACLE = f"""
SELECT c_custkey, c_name, n_name, {sql_rsum(REVENUE, 2)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
"""


@register("returned_items", RETURNED_ITEMS_ORACLE, tags=("trade",))
def returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns, per customer.

    Both fact filters (return flag on lineitem, quarter on orders) are
    pushed below the fact-fact join, so the join and the customer
    enrichment see only the returned slice.  No LIMIT: top-k over
    floating-point revenue is not deterministic cross-engine, and the
    grouped relation is already O(customers-with-returns) — a driver-safe
    result at any SF (downstream callers page it with topk_orders' idiom).
    """
    customer, orders, li, nation = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    q = orders.filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    returned = li.filter(F.col("l_returnflag") == "R")
    return (
        returned.join(q, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            # order-exact integer-unit sum: at sf1 the plain float sum's
            # partial-aggregation order drifted a last ulp across rounding
            # boundaries vs DuckDB (caught by the sf1 oracle sweep)
            rsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


TOP_VALUE_PARTS_ORACLE = f"""
WITH pv AS (
  SELECT l_partkey, sum(l_extendedprice * l_quantity) AS part_value
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, {sql_rn('part_value', 2)} AS part_value_r
FROM pv
WHERE part_value > (SELECT sum(part_value) * 0.0004 FROM pv)
"""


@register("top_value_parts", TOP_VALUE_PARTS_ORACLE, tags=("trade",))
def top_value_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts above a global value-fraction threshold.

    The per-part rollup is persisted and consumed twice — once by the
    1-row global threshold aggregate (broadcast-cross-joined back) and
    once as the probe side — so lineitem is scanned exactly once and the
    only extra cost is O(parts) cached.  The inner sum
    l_extendedprice*l_quantity matches the oracle term-for-term; per-group
    addition order is engine-internal but the >-threshold compare
    tolerates ulp differences everywhere except an exact boundary.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pv = tracked_persist(
        li.groupBy("l_partkey").agg(
            F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("part_value")
        )
    )
    threshold = pv.agg((F.sum("part_value") * 0.0004).alias("cutoff"))
    return (
        pv.crossJoin(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("cutoff"))
        .select("l_partkey", rn(F.col("part_value"), 2).alias("part_value_r"))
    )


CUSTOMER_DISTRIBUTION_ORACLE = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


@register("customer_distribution", CUSTOMER_DISTRIBUTION_ORACLE, tags=("trade",))
def customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of order counts across customers.

    The priority exclusion lives in the JOIN condition, not a WHERE —
    customers whose every order is urgent must survive with count 0, which
    a post-join filter would silently delete.  Aggregation is two-level:
    per-customer count on the join's shuffle key (no extra exchange), then
    a histogram over the tiny count domain.
    """
    customer, orders = load_tables(spark, sf_dir, "customer", "orders")
    joined = customer.join(
        orders,
        (customer.c_custkey == orders.o_custkey)
        & (orders.o_orderpriority != "1-URGENT"),
        "left_outer",
    )
    return (
        joined.groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


TOP_SUPPLIER_ORACLE = f"""
WITH sr AS (
  SELECT l_suppkey,
         sum(CAST(FLOOR(({REVENUE}) * 10000.0 + 0.5) AS BIGINT)) AS units
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, {sql_rn('units / 10000.0', 2)} AS total_revenue_r
FROM sr JOIN supplier ON s_suppkey = l_suppkey
WHERE units = (SELECT max(units) FROM sr)
"""


@register("top_supplier", TOP_SUPPLIER_ORACLE, tags=("trade",))
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue.

    Argmax via a global window max over the O(suppliers) rollup — one
    extra exchange over a tiny relation instead of re-scanning lineitem
    for the scalar (the textbook view-based rendering).  The revenue
    rollup sums order-exact integer 10^-4 units: argmax compares
    integers, so GENUINE revenue ties produce the identical tie set in
    both engines (the sf1 sweep caught float sums splitting a true
    6-way tie into unequal ulps), and partial-aggregation order can
    never move the winner.
    """
    li, supplier = load_tables(spark, sf_dir, "lineitem", "supplier")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    sr = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.floor(rev * F.lit(10000.0) + F.lit(0.5)).cast("long")).alias(
                "units"
            )
        )
    )
    w = Window.partitionBy()  # global max over O(suppliers) rows
    best = sr.withColumn("max_units", F.max("units").over(w)).filter(
        F.col("units") == F.col("max_units")
    )
    return best.join(
        F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
    ).select(
        "s_suppkey",
        "s_name",
        rn(F.col("units") / F.lit(10000.0), 2).alias("total_revenue_r"),
    )


DISJUNCTIVE_FILTER_ORACLE = f"""
SELECT {sql_rn('sum(' + REVENUE + ')', 2)} AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 21)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 40)
"""


@register("disjunctive_filter", DISJUNCTIVE_FILTER_ORACLE, tags=("trade",))
def disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunctions across both join sides.

    The part-only half of each disjunct (brand ∈ {12,23,34}, size ≥ 1) is
    factored out and applied BEFORE the broadcast build — Catalyst cannot
    hoist predicates out of a cross-relation OR by itself, so the union of
    the per-disjunct part filters is stated explicitly.  The residual OR
    runs as a probe filter inside the broadcast hash join; lineitem is
    never shuffled.
    """
    li, part = load_tables(spark, sf_dir, "lineitem", "part")
    qty = F.col("l_quantity")
    candidates = part.filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 35)
    ).select("p_partkey", "p_brand", "p_size")
    disjunct = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & qty.between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & qty.between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & qty.between(20, 40))
    )
    return (
        li.join(F.broadcast(candidates), F.col("l_partkey") == F.col("p_partkey"))
        .filter(disjunct)
        .agg(
            rn(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


WAITING_ORDERS_ORACLE = """
WITH flagged AS (
  SELECT l_orderkey,
         count(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                             THEN l_suppkey END) AS n_late_supps,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN l_suppkey END) AS late_supp,
         count(DISTINCT l_suppkey) AS n_supps
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM flagged JOIN supplier ON s_suppkey = late_supp
WHERE n_late_supps = 1 AND n_supps > 1
GROUP BY s_name
"""


@register("waiting_orders", WAITING_ORDERS_ORACLE, tags=("trade",))
def waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole late supplier on multi-supplier orders.

    The textbook rendering is EXISTS + NOT EXISTS, i.e. two extra
    self-joins of lineitem.  Both correlates collapse into ONE aggregate
    over the (order) grain — count of distinct late suppliers ("no other
    supplier was late" ⇔ exactly one) and count of distinct suppliers
    ("some other supplier exists" ⇔ more than one) — so lineitem is
    scanned and shuffled once, on the join key it already uses.  Our
    lineitem has no receiptdate/commitdate; "late" is ship > order-date
    + 60 days, and o_orderstatus='F' keeps Q21's finished-orders filter.
    """
    li, orders, supplier = load_tables(
        spark, sf_dir, "lineitem", "orders", "supplier"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    flagged = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.count_distinct(F.when(late, F.col("l_suppkey"))).alias(
                "n_late_supps"
            ),
            F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
            F.count_distinct("l_suppkey").alias("n_supps"),
        )
        .filter((F.col("n_late_supps") == 1) & (F.col("n_supps") > 1))
    )
    return (
        flagged.join(
            F.broadcast(supplier), F.col("late_supp") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


#: ps_supplycost stand-in (the driver schema has no partsupp table): a fixed
#: fraction of the part's retail price.  Keeps Q9's profit arithmetic shape
#: (revenue minus quantity-scaled cost) with columns that exist.
COST_FRACTION = 0.6

PRODUCT_PROFIT_ORACLE = f"""
SELECT n_name AS nation, l_year, {sql_rsum('amount', 2)} AS profit
FROM (
  SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount)
           - {COST_FRACTION} * p_retailprice * l_quantity AS amount
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%gear%'
) profit
GROUP BY nation, l_year
"""


@register("product_profit", PRODUCT_PROFIT_ORACLE, tags=("trade",))
def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation and year.

    The widest join in the battery — lineitem against four other tables —
    and the canonical star-join plan test.  Execution at 100 TB:

    - ``part`` (filtered on p_name FIRST, so only matching partkeys enter
      the build side), ``supplier`` and ``nation`` are dimensions →
      broadcast; the p_name filter prunes the broadcast to a fraction of
      part before a single fact row moves.  Three broadcast probes happen
      inside one WholeStageCodegen span over the lineitem scan — zero
      shuffles so far, and the part probe filters the fact stream to
      matching lines only.
    - ``orders`` is the second fact: that join shuffles both sides on
      orderkey — the plan's ONLY pre-aggregate exchange.  Only
      (o_orderkey, o_orderdate) is read from the orders scan.
    - The final aggregate groups O(nation × year) — 175 rows here —
      partial map-side, so the exchange after the fact join carries
      pre-combined rows.

    ``ps_supplycost`` does not exist in the driver schema (no partsupp
    table); profit uses COST_FRACTION × p_retailprice × quantity, keeping
    Q9's arithmetic shape with real columns.  Profit mixes signs, so the
    float sum's last-ulp association error lands on rounding boundaries;
    the sum therefore runs order-exact in integer 10^-4 units
    (``rsum`` — functions/rounding.py), which also makes the result
    independent of partitioning and combiner order at cluster scale.

    Completes the 22/22 TPC-H shape battery with trade.py's Q7/Q8/Q10/Q11/
    Q13/Q15/Q19 (reference ceiling: zero joins — SURVEY §2.C).
    """
    li, part, supp, orders, nation = load_tables(
        spark, sf_dir, "lineitem", "part", "supplier", "orders", "nation"
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        COST_FRACTION
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(
            F.broadcast(
                part.filter(F.col("p_name").like("%gear%")).select(
                    "p_partkey", "p_retailprice"
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(supp.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("l_year"),
        )
        .agg(rsum(amount, 2).alias("profit"))
    )


#: report size for the co-occurrence ranking.
BASKET_K = 25

BASKET_PAIRS_ORACLE = f"""
WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM lines a JOIN lines b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT part_a, part_b, n_orders
FROM pairs
ORDER BY n_orders DESC, part_a, part_b
LIMIT {BASKET_K}
"""


@register("basket_pairs", BASKET_PAIRS_ORACLE, tags=("trade",))
def basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-purchased part pairs (market-basket co-occurrence — the
    frequent-itemset shape behind recommendations).

    The self-join is keyed on the ORDER (the basket), so the pair
    blowup is Σ C(|basket|, 2) — bounded by the per-order line count
    (~7 here; a retail basket, not a corpus), which keeps the relation
    linear in orders.  Dedup to distinct (order, part) FIRST so
    multi-line parts don't inflate counts, rank with
    TakeOrderedAndProject on the integer count with a total (a, b)
    tiebreak.  At 100 TB: one orderkey shuffle for the dedup + the
    co-located self-join (both sides share the orderkey partitioning —
    no second exchange), then an O(distinct pairs) aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.select("l_orderkey", "l_partkey").distinct()
    a = lines.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = lines.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(BASKET_K)
    )
