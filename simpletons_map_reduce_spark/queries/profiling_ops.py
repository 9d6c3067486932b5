"""Data-profiling & semi-structured operators over ``events`` — tier C.

Three capabilities a pipeline engineer reaches for before any modeling run:
pull typed fields out of semi-structured payloads (JSON props), cross-tab a
categorical against an entity (pivot), and bin a numeric column into a
histogram.  All three are single-aggregation plans — map-side combined, one
shuffle on the group key, no UDFs — so they cost one pass over the fact
table at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import rn, sql_rn
from ..sources.tables import load_table, load_tables
from .registry import register

PROPS_EXTRACT_ORACLE = f"""
WITH t AS (
    SELECT json_extract(props, '$.k')::BIGINT AS k, value
    FROM events
)
SELECT k,
       CAST(count(*) AS BIGINT) AS n_events,
       {sql_rn('avg(value)', 4)} AS avg_value
FROM t GROUP BY k
"""


@register("props_extract", PROPS_EXTRACT_ORACLE, tags=("profiling",))
def props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the JSON ``props`` payload + aggregate by it.

    ``get_json_object`` is a native expression (Jackson inside codegen, no
    Python); the JSON parse happens once in the scan stage and only the
    extracted bigint continues into the aggregate.  At 100 TB: prefer
    parsing ONCE into a typed column and persisting (schema-on-write); this
    operator is the schema-on-read path for payloads you don't control.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            F.get_json_object("props", "$.k").cast("long").alias("k"), "value"
        )
        .groupBy("k")
        .agg(
            F.count("*").alias("n_events"),
            rn(F.avg("value"), 4).alias("avg_value"),
        )
    )


#: Fixed pivot columns — an explicit list keeps the schema deterministic
#: (and skips Spark's extra distinct-values job; at scale an implicit pivot
#: is a full shuffle just to learn the column set).
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

EVENT_PIVOT_ORACLE = f"""
SELECT user_id,
       {", ".join(
           f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}"
           for t in EVENT_TYPES
       )}
FROM events GROUP BY user_id
"""


@register("event_pivot", EVENT_PIVOT_ORACLE, tags=("profiling",))
def event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type cross-tab (pivot with a declared column set).

    Spelled as conditional aggregates rather than ``.pivot()``: Spark's
    pivot — even with declared values — lowers to a (user, type) pre-
    aggregate plus a second pivotfirst aggregate, i.e. TWO shuffles.  One
    ``count(when(type = t))`` per declared column is the same result in a
    single map-side-combined exchange on user_id (pinned in test_plans),
    and is exactly the FILTER-aggregate plan the oracle spells.
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == t, 1))
            .cast("long")
            .alias(f"n_{t}")
            for t in EVENT_TYPES
        ]
    )


HIST_BIN = 25.0  # fixed-width bins over the value column

VALUE_HISTOGRAM_ORACLE = f"""
SELECT CAST(floor(value / {HIST_BIN}) * {HIST_BIN} AS DOUBLE) AS bin_start,
       CAST(count(*) AS BIGINT) AS n,
       {sql_rn('min(value)', 4)} AS bin_min,
       {sql_rn('max(value)', 4)} AS bin_max
FROM events GROUP BY 1
"""


@register("value_histogram", VALUE_HISTOGRAM_ORACLE, tags=("profiling",))
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values (bin width {HIST_BIN}).

    floor-division binning is a scan-stage expression; the aggregate groups
    on the bin id — cardinality = value-range/width regardless of row count,
    so the shuffle is constant-size at any SF.
    """
    events = load_table(spark, sf_dir, "events")
    bin_start = (F.floor(F.col("value") / HIST_BIN) * HIST_BIN).cast("double")
    return (
        events.select(bin_start.alias("bin_start"), "value")
        .groupBy("bin_start")
        .agg(
            F.count("*").alias("n"),
            rn(F.min("value"), 4).alias("bin_min"),
            rn(F.max("value"), 4).alias("bin_max"),
        )
    )


CUSTOMER_DECILES_ORACLE = f"""
WITH spend AS (
    SELECT o_custkey, sum(o_totalprice) AS total_spend
    FROM orders GROUP BY o_custkey
),
tiled AS (
    SELECT o_custkey, total_spend,
           ntile(10) OVER (ORDER BY total_spend, o_custkey) AS decile
    FROM spend
)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       {sql_rn('min(total_spend)', 2)} AS min_spend,
       {sql_rn('max(total_spend)', 2)} AS max_spend,
       {sql_rn('sum(total_spend)', 2)} AS decile_spend
FROM tiled GROUP BY decile
"""


#: Range-bucket width for the distributed global ranking (dollars of
#: customer lifetime spend per bucket).  Bucket count = spend-range / width:
#: small enough that the bucket-offset relation is trivially broadcastable,
#: large enough that no bucket holds a meaningful fraction of customers.
DECILE_BUCKET_WIDTH = 50_000.0

N_TILES = 10


@register("customer_deciles", CUSTOMER_DECILES_ORACLE, tags=("profiling",))
def customer_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value deciles: per-customer spend, exact ntile(10),
    then per-decile population and spend stats.

    A naive ``ntile(10) OVER (ORDER BY …)`` is an UNPARTITIONED window —
    Spark moves every row to one partition (WindowExec warns exactly this),
    which is the classic global-ranking scale trap.  This plan computes the
    same global row number distributed, two-phase:

    1. range-bucket each customer by ``floor(spend / W)`` (scan-local);
    2. per-bucket counts → prefix-sum offsets with a window over the TINY
       bucket relation (rows = #buckets, not #customers);
    3. global rank = bucket offset (broadcast join) + ``row_number()`` over
       a window PARTITIONED by bucket — every heavy operator is now keyed;
    4. decile from (rank, n) with ntile's exact integer split: the first
       ``n mod 10`` tiles take ``n div 10 + 1`` rows.

    Ties broken by (spend, custkey), so the tiling is deterministic and
    bit-identical to the oracle's ntile.
    """
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    spend = orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("total_spend")
    )
    bucket = F.floor(F.col("total_spend") / DECILE_BUCKET_WIDTH)
    spend = spend.withColumn("bucket", bucket)
    bcnt = spend.groupBy("bucket").agg(F.count("*").alias("c"))
    woff = (
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = bcnt.select(
        "bucket",
        F.coalesce(F.sum("c").over(woff), F.lit(0)).alias("off"),
        F.sum("c").over(
            Window.orderBy("bucket").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    wrk = Window.partitionBy("bucket").orderBy("total_spend", "o_custkey")
    ranked = (
        spend.join(F.broadcast(offs), "bucket")
        .withColumn("rk", F.row_number().over(wrk) + F.col("off"))
    )
    # ntile's exact split in integer arithmetic (rk, n are bigints)
    tiled = ranked.withColumn(
        "decile",
        F.expr(
            f"CASE WHEN rk <= (n % {N_TILES}) * (n DIV {N_TILES} + 1)"
            f" THEN CAST((rk - 1) DIV (n DIV {N_TILES} + 1) + 1 AS INT)"
            f" ELSE CAST(n % {N_TILES}"
            f"      + (rk - (n % {N_TILES}) * (n DIV {N_TILES} + 1) - 1)"
            f"        DIV (n DIV {N_TILES}) + 1 AS INT) END"
        ),
    )
    return tiled.groupBy("decile").agg(
        F.count("*").alias("n_customers"),
        rn(F.min("total_spend"), 2).alias("min_spend"),
        rn(F.max("total_spend"), 2).alias("max_spend"),
        rn(F.sum("total_spend"), 2).alias("decile_spend"),
    )


#: Profiled columns.  min/max are stringified for one uniform output schema;
#: the NTZ timestamp stringifies identically in both engines
#: ('YYYY-MM-DD HH:MM:SS', timezone-free), so no epoch conversion needed.
_PROFILE_COLS = [
    ("o_orderkey", None),
    ("o_custkey", None),
    ("o_orderstatus", None),
    ("o_totalprice", None),
    ("o_orderdate", "ts"),
    ("o_orderpriority", None),
]


def _profile_oracle() -> str:
    parts = []
    for col, _kind in _PROFILE_COLS:
        v = col
        parts.append(
            f"SELECT '{col}' AS col_name,"
            f" CAST(count(*) - count({col}) AS BIGINT) AS n_nulls,"
            f" CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,"
            f" min({v})::VARCHAR AS min_val,"
            f" max({v})::VARCHAR AS max_val FROM orders"
        )
    return " UNION ALL ".join(parts)


TABLE_PROFILE_ORACLE = _profile_oracle()


@register("table_profile", TABLE_PROFILE_ORACLE, tags=("profiling",))
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data-quality profile of ``orders``: null count, exact
    distinct count, min/max (stringified uniformly across types).

    One independent single-column aggregate per profiled column, unioned
    (all subtrees run inside one job).  The previous one-pass form put
    every ``countDistinct`` in a single agg, which makes Spark EXPAND the
    input once per profiled column — 6× the rows through the partial
    aggregation and its exchange.  Per-column subtrees instead get the
    classic two-phase distinct aggregate each, over a scan pruned to that
    one column — on columnar storage six one-column scans read the same
    bytes as one six-column scan, and nothing is expanded (measured ~2×
    at sf0.1: 4.3 s → 2.2 s).  The oracle is literally a UNION ALL of
    per-column SELECTs, so this is also the shape it pins.
    """
    orders = load_table(spark, sf_dir, "orders")
    parts = []
    for col, _kind in _PROFILE_COLS:
        v = F.col(col)
        parts.append(
            orders.select(col).agg(
                F.lit(col).alias("col_name"),
                (F.count(F.lit(1)) - F.count(col))
                .cast("long")
                .alias("n_nulls"),
                F.countDistinct(col).cast("long").alias("n_distinct"),
                F.min(v).cast("string").alias("min_val"),
                F.max(v).cast("string").alias("max_val"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


@register("table_profile_approx", None, tags=("profiling",))
def table_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE PATH for column profiling (round 10 — registering the
    swap ``table_profile``'s docstring promised): ``approx_count_distinct``
    (HyperLogLog++, constant ~kilobyte state per column, mergeable)
    replaces the exact multi-column ``countDistinct``, which expands the
    input once per profiled column and measured 228.5 s at the 150M-row
    sweep.  The HLL plan is ONE map-side-combined pass at any width and
    any scale — the profile a 100 TB ingest actually runs.

    Same output shape as ``table_profile``; nulls/min/max stay EXACT
    (identical aggregates), only n_distinct is an estimate — rows-only
    evidence class with the HLL error contract (≤5% relative at rsd
    0.02, exactness of the other columns) pinned in
    tests/test_profiling_approx.py.
    """
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for col, _kind in _PROFILE_COLS:
        v = F.col(col)
        aggs += [
            (F.count(F.lit(1)) - F.count(col)).alias(f"{col}__nulls"),
            F.approx_count_distinct(col, rsd=0.02).alias(f"{col}__distinct"),
            F.min(v).cast("string").alias(f"{col}__min"),
            F.max(v).cast("string").alias(f"{col}__max"),
        ]
    one = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{col}', {col}__nulls, {col}__distinct, {col}__min, {col}__max"
        for col, _ in _PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args})"
            " AS (col_name, n_nulls, n_distinct, min_val, max_val)"
        )
    ).select(
        "col_name",
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_val",
        "max_val",
    )


EMBEDDING_STATS_ORACLE = f"""
WITH v AS (
  SELECT label,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm,
         len(embedding) AS dim
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(min(dim) AS BIGINT) AS min_dim,
       CAST(max(dim) AS BIGINT) AS max_dim,
       {sql_rn('min(norm)', 6)} AS min_norm,
       {sql_rn('max(norm)', 6)} AS max_norm,
       {sql_rn('avg(norm)', 4)} AS avg_norm
FROM v
GROUP BY label
"""


@register("embedding_stats", EMBEDDING_STATS_ORACLE, tags=("profiling",))
def embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding profile: vector counts, dimension bounds, and
    L2-norm spread — the sanity scan run before any ANN/dedup pass (a
    zero-norm or wrong-dim stripe invalidates cosine math downstream).

    The norm is a per-row fold (float→double cast is exact, double ops are
    IEEE-identical across engines, sqrt is correctly rounded), so min/max
    agree bit-for-bit pre-rounding; only the order-dependent avg needs the
    coarser 4-dp round.  One map-side-combined aggregate — vectors never
    shuffle, only (label, partial stats) rows do.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.expr(
            "aggregate(embedding, 0D, (acc, x) ->"
            " acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
        )
    )
    v = emb.select(
        F.col("label").cast("long").alias("label"),
        norm.alias("norm"),
        F.size("embedding").alias("dim"),
    )
    return v.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.min("dim").cast("long").alias("min_dim"),
        F.max("dim").cast("long").alias("max_dim"),
        rn(F.min("norm"), 6).alias("min_norm"),
        rn(F.max("norm"), 6).alias("max_norm"),
        rn(F.avg("norm"), 4).alias("avg_norm"),
    )


SKEW_TOP_K = 5

KEY_SKEW_ORACLE = f"""
WITH counts AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id
),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(cnt) AS BIGINT) AS total,
         CAST(max(cnt) AS BIGINT) AS max_cnt
  FROM counts
),
ranked AS (
  SELECT user_id, cnt,
         row_number() OVER (ORDER BY cnt DESC, user_id) AS rk
  FROM counts
)
SELECT r.user_id, r.cnt,
       {sql_rn('CAST(r.cnt AS DOUBLE) / g.total', 6)} AS share,
       {sql_rn('CAST(g.max_cnt AS DOUBLE) * g.n_keys / g.total', 4)}
         AS skew_ratio
FROM ranked r CROSS JOIN g
WHERE r.rk <= {SKEW_TOP_K}
"""


@register("key_skew_profile", KEY_SKEW_ORACLE, tags=("profiling",))
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic: the {SKEW_TOP_K} heaviest keys with
    their traffic share, plus the global skew ratio (max/mean key count —
    1.0 is uniform; the number that predicts straggler tasks before you
    run the join).

    One partial+final count per key, a 1-row global aggregate broadcast
    back, and a TakeOrdered top-k — the profile costs one shuffle of
    O(keys) pre-combined counts however large the fact is.  All inputs to
    the derived ratios are exact integers, so the doubles match the
    oracle bit-for-bit before rounding.
    """
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    g = counts.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("total"),
        F.max("cnt").alias("max_cnt"),
    )
    top = counts.orderBy(F.col("cnt").desc(), "user_id").limit(SKEW_TOP_K)
    return top.crossJoin(F.broadcast(g)).select(
        "user_id",
        "cnt",
        rn(F.col("cnt").cast("double") / F.col("total"), 6).alias("share"),
        rn(
            F.col("max_cnt").cast("double") * F.col("n_keys") / F.col("total"), 4
        ).alias("skew_ratio"),
    )


TABLE_CHECKS_ORACLE = """
WITH o AS (
  SELECT CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_custkey,
         CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS dup_pk,
         CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS nonpos_price
  FROM orders
),
l AS (
  SELECT CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber))
              AS BIGINT) AS dup_pk,
         CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS nonpos_qty,
         CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0
                  END) AS BIGINT) AS bad_discount
  FROM lineitem
),
fk_o AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM orders
  WHERE o_custkey IS NOT NULL
    AND o_custkey NOT IN (SELECT c_custkey FROM customer)
),
fk_l AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem
  WHERE l_orderkey IS NOT NULL
    AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)
)
SELECT 'orders.null_custkey' AS check_name, null_custkey AS n_violations FROM o
UNION ALL SELECT 'orders.pk_unique', dup_pk FROM o
UNION ALL SELECT 'orders.positive_price', nonpos_price FROM o
UNION ALL SELECT 'lineitem.pk_unique', dup_pk FROM l
UNION ALL SELECT 'lineitem.positive_qty', nonpos_qty FROM l
UNION ALL SELECT 'lineitem.discount_range', bad_discount FROM l
UNION ALL SELECT 'orders.fk_customer', n FROM fk_o
UNION ALL SELECT 'lineitem.fk_orders', n FROM fk_l
"""


@register("table_checks", TABLE_CHECKS_ORACLE, tags=("profiling",))
def table_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint battery: (check_name, n_violations) — the
    pipeline gate every warehouse load runs (null keys, PK uniqueness,
    FK coverage, domain ranges).

    Same-table checks FUSE into one aggregate pass per table (orders and
    lineitem are each scanned once for their null/uniqueness/range
    checks — count-distinct rides the same exchange); FK coverage is a
    broadcast LEFT-ANTI count per fact (dimension side broadcast, never
    a NOT IN shuffle).  A clean load emits all zeros; the fixture is
    clean by construction, and tests/test_queries feed a corrupted table
    through the same expressions to prove the signals fire.
    """
    orders, li, cust = load_tables(
        spark, sf_dir, "orders", "lineitem", "customer"
    )
    o = orders.agg(
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_custkey"),
        (F.count("*") - F.count_distinct("o_orderkey"))
        .cast("long")
        .alias("dup_pk"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("nonpos_price"),
    )
    l = li.agg(
        (F.count("*") - F.count_distinct("l_orderkey", "l_linenumber"))
        .cast("long")
        .alias("dup_pk"),
        F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("nonpos_qty"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("bad_discount"),
    )
    # NULL keys are the null check's finding, not an FK violation — and the
    # engines disagree on NULL NOT IN semantics, so exclude them explicitly.
    fk_o = (
        orders.filter(F.col("o_custkey").isNotNull())
        .join(
            F.broadcast(cust.select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    fk_l = (
        li.filter(F.col("l_orderkey").isNotNull())
        .join(
            orders.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count("*").cast("long").alias("n"))
    )

    # stack() unpivots ONE aggregate row into the check rows — a union of
    # per-check selects would re-execute the fused aggregate (and rescan
    # the table) once per row.
    o_rows = o.select(
        F.expr(
            "stack(3, 'orders.null_custkey', null_custkey,"
            " 'orders.pk_unique', dup_pk,"
            " 'orders.positive_price', nonpos_price)"
            " AS (check_name, n_violations)"
        )
    )
    l_rows = l.select(
        F.expr(
            "stack(3, 'lineitem.pk_unique', dup_pk,"
            " 'lineitem.positive_qty', nonpos_qty,"
            " 'lineitem.discount_range', bad_discount)"
            " AS (check_name, n_violations)"
        )
    )
    fk_o_row = fk_o.select(
        F.lit("orders.fk_customer").alias("check_name"),
        F.col("n").alias("n_violations"),
    )
    fk_l_row = fk_l.select(
        F.lit("lineitem.fk_orders").alias("check_name"),
        F.col("n").alias("n_violations"),
    )
    return o_rows.unionAll(l_rows).unionAll(fk_o_row).unionAll(fk_l_row)


WEIGHTED_MEDIAN_ORACLE = f"""
WITH g AS (
  SELECT l_returnflag, l_discount, sum(l_quantity) AS w
  FROM lineitem GROUP BY 1, 2
),
c AS (
  SELECT l_returnflag, l_discount, w,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY l_discount
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         sum(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM g
)
SELECT l_returnflag,
       {sql_rn('min(l_discount)', 4)} AS weighted_median_discount,
       {sql_rn('any_value(tw)', 2)} AS total_weight
FROM c
WHERE cw >= tw / 2
GROUP BY l_returnflag
"""


@register("weighted_median", WEIGHTED_MEDIAN_ORACLE, tags=("profiling",))
def weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median discount per return flag.

    The exact weighted-quantile shape that ``approx_quantiles`` trades
    away: pre-aggregate to one row per (group, value) — |distinct
    values| rows, NOT |rows| — then a cumulative-weight window over that
    compact relation picks the value where cumulative weight crosses
    half the total.  At 100 TB the fact table shuffles once into the
    (group, value) aggregate (map-side combined); the windows run over
    O(groups × distinct values) rows only — for bounded-cardinality
    measures like discount (11 distinct values) that is trivially small,
    which is exactly when exact beats sketch.

    Determinism: quantities are integral doubles, so every cumulative
    sum is exact (< 2^53) and the crossing row is engine-independent —
    no rsum machinery needed.
    """
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag", "l_discount").agg(
        F.sum("l_quantity").alias("w")
    )
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_discount")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("l_returnflag")
    c = g.select(
        "l_returnflag",
        "l_discount",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(wt).alias("tw"),
    )
    return (
        c.filter(F.col("cw") >= F.col("tw") / 2)
        .groupBy("l_returnflag")
        .agg(
            rn(F.min("l_discount"), 4).alias("weighted_median_discount"),
            rn(F.first("tw"), 2).alias("total_weight"),
        )
    )


STATS_MOMENTS_ORACLE = f"""
WITH m AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         sum(CAST(l_quantity AS BIGINT)) AS sx,
         sum(CAST(l_quantity * l_quantity AS BIGINT)) AS sxx,
         sum(CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT)) AS sy,
         sum(CAST(FLOOR(l_discount * 10000 + 0.5)
                  * FLOOR(l_discount * 10000 + 0.5) AS BIGINT)) AS syy,
         sum(CAST(l_quantity AS BIGINT)
             * CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT)) AS sxy
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, n,
       {sql_rn('sx / CAST(n AS DOUBLE)', 4)} AS mean_qty,
       {sql_rn('(n * sxx - sx * sx) / (CAST(n AS DOUBLE) * n)', 4)} AS var_qty,
       {sql_rn('(n * sxy - sx * sy) / '
               '(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * '
               ' sqrt(CAST(n * syy - sy * sy AS DOUBLE)))', 6)}
         AS corr_qty_disc
FROM m
"""


@register("stats_moments", STATS_MOMENTS_ORACLE, tags=("profiling",))
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean / population variance / correlation per return flag — from
    EXACT integer moments, not float accumulators.

    ``F.corr``/``F.var_pop`` stream float moments whose partial-merge
    order perturbs the last ulps (and whose Welford-style internals
    differ between engines), so they can never hash-match an oracle and
    — worse — aren't bit-stable across AQE re-plans.  Quantities are
    integral and discounts land on basis points, so all five moments
    (Σx, Σx², Σy, Σy², Σxy) are integer-exact and associative, and the
    final mean/var/corr are single double expressions over identical
    integers on both engines.  One map-side-combined aggregate, one
    exchange of 5 integers per group — the cheapest possible plan, and
    the same trick rsum uses for money.

    Overflow discipline: the DuckDB oracle's ``sum()`` promotes to
    HUGEINT, but Spark LONG arithmetic wraps SILENTLY in non-ANSI mode —
    at 100 TB the n·Σxy product blows past 2^63.  The Spark side
    therefore accumulates the moments as DECIMAL(38,0) (exact to 10^38;
    overflow yields NULL, which surfaces as a loudly-null output row
    instead of a silently wrong one).  Casting the identical integers
    decimal→double and hugeint→double is bit-equal, so hash parity is
    unaffected.
    """
    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    x = F.col("l_quantity").cast("long")
    y = F.floor(F.col("l_discount") * 10000 + F.lit(0.5)).cast("long")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x.cast(dec)).alias("sx"),
        F.sum((x * x).cast(dec)).alias("sxx"),
        F.sum(y.cast(dec)).alias("sy"),
        F.sum((y * y).cast(dec)).alias("syy"),
        F.sum((x * y).cast(dec)).alias("sxy"),
    )
    n = F.col("n").cast("double")
    var_num = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    corr_num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    y_var = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return m.select(
        "l_returnflag",
        "n",
        rn(F.col("sx") / n, 4).alias("mean_qty"),
        rn(var_num / (n * F.col("n")), 4).alias("var_qty"),
        rn(corr_num / (F.sqrt(var_num) * F.sqrt(y_var)), 6).alias(
            "corr_qty_disc"
        ),
    )


#: equi-depth bucket count.
EQUI_DEPTH_K = 8

HISTOGRAM_EQUI_DEPTH_ORACLE = f"""
WITH b AS (
  SELECT event_type, value,
         ntile({EQUI_DEPTH_K}) OVER (PARTITION BY event_type
                                     ORDER BY value, event_id) AS bucket
  FROM events
)
SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       {sql_rn('min(value)', 4)} AS lo,
       {sql_rn('max(value)', 4)} AS hi
FROM b
GROUP BY event_type, bucket
"""


@register("histogram_equi_depth", HISTOGRAM_EQUI_DEPTH_ORACLE, tags=("profiling",))
def histogram_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram: K buckets of (near-)equal row count per
    group, with their value boundaries — the optimizer-statistics /
    data-profiling dual of ``value_histogram``'s fixed-width bins
    (equi-width starves on skewed values; equi-depth adapts boundaries
    to the distribution, which is what selectivity estimation wants).

    ``ntile`` assigns buckets in one ranking pass; the (event_id)
    tiebreak makes the assignment total, so both engines split ties
    identically and min/max boundaries hash-match.  One event_type
    shuffle serves the window AND the bucket aggregate (partitioning
    reuse); output is O(groups × K).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    b = ev.select(
        "event_type", "value", F.ntile(EQUI_DEPTH_K).over(w).alias("bucket")
    )
    return b.groupBy("event_type", F.col("bucket").cast("long").alias("bucket")).agg(
        F.count("*").alias("n"),
        rn(F.min("value"), 4).alias("lo"),
        rn(F.max("value"), 4).alias("hi"),
    )


@register("histogram_equi_depth_approx", None, tags=("profiling",))
def histogram_equi_depth_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE PATH for equi-depth histograms (round 10 — registering
    the swap the exact twin's docstring promised): bucket boundaries come
    from ``percentile_approx`` (Greenwald–Khanna sketch: map-side
    combinable, mergeable, one ordinary group aggregate), so per-group
    parallelism is never capped the way the exact twin's total ``ntile``
    sort is — at the 100M-event sweep the exact op ran 130.7 s because
    K buckets per group serialize through one ranking pass per group;
    the sketch plan is two scans and one groups-sized broadcast at ANY
    group count.

    Same output shape as ``histogram_equi_depth`` (event_type, bucket,
    n, lo, hi); rows-only evidence class (sketch boundaries are
    approximate by nature) with the accuracy contract pinned in
    tests/test_profiling_approx.py: bucket depths within tolerance of
    the ideal n/K and exactly-conserved totals.  The boundary relation
    broadcast is bounded by contract: |event_type enum| × (K−1) rows.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    qs = [i / EQUI_DEPTH_K for i in range(1, EQUI_DEPTH_K)]
    bounds = ev.groupBy("event_type").agg(
        F.percentile_approx("value", qs).alias("bounds")
    )
    b = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "value",
        (
            F.lit(1)
            + F.aggregate(
                "bounds",
                F.lit(0),
                lambda acc, bd: acc + F.when(F.col("value") > bd, 1).otherwise(0),
            )
        ).cast("long").alias("bucket"),
    )
    return b.groupBy("event_type", "bucket").agg(
        F.count("*").alias("n"),
        rn(F.min("value"), 4).alias("lo"),
        rn(F.max("value"), 4).alias("hi"),
    )
