"""Graph analytics over fact-derived edges — weighted PageRank.

Completes the iterative-algorithm family that dedup_clusters (connected
components, queries/dedup_ops.py) opened: dedup_clusters iterates to a
fixpoint with pointer doubling; this module iterates a *numeric* recurrence
(rank flow) with a fixed iteration count so a DuckDB oracle can unroll the
same three steps as CTEs.

The 100 TB shape has two tiers:
1. EDGE AGGREGATION — the only pass that touches the fact tables: lineitem
   ⋈ orders ⋈ (broadcast nation dims) reduced to a weighted nation-grain
   digraph in one shuffle.  This is where the data volume lives.
2. RANK ITERATION — joins over the aggregated edge relation only.  The
   same loop body runs unchanged on a million-node doc-link graph; per
   iteration it is one (src) join + one (dst) aggregate, both shuffling
   O(edges of the aggregated graph), never the underlying fact.  For
   long-running fixpoint loops the plan-growth fix is the
   ``tracked_checkpoint`` idiom dedup_clusters already pins; 3 fixed
   rounds don't need it.

Reference analog: none (SURVEY §2.D tier-C extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import tracked_checkpoint
from ..functions.rounding import rn, sql_rn
from ..sources.tables import load_tables
from .registry import register

DAMPING = 0.85
N_ITER = 3

_EDGES_SQL = """
  SELECT cn.n_name AS src, sn.n_name AS dst,
         CAST(count(*) AS DOUBLE) AS w
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE cn.n_name <> sn.n_name
  GROUP BY cn.n_name, sn.n_name
"""


def _sql_iteration(prev: str, out: str) -> str:
    """One unrolled PageRank step: r'(v) = (1-d)/N + d·Σ r(u)·w(u,v)/out(u)."""
    return f"""
{out} AS (
  SELECT nodes.nation,
         (1 - {DAMPING}) / nn.n + {DAMPING} * coalesce(flow.incoming, 0) AS r
  FROM nodes CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS nation, sum({prev}.r * e.w / outw.ow) AS incoming
    FROM edges e
    JOIN {prev} ON {prev}.nation = e.src
    JOIN outw   ON outw.nation = e.src
    GROUP BY e.dst
  ) flow ON flow.nation = nodes.nation
)"""


NATION_PAGERANK_ORACLE = f"""
WITH edges AS ({_EDGES_SQL}),
nodes AS (SELECT n_name AS nation FROM nation),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
outw AS (SELECT src AS nation, sum(w) AS ow FROM edges GROUP BY src),
r0 AS (SELECT nation, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),
{_sql_iteration('r0', 'r1')},
{_sql_iteration('r1', 'r2')},
{_sql_iteration('r2', 'r3')}
SELECT nation, {sql_rn('r', 6)} AS rank
FROM r3
"""


@register("nation_pagerank", NATION_PAGERANK_ORACLE, tags=("graph",))
def nation_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the customer-nation → supplier-nation trade
    graph, {N_ITER} fixed iterations, damping {DAMPING}.

    The fact tables are reduced to the weighted digraph in one aggregate
    pass (dims broadcast); every iteration after that joins only the
    aggregated edge relation.  Simple variant: dangling mass is not
    redistributed — the oracle applies the identical recurrence, and both
    engines fold the per-node contribution sums before a 6-dp round.
    """
    li, orders, customer, supplier, nation = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    cn = F.broadcast(
        nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("src"))
    )
    sn = F.broadcast(
        nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("dst"))
    )
    # Materialize the aggregated graph (localCheckpoint, tracked for
    # release) — every rank iteration references `edges`, and without the
    # checkpoint each reference re-plans the whole fact aggregation:
    # 3 iterations × (flow + outw) = SIX lineitem scans.  After it, the
    # facts are scanned exactly once and iterations join O(edges) rows.
    edges = tracked_checkpoint(
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(cn, F.col("c_nationkey") == F.col("c_nk"))
        .join(sn, F.col("s_nationkey") == F.col("s_nk"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("w"))
    )
    nodes = nation.select(F.col("n_name").alias("nation"))
    n_nodes = nodes.agg(F.count("*").cast("double").alias("n"))
    outw = edges.groupBy(F.col("src").alias("nation")).agg(
        F.sum("w").alias("ow")
    )
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "nation", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(N_ITER):
        flow = (
            edges.join(ranks.withColumnRenamed("nation", "src"), "src")
            .join(outw.withColumnRenamed("nation", "src"), "src")
            .groupBy(F.col("dst").alias("nation"))
            .agg(F.sum(F.col("r") * F.col("w") / F.col("ow")).alias("incoming"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n_nodes))
            .join(flow, "nation", "left")
            .select(
                "nation",
                (
                    (1 - DAMPING) / F.col("n")
                    + DAMPING * F.coalesce("incoming", F.lit(0.0))
                ).alias("r"),
            )
        )
    return ranks.select("nation", rn(F.col("r"), 6).alias("rank"))


TRIANGLE_COUNT_ORACLE = f"""
WITH digraph AS ({_EDGES_SQL}),
edges AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM digraph
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.v
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
),
members AS (
  SELECT a AS nation FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT nation, CAST(count(*) AS BIGINT) AS n_triangles
FROM members GROUP BY nation
"""


@register("triangle_count", TRIANGLE_COUNT_ORACLE, tags=("graph",))
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation on the nation trade graph — the
    ordered-edge (node-iterator) distributed triangle count.

    Same two-tier shape as nation_pagerank: the fact tables reduce to the
    aggregated nation digraph in one pass (tier 1, where the volume is),
    then the graph algorithm runs on the aggregate only (tier 2).
    Canonicalizing edges to u < v makes each triangle appear EXACTLY once
    in the 3-way join (a<b<c), so no post-division by 6; the join keys are
    vertices, so shuffle volume is O(E + wedges) of the aggregated graph —
    the standard scalable formulation (wedge checking via the third-edge
    equi-join, never an all-pairs product).  At doc-graph scale the same
    plan applies with the usual high-degree-vertex mitigation (degree
    ordering already folds the worst wedges onto low-degree sources).
    """
    li, orders, customer, supplier, nation = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    cn = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("src")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("dst")
    )
    digraph = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
    )
    from ..caching import tracked_persist

    edges = tracked_persist(
        digraph.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        ).distinct()
    )
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = edges.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = edges.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    tri = (
        e1.join(e2, "b")
        .join(
            e3,
            (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")),
        )
        .select("a", "b", "c")
    )
    members = (
        tri.select(F.col("a").alias("nation"))
        .unionAll(tri.select(F.col("b").alias("nation")))
        .unionAll(tri.select(F.col("c").alias("nation")))
    )
    return members.groupBy("nation").agg(
        F.count("*").cast("long").alias("n_triangles")
    )
