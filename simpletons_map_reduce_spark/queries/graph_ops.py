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
