"""Physical-plan assertions — the ".explain and iterate" discipline as code.

The reference has no optimizer at all (SURVEY §4.1); our counterpart
guarantee is that Catalyst actually delivers the rewrites we rely on at
100 TB: filters and projections reaching the parquet scan, small dims going
broadcast, expressions staying inside whole-stage codegen, and no more
exchanges than the query semantically needs.  tests/test_plans.py pins these
properties so a refactor that silently de-optimizes a plan fails CI.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The executed/physical plan as a string (what .explain() prints)."""
    qe = df._jdf.queryExecution()
    try:
        jvm = df.sparkSession._jvm
        explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
        return qe.explainString(explain_mode)
    except Exception:
        return qe.toString()


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if the scan's PushedFilters mentions every fragment."""
    plan = physical_plan(df)
    pushed = " ".join(
        m.group(0) for m in re.finditer(r"PushedFilters: \[[^\]]*\]", plan)
    )
    return all(frag in pushed for frag in fragments)


def reads_only_columns(df: DataFrame, table_fragment: str, allowed: set[str]) -> bool:
    """True if every ReadSchema on scans matching table_fragment is ⊆ allowed
    (column pruning reached the parquet reader)."""
    plan = physical_plan(df)
    ok = True
    for scan in re.finditer(
        r"FileScan parquet[^\n]*\n(?:[^\n]*\n)*?[^\n]*ReadSchema: struct<([^>]*)>",
        plan,
    ):
        if table_fragment not in scan.group(0):
            continue
        cols = {
            c.split(":")[0].strip() for c in scan.group(1).split(",") if c.strip()
        }
        ok = ok and cols <= allowed
    return ok


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def count_exchanges(df: DataFrame) -> int:
    """Number of DISTINCT shuffle exchanges in the plan (broadcast
    exchanges excluded).

    Uses "simple" mode: formatted mode puts Exchange arguments on separate
    lines, which would hide the partitioning kind from one regex.

    Distinct by plan_id: a persisted relation's cached-build plan is
    re-printed at EVERY InMemoryRelation reference, so raw line counting
    charges one executed shuffle as many times as the relation is consumed
    (near_dedup's round-8 plan printed 32 Exchange lines for ~12 executed
    shuffles).  The same plan object keeps the same plan_id across
    appearances, so distinct ids = shuffles that actually run.  Lines
    without a plan_id (older Spark string forms) fall back to being
    counted individually.
    """
    plan = physical_plan(df, mode="simple")
    ids: set[str] = set()
    extra = 0
    for m in re.finditer(
        r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)"
        r"[^\n]*",
        plan,
    ):
        pid = re.search(r"\[plan_id=(\d+)\]", m.group(0))
        if pid:
            ids.add(pid.group(1))
        else:
            extra += 1
    return len(ids) + extra


def count_broadcast_hints(df: DataFrame) -> int:
    """Number of explicit broadcast HINTS in the analyzed logical plan.

    Counts ``F.broadcast(...)`` call sites (ResolvedHint nodes), not
    size-based broadcasts Catalyst/AQE elect on its own: an explicit hint
    is unconditional — it ships the relation to every executor at ANY
    scale — so each one is a reviewed promise that the relation is
    bounded by contract (a query-literal set, a k-row aggregate, a
    capped top-k), never something that grows with the corpus.
    tests/test_plans.py pins the per-query count so a new unbounded
    broadcast cannot slip in silently (VERDICT r4 item 2).
    """
    analyzed = df._jdf.queryExecution().analyzed().toString()
    return analyzed.count("ResolvedHint (strategy=broadcast")


def has_whole_stage_codegen(df: DataFrame) -> bool:
    """True if the *executed* plan ran whole-stage-codegen stages.

    AQE reports 0 codegen subtrees before execution (the final plan doesn't
    exist yet), so this executes the query and inspects the final adaptive
    plan — use on small/test data only."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "WholeStageCodegen" in plan or "*(" in plan
