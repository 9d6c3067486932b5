"""Dump per-query Exchange and broadcast-hint counts for the registry-wide
plan lints.

Prints Python dict literals mapping query name -> current Exchange count /
explicit-broadcast-hint count at sf0.001, for embedding in
tests/test_plans.py as EXCHANGE_BUDGET / BROADCAST_BUDGET.  Run after a
deliberate plan change to regenerate; the diff in the test file is then
the reviewed evidence that a shuffle or broadcast was added on purpose.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from simpletons_map_reduce_spark.plans import (  # noqa: E402
    count_broadcast_hints,
    count_exchanges,
)
from simpletons_map_reduce_spark.queries import REGISTRY  # noqa: E402
from simpletons_map_reduce_spark.session import get_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    # --only NAME[,NAME…]: measure just the listed queries (new-op flow)
    only: set[str] | None = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    spark = get_session()
    counts: dict[str, int] = {}
    hints: dict[str, int] = {}
    for name, q in sorted(REGISTRY.items()):
        if only is not None and name not in only:
            continue
        try:
            df = q.fn(spark, SF_DIR)
            counts[name] = count_exchanges(df)
            hints[name] = count_broadcast_hints(df)
        except Exception as exc:  # pragma: no cover - diagnostic tool
            print(f"# ERROR {name}: {exc}", file=sys.stderr)
    print("EXCHANGE_BUDGET = {")
    for name, n in counts.items():
        print(f'    "{name}": {n},')
    print("}")
    print("BROADCAST_BUDGET = {")
    for name, n in hints.items():
        if n:
            print(f'    "{name}": {n},')
    print("}")


if __name__ == "__main__":
    main()
