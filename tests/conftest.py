from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from simpletons_map_reduce_spark.session import get_session  # noqa: E402
from simpletons_map_reduce_spark.sources.tables import TABLES  # noqa: E402

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_session("tests", cpus=8, shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    # Match the Spark session's pinned UTC zone — ts::TIMESTAMPTZ oracles
    # would otherwise inherit the host OS timezone (ADVICE r3).
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF0001}/{t}.parquet'")
    yield con
    con.close()
