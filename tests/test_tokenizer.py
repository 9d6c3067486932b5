"""Tokenizer parity — the biggest hash-match risk (SURVEY §7).

Three implementations must agree on the reference contract (maximal runs of
Unicode letters, mrapps/wc.go:19-32): the Spark expression
(functions/text.py), the DuckDB oracle regex, and the Python map-fn used by
the MapReduce framework API.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from simpletons_map_reduce_spark.functions.text import sql_tokens, tokens
from simpletons_map_reduce_spark.mapreduce import _letters_split

FIXTURES = [
    "Don't 42 Café café",
    "hello world",
    "",
    "123 456",
    "naïve coöperate résumé",
    "under_score dash-dash",
    "ÀÉÎÕÜ mixed ÇASE",
    "tab\tnewline\nspace",
    "greek αλφα βήτα and ümlaut",
    "x",
    "...punct!!!only???",
]

EXPECTED = {
    "Don't 42 Café café": ["Don", "t", "Café", "café"],
    "hello world": ["hello", "world"],
    "": [],
    "123 456": [],
    "under_score dash-dash": ["under", "score", "dash", "dash"],
}


@pytest.mark.parametrize("text", FIXTURES)
def test_three_way_parity(spark, text):
    srow = spark.range(1).select(tokens(F.lit(text)).alias("t")).collect()[0]
    spark_toks = list(srow.t)
    duck_toks = duckdb.sql(
        f"SELECT {sql_tokens('$tx')} AS t", params={"tx": text}
    ).fetchone()[0]
    py_toks = _letters_split(text)
    assert spark_toks == duck_toks == py_toks


@pytest.mark.parametrize("text,expected", list(EXPECTED.items()))
def test_reference_contract(spark, text, expected):
    srow = spark.range(1).select(tokens(F.lit(text)).alias("t")).collect()[0]
    assert list(srow.t) == expected
