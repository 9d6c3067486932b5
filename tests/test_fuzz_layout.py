"""Randomized differential coverage for the round-6 arithmetic operators.

Two generated families:

- z-order interleave parity: the 20-term generated polynomial
  (layout_ops._z_expr) evaluated by Spark SQL and DuckDB on random key
  pairs must agree bit-for-bit — any divergence in the idiv spelling,
  bucketization, or term generation shrinks to a concrete (ok, pk, max)
  triple.
- BPE differential on random vocabularies: the distributed loop
  (pair-count argmax + aggregate() merge state machine) vs the
  independent pure-Python reference on arbitrary word-frequency dicts —
  exercises merge chaining, ties, repeated letters ("aaaa"), and 1-char
  words far beyond the corpus fixtures.
"""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from simpletons_map_reduce_spark.queries.layout_ops import _z_expr
from simpletons_map_reduce_spark.queries.tokenizer_ops import (
    learn_bpe_from_words,
)
from tests.test_tokenizer_ops import _ref_bpe


@st.composite
def key_rows(draw):
    max_ok = draw(st.integers(min_value=1, max_value=10_000_000))
    max_pk = draw(st.integers(min_value=1, max_value=10_000_000))
    n = draw(st.integers(min_value=1, max_value=30))
    rows = [
        (
            draw(st.integers(min_value=0, max_value=max_ok)),
            draw(st.integers(min_value=0, max_value=max_pk)),
        )
        for _ in range(n)
    ]
    return rows, max_ok, max_pk


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=key_rows())
def test_zorder_interleave_cross_engine(spark, data):
    rows, max_ok, max_pk = data
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = sorted(
        r.z
        for r in df.selectExpr(
            f"{_z_expr('div')} AS z".replace("max_ok", str(max_ok)).replace(
                "max_pk", str(max_pk)
            )
        ).collect()
    )
    con = duckdb.connect()
    values = ", ".join(f"({a}, {b})" for a, b in rows)
    sql_z = (
        _z_expr("//").replace("max_ok", str(max_ok)).replace("max_pk", str(max_pk))
    )
    # VALUES literals land as INT32 in DuckDB; the real oracle reads BIGINT
    # parquet columns, so mirror that here or the *1024 multiply overflows.
    want = sorted(
        r[0]
        for r in con.execute(
            f"SELECT {sql_z} FROM ("
            "  SELECT CAST(a AS BIGINT) AS l_orderkey,"
            "         CAST(b AS BIGINT) AS l_partkey"
            f" FROM (VALUES {values}) t(a, b))"
        ).fetchall()
    )
    assert got == want


@st.composite
def word_freqs(draw):
    alphabet = "abcd"
    n_words = draw(st.integers(min_value=1, max_value=10))
    words = draw(
        st.lists(
            st.text(alphabet=alphabet, min_size=1, max_size=7),
            min_size=n_words,
            max_size=n_words,
            unique=True,
        )
    )
    return {w: draw(st.integers(min_value=1, max_value=50)) for w in words}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(wf=word_freqs())
def test_bpe_differential_random_vocab(spark, wf):
    df = spark.createDataFrame(
        list(wf.items()), "word string, freq long"
    )
    got = learn_bpe_from_words(df, n_merges=4)
    want = _ref_bpe(wf, 4)
    assert got == want
