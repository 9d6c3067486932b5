"""Property-based and adversarial-input tests.

The tokenizer contract (maximal runs of Unicode letters, mrapps/wc.go:19-32)
must hold for the Python map-fn and the DuckDB oracle on *arbitrary* text,
not just the fixtures — hypothesis explores the space cheaply (no JVM in the
loop; Spark-side parity is pinned by test_tokenizer.py on fixed fixtures).

The MapReduce framework must satisfy run_job ≡ run_sequential on adversarial
key/value data (empty strings, unicode keys, whitespace, duplicate keys) —
the reference's differential-testing idea pushed to hostile inputs.
"""

from __future__ import annotations

import random

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from simpletons_map_reduce_spark.functions.text import sql_tokens
from simpletons_map_reduce_spark.mapreduce import (
    _letters_split,
    run_job,
    run_sequential,
)

# Broad-but-sane alphabet: latin+accents, greek, cyrillic, CJK, digits,
# punctuation, whitespace.  Deliberately excludes exotic Unicode categories
# (combining marks, compatibility forms) where regex engines legitimately
# disagree and which the reference's Gutenberg corpus never contains.
ALPHABET = (
    "abcXYZ àéîõü ÇÅØ αβγΩ жзй 漢字仮名 0123456789"
    " .,!?'\"-_()[]{}@#$%&*+=/\\\t\n"
)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=ALPHABET, max_size=200))
def test_tokenizer_python_duckdb_parity(text):
    py = _letters_split(text)
    sql = duckdb.sql(
        f"SELECT {sql_tokens('$t')} AS toks", params={"t": text}
    ).fetchone()[0]
    assert py == sql


def _adversarial_kv(n=300):
    prng = random.Random(42)
    keys = [
        "",
        " ",
        "k with spaces",
        "line\nbreak",
        "unicode·键·κλειδί",
        "dup",
        "DUP",
        "0",
        "k" * 200,
    ]
    rows = []
    for i in range(n):
        k = prng.choice(keys) + (str(i % 7) if prng.random() < 0.5 else "")
        v = prng.choice(["", "x", "value v", "π≈3.14159", str(i)])
        rows.append((k, v))
    return rows


def test_run_job_equals_sequential_on_adversarial_kv(spark):
    rows = _adversarial_kv()
    inputs = spark.createDataFrame(rows, "key string, value string")

    def mapf(k, v):
        # 1→N expansion with key rewriting; exercises empty keys/values
        return [(k, v), (v, k)] if v else [(k, "∅")]

    def reducef(key, values):
        return "|".join(values)  # values arrive sorted (B7 idiom)

    dist = {
        (r.key, r.value)
        for r in run_job(spark, mapf, reducef, inputs, num_partitions=7).collect()
    }
    seq = {
        (r.key, r.value)
        for r in run_sequential(spark, mapf, reducef, inputs).collect()
    }
    assert dist == seq
    # one output row per distinct intermediate key
    assert len({k for k, _ in dist}) == len(dist)


@settings(max_examples=300, deadline=None)
@given(
    st.floats(
        min_value=-1e9,
        max_value=1e9,
        allow_nan=False,
        allow_infinity=False,
    ),
    st.integers(min_value=0, max_value=6),
)
def test_rounding_parity_python_vs_duckdb(x, n):
    """The floor-round idiom (functions/rounding.py) must produce the SAME
    double in pure-IEEE Python arithmetic and in DuckDB for any input —
    the core cross-engine parity primitive every money/score column rides
    on.  (The Spark side executes the identical floor/multiply/divide
    expression tree on the same doubles, so DuckDB parity here transfers.)
    """
    import math

    scale = float(10**n)
    want = math.floor(x * scale + 0.5) / scale
    con = duckdb.connect()
    # Feed x as a STRING cast (strtod — exact, like parquet-sourced
    # doubles).  A bare high-precision literal would parse as a wide
    # DECIMAL whose scaled integer can exceed 2^53, and DuckDB's
    # decimal→double conversion then loses the last ulp (hypothesis
    # found x=900719925.5703125: decimal path gives a product 1 ulp
    # low).  Real oracle columns come from parquet as true doubles, so
    # the string cast is the faithful model; oracle SQL embeds only
    # short literals (thresholds), whose scaled ints are far below 2^53.
    got = con.sql(
        f"SELECT FLOOR(CAST('{x!r}' AS DOUBLE) * {scale} + 0.5) / {scale}"
    ).fetchone()[0]
    con.close()
    assert got == want, (x, n, got, want)


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=200,
    ),
    st.integers(min_value=1, max_value=16),
)
@settings(max_examples=30, deadline=None)
def test_rsum_is_partition_order_invariant(xs, nparts):
    """rsum's integer units must make the sum independent of how rows are
    grouped into partial aggregates (the property float sums lack)."""
    import duckdb as _d
    from simpletons_map_reduce_spark.functions.rounding import sql_rsum

    con = _d.connect()
    total = None
    for shift in range(min(nparts, len(xs))):
        perm = xs[shift:] + xs[:shift]  # different association order
        # cast: DuckDB types bare literals as DECIMAL; real oracle columns
        # are DOUBLE from parquet, which is what rsum is specified over
        con.execute("CREATE OR REPLACE TABLE t AS SELECT CAST(x AS DOUBLE) "
                    "AS x FROM (VALUES "
                    + ",".join(f"({v!r})" for v in perm) + ") v(x)")
        got = con.sql(f"SELECT {sql_rsum('x', 2)} AS s FROM t").fetchone()[0]
        if total is None:
            total = got
        assert got == total, f"order-dependent rsum: {got} != {total}"
