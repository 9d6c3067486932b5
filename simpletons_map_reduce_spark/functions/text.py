"""Tokenizer — the reference's word contract, as a native column expression.

The reference tokenizes with Go's ``strings.FieldsFunc(contents,
!unicode.IsLetter)`` (mrapps/wc.go:19-32): tokens are maximal runs of Unicode
letters, case-sensitive; digits/apostrophes/punctuation are separators
("Don't" → "Don","t").  Java regex ``\\p{L}`` and DuckDB (RE2) ``\\p{L}``
agree with ``unicode.IsLetter`` on the BMP letters the fixtures use; parity is
pinned by tests/test_tokenizer.py.

Kept as a pure JVM-side expression (split + filter) so tokenization stays
inside whole-stage codegen — no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: split pattern: one-or-more non-letters (identical string in Spark & DuckDB)
TOKEN_SPLIT_RE = r"[^\p{L}]+"


def tokens(col: Column) -> Column:
    """array<string> of tokens (maximal Unicode-letter runs), case-sensitive."""
    return F.filter(F.split(col, TOKEN_SPLIT_RE), lambda x: x != F.lit(""))


def tokens_lower(col: Column) -> Column:
    """Case-folded tokens for ops where the reference has no case contract."""
    return tokens(F.lower(col))


def sql_tokens(expr: str, lower: bool = False) -> str:
    """DuckDB twin: list of tokens from ``expr`` (empty strings removed)."""
    if lower:
        expr = f"lower({expr})"
    return (
        f"list_filter(regexp_split_to_array({expr}, '[^\\p{{L}}]+'), x -> x <> '')"
    )
