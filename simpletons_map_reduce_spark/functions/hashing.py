"""Cross-engine deterministic hashing.

The reference buckets by FNV-1a-32 (mr/worker.go:41-45); which bucket a key
lands in never changes query *results* (SURVEY §2.A A5), so we do not need
FNV parity — we need a hash both Spark and DuckDB can compute identically so
that MinHash / fingerprint operators are oracle-checkable.

The live convention (near_dedup, simhash) is the first 8 hex chars of md5 →
32-bit non-negative bigint; MinHash call sites additionally reduce it mod
``MINHASH_PRIME`` *before* the affine permutation ``(a*h + b) % p`` so that
with a, b, h < 2^31 the product stays < 2^62 — inside signed-64 arithmetic
on both engines (no overflow divergence).  ``md5_mod_prime`` /
``sql_md5_mod_prime`` package exactly that convention; do not feed a wider
hash into the permutations.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31-1 — modulus for MinHash affine permutations.
MINHASH_PRIME = 2_147_483_647


def md5_mod_prime(col: Column) -> Column:
    """32-bit md5 prefix reduced mod MINHASH_PRIME — safe input for the
    affine MinHash permutations; identical in Spark and DuckDB."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % MINHASH_PRIME
    )


def sql_md5_mod_prime(expr: str) -> str:
    """DuckDB twin of :func:`md5_mod_prime`."""
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT % {MINHASH_PRIME})"


#: Spark-side SQL fragment: first 15 hex chars of md5 → 60-bit bigint.
#: 60 bits fits signed-64 with headroom; NEVER feed this into the MinHash
#: affine permutations (use md5_mod_prime there — see module docstring).
#: Used to replace string set-elements with fixed-width ints before
#: shuffling them (2-3× smaller, long compares): a collision merely makes
#: both engines see the same merged element, so parity is unaffected.
SPARK_MD5_INT60 = "CAST(conv(substring(md5({e}), 1, 15), 16, 10) AS BIGINT)"
SQL_MD5_INT60 = "(('0x' || substr(md5({e}), 1, 15))::BIGINT)"


def md5_int60(col: Column) -> Column:
    """Column form of SPARK_MD5_INT60 — 60-bit md5 prefix as bigint."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i(x) = (a_i*(x%p) + b_i) % p.

    A tiny LCG expands the seed; a is kept odd and nonzero.  Pure Python so
    the same constants are embedded in both the Spark plan and the oracle SQL.
    """
    params = []
    state = seed
    for _ in range(num_perm):
        state = (state * 1_103_515_245 + 12_345) % (2**31)
        a = (state | 1) % MINHASH_PRIME or 1
        state = (state * 1_103_515_245 + 12_345) % (2**31)
        b = state % MINHASH_PRIME
        params.append((a, b))
    return params
