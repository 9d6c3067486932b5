"""Cross-engine deterministic hashing.

The reference buckets by FNV-1a-32 (mr/worker.go:41-45); which bucket a key
lands in never changes query *results* (SURVEY §2.A A5), so we do not need
FNV parity — we need a hash both Spark and DuckDB can compute identically so
that MinHash / fingerprint operators are oracle-checkable.

``md5_int``: first 15 hex chars of md5 → 60-bit non-negative bigint.  md5 is
byte-identical across engines; 15 nibbles keep the value < 2^60 so affine
permutations ``(a*h + b) % p`` with a,b,h < 2^31 stay inside signed-64
arithmetic on both sides (no overflow divergence).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31-1 — modulus for MinHash affine permutations.
MINHASH_PRIME = 2_147_483_647


def md5_int(col: Column) -> Column:
    """60-bit bigint from md5(col) — identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def sql_md5_int(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


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
