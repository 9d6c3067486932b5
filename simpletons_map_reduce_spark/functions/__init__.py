from .rounding import r2, r4, r6, rn, sql_rn
from .text import TOKEN_SPLIT_RE, tokens, tokens_lower, sql_tokens
from .hashing import md5_mod_prime, sql_md5_mod_prime
from .vectors import cosine, dot, to_double_vec

__all__ = [
    "r2",
    "r4",
    "r6",
    "rn",
    "sql_rn",
    "TOKEN_SPLIT_RE",
    "tokens",
    "tokens_lower",
    "sql_tokens",
    "md5_mod_prime",
    "sql_md5_mod_prime",
    "cosine",
    "dot",
    "to_double_vec",
]
