"""Oracle-replayable pseudo-randomness: a portable two-round LCG whose
every intermediate fits int64 exactly, so Spark and DuckDB compute the
IDENTICAL uniform from the identical (key, replicate) pair — the
primitive behind the repo's resampling statistics (Poisson bootstrap,
randomization tests; see docs/SCALE.md "Oracle-replayable randomness").

Single source of truth: the Spark column expression and the DuckDB SQL
fragment are generated from the same constants, so an LCG change can
never leave the two engines out of lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_A = 1103515245
_C = 12345
_M31 = 2147483647  # key-mixing modulus (prime 2^31 - 1)
_M = 2147483648  # state modulus 2^31


def lcg_uniform(key: Column, rep: Column, b: int) -> Column:
    """Deterministic U[0,1) for (key, rep): s0 = (key·b + rep) mod
    (2³¹−1), two LCG rounds mod 2³¹, u = s2/2³¹.  All products are
    < 2⁶¹ — exact int64 arithmetic under ANSI mode; u is a dyadic
    rational, exactly representable as a double."""
    s0 = (key * b + rep) % _M31
    s1 = (F.lit(_A).cast("long") * s0 + _C) % _M
    s2 = (F.lit(_A).cast("long") * s1 + _C) % _M
    return s2 / F.lit(float(_M))


def lcg_uniform_sql(key_expr: str, rep_expr: str, b: int) -> str:
    """The DuckDB fragment computing the identical uniform — inline it
    in oracle SQL wherever :func:`lcg_uniform` appears Spark-side."""
    s0 = f"(({key_expr}) * {b} + ({rep_expr})) % {_M31}"
    s1 = f"({_A} * ({s0}) + {_C}) % {_M}"
    s2 = f"({_A} * ({s1}) + {_C}) % {_M}"
    return f"(({s2}) / {_M}.0)"
