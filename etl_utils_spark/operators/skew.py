"""Skew-handling operators: salted two-phase aggregation and a
salted-join helper.

AQE's skew-join splitting handles most runtime skew; these are for the
cases planned ahead of time — a groupBy key known to be Zipfian (the
classic hot-key aggregation) where pre-splitting the key avoids one
straggler task owning the hot group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_group_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """COUNT per key via two-phase salted aggregation.

    Phase 1 groups by (key, salt) — the hot key's rows spread over
    n_salts reducers; phase 2 sums the partial counts per key (tiny).
    The salt derives from a row hash: deterministic, no RNG state."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias("n"))


def salted_group_sum(
    df: DataFrame, key: str, value: Column, n_salts: int = 16, out: str = "total"
) -> DataFrame:
    """SUM per key, salted. ``value`` should be decimal-typed for
    order-independent exactness."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.sum(value).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias(out))
