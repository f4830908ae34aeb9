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


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    dim_key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-salted equi-join: the fact side gets a deterministic salt
    in [0, n_salts) (row-hash derived — no RNG state), the dim side is
    replicated ×n_salts via an explode, and the join runs on
    (key, salt) — a hot fact key's rows land on n_salts reducers
    instead of one.

    This is the manual form of what AQE's skew-join split does at
    runtime (the session enables that too); it exists for the cases
    AQE can't rescue — skew inside a single shuffle block, or engines/
    modes without runtime re-planning. The dim must be replication-
    sized (n_salts × |dim| exchanged); a broadcast-sized dim should
    just broadcast instead — salting targets the middle regime."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(n_salts))
    f = facts.withColumn("_salt", salt)
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    # frame-qualified references: `F.col(key)` would be AMBIGUOUS
    # whenever both frames carry the key name (key == dim_key, or a
    # conformed dim repeating the fact key); the dim-side key column is
    # dropped after the join — it duplicates f[key], and leaving it
    # would re-create the same ambiguity for any by-name consumer
    return (
        f.join(
            d.hint("shuffle_hash"),
            (f[key] == d[dim_key]) & (f["_salt"] == d["_salt"]),
        )
        .drop(d[dim_key])
        .drop("_salt")
    )
