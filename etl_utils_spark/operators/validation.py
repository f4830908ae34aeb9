"""Cross-engine data reconciliation: order-independent table
fingerprints.

The migration-validation primitive: two systems each compute a small
summary over the same logical table — row count, distinct-row count,
and the min/max of a canonical per-row digest — and equal summaries
certify the copy without moving data.  Order-independent by
construction (count/min/max are commutative), so partitioning and scan
order are irrelevant; the digest rides on md5 of a canonical string
rendering, which both Spark and DuckDB produce identically for
integers, strings, dates, and DECIMAL (floats must be cast to DECIMAL
first — raw float-to-string rendering is engine-specific).

One hash aggregate; at 100 TB the map side reduces each partition to
four values (the distinct count shuffles digests, or swap in
approx_count_distinct for a sketch-sized shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_digest(cols: list[str | Column]) -> Column:
    """Canonical per-row md5 over '|'-joined string renderings.
    concat_ws SKIPS nulls (both Spark and DuckDB), which would make
    (2, NULL) collide with (NULL, 2) — every column is therefore
    coalesced to a \\x00 sentinel so null position survives."""
    rendered = [
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"), F.lit("\x00")
        )
        for c in cols
    ]
    return F.md5(F.concat_ws("|", *rendered))


def table_fingerprint(df: DataFrame, cols: list[str | Column]) -> DataFrame:
    """One-row reconciliation summary of ``df`` over ``cols``."""
    d = df.select(row_digest(cols).alias("digest"))
    return d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("digest").alias("n_distinct_rows"),
        F.min("digest").alias("min_digest"),
        F.max("digest").alias("max_digest"),
    )


def expectations(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Declarative data-quality gate: evaluate named violation-count
    aggregates in ONE pass and return (check_name, n_violations,
    passed) per check — the write-audit-publish pattern's audit step
    (run between staging and promote; a failed row blocks the swap).

    Each value in ``checks`` is an AGGREGATE Column counting
    violations (e.g. ``F.sum((col < 0).cast("long"))`` or
    ``F.count("*") - F.count_distinct(col)``), so uniqueness,
    nullability, domain, and range checks all ride the same single
    scan — no per-check job, no driver loop.  The 1×k result row is
    exploded into k rows plan-side."""
    agg = df.agg(*[c.cast("long").alias(k) for k, c in checks.items()])
    packed = F.array(
        *[
            F.struct(
                F.lit(k).alias("check_name"), F.col(k).alias("n_violations")
            )
            for k in checks
        ]
    )
    return (
        agg.select(F.explode(packed).alias("x"))
        .select(
            "x.check_name",
            "x.n_violations",
            (F.col("x.n_violations") == 0).alias("passed"),
        )
    )
