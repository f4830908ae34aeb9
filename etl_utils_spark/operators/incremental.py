"""Incremental aggregate maintenance (materialized-view refresh).

The 100 TB pattern: keep a per-key PARTIAL aggregate state table
(count / sum / min / max are all commutative monoids), and on each new
batch aggregate ONLY the delta and merge it into the state — never
rescan the base.  Refreshing a day's delta into a year's aggregate
touches 1/365th of the data; the merge itself is one hash aggregate
over (|state| + |delta partials|) rows.

COUNT DISTINCT and AVG are handled the standard way: avg = s/n derived
at read time; distinct via an HLL/approx sketch column if needed (not
included here — approx_count_distinct covers that surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_aggs(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Per-key mergeable aggregate state: n / s / mn / mx.

    The sum accumulates in DECIMAL so merge order cannot perturb the
    result (float partial sums would make refresh results depend on
    batch boundaries)."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("s"),
        F.min(value_col).alias("mn"),
        F.max(value_col).alias("mx"),
    )


def merge_partials(state: DataFrame, delta_partials: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two partial-state tables: the refresh step.  Keys present
    in only one side pass through unchanged (union + re-aggregate —
    map-side combine keeps the shuffle at state-table size)."""
    return state.unionByName(delta_partials).groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )


def finalize(state: DataFrame, keys: list[str]) -> DataFrame:
    """Render the state as the user-facing aggregate view."""
    return state.select(
        *keys,
        F.col("n").alias("n_rows"),
        F.col("s").cast("double").alias("total"),
        (F.col("s").cast("double") / F.col("n")).alias("mean"),
        F.col("mn").alias("min_value"),
        F.col("mx").alias("max_value"),
    )
