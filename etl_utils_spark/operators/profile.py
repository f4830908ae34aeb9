"""Table profiling: per-column statistics in ONE pass.

The data-quality primitive every ingest pipeline runs first. One
aggregate over the table computes (nulls, distinct-approx, min, max)
for every column simultaneously — never one scan per column; at 100 TB
the difference is a day of cluster time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, exact_distinct: bool = False) -> DataFrame:
    """Long-format profile: (column, n_rows, n_nulls, n_distinct,
    min_str, max_str). One wide aggregate, then an unpivot to rows.
    n_distinct is HyperLogLog-approximate unless exact_distinct."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in df.columns:
        col = F.col(c)
        aggs.append(F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__nulls"))
        aggs.append(
            (F.countDistinct(col) if exact_distinct else F.approx_count_distinct(col)).alias(
                f"{c}__distinct"
            )
        )
        aggs.append(F.min(col).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(col).cast("string").alias(f"{c}__max"))
    wide = df.agg(*aggs)
    stacks = []
    for c in df.columns:
        stacks.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_str"),
                F.col(f"{c}__max").alias("max_str"),
            )
        )
    return wide.select(F.explode(F.array(*stacks)).alias("p")).select("p.*")
