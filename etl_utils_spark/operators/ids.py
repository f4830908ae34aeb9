"""Contiguous global row-id assignment without a global sort bottleneck.

The naive formulation — ``row_number() OVER (ORDER BY key)`` — moves the
entire dataset through ONE partition (Spark warns "No Partition Defined
for Window operation"); at 100 TB that is a single-reducer sort and the
job dies.  The classic two-phase alternative used here:

1. ``repartitionByRange(key).sortWithinPartitions(key)`` — a parallel
   range shuffle; partition *i* holds a key range strictly below
   partition *i+1*.
2. A per-partition running counter (``mapInPandas`` — one Python pass,
   zero extra shuffle) assigns local ranks in partition order.
3. Per-partition row counts (a #partitions-row aggregate) are collected
   to the driver — bounded by the partition count, never the data —
   cumulative offsets are computed, and ``global_id = offset[pid] +
   local_rank`` lands via a broadcast join on the partition id.

The result equals the global rank in ``key`` order regardless of where
the range sampler put the boundaries, because the key is unique and the
ranges are ordered: partition boundaries cannot reorder ranks.

Reference parity note: the reference engine has no id-assignment surface
(`query_wrapper.sql` uses `INT IDENTITY`, :5); this operator is the
distributed equivalent of IDENTITY for bulk backfills.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_global_ids(
    df: DataFrame,
    order_col: str,
    num_partitions: int = 16,
    id_col: str = "global_id",
) -> DataFrame:
    """Assign contiguous 1-based ids in ``order_col`` order (must be a
    unique key) with no single-partition stage."""
    ranged = (
        df.repartitionByRange(num_partitions, order_col)
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    out_schema = ", ".join(
        f"{name} {dtype}" for name, dtype in ranged.dtypes
    ) + ", _local bigint"

    def _number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # One call per partition; batches arrive in partition (sorted)
        # order, so a running counter is the partition-local rank.
        n = 0
        for pdf in batches:
            pdf = pdf.assign(_local=range(n, n + len(pdf)))
            n += len(pdf)
            yield pdf

    numbered = ranged.mapInPandas(_number, schema=out_schema)

    # Partition counts: #partitions rows, collected driver-side (bounded
    # by the partition count, not the data size).
    counts = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()] or [(0, 0)],
        "_pid int, _offset bigint",
    )
    return (
        numbered.join(F.broadcast(off_df), "_pid")
        .withColumn(id_col, F.col("_offset") + F.col("_local") + F.lit(1))
        .drop("_pid", "_local", "_offset")
    )
