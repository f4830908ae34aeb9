"""Count-Min Sketch: a fixed-size, mergeable frequency summary.

The sketch is a d×w count matrix: each key increments one bucket per
hash row, a point estimate is the MIN over its d buckets — always an
OVERestimate (collisions only add).  Built as a plain groupBy over
(depth, bucket), so Spark's partial aggregation gives the classic
distributed-sketch merge for free: executors build per-partition
sketches map-side and the shuffle combines them — d·w counters cross
the wire per partition, never per-key traffic.  At 100 TB the sketch
for d=4, w=1024 is 32 KB regardless of key cardinality, which is the
whole point: frequency answers without a key-cardinality shuffle.

Estimates use xxhash64(key, seed+depth) — deterministic across runs
and cluster layouts, so results are reproducible and testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_min_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256, seed: int = 42
) -> DataFrame:
    """Build the sketch: one row per non-empty (depth, bucket) with its
    count.  ≤ depth·width rows total — constant-size at any scale."""
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("depth"),
                F.pmod(F.xxhash64(F.col(key_col), F.lit(seed + i)), F.lit(width)).alias(
                    "bucket"
                ),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.depth").alias("depth"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_point_estimates(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    seed: int = 42,
) -> DataFrame:
    """Point-estimate each key in ``keys``: min over its d buckets.
    The sketch side is d·w rows — broadcast, so probing N keys is a
    map-side join + one aggregate on the key."""
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("depth"),
                F.pmod(F.xxhash64(F.col(key_col), F.lit(seed + i)), F.lit(width)).alias(
                    "bucket"
                ),
            )
            for i in range(depth)
        ]
    )
    kb = keys.select(F.col(key_col), F.explode(cells).alias("c")).select(
        key_col, F.col("c.depth").alias("depth"), F.col("c.bucket").alias("bucket")
    )
    return (
        kb.join(F.broadcast(sketch), ["depth", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est"))
    )
