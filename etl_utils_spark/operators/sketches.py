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


# -------------------------------------------------------- Misra-Gries

def misra_gries_partials(df, col: str, k: int = 8):
    """Per-partition Misra-Gries heavy-hitter summaries: each partition
    reduces to ≤ k (value, counter) rows via the classic k-counter
    stream algorithm (Misra & Gries 1982), Arrow-batched through
    mapInPandas.  Partials are MERGEABLE (Agarwal et al., PODS 2012):
    summing counters value-wise and subtracting the (k+1)-th largest
    keeps the deterministic error bound  true_count − estimate ≤
    n/(k+1)  for the merged summary — the driver merge in
    :func:`misra_gries_merge` applies exactly that rule.  At 100 TB
    the shuffle carries ≤ k rows per partition, nothing else."""
    import pandas as pd

    def _mg(batches):
        counters: dict = {}
        for pdf in batches:
            for v in pdf["value"]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:  # decrement-all step
                    for key in list(counters):
                        counters[key] -= 1
                        if counters[key] == 0:
                            del counters[key]
        if counters:
            yield pd.DataFrame(
                {"value": list(counters), "cnt": list(counters.values())}
            )

    return df.select(F.col(col).alias("value")).mapInPandas(
        _mg, schema=f"value {df.schema[col].dataType.simpleString()}, cnt long"
    )


def misra_gries_merge(partials, k: int = 8) -> dict:
    """Driver-side merge of per-partition MG summaries (bounded input:
    ≤ k rows per partition): value-wise counter sum, then subtract the
    (k+1)-th largest counter and drop non-positives — the mergeability
    rule that preserves the n/(k+1) error bound."""
    merged: dict = {}
    for row in partials.groupBy("value").agg(F.sum("cnt").alias("cnt")).collect():
        merged[row["value"]] = int(row["cnt"])
    if len(merged) > k:
        cut = sorted(merged.values(), reverse=True)[k]
        merged = {v: c - cut for v, c in merged.items() if c - cut > 0}
    return merged
