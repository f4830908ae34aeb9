"""Bloom-filter runtime join pruning, built from SQL primitives.

The engine-level technique behind runtime filters / dynamic semi-join
pushdown (Spark's InjectRuntimeFilter does this internally with
`bloom_filter_agg`, which is not exposed as a public function): hash
the BUILD side's join keys into a small bitmap, broadcast the bitmap
as a LITERAL, and drop probe rows whose k positions are not all set —
BEFORE the probe side's exchange.  The final exact join still runs, so
Bloom false positives cannot affect results; the bitmap only removes
(most of) the rows that could never match, which at 100 TB is the
difference between shuffling the full fact table and shuffling the
matching slice.

Construction is pure DataFrame ops: k = 5 positions per key via
``xxhash64(key, i)``, OR-folded into ``m/64`` longs with a `bit_or`
aggregate (mergeable, map-side combined), collected driver-side —
bounded by the bitmap size (1024 longs = 8 KB), never the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M_BITS = 65_536  # bitmap bits (1024 longs); ~5e-5 FP at 2k keys, k=5
K_HASHES = 5


def _positions(col: Column) -> list[Column]:
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(M_BITS)) for i in range(K_HASHES)
    ]


def build_bitmap(df: DataFrame, key: str) -> list[int]:
    """Aggregate the build side's keys into an ``M_BITS`` bitmap,
    returned as ``M_BITS/64`` Python ints (driver-bounded)."""
    pos = df.select(
        F.explode(F.array(*_positions(F.col(key)))).alias("pos")
    )
    words = (
        pos.select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("word"))
        .collect()
    )
    bitmap = [0] * (M_BITS // 64)
    for r in words:
        bitmap[r["w"]] = r["word"]
    return bitmap


def might_contain(col: Column, bitmap: list[int]) -> Column:
    """All-k-bits-set test against the literal bitmap — a row-local
    codegen expression (element_at on a literal array + bit tests),
    evaluated at the scan before any exchange."""
    arr = F.array(*[F.lit(w) for w in bitmap])
    cond = F.lit(True)
    for p in _positions(col):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond
