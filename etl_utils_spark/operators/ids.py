"""Contiguous global row-id assignment without a global sort bottleneck.

The naive formulation — ``row_number() OVER (ORDER BY key)`` — moves the
entire dataset through ONE partition (Spark warns "No Partition Defined
for Window operation"); at 100 TB that is a single-reducer sort and the
job dies.  The two-phase alternative used here:

1. Bucket boundaries are computed ONCE with an ``approx_percentile``
   sketch (mergeable, no shuffle) and collected as DRIVER-SIDE LITERALS.
   This is the load-bearing design point: every later job buckets rows
   with the same pure function of (key, literal boundaries), so the
   result cannot depend on exchange-level sampling being repeatable
   across job executions — the trap in ``repartitionByRange``-based
   formulations, whose boundary sampling re-runs per job.  Correct ids
   result for ANY boundary vector; the percentiles only balance skew.
2. Rows hash-shuffle on the bucket id and sort within partitions by
   (bucket, key).  A bucket lives entirely in one partition, so a
   per-bucket running counter (``mapInPandas``, one pass, counter reset
   on bucket change) yields the rank of each row within its bucket.
3. Per-bucket row counts (a #buckets-row aggregate) are collected to
   the driver — bounded by the bucket count, never the data —
   cumulative offsets follow, and ``global_id = offset[bucket] +
   local_rank`` lands via a broadcast join.

The result equals the global rank in ``key`` order: buckets are ordered
ranges, ranks are dense within each bucket.

Reference parity note: the reference engine has no id-assignment surface
(`query_wrapper.sql` uses `INT IDENTITY`, :5); this operator is the
distributed equivalent of IDENTITY for bulk backfills.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_expr(order_col: str, boundaries: list) -> F.Column:
    """Number of boundaries <= key — a pure row-local function of the
    key and the literal boundary vector (codegen'd aggregate over a
    literal array; no join, no shuffle)."""
    if not boundaries:
        return F.lit(0)
    arr = F.array(*[F.lit(b) for b in boundaries])
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(F.col(order_col) >= b, 1).otherwise(0),
    )


def prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    num_partitions: int = 16,
    out_col: str = "running_total",
) -> DataFrame:
    """Distributed inclusive prefix sum of an INTEGER ``value_col`` in
    ``order_col`` order (unique key), with no single-partition stage —
    the same bucket decomposition as :func:`assign_global_ids`: literal
    boundaries → per-bucket totals (a #buckets-row frame, cumulated
    driver-side into bucket offsets) → per-partition vectorized cumsum
    with cross-batch carry.  The naive ``SUM() OVER (ORDER BY ...)``
    is a one-reducer sort at 100 TB; this is three bounded passes.
    Integer-only on purpose: exact associative addition means the
    bucket decomposition cannot drift from a sequential evaluation
    (floats would differ in summation order by ulps)."""
    fracs = [i / num_partitions for i in range(1, num_partitions)]
    boundaries: list = []
    if fracs:
        row = df.agg(
            F.percentile_approx(order_col, fracs, 10_000).alias("bs")
        ).collect()
        boundaries = sorted(set(row[0]["bs"] or [])) if row else []

    bucketed = df.withColumn("_bucket", _bucket_expr(order_col, boundaries))
    sums = {
        r["_bucket"]: r["s"]
        for r in bucketed.groupBy("_bucket")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    }
    offsets, acc = {}, 0
    for b in sorted(sums):
        offsets[b] = acc
        acc += sums[b] or 0

    parts = bucketed.repartition(num_partitions, "_bucket").sortWithinPartitions(
        "_bucket", order_col
    )
    out_schema = ", ".join(f"{n} {t}" for n, t in parts.dtypes) + ", _local bigint"

    def _cumsum(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry = 0
        cur = None
        for pdf in batches:
            if not len(pdf):
                yield pdf.assign(_local=pd.Series([], dtype="int64"))
                continue
            cs = pdf.groupby("_bucket")[value_col].cumsum().to_numpy(dtype="int64")
            if cur is not None and pdf["_bucket"].iloc[0] == cur:
                cs = cs + carry * (pdf["_bucket"] == cur).to_numpy()
            cur = pdf["_bucket"].iloc[-1]
            carry = int(cs[(pdf["_bucket"] == cur).to_numpy()][-1])
            yield pdf.assign(_local=cs)

    cumulated = parts.mapInPandas(_cumsum, schema=out_schema)
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(int(b), int(o)) for b, o in offsets.items()] or [(0, 0)],
        "_bucket int, _offset bigint",
    )
    return (
        cumulated.join(F.broadcast(off_df), "_bucket")
        .withColumn(out_col, F.col("_offset") + F.col("_local"))
        .drop("_bucket", "_local", "_offset")
    )


def assign_global_ids(
    df: DataFrame,
    order_col: str,
    num_partitions: int = 16,
    id_col: str = "global_id",
) -> DataFrame:
    """Assign contiguous 1-based ids in ``order_col`` order (must be a
    unique key) with no single-partition stage."""
    # Phase 0: boundary literals from one sketch pass (column-pruned
    # scan, mergeable aggregate, 1 collected row).
    fracs = [i / num_partitions for i in range(1, num_partitions)]
    boundaries: list = []
    if fracs:
        row = df.agg(
            F.percentile_approx(order_col, fracs, 10_000).alias("bs")
        ).collect()
        boundaries = sorted(set(row[0]["bs"] or [])) if row else []

    bucketed = df.withColumn("_bucket", _bucket_expr(order_col, boundaries))

    # Phase 1: per-bucket counts — #buckets rows to the driver.
    counts = {
        r["_bucket"]: r["n"]
        for r in bucketed.groupBy("_bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]

    # Phase 2: shuffle on the bucket id, sort (bucket, key) within
    # partitions, per-bucket running counter in one Arrow pass.
    parts = bucketed.repartition(num_partitions, "_bucket").sortWithinPartitions(
        "_bucket", order_col
    )
    out_schema = ", ".join(f"{n} {t}" for n, t in parts.dtypes) + ", _local bigint"

    def _number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # One call per partition; rows arrive sorted by (bucket, key).
        # A bucket is wholly contained in its partition (hash on
        # bucket), so a vectorized per-bucket cumcount — with the
        # carry applied to the batch's leading run when it continues
        # the previous batch's bucket — yields the in-bucket rank.
        n = 0
        cur = None
        for pdf in batches:
            if not len(pdf):
                yield pdf.assign(_local=pd.Series([], dtype="int64"))
                continue
            cc = pdf.groupby("_bucket").cumcount().to_numpy()
            if cur is not None and pdf["_bucket"].iloc[0] == cur:
                cc = cc + n * (pdf["_bucket"] == cur).to_numpy()
            cur = pdf["_bucket"].iloc[-1]
            n = int(cc[(pdf["_bucket"] == cur).to_numpy()][-1]) + 1
            yield pdf.assign(_local=cc)

    numbered = parts.mapInPandas(_number, schema=out_schema)

    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(int(b), int(o)) for b, o in offsets.items()] or [(0, 0)],
        "_bucket int, _offset bigint",
    )
    return (
        numbered.join(F.broadcast(off_df), "_bucket")
        .withColumn(id_col, F.col("_offset") + F.col("_local") + F.lit(1))
        .drop("_bucket", "_local", "_offset")
    )


def prefix_min(
    df: DataFrame,
    order_col: str,
    value_col: str,
    num_partitions: int = 16,
    out_col: str = "running_min",
    exclusive_out: str | None = None,
) -> DataFrame:
    """Distributed prefix MIN of an INTEGER ``value_col`` in
    ``order_col`` order (unique key) — the same bucket decomposition
    as :func:`prefix_sum` (min is associative and exact on integers,
    so per-bucket partials compose deterministically): literal
    boundaries → per-bucket mins (collected, cumulated driver-side
    into strictly-preceding carries) → per-partition sequential cummin
    with cross-batch carry (a plain scan: the intended inputs are
    value-cardinality-bounded count frames, not raw corpora), composed
    with the bucket carry via ``least`` (null-skipping).  ``exclusive_out`` additionally emits
    the STRICTLY-preceding min (NULL for the global first row) — the
    shape Pareto-frontier / skyline scans need.  The naive
    ``MIN() OVER (ORDER BY ...)`` is a one-reducer sort at 100 TB."""
    fracs = [i / num_partitions for i in range(1, num_partitions)]
    boundaries: list = []
    if fracs:
        row = df.agg(
            F.percentile_approx(order_col, fracs, 10_000).alias("bs")
        ).collect()
        boundaries = sorted(set(row[0]["bs"] or [])) if row else []

    bucketed = df.withColumn("_bucket", _bucket_expr(order_col, boundaries))
    mins = {
        r["_bucket"]: r["m"]
        for r in bucketed.groupBy("_bucket")
        .agg(F.min(value_col).alias("m"))
        .collect()
    }
    carries, acc = {}, None
    for b in sorted(mins):
        carries[b] = acc  # min over strictly-preceding buckets
        m = mins[b]
        acc = m if acc is None else min(acc, m)

    parts = bucketed.repartition(num_partitions, "_bucket").sortWithinPartitions(
        "_bucket", order_col
    )
    out_schema = (
        ", ".join(f"{n} {t}" for n, t in parts.dtypes)
        + ", _lmin bigint, _lexc bigint"
    )

    def _cummin(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry = None  # (bucket, running_min) within this partition
        cur = None
        for pdf in batches:
            if not len(pdf):
                yield pdf.assign(
                    _lmin=pd.Series([], dtype="Int64"),
                    _lexc=pd.Series([], dtype="Int64"),
                )
                continue
            vals = pdf[value_col].to_numpy("int64")
            bks = pdf["_bucket"].to_numpy()
            lmin, lexc = [], []
            for v, b in zip(vals, bks):
                if b != cur:
                    cur, carry = b, None
                lexc.append(carry)
                carry = int(v) if carry is None else min(carry, int(v))
                lmin.append(carry)
            yield pdf.assign(
                _lmin=pd.array(lmin, dtype="Int64"),
                _lexc=pd.array(lexc, dtype="Int64"),
            )

    cumulated = parts.mapInPandas(_cummin, schema=out_schema)
    spark = df.sparkSession
    carry_df = spark.createDataFrame(
        [(int(b), None if c is None else int(c)) for b, c in carries.items()]
        or [(0, None)],
        "_bucket int, _carry bigint",
    )
    out = (
        cumulated.join(F.broadcast(carry_df), "_bucket")
        .withColumn(out_col, F.least(F.col("_lmin"), F.col("_carry")))
    )
    if exclusive_out is not None:
        out = out.withColumn(
            exclusive_out, F.least(F.col("_lexc"), F.col("_carry"))
        )
    return out.drop("_bucket", "_lmin", "_lexc", "_carry")
