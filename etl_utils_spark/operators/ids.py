"""Contiguous global row-id assignment and prefix aggregates without a
global sort bottleneck.

The naive formulation — ``row_number() OVER (ORDER BY key)`` — moves the
entire dataset through ONE partition (Spark warns "No Partition Defined
for Window operation"); at 100 TB that is a single-reducer sort and the
job dies.  The bucket-decomposed alternative used here:

1. Bucket boundaries are computed ONCE with an ``approx_percentile``
   sketch (mergeable, no shuffle) and collected as DRIVER-SIDE LITERALS.
   This is the load-bearing design point: every later job buckets rows
   with the same pure function of (key, literal boundaries), so the
   result cannot depend on exchange-level sampling being repeatable
   across job executions — the trap in ``repartitionByRange``-based
   formulations, whose boundary sampling re-runs per job.  Correct ids
   result for ANY boundary vector; the percentiles only balance skew.
2. The in-bucket running aggregate is a WINDOW partitioned by the
   bucket id.  Window partition sizes are bounded by the bucket
   decomposition (each holds ~1/num_partitions of the rows), so there
   is no single-reducer stage — and the whole pass runs in the JVM
   with codegen.  (r12 optimization: this replaces a
   repartition+sortWithinPartitions+``mapInPandas`` pass — the window's
   own exchange+sort is the only shuffle, and the JVM↔Python Arrow
   boundary is gone entirely; guide §4.)
3. Cross-bucket offsets come from the per-bucket totals — a frame of
   at most ``num_partitions`` rows — prefix-cumulated by a window over
   that tiny frame and broadcast-joined back.  The single-partition
   window there is bounded by the CONSTANT bucket count, never by data.
   (r12: this replaces a ``collect()`` of the totals — construction no
   longer runs driver jobs beyond the one boundary sketch; guide §5.)

The result equals the global rank in ``key`` order: buckets are ordered
ranges, ranks are dense within each bucket.

Reference parity note: the reference engine has no id-assignment surface
(`query_wrapper.sql` uses `INT IDENTITY`, :5); this operator is the
distributed equivalent of IDENTITY for bulk backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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


def _boundary_literals(
    df: DataFrame, order_col: str, num_partitions: int
) -> list:
    """Phase 0: bucket-boundary literals from one sketch pass
    (column-pruned scan, mergeable aggregate, 1 collected row)."""
    fracs = [i / num_partitions for i in range(1, num_partitions)]
    if not fracs:
        return []
    row = df.agg(
        F.percentile_approx(order_col, fracs, 10_000).alias("bs")
    ).collect()
    return sorted(set(row[0]["bs"] or [])) if row else []


# Exclusive-prefix frame over the ordered bucket-totals table: every
# bucket strictly before this one.
_PRECEDING = (Window.unboundedPreceding, -1)


def prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str | None = None,
    num_partitions: int = 16,
    out_col: str = "running_total",
    value_cols: dict[str, str] | None = None,
    boundaries: list | None = None,
) -> DataFrame:
    """Distributed inclusive prefix sum of INTEGER value column(s) in
    ``order_col`` order (unique key), with no single-partition stage
    over the data: literal boundaries → in-bucket window cumsum →
    per-bucket totals (≤ num_partitions rows) offset-cumulated and
    broadcast back.  The naive ``SUM() OVER (ORDER BY ...)`` is a
    one-reducer sort at 100 TB; this is bounded passes, all JVM-side.

    ``value_cols`` maps several value columns to their output columns
    so N prefix sums share ONE bucketing, ONE window exchange and ONE
    offsets frame (r12: stats_ks chained two full calls before).

    Integer-only on purpose: exact associative addition means the
    bucket decomposition cannot drift from a sequential evaluation
    (floats would differ in summation order by ulps)."""
    specs = list((value_cols or {value_col: out_col}).items())
    # ``boundaries`` lets a caller with SEVERAL prefix_sum inputs fuse
    # the per-input sketch collects into one driver job (r13; any
    # boundary vector is correct — see the module docstring).
    if boundaries is None:
        boundaries = _boundary_literals(df, order_col, num_partitions)
    else:
        boundaries = sorted(set(boundaries))
    bucketed = df.withColumn("_bucket", _bucket_expr(order_col, boundaries))

    w_in = (
        Window.partitionBy("_bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = bucketed.select(
        "*",
        *[
            F.sum(F.col(v).cast("long")).over(w_in).alias(f"_l{i}")
            for i, (v, _) in enumerate(specs)
        ],
    )

    totals = bucketed.groupBy("_bucket").agg(
        *[
            F.sum(F.col(v).cast("long")).alias(f"_t{i}")
            for i, (v, _) in enumerate(specs)
        ]
    )
    w_off = Window.orderBy("_bucket").rowsBetween(*_PRECEDING)
    offsets = totals.select(
        "_bucket",
        *[
            F.coalesce(F.sum(f"_t{i}").over(w_off), F.lit(0).cast("long")).alias(
                f"_o{i}"
            )
            for i in range(len(specs))
        ],
    )

    out = cum.join(F.broadcast(offsets), "_bucket")
    for i, (_, oc) in enumerate(specs):
        out = out.withColumn(oc, F.col(f"_o{i}") + F.col(f"_l{i}"))
    return out.drop(
        "_bucket",
        *[f"_l{i}" for i in range(len(specs))],
        *[f"_o{i}" for i in range(len(specs))],
    )


def assign_global_ids(
    df: DataFrame,
    order_col: str,
    num_partitions: int = 16,
    id_col: str = "global_id",
) -> DataFrame:
    """Assign contiguous 1-based ids in ``order_col`` order (must be a
    unique key) with no single-partition stage over the data."""
    boundaries = _boundary_literals(df, order_col, num_partitions)
    bucketed = df.withColumn("_bucket", _bucket_expr(order_col, boundaries))

    # In-bucket 1-based rank: window partitioned by the bucket id —
    # bucket-bounded partitions, JVM codegen, no Python pass.
    w_in = Window.partitionBy("_bucket").orderBy(order_col)
    ranked = bucketed.withColumn("_local", F.row_number().over(w_in))

    # Cross-bucket offsets from the ≤ num_partitions-row counts frame.
    totals = bucketed.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_t"))
    w_off = Window.orderBy("_bucket").rowsBetween(*_PRECEDING)
    offsets = totals.select(
        "_bucket",
        F.coalesce(F.sum("_t").over(w_off), F.lit(0).cast("long")).alias("_offset"),
    )

    return (
        ranked.join(F.broadcast(offsets), "_bucket")
        .withColumn(id_col, F.col("_offset") + F.col("_local"))
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
    boundaries → in-bucket window cummin → per-bucket mins cumulated
    into strictly-preceding carries by a window over the
    ≤ num_partitions-row totals frame — composed with the in-bucket
    values via ``least`` (null-skipping).  ``exclusive_out``
    additionally emits the STRICTLY-preceding min (NULL for the global
    first row) — the shape Pareto-frontier / skyline scans need.  The
    naive ``MIN() OVER (ORDER BY ...)`` is a one-reducer sort at
    100 TB."""
    boundaries = _boundary_literals(df, order_col, num_partitions)
    bucketed = df.withColumn("_bucket", _bucket_expr(order_col, boundaries))

    v = F.col(value_col).cast("long")
    w_inc = (
        Window.partitionBy("_bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_exc = (
        Window.partitionBy("_bucket").orderBy(order_col).rowsBetween(*_PRECEDING)
    )
    cum = bucketed.select(
        "*", F.min(v).over(w_inc).alias("_lmin"), F.min(v).over(w_exc).alias("_lexc")
    )

    totals = bucketed.groupBy("_bucket").agg(F.min(v).alias("_tmin"))
    w_off = Window.orderBy("_bucket").rowsBetween(*_PRECEDING)
    carries = totals.select(
        "_bucket", F.min("_tmin").over(w_off).alias("_carry")
    )

    out = cum.join(F.broadcast(carries), "_bucket").withColumn(
        out_col, F.least(F.col("_lmin"), F.col("_carry"))
    )
    if exclusive_out is not None:
        out = out.withColumn(
            exclusive_out, F.least(F.col("_lexc"), F.col("_carry"))
        )
    return out.drop("_bucket", "_lmin", "_lexc", "_carry")
