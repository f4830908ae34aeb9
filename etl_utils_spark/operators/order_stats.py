"""Exact order statistics without a global sort.

``ORDER BY x LIMIT/OFFSET`` or ``sort + row_number`` formulations of
"the k-th smallest of 10^12 values" funnel the corpus through one
reducer.  This operator computes an EXACT quantile (discrete
order-statistic semantics, DuckDB ``quantile_disc``: 0-based rank
``floor((n-1)·q)``) with only mergeable aggregates and a bounded
final selection:

1. one count → n, target rank.
2. one ``approx_percentile`` sketch (rank error ≤ n/accuracy) brackets
   the target with value bounds [lo, hi].
3. one exact aggregate computes rank(lo) and the candidate count
   inside the bracket — both VERIFIED against the target rank; if the
   sketch under-delivered (it cannot by its error bound, but the
   check is cheap) the bracket widens and retries.
4. candidates (≈ 2n/accuracy rows) are either selected exactly via
   TakeOrdered top-k (bounded, per-partition heaps) or, when still
   too large at extreme scale, the same bracket step recurses on the
   filtered frame — each round shrinks the candidate set by the
   accuracy factor, so two rounds cover 10^12 rows at accuracy 10^4.

Ties/duplicates are handled by rank arithmetic (a value heavier than
the bracket collapses lo == hi → answer immediately).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_quantile(
    df: DataFrame,
    col: str,
    q: float,
    accuracy: int = 10_000,
    take_limit: int = 1_000_000,
    max_rounds: int = 64,
) -> float | None:
    """Exact q-quantile of a numeric column (discrete semantics:
    the value at 0-based rank ``floor((n-1)·q)`` in ascending order).
    Returns None on an empty input.  Null values are ignored (SQL
    aggregate semantics)."""
    return exact_quantiles(df, col, [q], accuracy, take_limit, max_rounds)[0]


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: list[float],
    accuracy: int = 10_000,
    take_limit: int = 1_000_000,
    max_rounds: int = 64,
) -> list[float | None]:
    """Exact quantiles for SEVERAL fractions with SHARED passes (r12,
    guide §1.2 — don't repeat full passes the targets can share): one
    count, one sketch bracketing every target, one verification
    aggregate for all brackets, then a bounded selection per target.
    Targets whose first-round bracket under-delivers (cannot happen
    within the sketch error bound, but verify-don't-trust) fall back
    to the per-target :func:`exact_rank` loop."""
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"q must be in [0,1], got {q}")
    vals = df.select(F.col(col).alias("x")).filter(F.col("x").isNotNull())
    n = vals.count()
    if n == 0:
        return [None for _ in qs]
    targets = [int((n - 1) * q) for q in qs]
    return exact_ranks(
        vals, "x", targets, accuracy, take_limit, max_rounds, n_hint=n
    )


def exact_ranks(
    df: DataFrame,
    col: str,
    targets: list[int],
    accuracy: int = 10_000,
    take_limit: int = 1_000_000,
    max_rounds: int = 64,
    n_hint: int | None = None,
) -> list[float | None]:
    """Values at EXACT 0-based ascending ranks ``targets`` (nulls
    ignored), sharing the sketch and verification passes across every
    target: one ``percentile_approx`` with all 2·k bracket fractions,
    one aggregate computing (below, inside) for all k brackets, then a
    bounded per-bracket selection.  k targets cost 2 + k bounded jobs
    instead of k·(3..5) full-pass jobs."""
    vals = df.select(F.col(col).alias("x")).filter(F.col("x").isNotNull())
    n = n_hint if n_hint is not None else vals.count()
    if n == 0:
        return [None for _ in targets]
    for t in targets:
        if not 0 <= t < n:
            raise ValueError(f"rank {t} outside [0, {n})")
    margin = 2.0 / accuracy
    fracs: list[float] = []
    for t in targets:
        fracs.append(max(0.0, t / max(n - 1, 1) - margin))
        fracs.append(min(1.0, t / max(n - 1, 1) + margin))
    row = vals.agg(F.percentile_approx("x", fracs, accuracy).alias("b")).collect()[0]
    bounds = [(row["b"][2 * i], row["b"][2 * i + 1]) for i in range(len(targets))]
    stat_cols = []
    for i, (lo, hi) in enumerate(bounds):
        stat_cols.append(
            F.sum(F.when(F.col("x") < lo, 1).otherwise(0)).alias(f"below{i}")
        )
        stat_cols.append(
            F.sum(
                F.when((F.col("x") >= lo) & (F.col("x") <= hi), 1).otherwise(0)
            ).alias(f"inside{i}")
        )
    stats = vals.agg(*stat_cols).collect()[0]
    out: list[float | None] = []
    for i, (t, (lo, hi)) in enumerate(zip(targets, bounds)):
        below = stats[f"below{i}"] or 0
        inside = stats[f"inside{i}"] or 0
        if 0 <= t - below < inside:
            k = t - below
            if lo == hi:
                out.append(lo)
                continue
            if inside <= take_limit:
                cand = vals.filter((F.col("x") >= lo) & (F.col("x") <= hi))
                out.append(
                    cand.orderBy("x").limit(k + 1).agg(F.max("x")).collect()[0][0]
                )
                continue
        # bracket missed or too large: per-target convergence loop
        out.append(
            exact_rank(vals, "x", t, accuracy, take_limit, max_rounds, n_hint=n)
        )
    return out


def exact_rank(
    df: DataFrame,
    col: str,
    target: int,
    accuracy: int = 10_000,
    take_limit: int = 1_000_000,
    max_rounds: int = 64,
    n_hint: int | None = None,
) -> float | None:
    """The value at EXACT 0-based ascending rank ``target`` (nulls
    ignored) — the engine behind :func:`exact_quantile`; use directly
    when the rank is known (e.g. the k and k+1 order statistics of an
    interpolated percentile)."""
    vals = df.select(F.col(col).alias("x")).filter(F.col("x").isNotNull())
    n = n_hint if n_hint is not None else vals.count()
    if n == 0:
        return None
    if not 0 <= target < n:
        raise ValueError(f"rank {target} outside [0, {n})")
    # m (the remaining frame's row count) is tracked arithmetically —
    # the initial count is n, a bracket recursion leaves `inside` rows,
    # a bisection leaves `cnt_le` / `m - cnt_le` — so the loop never
    # pays a count() job (r12: one full pass per round removed).
    frame, rank_offset, m = vals, 0, n
    margin = 2.0 / accuracy
    for _ in range(max_rounds):
        local_target = target - rank_offset
        # local quantile of the remaining frame that pins the target
        ql = max(0.0, local_target / max(m - 1, 1) - margin)
        qh = min(1.0, local_target / max(m - 1, 1) + margin)
        row = frame.agg(
            F.percentile_approx("x", [ql, qh], accuracy).alias("b")
        ).collect()[0]
        lo, hi = row["b"][0], row["b"][1]
        stats = frame.agg(
            F.sum(F.when(F.col("x") < lo, 1).otherwise(0)).alias("below"),
            F.sum(
                F.when((F.col("x") >= lo) & (F.col("x") <= hi), 1).otherwise(0)
            ).alias("inside"),
        ).collect()[0]
        below, inside = stats["below"] or 0, stats["inside"] or 0
        if not (0 <= local_target - below < inside):
            # sketch bracket missed (cannot happen within the error
            # bound, but verify-don't-trust): widen and retry
            margin *= 4
            continue
        k = local_target - below  # 0-based rank within the bracket
        if lo == hi:
            # every candidate equals lo and the verified rank window
            # contains the target — answer found
            return lo
        if inside <= take_limit:
            # bounded exact selection: top-(k+1) via per-partition
            # heaps (TakeOrderedAndProject), answer is the max
            cand = frame.filter((F.col("x") >= lo) & (F.col("x") <= hi))
            top = cand.orderBy("x").limit(k + 1).agg(F.max("x")).collect()[0][0]
            return top
        if inside < m:
            # recurse into the bracket; ranks below it are accounted
            frame = frame.filter((F.col("x") >= lo) & (F.col("x") <= hi))
            rank_offset += below
            m = inside
            margin = 2.0 / accuracy
            continue
        # Sketch made no progress (bracket covers the whole frame —
        # e.g. two heavy distinct values with the target rank near
        # their boundary): take one value-space bisection step, which
        # always shrinks because lo < hi.
        mid = (lo + hi) / 2.0
        cnt_le = frame.filter(F.col("x") <= mid).count()
        if local_target < cnt_le:
            frame = frame.filter(F.col("x") <= mid)
            m = cnt_le
        else:
            frame = frame.filter(F.col("x") > mid)
            rank_offset += cnt_le
            m = m - cnt_le
        margin = 2.0 / accuracy
    raise RuntimeError("exact_quantile failed to converge")


def weighted_quantile(
    df: DataFrame,
    col: str,
    weight_col: str,
    q_num: int,
    q_den: int,
    num_partitions: int = 16,
):
    """Exact weighted q-quantile (q = q_num/q_den): the smallest x
    with Σ w(y ≤ x) ≥ q·W, computed with NO global sort and NO float
    thresholds — the rank test multiplies through by q_den so every
    comparison is exact integer arithmetic.

    Shape: one (value → weight-sum) aggregate (bounded by distinct
    cardinality, localCheckpointed), the distributed ``prefix_sum``
    over the value order, a 1-row total, and a bounded min-aggregate.
    Weights must be non-negative integers (casted); the result is an
    actual data value.  Returns None on empty/zero-weight input."""
    return weighted_quantiles(
        df, col, weight_col, [(q_num, q_den)], num_partitions=num_partitions
    )[0]


def weighted_quantiles(
    df: DataFrame,
    col: str,
    weight_col: str,
    fractions: list[tuple[int, int]],
    num_partitions: int = 16,
):
    """Exact weighted quantiles for SEVERAL fractions from ONE pass:
    the (value → weight-sum) aggregate and the 1-row total are built
    once (the aggregate localCheckpointed — four consumers read it),
    then ALL fractions are answered by ONE conditional-min aggregate
    over the prefix-sum frame (r12, guide §1.2: the per-fraction
    filter+min collects each re-ran the cum plan, plus a full
    localCheckpoint materialization to amortize them; a single
    ``min(CASE WHEN cw·den ≥ num·tw THEN x END)`` per fraction reads it
    exactly once with no materialization).  Same integer-exact rank
    test as :func:`weighted_quantile` (now a 1-fraction wrapper)."""
    from etl_utils_spark.operators.ids import prefix_sum

    for q_num, q_den in fractions:
        if not (0 < q_num <= q_den):
            raise ValueError(f"need 0 < q_num <= q_den, got {q_num}/{q_den}")
    agg = (
        df.select(F.col(col).alias("x"), F.col(weight_col).cast("long").alias("w"))
        .filter(F.col("x").isNotNull() & (F.col("w") > 0))
        .groupBy("x")
        .agg(F.sum("w").alias("wx"))
        .localCheckpoint(eager=True)
    )
    total_row = agg.agg(F.sum("wx").alias("tw")).collect()[0]
    tw = total_row["tw"]
    if not tw:
        return [None for _ in fractions]
    cum = prefix_sum(
        agg, order_col="x", value_col="wx", out_col="cw",
        num_partitions=num_partitions,
    )
    row = cum.agg(
        *[
            F.min(
                F.when(F.col("cw") * q_den >= q_num * tw, F.col("x"))
            ).alias(f"_q{i}")
            for i, (q_num, q_den) in enumerate(fractions)
        ]
    ).collect()[0]
    return [row[i] for i in range(len(fractions))]
