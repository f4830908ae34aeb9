"""Distributed model training primitives: closed-form multivariate OLS
(normal equations from exact integer moments) and full-batch
gradient-descent logistic regression.

Reference parity: the reference has no training surface (it is an ETL
wrapper); this is north-star territory — the model-fitting steps a
training-data pipeline runs over the features it just built
(SURVEY.md §2 LLM-pipeline tier).

Scale shapes (100 TB):
- OLS: ONE aggregate computes every moment (Σx, Σxx', Σxy) as exact
  integer sums — mergeable map-side partials, no iteration; the 3×3
  solve happens on the driver over 9 numbers.  Weights are a fixed
  IEEE formula (Cramer) over exactly-representable inputs, so a SQL
  oracle writing the SAME formula reproduces them bit-for-bit.
- Logistic GD: each step is ONE aggregate (mean gradient) over a
  materialized feature frame; the driver holds only the (d+1)-float
  weight vector.  Full-batch and deterministic — no sampling, no
  float races (the gradient mean is a fixed-op reduction of doubles;
  order-dependence is bounded by the final gate, not hash parity —
  the training queries are declared rows-only for exactly this
  reason).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ols_moments_2f(df: DataFrame, x1, x2, y) -> dict[str, int]:
    """Exact integer moment sums for a 2-feature + intercept OLS.
    x1, x2, y must be integer-valued Columns (caller scales decimals
    to integer units first)."""
    row = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x1).cast("long").alias("s1"),
        F.sum(x2).cast("long").alias("s2"),
        F.sum(x1 * x1).cast("long").alias("s11"),
        F.sum(x1 * x2).cast("long").alias("s12"),
        F.sum(x2 * x2).cast("long").alias("s22"),
        F.sum(y).cast("long").alias("sy"),
        F.sum(x1 * y).cast("long").alias("s1y"),
        F.sum(x2 * y).cast("long").alias("s2y"),
    ).collect()[0]
    return {k: row[k] for k in ("n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y")}


def det3(a, b, c, d, e, f, g, h, i) -> float:
    """3×3 determinant with a FIXED operation order — the same textual
    formula runs in the SQL oracle, so results agree bit-for-bit when
    the inputs are exactly-representable doubles."""
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def solve_normal_eq_2f(m: dict[str, int]) -> tuple[float, float, float]:
    """Cramer's-rule solve of [n Σx1 Σx2; Σx1 Σx1² Σx1x2; Σx2 Σx1x2 Σx2²]
    w = [Σy Σx1y Σx2y].  Inputs stay < 2⁵³ so the double conversion is
    exact; every later op is a fixed IEEE sequence."""
    n, s1, s2 = float(m["n"]), float(m["s1"]), float(m["s2"])
    s11, s12, s22 = float(m["s11"]), float(m["s12"]), float(m["s22"])
    sy, s1y, s2y = float(m["sy"]), float(m["s1y"]), float(m["s2y"])
    da = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    d0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    d1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    d2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
    return d0 / da, d1 / da, d2 / da


def train_logreg_gd(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str,
    steps: int = 12,
    lr: float = 0.5,
) -> list[float]:
    """Full-batch gradient descent for logistic regression: per step,
    ONE aggregate computes the mean gradient of the log-loss; the
    driver updates the (d+1)-vector.  Deterministic given the frame
    (weights start at 0; the schedule is fixed).  Returns
    [w_intercept, w_1, ..., w_d]."""
    w = [0.0] * (len(feature_cols) + 1)
    # r12: AQE off for the step aggregates — each step is a 1-row
    # final aggregate whose plan AQE cannot improve, but adaptive
    # execution splits every collect into two jobs (shuffle-stage
    # materialization + result), doubling per-step scheduling overhead
    # (measured 2.38→2.03s for 12 steps at sf0.1).  Scale-neutral: the
    # partial/final aggregate shape is identical on a cluster.
    spark = feats.sparkSession
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for _ in range(steps):
            z = F.lit(w[0])
            for wi, c in zip(w[1:], feature_cols):
                z = z + F.lit(wi) * F.col(c)
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            err = p - F.col(label_col)
            aggs = [F.avg(err).alias("g0")] + [
                F.avg(err * F.col(c)).alias(f"g{i+1}")
                for i, c in enumerate(feature_cols)
            ]
            g = feats.agg(*aggs).collect()[0]
            w = [wi - lr * g[f"g{i}"] for i, wi in enumerate(w)]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    if any(math.isnan(x) or math.isinf(x) for x in w):
        raise ValueError(f"logreg training diverged: {w}")
    return w
