"""Exact integer second moments → engine-identical Pearson/regression.

Engine-builtin float moment aggregates (corr, covar_samp, stddev_samp,
regr_*) accumulate doubles in engine- and partition-order-specific
ways, so Spark and an SQL oracle disagree at the ulp level and a
ROUND on top can flip the last digit (the r5
``stats_rolling_corr_price_qty`` driver red).  The repo discipline:
aggregate EXACT integer sums n, Sx, Sy, Sxy, Sxx, Syy, then evaluate
ONE shared IEEE double expression

    corr  = (n·Sxy − Sx·Sy) / sqrt((n·Sxx − Sx²) · (n·Syy − Sy²))
    slope = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²)

on both engines — identical inputs, identical operations, identical
bits.  Sums are Spark ``decimal(38,0)`` / DuckDB ``HUGEINT`` (SUM of
BIGINT): integer-exact far past int64, which rank/count products
overflow beyond ~1M rows.  Final casts decimal→double and
hugeint→double are both IEEE round-to-nearest — equal bits either way.

Spark-side and SQL-side expression builders live together so the two
engines can never drift (same single-source pattern as
operators/prng.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MOMENT_COLS = ("n", "sx", "sy", "sxy", "sxx", "syy")


def moments_agg(df: DataFrame, x: Column, y: Column) -> DataFrame:
    """One hash aggregate producing the six exact integer moments of
    (x, y).  ``x``/``y`` must be integer-valued columns (cents, ranks,
    counts); they are widened to decimal(18,0) so products and sums
    stay exact in decimal(38,0) instead of wrapping int64."""
    dx = x.cast("decimal(18,0)")
    dy = y.cast("decimal(18,0)")
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx).alias("sx"),
        F.sum(dy).alias("sy"),
        F.sum(dx * dy).alias("sxy"),
        F.sum(dx * dx).alias("sxx"),
        F.sum(dy * dy).alias("syy"),
    )


def grouped_moments_agg(
    df: DataFrame, keys: list[str], x: Column, y: Column
) -> DataFrame:
    """Per-group variant of :func:`moments_agg`."""
    dx = x.cast("decimal(18,0)")
    dy = y.cast("decimal(18,0)")
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx).alias("sx"),
        F.sum(dy).alias("sy"),
        F.sum(dx * dy).alias("sxy"),
        F.sum(dx * dx).alias("sxx"),
        F.sum(dy * dy).alias("syy"),
    )


def _num() -> Column:
    return F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")


def _dx() -> Column:
    return F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")


def _dy() -> Column:
    return F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")


def corr_col(round_digits: int | None = None) -> Column:
    """Pearson r from the moment columns; NULL when either variance is
    zero (mirrors the SQL CASE — Spark's corr would emit NaN)."""
    r = _num().cast("double") / F.sqrt(_dx().cast("double") * _dy().cast("double"))
    if round_digits is not None:
        r = F.round(r, round_digits) + F.lit(0.0)  # +0.0: canonicalize -0.0
    return F.when((_dx() > 0) & (_dy() > 0), r)


def slope_col() -> Column:
    """OLS slope of y on x — one exact-int ratio evaluated as a single
    IEEE division (unrounded: a rational of exact integers)."""
    return F.when(_dx() > 0, _num().cast("double") / _dx().cast("double"))


def intercept_col() -> Column:
    """OLS intercept (Sy − slope·Sx)/n — shared IEEE expression."""
    return F.when(
        _dx() > 0,
        (
            F.col("sy").cast("double")
            - (_num().cast("double") / _dx().cast("double"))
            * F.col("sx").cast("double")
        )
        / F.col("n").cast("double"),
    )


def r2_col(round_digits: int | None = None) -> Column:
    """Coefficient of determination r² = num² / (dx·dy)."""
    v = (_num().cast("double") * _num().cast("double")) / (
        _dx().cast("double") * _dy().cast("double")
    )
    if round_digits is not None:
        v = F.round(v, round_digits) + F.lit(0.0)
    return F.when((_dx() > 0) & (_dy() > 0), v)


# ------------------------------------------------------------------ SQL twins
def moments_sql(x_expr: str, y_expr: str) -> str:
    """SELECT-list fragment computing the identical six moments in
    DuckDB (SUM over BIGINT → HUGEINT, exact)."""
    return (
        f"count(*) AS n, SUM({x_expr}) AS sx, SUM({y_expr}) AS sy, "
        f"SUM(({x_expr}) * ({y_expr})) AS sxy, "
        f"SUM(({x_expr}) * ({x_expr})) AS sxx, "
        f"SUM(({y_expr}) * ({y_expr})) AS syy"
    )


_NUM = "(n * sxy - sx * sy)"
_DX = "(n * sxx - sx * sx)"
_DY = "(n * syy - sy * sy)"


def corr_sql(round_digits: int | None = None) -> str:
    expr = (
        f"CAST({_NUM} AS DOUBLE) / "
        f"sqrt(CAST({_DX} AS DOUBLE) * CAST({_DY} AS DOUBLE))"
    )
    if round_digits is not None:
        expr = f"ROUND({expr}, {round_digits}) + 0.0"
    return f"CASE WHEN {_DX} > 0 AND {_DY} > 0 THEN {expr} END"


def slope_sql() -> str:
    return (
        f"CASE WHEN {_DX} > 0 THEN "
        f"CAST({_NUM} AS DOUBLE) / CAST({_DX} AS DOUBLE) END"
    )


def intercept_sql() -> str:
    return (
        f"CASE WHEN {_DX} > 0 THEN "
        f"(CAST(sy AS DOUBLE) - (CAST({_NUM} AS DOUBLE) / CAST({_DX} AS DOUBLE))"
        f" * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) END"
    )


def r2_sql(round_digits: int | None = None) -> str:
    expr = (
        f"(CAST({_NUM} AS DOUBLE) * CAST({_NUM} AS DOUBLE)) / "
        f"(CAST({_DX} AS DOUBLE) * CAST({_DY} AS DOUBLE))"
    )
    if round_digits is not None:
        expr = f"ROUND({expr}, {round_digits}) + 0.0"
    return f"CASE WHEN {_DX} > 0 AND {_DY} > 0 THEN {expr} END"
