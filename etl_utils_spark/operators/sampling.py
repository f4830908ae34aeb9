"""Sampling operators: uniform and stratified, seed-deterministic.

At 100 TB sampling is how everything exploratory starts; determinism
(fixed seed → same sample) is non-negotiable for reproducible
pipelines. Sampling is a narrow operation — no shuffle, each partition
samples locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def uniform_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum fractions via sampleBy (e.g. downsample dominant
    event types while keeping rare ones whole)."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def stratified_sample_md5(
    df: DataFrame, strata_col: str, fractions: dict, key: str
) -> DataFrame:
    """Deterministic stratified sample: keep a row iff its md5-derived
    uniform u(key) ∈ [0,1) is below its stratum's fraction — the
    per-stratum generalization of ml_prep.quality_weighted_sample.

    Same scale contract as sampleBy (pure map-side filter, no shuffle,
    no RNG state) but the accept test is a pure function of the key:
    engines, re-runs, and cluster layouts agree ROW-BY-ROW, and a row's
    fate never changes as the corpus grows.  u is an exact dyadic
    rational (32-bit int / 2^32), so the `<` compare has no
    float-rounding ambiguity; a fraction of 1.0 keeps its stratum
    complete (u < 1.0 always holds)."""
    from etl_utils_spark.operators.ml_prep import md5_uniform

    frac = None
    for stratum, f in fractions.items():
        cond = F.col(strata_col) == stratum
        frac = (
            F.when(cond, F.lit(float(f)))
            if frac is None
            else frac.when(cond, F.lit(float(f)))
        )
    frac = frac.otherwise(F.lit(0.0)) if frac is not None else F.lit(0.0)
    return df.filter(md5_uniform(key) < frac)
