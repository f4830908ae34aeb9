"""Sampling operators: uniform and stratified, seed-deterministic.

At 100 TB sampling is how everything exploratory starts; determinism
(fixed seed → same sample) is non-negotiable for reproducible
pipelines. Sampling is a narrow operation — no shuffle, each partition
samples locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def uniform_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum fractions via sampleBy (e.g. downsample dominant
    event types while keeping rare ones whole)."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)
