"""Registry binding each declared query to its DuckDB oracle SQL.

Contract (driver's t2 gate, __spark_entry__.py):
- ``fn(spark, sf_dir) -> DataFrame`` — the Spark-side implementation.
- ``oracle`` — ANSI SQL producing the same rows on DuckDB views of the
  same parquet (or None for non-SQL-expressible ops → rows-only check).
- Column names must match exactly between the two (the driver sorts
  columns by name before hashing values) — alias everything.
- Determinism rules: round float arithmetic on BOTH sides; total-order
  tie-breaks on every ranked/top-k query.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip())
        return fn

    return deco
