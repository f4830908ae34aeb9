"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``etl_utils_spark``; this module is a thin
adapter over its query registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's README example job re-imagined — a
    QueryWrapper-orchestrated ETL run over the sf0.001 fixtures that
    counts every table with identifier-parameterized SQL, logs custom
    messages, finishes, and returns the job's log-detail DataFrame."""
    from etl_utils_spark.flagship import flagship_job

    return flagship_job(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from etl_utils_spark.queries import REGISTRY

    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    from etl_utils_spark.queries import REGISTRY

    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
