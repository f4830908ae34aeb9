"""Declared query library (SURVEY.md §2) with DuckDB-oracle parity.

Import side effect: importing this package registers every query module
into ``REGISTRY``. ``__spark_entry__.queries()`` / ``oracle_sql()`` are
thin views over this registry.
"""

from etl_utils_spark.queries.registry import REGISTRY, Query, query

# Register all query modules (import order = SURVEY tier order).
from etl_utils_spark.queries import relational  # noqa: E402,F401
from etl_utils_spark.queries import scalar_funcs  # noqa: E402,F401
from etl_utils_spark.queries import llm  # noqa: E402,F401
from etl_utils_spark.queries import events_analytics  # noqa: E402,F401
from etl_utils_spark.queries import udf_multimodal  # noqa: E402,F401
from etl_utils_spark.queries import wrapper_ops  # noqa: E402,F401
from etl_utils_spark.queries import analytics  # noqa: E402,F401
from etl_utils_spark.queries import stats_sampling  # noqa: E402,F401
from etl_utils_spark.queries import etl_ops  # noqa: E402,F401
from etl_utils_spark.queries import windows_extended  # noqa: E402,F401
from etl_utils_spark.queries import profiling  # noqa: E402,F401
from etl_utils_spark.queries import subqueries_advanced  # noqa: E402,F401
from etl_utils_spark.queries import advanced_ops  # noqa: E402,F401
from etl_utils_spark.queries import misc_funcs  # noqa: E402,F401
from etl_utils_spark.queries import setops_catalog  # noqa: E402,F401
from etl_utils_spark.queries import ml_prep  # noqa: E402,F401
from etl_utils_spark.queries import timeseries  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "query"]
