"""Duplicate-preserving set operations and catalog-columns
introspection (rounding out C5 and B16)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import TABLES, load_table, register_views


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "set_except_all_returnflags",
    oracle="""
        SELECT l_returnflag AS flag FROM lineitem WHERE l_linenumber <= 3
        EXCEPT ALL
        SELECT l_returnflag AS flag FROM lineitem WHERE l_linenumber > 3
    """,
)
def set_except_all_returnflags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag semantics (each copy cancels one copy), the
    multiplicity-aware cousin of EXCEPT."""
    l = _t(spark, sf_dir, "lineitem")
    a = l.filter(F.col("l_linenumber") <= 3).select(F.col("l_returnflag").alias("flag"))
    b = l.filter(F.col("l_linenumber") > 3).select(F.col("l_returnflag").alias("flag"))
    return a.exceptAll(b)


@query(
    "set_intersect_all_status",
    oracle="""
        SELECT o_orderstatus AS status FROM orders WHERE o_totalprice > 200000
        INTERSECT ALL
        SELECT o_orderstatus AS status FROM orders WHERE o_totalprice <= 200000
    """,
)
def set_intersect_all_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — min-multiplicity bag intersection."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 200000).select(F.col("o_orderstatus").alias("status"))
    b = o.filter(F.col("o_totalprice") <= 200000).select(F.col("o_orderstatus").alias("status"))
    return a.intersectAll(b)


_EXPECTED_COLUMNS = {
    "region": ("r_regionkey", "r_name"),
    "nation": ("n_nationkey", "n_name", "n_regionkey"),
}

_COLUMNS_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{t}' AS table_name, '{c}' AS column_name"
    for t, cols in sorted(_EXPECTED_COLUMNS.items())
    for c in cols
)


@query("catalog_list_columns", oracle=_COLUMNS_ORACLE)
def catalog_list_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16: column-level catalog introspection as a relation (the
    README's exa_all_columns pattern, README.md:52-58), hash-checked
    against the expected inventory."""
    register_views(spark, sf_dir, ("region", "nation"))
    rows = []
    for t in sorted(_EXPECTED_COLUMNS):
        for col in spark.catalog.listColumns(t):
            rows.append((t, col.name))
    return spark.createDataFrame(rows, "table_name string, column_name string")
