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


@query(
    "join_null_safe_regions",
    oracle="""
        WITH a AS (
            SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg
            FROM customer WHERE c_custkey <= 200
        ),
        b AS (
            SELECT c_custkey AS b_custkey,
                   NULLIF(c_mktsegment, 'BUILDING') AS seg
            FROM customer WHERE c_custkey BETWEEN 101 AND 300
        )
        SELECT coalesce(a.seg, '<null>') AS seg, count(*) AS n_pairs
        FROM a JOIN b ON a.seg IS NOT DISTINCT FROM b.seg
        GROUP BY 1
    """,
)
def join_null_safe_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (<=> / IS NOT DISTINCT FROM): NULL keys
    match EACH OTHER instead of vanishing — the semantic every
    late-arriving-dimension pipeline needs when 'unknown' rows must
    still pair up.  Still hash-partitionable (NULL hashes like any
    value under null-safe equality), so the plan stays a real hash
    join, not a filter-dance."""
    c = _t(spark, sf_dir, "customer")
    seg = F.expr("NULLIF(c_mktsegment, 'BUILDING')")
    a = c.filter(F.col("c_custkey") <= 200).select(
        "c_custkey", seg.alias("seg")
    )
    b = c.filter(F.col("c_custkey").between(101, 300)).select(
        F.col("c_custkey").alias("b_custkey"), seg.alias("seg_b")
    )
    j = a.join(b, a.seg.eqNullSafe(b.seg_b))
    return j.groupBy(F.coalesce("seg", F.lit("<null>")).alias("seg")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


@query(
    "union_by_name_missing_cols",
    oracle="""
        SELECT n_nationkey AS entity_key, n_name AS name,
               n_regionkey AS region_key, NULL AS acctbal
        FROM nation
        UNION ALL
        SELECT s_suppkey, s_name, NULL, s_acctbal FROM supplier
    """,
)
def union_by_name_missing_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-tolerant union (unionByName allowMissingColumns): two
    entity tables with only partially overlapping columns align BY
    NAME with NULL fill — the schema-drift-tolerant append every
    multi-source ingest needs (positional UNION would silently pair
    the wrong columns; the oracle spells out the explicit NULL
    padding Spark synthesizes)."""
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("entity_key"),
        F.col("n_name").alias("name"),
        F.col("n_regionkey").alias("region_key"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return n.unionByName(s, allowMissingColumns=True)


@query(
    "sql_group_by_all",
    oracle="""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM orders
        GROUP BY ALL
    """,
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL — the modern SQL dialect surface (group by every
    non-aggregate select item) supported verbatim by both engines;
    the registered-view path doubles as the engine's spark.sql()
    text-SQL entry check."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM orders
        GROUP BY ALL
        """
    )
