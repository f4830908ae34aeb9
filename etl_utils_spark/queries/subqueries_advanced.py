"""Advanced subquery shapes (TPC-H Q2/Q7/Q17 analogs on the fixture
schema): correlated scalar aggregates, self-join decorrelation,
nation-pair flows — the decorrelation surface of Catalyst."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q17_small_quantity_revenue",
    oracle="""
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
               AS DOUBLE) AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#33'
          AND l_quantity < (
              SELECT 0.2 * AVG(l2.l_quantity)
              FROM lineitem l2
              WHERE l2.l_partkey = p_partkey
          )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar-aggregate subquery
    (per-part average) in a predicate — Catalyst decorrelates it into
    an aggregate+join; no per-row subquery execution ever happens."""
    return spark.sql(
        """
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
               AS DOUBLE) AS avg_yearly
        FROM {lineitem}
        JOIN {part} ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#33'
          AND l_quantity < (
              SELECT 0.2 * AVG(l2.l_quantity)
              FROM {lineitem} l2
              WHERE l2.l_partkey = p_partkey
          )
        """,
        lineitem=_t(spark, sf_dir, "lineitem"),
        part=_t(spark, sf_dir, "part"),
    )


@query(
    "q2_min_balance_per_nation",
    oracle="""
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer c
        WHERE c_acctbal = (
            SELECT MIN(c2.c_acctbal) FROM customer c2
            WHERE c2.c_nationkey = c.c_nationkey
        )
    """,
)
def q2_min_balance_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery selecting each group's
    extreme row (decorrelated to an aggregate self-join)."""
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM {customer} c
        WHERE c_acctbal = (
            SELECT MIN(c2.c_acctbal) FROM {customer} c2
            WHERE c2.c_nationkey = c.c_nationkey
        )
        """,
        customer=_t(spark, sf_dir, "customer"),
    )


@query(
    "q7_nation_pair_volume",
    oracle="""
        SELECT n1.n_name AS cust_nation,
               n2.n_name AS supp_nation,
               year(o_orderdate) AS order_year,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)))
                    AS DOUBLE) AS volume
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey  = o_custkey
        JOIN supplier ON s_suppkey  = l_suppkey
        JOIN nation n1 ON n1.n_nationkey = c_nationkey
        JOIN nation n2 ON n2.n_nationkey = s_nationkey
        WHERE n1.n_name IN ('FRANCE', 'GERMANY')
          AND n2.n_name IN ('FRANCE', 'GERMANY')
          AND n1.n_name != n2.n_name
        GROUP BY 1, 2, 3
    """,
)
def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dimension joined twice under different
    roles (customer nation vs supplier nation), cross-nation flows by
    year. Both nation aliases broadcast."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = F.broadcast(_t(spark, sf_dir, "nation").alias("n1"))
    n2 = F.broadcast(_t(spark, sf_dir, "nation").alias("n2"))
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    vol = (price * (1 - disc)).cast("decimal(18,4)")
    nations = ("FRANCE", "GERMANY")
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n1, F.col("n1.n_nationkey") == F.col("c_nationkey"))
        .join(n2, F.col("n2.n_nationkey") == F.col("s_nationkey"))
        .filter(
            F.col("n1.n_name").isin(*nations)
            & F.col("n2.n_name").isin(*nations)
            & (F.col("n1.n_name") != F.col("n2.n_name"))
        )
        .groupBy(
            F.col("n1.n_name").alias("cust_nation"),
            F.col("n2.n_name").alias("supp_nation"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(F.sum(vol).cast("double").alias("volume"))
    )
