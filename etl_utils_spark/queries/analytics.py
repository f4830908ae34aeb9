"""Composite analytical queries: multi-join star-schema aggregates,
subqueries (scalar / IN / correlated EXISTS), CTE pipelines, nested
aggregation — the TPC-H-shaped ETL workload the reference wrapper was
built to drive (its job_details screenshot shows it counting TPC-DS
tables; these are the queries such jobs run between the counts).

All pure Catalyst; money math on DecimalType for engine-exact sums
(see relational.py). Each query's scale posture is noted: which joins
broadcast, where the shuffles are, and why the plan survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_D182 = "CAST(l_extendedprice AS DECIMAL(18,2))"
_DISC = f"CAST({_D182} * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))"


def _disc_price() -> F.Column:
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (price * (1 - disc)).cast("decimal(18,4)")


@query(
    "q3_shipping_priority",
    oracle=f"""
        SELECT l_orderkey,
               CAST(SUM({_DISC}) AS DOUBLE) AS revenue,
               o_orderdate,
               o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 20
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, filters pushed into all three scans,
    aggregate, top-20. customer filters to one segment (broadcastable
    after filter); orders↔lineitem is the fact-fact sort-merge join
    AQE manages at scale."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(20)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
        SELECT n_name,
               CAST(SUM({_DISC}) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders   ON c_custkey  = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey  = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
        GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join with a cross-dimension equality
    (customer and supplier share a nation). supplier/nation/region are
    broadcast; the fact chain shuffles on its join keys only."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@query(
    "subq_scalar_above_avg_price",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (
            SELECT CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                 AS BIGINT)) AS DOUBLE)
                   / (CAST(count(*) AS DOUBLE) * 100.0) * 1.5
            FROM orders)
    """,
)
def subq_scalar_above_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate: orders 50% above the mean.
    Catalyst evaluates the subquery once and broadcasts the scalar."""
    register = _t(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM {orders}
        WHERE o_totalprice > (
            SELECT CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                 AS BIGINT)) AS DOUBLE)
                   / (CAST(count(*) AS DOUBLE) * 100.0) * 1.5
            FROM {orders})
        """,
        orders=register,
    )


@query(
    "subq_in_top_nations",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_nationkey IN (
            SELECT n_nationkey FROM nation WHERE n_regionkey <= 1
        )
    """,
)
def subq_in_top_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → left-semi join under Catalyst."""
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM {customer}
        WHERE c_nationkey IN (
            SELECT n_nationkey FROM {nation} WHERE n_regionkey <= 1
        )
        """,
        customer=_t(spark, sf_dir, "customer"),
        nation=_t(spark, sf_dir, "nation"),
    )


@query(
    "subq_exists_multi_order_days",
    oracle="""
        SELECT c_custkey, c_acctbal
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
    """,
)
def subq_exists_multi_order_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS → semi join with the correlation as the key."""
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM {customer} c
        WHERE EXISTS (
            SELECT 1 FROM {orders} o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
        """,
        customer=_t(spark, sf_dir, "customer"),
        orders=_t(spark, sf_dir, "orders"),
    )


@query(
    "cte_nation_order_stats",
    oracle="""
        WITH cust_orders AS (
            SELECT c_nationkey, o_orderkey,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS price_d
            FROM customer JOIN orders ON c_custkey = o_custkey
        ),
        nation_totals AS (
            SELECT c_nationkey,
                   count(*) AS n_orders,
                   CAST(SUM(price_d) AS DOUBLE) AS total_spend
            FROM cust_orders GROUP BY c_nationkey
        )
        SELECT n_name, n_orders, total_spend
        FROM nation_totals JOIN nation ON c_nationkey = n_nationkey
    """,
)
def cte_nation_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE pipeline (WITH ... ) over DataFrame temp results — nation
    order totals; nation dim broadcast at the end."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    cust_orders = c.join(o, c.c_custkey == o.o_custkey).select(
        "c_nationkey", "o_orderkey", F.col("o_totalprice").cast("decimal(18,2)").alias("price_d")
    )
    nation_totals = cust_orders.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("price_d").cast("double").alias("total_spend"),
    )
    return nation_totals.join(n, nation_totals.c_nationkey == n.n_nationkey).select(
        "n_name", "n_orders", "total_spend"
    )


@query(
    "nested_agg_avg_order_size",
    oracle="""
        SELECT o_orderpriority,
               CAST(AVG(n_items) AS DOUBLE) AS avg_items_per_order,
               count(*) AS n_orders
        FROM (
            SELECT o_orderkey, o_orderpriority, count(*) AS n_items
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            GROUP BY o_orderkey, o_orderpriority
        )
        GROUP BY o_orderpriority
    """,
)
def nested_agg_avg_order_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level aggregation (per-order count → per-priority average):
    the inner agg shuffles on o_orderkey, the outer reuses tiny group
    counts — no re-shuffle of fact rows."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    per_order = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )
    return per_order.groupBy("o_orderpriority").agg(
        F.avg("n_items").cast("double").alias("avg_items_per_order"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "having_filter_hot_parts",
    oracle="""
        SELECT l_partkey, count(*) AS n_lines,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM lineitem
        GROUP BY l_partkey
        HAVING count(*) >= 40
    """,
)
def having_filter_hot_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING (post-aggregation filter)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("total_qty"),
        )
        .filter(F.col("n_lines") >= 40)
    )


@query(
    "pivot_status_by_priority",
    oracle="""
        SELECT o_orderpriority,
               count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_f,
               count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_o,
               count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_p
        FROM orders
        GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: status columns per priority — Spark's pivot with an
    explicit value list (never let pivot scan for distinct values at
    scale)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("status_f"),
            F.coalesce("O", F.lit(0)).alias("status_o"),
            F.coalesce("P", F.lit(0)).alias("status_p"),
        )
    )


@query(
    "unpivot_customer_metrics",
    oracle="""
        SELECT c_custkey, metric, val FROM (
            SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
            UNION ALL
            SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val
            FROM customer
        )
    """,
)
def unpivot_customer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt via the stack() generator (wide→long reshape)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE)) "
            "AS (metric, val)"
        ),
    )
