"""Second TPC-H-shaped composite pack (Q4/Q6/Q8/Q10/Q13/Q14/Q18/Q19/
Q22 shapes), adapted to the fixture schema (no partsupp /
commitdate / shipmode columns — the shapes keep each query's join
topology, predicate structure, and aggregation pattern).

Scale posture shared by the pack: dimension tables (region, nation,
filtered part/customer subsets) broadcast; orders↔lineitem is the one
fact-fact shuffle, managed by AQE; every filter is pushed into the
parquet scan; money math on DecimalType then cast to double ONCE at
the end (engine-exact vs DuckDB regardless of summation order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table

_D182 = "CAST(l_extendedprice AS DECIMAL(18,2))"
_DISC = f"CAST({_D182} * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _disc_price() -> F.Column:
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (price * (1 - disc)).cast("decimal(18,4)")


@query(
    "q4_order_priority",
    oracle="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
          )
        GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority counts for orders with at least one
    late-shipped line (shipdate > orderdate + 30d stands in for the
    missing commitdate/receiptdate pair).  LEFT SEMI join — the
    existence probe never widens rows; both scans keep pushed date
    filters."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q6_forecast_revenue",
    oracle=f"""
        SELECT CAST(SUM(CAST({_D182} * CAST(l_discount AS DECIMAL(18,2))
                          AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate — no join, no shuffle
    beyond the final 1-row combine; every predicate reaches the parquet
    scan (PushedFilters)."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return l.agg(
        F.sum((price * disc).cast("decimal(18,4)")).cast("double").alias("revenue")
    )


@query(
    "q8_market_share",
    oracle=f"""
        WITH vol AS (
            SELECT year(o_orderdate) AS o_year,
                   {_DISC} AS volume,
                   sn.n_name AS supp_nation
            FROM lineitem
            JOIN part     ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation sn ON sn.n_nationkey = s_nationkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation cn ON cn.n_nationkey = c_nationkey
            JOIN region   ON r_regionkey = cn.n_regionkey
            WHERE r_name = 'ASIA'
              AND p_type = 'STANDARD'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        )
        SELECT o_year,
               ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_5'
                                   THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END)
                          AS DOUBLE)
                     / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
        FROM vol
        GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — 7-table star join.
    part (filtered to one type), supplier, both nation copies, and
    region all broadcast; orders↔lineitem is the only fact-fact
    shuffle.  Decimal volume sums, ONE double division at the end."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = _t(spark, sf_dir, "customer")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    vol = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _disc_price().alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(zero))
            .cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


@query(
    "q10_returned_items",
    oracle=f"""
        SELECT c_custkey, c_name,
               CAST(SUM({_DISC}) AS DOUBLE) AS revenue,
               CAST(c_acctbal AS DOUBLE) AS acctbal,
               n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON n_nationkey = c_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: revenue lost to returns per customer, top 20 —
    nation broadcasts, return-flag + date filters pushed down, final
    TakeOrderedAndProject with a total-order tie-break."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "c_custkey",
            "c_name",
            F.col("c_acctbal").cast("double").alias("acctbal"),
            "n_name",
        )
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q13_customer_distribution",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count histogram INCLUDING zero-order customers
    (left outer join, count of non-null keys) — double aggregation,
    second one over a tiny domain."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q14_promo_effect",
    oracle=f"""
        SELECT ROUND(
                 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                       THEN {_DISC}
                                       ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM({_DISC}) AS DOUBLE), 6) AS promo_revenue_pct
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotion revenue share in one month — part
    broadcasts against the date-pruned lineitem scan; decimal sums,
    one double division."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(zero))
                .cast("double")
                / F.sum(_disc_price()).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q18_large_volume_customers",
    oracle="""
        SELECT c_custkey, c_name, o_orderkey,
               CAST(o_totalprice AS DOUBLE) AS totalprice,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY c_custkey, c_name, o_orderkey, totalprice
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > CAST(250 AS DECIMAL(18,2))
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a
    threshold, with their customer — the canonical HAVING-over-join
    aggregate (the classic IN-subquery formulation collapses into the
    same single aggregation; no second lineitem scan).

    The quantity sum aggregates lineitem by its own key BEFORE any
    join: o_orderkey is the orders PK, so grouping the joined frame by
    (c_custkey, c_name, o_orderkey, totalprice) partitions rows exactly
    as l_orderkey does, and the HAVING filter then runs on the narrow
    per-order totals — only the few surviving orders enter the joins
    (inner joins drop orphan keys identically on either side of the
    aggregate).  The wide customer⋈orders⋈lineitem frame never exists."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("_qty"))
        .filter(F.col("_qty") > F.lit(250).cast("decimal(18,2)"))
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.col("_qty").cast("double").alias("total_qty"),
        )
    )


@query(
    "q19_discounted_revenue",
    oracle=f"""
        SELECT CAST(SUM({_DISC}) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive brand/size/quantity predicates over a
    part⋈lineitem join — part broadcasts; the OR-of-ANDs stays one
    join with a residual condition (no union of three scans)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#13") & sz.between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#20") & sz.between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#25") & sz.between(1, 35) & q.between(20, 30))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@query(
    "q22_sales_opportunity",
    oracle="""
        WITH rich AS (
            SELECT c_custkey, c_nationkey, c_acctbal
            FROM customer
            WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) > (
                SELECT CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT))
                            AS BIGINT) // count(*)
                FROM customer WHERE c_acctbal > 0
            )
        )
        SELECT n_name,
               count(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM rich
        JOIN nation ON n_nationkey = c_nationkey
        WHERE NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = rich.c_custkey
        )
        GROUP BY n_name
    """,
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers who never ordered, per
    nation — LEFT ANTI join against orders (no row widening), nation
    broadcast.  The 'average positive balance' threshold is computed in
    exact integer CENTS with floor division — bit-identical across
    engines (a float avg is summation-order-sensitive and a customer at
    the boundary would flip) — and fetched driver-side: one scalar,
    config-scale, cheaper than the BroadcastNestedLoopJoin a 1-row
    cross join would compile to."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    n = _t(spark, sf_dir, "nation")
    cents = (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
    row = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.sum(cents).alias("s"), F.count(F.lit(1)).alias("cnt"))
        .collect()[0]
    )
    thr_cents = int(row.s) // int(row.cnt)
    rich = c.filter(cents > F.lit(thr_cents))
    no_orders = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (
        no_orders.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("totacctbal"),
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS suppkey_r,
                   SUM({_DISC}) AS rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = suppkey_r
        WHERE rev = (SELECT max(rev) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier by quarterly revenue): the scalar
    max-subquery becomes a broadcast EQUI-join of the 1-row max
    aggregate against the supplier-level revenue table (no nested-loop,
    no global window sort), then a broadcast join to supplier names.
    Ties on exact DECIMAL revenue are all kept, as the spec requires."""
    l = _t(spark, sf_dir, "lineitem")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("suppkey_r"))
        .agg(F.sum(_disc_price()).alias("rev"))
    )
    mx = rev.agg(F.max("rev").alias("mx"))
    top = rev.join(F.broadcast(mx), rev.rev == mx.mx)
    s = _t(spark, sf_dir, "supplier")
    return top.join(s, top.suppkey_r == s.s_suppkey).select(
        "s_suppkey", "s_name", F.col("rev").cast("double").alias("total_revenue")
    )
