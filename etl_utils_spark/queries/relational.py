"""Relational core: scans, filters, joins, aggregates, windows, sorts,
set operations (SURVEY.md §2 Tier B + C1–C5).

Every query is a pure Catalyst plan — built-in functions only, no UDFs,
no collect(). Scale notes are per-query: the guiding rules are
(1) broadcast bounded dims, let sort-merge+AQE handle fact-fact joins,
(2) push filters/projections into the parquet scan,
(3) make every ranked output deterministic with total-order tie-breaks.

Reference parity: the reference (exasol/etl-utils) delegates all SQL to
its host engine; the SQL shapes reproduced here are the ones its wrapper
emits or evidences (query_wrapper.sql:213,268; README.md:41-58 scans /
filters / COUNT / MAX) plus the ETL-workload surface those imply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------- scans

@query(
    "scan_count_lineitem",
    oracle="SELECT count(*) AS cnt FROM lineitem",
)
def scan_count_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table COUNT(*) — the reference wrapper's bread-and-butter
    statement (README.md:46, job_details.png TPC-DS counts).

    Scale: count aggregates partially per partition; no shuffle of data,
    only of per-partition counts.
    """
    return _t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("cnt"))


@query(
    "scan_project_region",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def scan_project_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * style scan (query_wrapper.sql:213) over the smallest dim."""
    return _t(spark, sf_dir, "region").select("r_regionkey", "r_name")


@query(
    "project_orders_cols",
    oracle="SELECT o_orderkey, o_custkey, o_totalprice FROM orders",
)
def project_orders_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit column projection (README.md:41). Column pruning reaches
    the parquet scan: ReadSchema carries only these 3 columns."""
    return _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")


# --------------------------------------------------------------- filters

@query(
    "filter_conj_events",
    oracle="""
        SELECT event_id, user_id, value
        FROM events
        WHERE event_type = 'purchase' AND value > 100.0
    """,
)
def filter_conj_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive equality/range predicates (README.md:52-58 pattern).
    Both predicates push down into the parquet scan (PushedFilters)."""
    e = _t(spark, sf_dir, "events")
    return e.filter((F.col("event_type") == "purchase") & (F.col("value") > 100.0)).select(
        "event_id", "user_id", "value"
    )


@query(
    "param_filter_mktsegment",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE c_mktsegment = 'BUILDING'
    """,
)
def param_filter_mktsegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter value binding ``:NAME`` (query_wrapper.sql:98,
    README.md:55-57) via spark.sql(args=...) — the engine-native
    equivalent of the reference's pquery param dict."""
    customer = _t(spark, sf_dir, "customer")
    return spark.sql(
        "SELECT c_custkey, c_name, c_acctbal FROM {customer} WHERE c_mktsegment = :seg",
        args={"seg": "BUILDING"},
        customer=customer,
    )


# ------------------------------------------------------------ aggregates

@query(
    "agg_max_runid",
    oracle="SELECT max(o_orderkey) AS max_run_id FROM orders",
)
def agg_max_runid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The run-id allocation pattern ``SELECT MAX(id)``
    (query_wrapper.sql:268), expressed over the orders fixture."""
    return _t(spark, sf_dir, "orders").agg(F.max("o_orderkey").alias("max_run_id"))


@query(
    "agg_pricing_summary",
    oracle="""
        WITH c AS (
            SELECT l_returnflag, l_linestatus,
                   CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty_c,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c,
                   CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS disc_c,
                   CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) AS tax_c
            FROM lineitem
        )
        SELECT
            l_returnflag,
            l_linestatus,
            CAST(SUM(qty_c) AS DOUBLE) / 1e2                             AS sum_qty,
            CAST(SUM(price_c) AS DOUBLE) / 1e2                           AS sum_base_price,
            CAST(SUM(price_c * (100 - disc_c)) AS DOUBLE) / 1e4          AS sum_disc_price,
            CAST(SUM(price_c * (100 - disc_c) * (100 + tax_c)) AS DOUBLE)
                / 1e6                                                    AS sum_charge,
            CAST(SUM(qty_c) AS DOUBLE) / CAST(100 * count(*) AS DOUBLE)  AS avg_qty,
            CAST(SUM(price_c) AS DOUBLE) / CAST(100 * count(*) AS DOUBLE) AS avg_price,
            CAST(SUM(disc_c) AS DOUBLE) / CAST(100 * count(*) AS DOUBLE) AS avg_disc,
            count(*)                                                     AS count_order
        FROM c
        GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: hash aggregate with partial
    (map-side) combine — the canonical 100 TB-safe aggregation: the
    shuffle carries only (flag,status) groups, not rows.

    Money math accrues as SCALE-0 integers: price/disc/tax are exact
    2-decimal values, so disc_price·10^4 = price_c·(100−disc_c) and
    charge·10^6 = price_c·(100−disc_c)·(100+tax_c) are EXACT integer
    identities (no rounding anywhere), the sums are order-independent
    128-bit integers, and each output is one shared IEEE division.
    Scale-4/6 decimal sums cast to double were the round-7 sf1-sweep
    find: once the scaled integer passes 2^53 the engines' decimal→
    double conversions disagree by 1 ulp (docs/SCALE.md law; scale-0
    casts are driver-proven identical)."""
    l = _t(spark, sf_dir, "lineitem")

    def cents(col: str):
        return (F.col(col).cast("decimal(18,2)") * 100).cast("long").cast("decimal(18,0)")

    qty_c, price_c, disc_c, tax_c = (
        cents("l_quantity"), cents("l_extendedprice"), cents("l_discount"), cents("l_tax")
    )
    n = F.count(F.lit(1))
    n100 = (F.lit(100) * n).cast("double")
    return (
        l.select(
            "l_returnflag", "l_linestatus",
            qty_c.alias("qty_c"), price_c.alias("price_c"),
            disc_c.alias("disc_c"), tax_c.alias("tax_c"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum("qty_c").cast("double") / 1e2).alias("sum_qty"),
            (F.sum("price_c").cast("double") / 1e2).alias("sum_base_price"),
            (
                F.sum(F.col("price_c") * (100 - F.col("disc_c"))).cast("double") / 1e4
            ).alias("sum_disc_price"),
            (
                F.sum(
                    F.col("price_c") * (100 - F.col("disc_c")) * (100 + F.col("tax_c"))
                ).cast("double")
                / 1e6
            ).alias("sum_charge"),
            (F.sum("qty_c").cast("double") / n100).alias("avg_qty"),
            (F.sum("price_c").cast("double") / n100).alias("avg_price"),
            (F.sum("disc_c").cast("double") / n100).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@query(
    "agg_count_distinct_custkey",
    oracle="SELECT count(DISTINCT o_custkey) AS n_cust FROM orders",
)
def agg_count_distinct_custkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) — Catalyst expands to a two-stage
    aggregate (partial distinct per partition, then merge)."""
    return _t(spark, sf_dir, "orders").agg(F.countDistinct("o_custkey").alias("n_cust"))


@query("approx_count_distinct_custkey", oracle=None)
def approx_count_distinct_custkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the 100 TB path where exact
    distinct would shuffle every key. Rows-only check (approximate)."""
    return _t(spark, sf_dir, "orders").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n_cust_approx")
    )


@query(
    "agg_rollup_nation_region",
    oracle="""
        SELECT
            COALESCE(r_name, 'ALL') AS region_name,
            COALESCE(n_name, 'ALL') AS nation_name,
            count(*)                AS n_customers,
            CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the region→nation hierarchy. NULL group labels are
    normalized to 'ALL' on both engines (duckdb-vs-Spark rollup label
    conventions — SURVEY.md §7 risk 5). Dims are broadcast."""
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    joined = c.join(n, c.c_nationkey == n.n_nationkey).join(r, n.n_regionkey == r.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("sum_acctbal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
            "sum_acctbal",
        )
    )


@query(
    "agg_conditional_returns",
    oracle="""
        SELECT
            l_linestatus,
            CAST(SUM(CASE WHEN l_returnflag = 'R'
                          THEN CAST(l_extendedprice AS DECIMAL(18,2))
                          ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                AS returned_value,
            count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_returned,
            count(*) AS n_total
        FROM lineitem
        GROUP BY l_linestatus
    """,
)
def agg_conditional_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregation (SUM(CASE WHEN ...)) — one pass,
    no extra scan per condition."""
    l = _t(spark, sf_dir, "lineitem")
    is_ret = F.col("l_returnflag") == "R"
    price_d = F.col("l_extendedprice").cast("decimal(18,2)")
    zero_d = F.lit(0).cast("decimal(18,2)")
    return l.groupBy("l_linestatus").agg(
        F.sum(F.when(is_ret, price_d).otherwise(zero_d)).cast("double").alias("returned_value"),
        F.count(F.when(is_ret, F.lit(1))).alias("n_returned"),
        F.count(F.lit(1)).alias("n_total"),
    )


# ----------------------------------------------------------------- joins

@query(
    "join_inner_orders_customer",
    oracle="""
        SELECT o_orderkey, c_name, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_inner_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join fact→dim. Catalyst picks broadcast-hash while
    customer fits autoBroadcastJoinThreshold, sort-merge beyond; AQE can
    switch at runtime — exactly the behavior wanted at 100 TB."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@query(
    "join_broadcast_nation_region",
    oracle="""
        SELECT n_nationkey, n_name, r_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def join_broadcast_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast join of bounded dims — hint guarantees no
    shuffle regardless of statistics."""
    n = _t(spark, sf_dir, "nation")
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return n.join(r, n.n_regionkey == r.r_regionkey).select("n_nationkey", "n_name", "r_name")


@query(
    "join_left_outer_customer_orders",
    oracle="""
        SELECT c_custkey, o_orderkey, o_totalprice
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    """,
)
def join_left_outer_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers without orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )


@query(
    "join_semi_customer_with_orders",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_semi_customer_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS) — streams the probe side, never widens
    rows; cheaper than inner+distinct at scale."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti_customer_no_orders",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti_customer_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS) — NULL-safe unlike NOT IN."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_range_events",
    oracle="""
        SELECT a.event_id AS event_a, b.event_id AS event_b,
               a.user_id AS user_id
        FROM events a
        JOIN events b
          ON a.user_id = b.user_id
         AND b.ts > a.ts
         AND b.ts <= a.ts + INTERVAL 10 MINUTE
    """,
)
def join_range_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) join: same-user event pairs within 10 minutes.
    The equi-key (user_id) keeps this a hash/sort-merge join with the
    range as a post-filter — NOT a nested-loop cross product; this is
    the shape that survives 100 TB (pure theta joins do not)."""
    e = _t(spark, sf_dir, "events")
    a = e.alias("a")
    b = e.alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 10 MINUTES"))
    )
    return a.join(b, cond, "inner").select(
        F.col("a.event_id").alias("event_a"),
        F.col("b.event_id").alias("event_b"),
        F.col("a.user_id").alias("user_id"),
    )


@query(
    "join_cross_region_nation",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join — only ever sane between bounded dims (5×25 here);
    the engine reserves it for dimension enumeration."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


# --------------------------------------------------------------- windows

@query(
    "window_rank_orders_by_price",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, rn
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM orders
        )
        WHERE rn <= 3
    """,
)
def window_rank_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number. Tie-break on o_orderkey
    gives a total order → deterministic across engines. Spark pushes a
    per-partition TopK (WindowGroupLimit) before the shuffle."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "window_lag_event_gap",
    oracle="""
        SELECT event_id, user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS gap_us
        FROM events
    """,
)
def window_lag_event_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG analytic: microsecond gap to the previous event per user.
    Gap computed on integer epoch-micros so both engines are exact."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros("ts")
    return e.select(
        "event_id",
        "user_id",
        (micros - F.lag(micros).over(w)).alias("gap_us"),
    )


@query(
    "window_running_sum_orders",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_spend
        FROM orders
    """,
)
def window_running_sum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-total frame spec. Decimal window sum → exact parity
    independent of engine summation details."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias(
            "running_spend"
        ),
    )


# ------------------------------------------------------------ sort/limit

@query(
    "sort_orders_totalprice",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
    """,
)
def sort_orders_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort — range-partitioned exchange + per-partition sort in
    Spark (no single-node bottleneck)."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "topk_orders_by_price",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 25
    """,
)
def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K: Spark rewrites sort+limit to TakeOrderedAndProject —
    per-partition heaps, no global sort. Tie-break keeps it exact."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ---------------------------------------------------------------- setops

@query(
    "set_union_event_types",
    oracle="""
        SELECT event_type AS v FROM events
        UNION
        SELECT o_orderpriority AS v FROM orders
    """,
)
def set_union_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two label domains."""
    e = _t(spark, sf_dir, "events").select(F.col("event_type").alias("v"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_orderpriority").alias("v"))
    return e.union(o).distinct()


@query(
    "set_except_customers",
    oracle="""
        SELECT c_custkey FROM customer
        EXCEPT
        SELECT o_custkey AS c_custkey FROM orders
    """,
)
def set_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers that never ordered."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.exceptAll(o.distinct()).distinct()


@query(
    "set_intersect_customers",
    oracle="""
        SELECT c_custkey FROM customer
        INTERSECT
        SELECT o_custkey AS c_custkey FROM orders
    """,
)
def set_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers that ordered at least once."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.intersect(o)


@query(
    "distinct_event_types",
    oracle="SELECT DISTINCT event_type FROM events",
)
def distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT — partial distinct per partition before the shuffle."""
    return _t(spark, sf_dir, "events").select("event_type").distinct()
