"""Extended window-function surface: ntile, percent_rank, cume_dist,
first/last value frames, range frames, and fuzzy string matching —
rounding out C3 and C6 (SURVEY.md §2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "window_ntile_percentrank",
    oracle="""
        SELECT o_orderkey,
               ntile(4) OVER w AS price_quartile,
               percent_rank() OVER w AS pr,
               cume_dist() OVER w AS cd,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_ntile_percentrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/cume_dist/rank/dense_rank over a total order
    (price, key) — deterministic across engines."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("price_quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "window_first_last_value",
    oracle="""
        SELECT o_custkey, o_orderkey,
               first_value(o_orderkey) OVER w AS first_order,
               last_value(o_orderkey) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS last_order,
               nth_value(o_orderkey, 2) OVER w AS second_order
        FROM orders
        WINDOW w AS (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        )
    """,
)
def window_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value with explicit frames (the default frame's
    last_value trap is exactly why the frame is explicit)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_full = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


@query(
    "window_range_frame_spend",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   RANGE BETWEEN 365 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS spend_trailing_year
        FROM orders
    """,
)
def window_range_frame_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over epoch-days: trailing-365-day spend per
    customer — the value-based frame ROWS cannot express. Integer day
    arithmetic keeps it timezone-free on both engines."""
    o = _t(spark, sf_dir, "orders")
    epoch_day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    w = Window.partitionBy("o_custkey").orderBy(epoch_day).rangeBetween(-365, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("spend_trailing_year"),
    )


@query(
    "fuzzy_match_part_names",
    oracle="""
        SELECT p_partkey,
               levenshtein(p_brand, 'Brand#33') AS brand_dist
        FROM part
        WHERE levenshtein(p_brand, 'Brand#33') <= 2
    """,
)
def fuzzy_match_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy matching via Levenshtein distance (C6a-adjacent) — the
    string-similarity primitive for entity resolution."""
    p = _t(spark, sf_dir, "part")
    dist = F.levenshtein("p_brand", F.lit("Brand#33"))
    return p.select("p_partkey", dist.alias("brand_dist")).filter(dist <= 2)


@query(
    "window_rolling_median_spikes",
    oracle="""
        WITH b AS (
            SELECT user_id, event_id, ts, value,
                   CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
            FROM events
        )
        SELECT user_id, event_id, value,
               median(vc) OVER w / 100.0 AS rolling_med,
               value > 2 * (median(vc) OVER w / 100.0) AS is_spike
        FROM b
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    """,
)
def window_rolling_median_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling EXACT median (10-row trailing frame per user) with a
    spike flag — the robust-statistics anomaly pattern.  Spark's exact
    percentile(0.5) and DuckDB's median both linear-interpolate; the
    probe over all sf0.01 rows showed round-6 equality, and the flag
    compares against the ROUNDED median in both engines so the
    boolean cannot straddle the rounding."""
    e = _t(spark, sf_dir, "events").withColumn(
        "vc", (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    )
    # Median over exact integer cents: interpolation of two BIGINT
    # middles is exact in double on both engines (values < 2^53), so
    # ONE trailing /100.0 division is the only inexact step — shared
    # IEEE, no rounding needed.  (ts, event_id) gives the frame a
    # deterministic total order under timestamp ties.
    med = (
        F.expr(
            "percentile(vc, 0.5) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id "
            "ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)"
        )
        / 100.0
    )
    return e.select(
        "user_id",
        "event_id",
        "value",
        med.alias("rolling_med"),
        (F.col("value") > 2 * med).alias("is_spike"),
    )
