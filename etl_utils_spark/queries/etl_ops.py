"""ETL mutation-shaped queries: MERGE/upsert and SCD2 — expressed as
pure transformations so the DuckDB oracle can check them exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_utils_spark.operators.upsert import merge_upsert, scd2_intervals
from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "merge_upsert_customers",
    oracle="""
        WITH target AS (
            SELECT c_custkey, c_name, c_acctbal FROM customer
            WHERE c_custkey % 2 = 0
        ),
        source AS (
            SELECT c_custkey, c_name, c_acctbal + 1000.0 AS c_acctbal
            FROM customer WHERE c_custkey % 3 = 0
        )
        SELECT c_custkey, c_name, c_acctbal FROM source
        UNION ALL
        SELECT t.c_custkey, t.c_name, t.c_acctbal FROM target t
        WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.c_custkey = t.c_custkey)
    """,
)
def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE: evens are the target dim, multiples of 3 arrive as
    updates (+1000 balance) — matched rows replaced, new rows
    inserted, unmatched kept (operators/upsert.py:merge_upsert)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    target = c.filter(F.col("c_custkey") % 2 == 0)
    source = c.filter(F.col("c_custkey") % 3 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 1000.0
    )
    return merge_upsert(target, source, "c_custkey")


@query(
    "scd2_user_value_history",
    oracle="""
        WITH dedup AS (
            SELECT * FROM (
                SELECT user_id, ts, event_id, event_type,
                       lag(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev_type
                FROM events
            ) WHERE prev_type IS NULL OR event_type != prev_type
        )
        SELECT user_id, event_type,
               ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   AS is_current
        FROM dedup
    """,
)
def scd2_user_value_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity intervals over each user's event_type timeline:
    consecutive duplicates collapsed, [valid_from, valid_to) from
    lead(), open interval flagged current
    (operators/upsert.py:scd2_intervals)."""
    e = _t(spark, sf_dir, "events")
    return scd2_intervals(
        e, key="user_id", ts_col="ts", attr_cols=["event_type"], tiebreak="event_id"
    )
