"""Event-stream analytics, batch analogs (SURVEY.md §2 C10a/C10c +
as-of join): tumbling-window aggregation, sessionization, as-of join.
The Structured Streaming variants of these shapes live in
etl_utils_spark/streaming/; these batch forms are their oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_utils_spark.operators.sessionize import asof_join, session_stats
from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "stream_tumbling_counts",
    oracle="""
        SELECT date_trunc('hour', ts) AS hour_start,
               event_type,
               count(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window aggregate — the batch analog of the
    streaming groupBy(window(...)); F.window keeps the same semantics
    the readStream variant uses (streaming/windows.py)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events", "sum_value")
    )


@query(
    "sessionize_events",
    oracle="""
        WITH ordered AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts, value,
                   SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_seq
            FROM ordered
        )
        SELECT user_id, session_seq,
               min(ts) AS session_start,
               max(ts) AS session_end,
               count(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM sess
        GROUP BY user_id, session_seq
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (30-min gap) — batch analog of
    session_window streaming (operators/sessionize.py)."""
    return session_stats(_t(spark, sf_dir, "events"), gap_seconds=1800)


@query(
    "asof_purchase_last_click",
    oracle="""
        SELECT p.event_id AS event_id,
               p.user_id  AS user_id,
               max(c.ts)  AS right_ts,
               arg_max(c.event_id, c.ts) AS right_event_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id AND c.ts <= p.ts
        GROUP BY p.event_id, p.user_id
    """,
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent
    preceding click — union-and-carry implementation, ONE shuffle, no
    candidate-pair explosion (operators/sessionize.py:asof_join)."""
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    out = asof_join(purchases, clicks, on="user_id", right_cols=["event_id"])
    return out.select("event_id", "user_id", "right_ts", "right_event_id")
