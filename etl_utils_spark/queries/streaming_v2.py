"""Structured-Streaming v2 pack (round 4): leaderboards, share-of-
traffic ratios, and OHLC resampling executed as REAL streams
(readStream → AvailableNow → memory sink) whose final state is
hash-checked against the same DuckDB oracle as a batch run.

These extend the `stream_*_live` family (events_analytics.py) with the
aggregation shapes it didn't cover: arg-min/arg-max state (min_by /
max_by inside a streaming agg), conditional-ratio aggregates, and a
post-stream batch top-k finisher — the "dashboard tile" pattern where
the stream maintains totals and a cheap batch query ranks them.

Scale posture: every stream aggregates into bounded key state
(user_id / hour buckets); the memory sink is harness-only — production
would writeStream to a table with the identical plan.  Shuffle
partitions are pinned low by ``run_stream_to_batch`` (state-store
count = shuffle partitions; see that docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_utils_spark.queries.registry import query
from etl_utils_spark.streaming.windows import read_events_stream, run_stream_to_batch


@query(
    "stream_topk_users_live",
    oracle="""
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY user_id
        ORDER BY total_value DESC, user_id
        LIMIT 10
    """,
)
def stream_topk_users_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming leaderboard: the stream maintains per-user running
    totals (complete mode, bounded key state); the top-10 ranking runs
    as a batch finisher over the sink — ranking inside the stream would
    force a global sort per micro-batch for no benefit.  Decimal
    accumulation keeps the sum order-independent, so the streamed total
    hash-matches the batch oracle exactly."""
    events = read_events_stream(spark, sf_dir)
    totals = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("dec_total"),
    )
    final = run_stream_to_batch(spark, totals)
    return (
        final.select(
            "user_id",
            "n_events",
            F.col("dec_total").cast("double").alias("total_value"),
        )
        .orderBy(F.desc("total_value"), "user_id")
        .limit(10)
    )


@query(
    "stream_purchase_share_hourly_live",
    oracle="""
        SELECT date_trunc('hour', ts) AS hour_start,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
                   AS n_purchases,
               round(CAST(count(*) FILTER (WHERE event_type = 'purchase')
                          AS DOUBLE) / count(*), 6) AS purchase_share
        FROM events
        GROUP BY 1
    """,
)
def stream_purchase_share_hourly_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-ratio aggregate inside a streaming window: purchase
    share per hour maintained as two counters per bucket (count +
    filtered count), ratio derived at read time — the monitoring-metric
    shape (error rates, conversion rates) over a tumbling window."""
    events = read_events_stream(spark, sf_dir)
    hourly = events.groupBy(F.window("ts", "1 hour").alias("w")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
    )
    final = run_stream_to_batch(spark, hourly)
    return final.select(
        F.col("w.start").alias("hour_start"),
        "n_events",
        "n_purchases",
        F.round(
            F.col("n_purchases").cast("double") / F.col("n_events"), 6
        ).alias("purchase_share"),
    )


@query(
    "stream_ohlc_hourly_live",
    oracle="""
        SELECT user_id,
               date_trunc('hour', ts) AS hour_start,
               arg_min(value, ts) AS open,
               max(value)         AS high,
               min(value)         AS low,
               arg_max(value, ts) AS close,
               CAST(count(*) AS BIGINT) AS n_ticks
        FROM events
        GROUP BY 1, 2
    """,
)
def stream_ohlc_hourly_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling executed as a stream: min_by/max_by carry
    (value, ts) argmin/argmax STATE through the streaming aggregation —
    the tick-data rollup shape, showing arg-aggregates work under
    micro-batch merges.  Unique (user_id, ts) pairs in the fixture make
    the argmin/argmax deterministic (same tie contract as the batch
    ``resample_ohlc_15min``)."""
    events = read_events_stream(spark, sf_dir)
    ohlc = events.groupBy(
        "user_id", F.window("ts", "1 hour").alias("w")
    ).agg(
        F.min_by("value", "ts").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "ts").alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    )
    final = run_stream_to_batch(spark, ohlc)
    return final.select(
        "user_id",
        F.col("w.start").alias("hour_start"),
        "open",
        "high",
        "low",
        "close",
        "n_ticks",
    )


from etl_utils_spark.queries.shared import funnel_stage_ctes as _funnel_ctes  # noqa: E402


@query(
    "stream_funnel_stages_live",
    oracle=f"""
        WITH {_funnel_ctes()},
        base AS (SELECT DISTINCT user_id FROM events)
        SELECT b.user_id, u1.t1, u2.t2, u3.t3
        FROM base b
        LEFT JOIN u1 USING (user_id)
        LEFT JOIN u2 USING (user_id)
        LEFT JOIN u3 USING (user_id)
    """,
)
def stream_funnel_stages_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user funnel stage times computed as a REAL stream
    (applyInPandasWithState, AvailableNow): the state machine carries
    three integer-microsecond timestamps per user and folds each
    micro-batch's events in (ts, stage) order — greedy-earliest
    semantics identical to the batch ``funnel_conversion_windowed``
    chain, so the final state hash-matches the three-stage keyed
    min-aggregate oracle exactly (integer-only output, nothing to
    round).  The stream shape is the live-funnel dashboard: O(1)
    state per key, update-mode emission."""
    from etl_utils_spark.streaming.stateful import running_funnel

    s = read_events_stream(spark, sf_dir)
    return run_stream_to_batch(
        spark, running_funnel(s), output_mode="update", python_stateful=True
    ).select(
        "user_id", "t1", "t2", "t3"
    )
