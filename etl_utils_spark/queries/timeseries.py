"""Time-series utilities: cube aggregation with GROUPING()
disambiguation, advanced array ops, and gap-fill + forward-fill —
the resample/interpolate surface of event analytics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "agg_cube_status_priority",
    oracle="""
        SELECT GROUPING(o_orderstatus)   AS g_status,
               GROUPING(o_orderpriority) AS g_priority,
               COALESCE(o_orderstatus, 'ALL')   AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               count(*) AS n
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with GROUPING() flags (C2d): the flags distinguish genuine
    NULL group values from subtotal rows — the portable way to label
    rollup levels across engines."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "g_status",
            "g_priority",
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
        )
    )


@query(
    "array_advanced_ops",
    oracle="""
        SELECT doc_id,
               array_to_string(list_sort(string_split(text, ' '))[1:5], ',')
                   AS first5_csv,
               list_contains(string_split(text, ' '), 'data') AS has_data,
               array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',')
                   AS top3_csv
        FROM documents
    """,
)
def array_advanced_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sort_array/slice/contains/join — the higher-order array toolkit
    beyond explode (C6f).  Output columns are scalars only: the driver's
    canonicalizer hashes rows with pandas, which cannot hash an
    array-typed cell, so the sorted slice is array_join'ed on BOTH the
    Spark and the oracle side (the array ops themselves still run)."""
    d = _t(spark, sf_dir, "documents")
    w = F.split("text", " ")
    return d.select(
        "doc_id",
        F.array_join(F.slice(F.sort_array(w), 1, 5), ",").alias("first5_csv"),
        F.array_contains(w, "data").alias("has_data"),
        F.array_join(F.slice(F.sort_array(F.array_distinct(w)), 1, 3), ",").alias("top3_csv"),
    )


@query(
    "gap_fill_forward_events",
    oracle="""
        WITH bounds AS (
            SELECT user_id,
                   date_trunc('hour', min(ts)) AS t0,
                   date_trunc('hour', max(ts)) AS t1
            FROM events WHERE user_id < 20 GROUP BY user_id
        ),
        grid AS (
            SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS slot
            FROM bounds
        ),
        hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS slot,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
            FROM events WHERE user_id < 20 GROUP BY 1, 2
        )
        SELECT g.user_id, g.slot,
               (h.v IS NULL) AS was_gap,
               last_value(h.v IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.slot
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS v_filled
        FROM grid g LEFT JOIN hourly h
          ON h.user_id = g.user_id AND h.slot = g.slot
    """,
)
def gap_fill_forward_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample to an hourly grid and forward-fill gaps: per-user
    sequence() grid → explode → left join hourly aggregates →
    last(ignorenulls) carry — the classic time-series densification,
    all Catalyst (sequence/explode generate the grid data-locally)."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    hourly = (
        e.groupBy("user_id", F.date_trunc("hour", "ts").alias("slot"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v"))
    )
    bounds = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("slot"),
    )
    joined = grid.join(hourly, ["user_id", "slot"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "slot",
        F.col("v").isNull().alias("was_gap"),
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
    )


@query(
    "ewma_user_value",
    oracle="""
        WITH RECURSIVE seq AS (
            SELECT user_id, event_id, value,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
            FROM events
        ),
        r AS (
            SELECT user_id, event_id, value, rn, value AS ewma
            FROM seq WHERE rn = 1
            UNION ALL
            SELECT s.user_id, s.event_id, s.value, s.rn,
                   0.5 * s.value + 0.5 * r.ewma AS ewma
            FROM seq s JOIN r ON s.user_id = r.user_id AND s.rn = r.rn + 1
        )
        SELECT user_id, event_id, value, ewma FROM r
    """,
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key sequential recurrence (EWMA, alpha=0.5) via an
    Arrow-batched grouped-map — the stateful-op shape window frames
    can't express.  Hash-checked against a DuckDB recursive CTE: both
    engines evaluate ``0.5*x + 0.5*prev`` in the same IEEE order, so
    the doubles are bit-identical (no rounding needed)."""
    from etl_utils_spark.operators.recurrence import ewma

    e = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    return ewma(e, "user_id", "ts", "value", alpha=0.5).select(
        "user_id", "event_id", "value", "ewma"
    )


@query(
    "resample_ohlc_15min",
    oracle="""
        SELECT user_id,
               make_timestamp(((epoch_us(ts) // 900000000) * 900000000)::BIGINT)
                   AS bucket_start,
               arg_min(value, ts)  AS open,
               max(value)          AS high,
               min(value)          AS low,
               arg_max(value, ts)  AS close,
               count(*)            AS n_ticks
        FROM events
        GROUP BY user_id, bucket_start
    """,
)
def resample_ohlc_15min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling (open/high/low/close per 15-min bucket per
    user) — the canonical time-series resample: min_by/max_by pick the
    first/last tick WITHOUT a window sort, one hash aggregate total.

    Tie-break note: min_by/arg_min on duplicate timestamps is
    engine-arbitrary; the fixture's (user_id, ts) pairs are unique so
    the comparison is exact."""
    e = _t(spark, sf_dir, "events")
    bucket = F.timestamp_micros(
        ((F.unix_micros("ts") / 900000000).cast("long") * 900000000)
    )
    return e.groupBy("user_id", bucket.alias("bucket_start")).agg(
        F.min_by("value", "ts").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "ts").alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


@query(
    "rollup_time_grains_events",
    oracle="""
        SELECT 'hour' AS grain, date_trunc('hour', ts) AS bucket,
               event_type, count(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 2, 3
        UNION ALL
        SELECT 'day', date_trunc('day', ts), event_type, count(*),
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        FROM events GROUP BY 2, 3
        UNION ALL
        SELECT 'week', date_trunc('week', ts), event_type, count(*),
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        FROM events GROUP BY 2, 3
    """,
)
def rollup_time_grains_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate shape: hour/day/week
    rollups of the SAME event scan in one job via GROUPING SETS — one
    table pass expanded 3× map-side, partial aggregation before the
    single shuffle, versus the oracle's three scans.  At 100 TB the
    coarser grains are nearly free because the expand rides the same
    partial-agg pipeline; the result powers dashboard zoom levels
    without re-reading facts.  Grain is made explicit (not NULL-coded
    grouping ids) so downstream filters prune by string equality."""
    e = _t(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    day = F.date_trunc("day", F.col("ts"))
    week = F.date_trunc("week", F.col("ts"))
    base = e.select(
        hour.alias("hour"), day.alias("day"), week.alias("week"),
        "event_type", "value",
    )
    gs = base.groupingSets(
        [[F.col("hour"), F.col("event_type")],
         [F.col("day"), F.col("event_type")],
         [F.col("week"), F.col("event_type")]],
        F.col("hour"), F.col("day"), F.col("week"), F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )
    grain = (
        F.when(F.col("hour").isNotNull(), F.lit("hour"))
        .when(F.col("day").isNotNull(), F.lit("day"))
        .otherwise(F.lit("week"))
    )
    bucket = F.coalesce(F.col("hour"), F.col("day"), F.col("week"))
    return gs.select(
        grain.alias("grain"), bucket.alias("bucket"), "event_type",
        "n_events", "sum_value",
    )
