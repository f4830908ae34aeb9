"""Time-series analytics v2 (round 4): autocorrelation spectra and
two-variable smoothing recurrences.

Scale notes: the ACF computes all lags with ONE self-join on an
integer epoch-hour key (the lag offset rides in the join condition),
so lag count multiplies only the probe fan-out, not the scan count.
Holt smoothing reuses the single-shuffle recurrence operator
(operators/recurrence.py) — state stays per-partition, never on the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table as _t

from etl_utils_spark.operators import exact_moments

_moments_sql_acf = exact_moments.moments_sql("h1.n", "h2.n")
_corr_sql_acf = exact_moments.corr_sql(6)


@query(
    "acf_hourly_events",
    oracle="""
        WITH hourly AS (
            SELECT epoch_us(ts) // 3600000000 AS hr,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        ),
        ks AS (SELECT unnest(generate_series(1, 12)) AS k),
        m AS (
            SELECT ks.k AS lag_hours, {MOMENTS}
            FROM ks
            JOIN hourly h1 ON TRUE
            JOIN hourly h2 ON h2.hr = h1.hr + ks.k
            GROUP BY ks.k
        )
        SELECT CAST(lag_hours AS BIGINT) AS lag_hours,
               n AS n_pairs,
               {CORR} AS acf
        FROM m
    """.replace("{MOMENTS}", _moments_sql_acf).replace("{CORR}", _corr_sql_acf),
)
def acf_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the hourly event-arrival series at
    lags 1..12 — the seasonality detector for traffic-shaped data.
    ONE aggregate builds the hourly series; one self-join keyed on
    integer epoch-hour + lag computes every lag's aligned pairs; corr
    per lag.  No window-per-lag, no repeated scans."""
    e = _t(spark, sf_dir, "events")
    hourly = (
        e.groupBy((F.unix_micros("ts") / 3600000000).cast("long").alias("hr"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ks = spark.range(1, 13).select(F.col("id").alias("k"))
    h1 = hourly.alias("h1")
    h2 = hourly.alias("h2")
    joined = F.broadcast(ks).crossJoin(h1).join(
        h2, F.col("h2.hr") == F.col("h1.hr") + F.col("k")
    )
    # Exact integer count moments per lag -> one shared IEEE corr
    # expression (operators/exact_moments.py).
    m = exact_moments.grouped_moments_agg(
        joined.select(
            F.col("k").cast("long").alias("lag_hours"),
            F.col("h1.n").alias("na"),
            F.col("h2.n").alias("nb"),
        ),
        ["lag_hours"],
        F.col("na"),
        F.col("nb"),
    )
    return m.select(
        "lag_hours",
        F.col("n").alias("n_pairs"),
        exact_moments.corr_col(6).alias("acf"),
    )


@query(
    "holt_linear_user_value",
    oracle="""
        WITH RECURSIVE seq AS (
            SELECT user_id, event_id, value,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
            FROM events
        ),
        r AS (
            SELECT user_id, event_id, value, rn,
                   value AS level, CAST(0.0 AS DOUBLE) AS trend
            FROM seq WHERE rn = 1
            UNION ALL
            SELECT s.user_id, s.event_id, s.value, s.rn,
                   0.5 * s.value + 0.5 * (r.level + r.trend) AS level,
                   0.3 * ((0.5 * s.value + 0.5 * (r.level + r.trend)) - r.level)
                       + 0.7 * r.trend AS trend
            FROM seq s JOIN r ON s.user_id = r.user_id AND s.rn = r.rn + 1
        )
        SELECT user_id, event_id, value, level, trend FROM r
    """,
)
def holt_linear_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (alpha=0.5, beta=0.3) per
    user — a TWO-variable sequential recurrence (level + trend), the
    shape window frames cannot express.  Runs on the single-shuffle
    ``mapInPandas`` recurrence operator; hash-checked bit-identically
    against a DuckDB recursive CTE evaluating the same IEEE-754
    expression order (no rounding — same contract as
    ``ewma_user_value``)."""
    from etl_utils_spark.operators.recurrence import holt_linear

    e = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    return holt_linear(e, "user_id", "ts", "value", alpha=0.5, beta=0.3).select(
        "user_id", "event_id", "value", "level", "trend"
    )
