"""Event-stream analytics, batch analogs (SURVEY.md §2 C10a/C10c +
as-of join): tumbling-window aggregation, sessionization, as-of join.
The Structured Streaming variants of these shapes live in
etl_utils_spark/streaming/; these batch forms are their oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_utils_spark.operators.sessionize import asof_join, session_stats
from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table

_TUMBLING_ORACLE = """
    SELECT date_trunc('hour', ts) AS hour_start,
           event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
"""

_SLIDING_ORACLE = """
    SELECT make_timestamp(
               ((epoch_us(ts) // 300000000) * 300000000 - k.k * 300000000)::BIGINT
           ) AS window_start,
           count(*) AS n_events
    FROM events, (SELECT unnest([0, 1]) AS k) k
    GROUP BY 1
"""


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query("stream_tumbling_counts", oracle=_TUMBLING_ORACLE)
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
                   CAST(SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_seq
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


@query(
    "sliding_window_counts",
    oracle=_SLIDING_ORACLE,
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window (10 min / 5 min) event counts — batch analog of
    the streaming sliding window (C10b); each event lands in
    width/slide = 2 windows."""
    from etl_utils_spark.streaming.windows import sliding_counts

    return sliding_counts(_t(spark, sf_dir, "events"))


@query(
    "retention_cohorts_weekly",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
            FROM events GROUP BY user_id
        )
        SELECT f.cohort_week,
               CAST(date_diff('week',
                    CAST(f.cohort_week AS DATE),
                    CAST(date_trunc('week', e.ts) AS DATE)) AS BIGINT) AS week_offset,
               count(DISTINCT e.user_id) AS n_active
        FROM events e JOIN firsts f ON f.user_id = e.user_id
        GROUP BY 1, 2
    """,
)
def retention_cohorts_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    counted distinct in each subsequent week — two shuffles total (the
    firsts aggregate, then the cohort×offset count-distinct); the
    firsts table joins back broadcast-or-shuffle per AQE."""
    e = _t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    week_offset = (
        F.datediff(
            F.date_trunc("week", F.col("ts")).cast("date"),
            F.col("cohort_week").cast("date"),
        )
        / 7
    ).cast("long")
    return (
        e.join(firsts, "user_id")
        .groupBy("cohort_week", week_offset.alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@query(
    "funnel_view_click_purchase",
    oracle="""
        WITH stage1 AS (
            SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        stage2 AS (
            SELECT e.user_id, min(e.ts) AS t2
            FROM events e JOIN stage1 s ON s.user_id = e.user_id
            WHERE e.event_type = 'click' AND e.ts > s.t1
            GROUP BY e.user_id
        ),
        stage3 AS (
            SELECT e.user_id, min(e.ts) AS t3
            FROM events e JOIN stage2 s ON s.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s.t2
            GROUP BY e.user_id
        )
        SELECT '1_view' AS stage, count(*) AS n_users FROM stage1
        UNION ALL
        SELECT '2_click_after' AS stage, count(*) AS n_users FROM stage2
        UNION ALL
        SELECT '3_purchase_after' AS stage, count(*) AS n_users FROM stage3
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → later click → later purchase):
    per-stage first-event times via keyed aggregates + semi-ish joins —
    each stage is one shuffle on user_id, no window over the full event
    stream, no row explosion; the three stage tables shrink
    monotonically."""
    e = _t(spark, sf_dir, "events")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    def _count(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(label).alias("stage"), "n_users"
        )

    return (
        _count(s1, "1_view")
        .unionByName(_count(s2, "2_click_after"))
        .unionByName(_count(s3, "3_purchase_after"))
    )


# ------------------------------------------------ streaming execution
# These run REAL Structured Streaming (readStream → AvailableNow →
# memory sink) and return the final state as a batch DataFrame — so
# the driver hash-checks streaming execution against the same DuckDB
# oracles as the batch analogs.

@query("stream_tumbling_counts_live", oracle=_TUMBLING_ORACLE)
def stream_tumbling_counts_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10a executed as a stream: same oracle as the batch analog —
    the final complete-mode state must hash-match DuckDB."""
    from etl_utils_spark.streaming import windows as W

    return W.run_stream_to_batch(spark, W.tumbling_counts(W.read_events_stream(spark, sf_dir)))


@query("stream_sliding_counts_live", oracle=_SLIDING_ORACLE)
def stream_sliding_counts_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10b executed as a stream."""
    from etl_utils_spark.streaming import windows as W

    return W.run_stream_to_batch(spark, W.sliding_counts(W.read_events_stream(spark, sf_dir)))


@query(
    "stream_session_window_live",
    oracle="""
        WITH ordered AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sess AS (
            SELECT user_id, ts, value,
                   CAST(SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS seq
            FROM ordered
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               count(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM sess
        GROUP BY user_id, seq
    """,
)
def stream_session_window_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10c executed as a stream with native session_window —
    hash-checked against the DuckDB gaps-and-islands analog (a merged
    session window is [min ts, max ts + gap); windows merge only on
    STRICT overlap, so a gap of exactly 30 min starts a new session —
    hence >= in the oracle's is_new, vs > in sessionize_events)."""
    from etl_utils_spark.streaming import windows as W

    return W.run_stream_to_batch(
        spark, W.session_window_stats(W.read_events_stream(spark, sf_dir))
    )


@query(
    "stream_cdc_merge_live",
    oracle="""
        WITH target AS (
            SELECT user_id, event_id, ts FROM events WHERE event_type = 'signup'
        ),
        updates AS (
            SELECT user_id, event_id, ts FROM (
                SELECT user_id, event_id, ts,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                       ) AS rn
                FROM events WHERE event_type = 'purchase'
            ) WHERE rn = 1
        )
        SELECT user_id, event_id, ts FROM updates
        UNION ALL
        SELECT t.user_id, t.event_id, t.ts FROM target t
        WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.user_id = t.user_id)
    """,
)
def stream_cdc_merge_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-apply executed as a REAL stream: a purchase stream merges
    into a signup-seeded dimension via foreachBatch (deterministic
    last-writer-wins per user on (ts, event_id)); the final target
    parquet hash-matches the batch MERGE oracle.  Per-signup rows
    survive only for users with no purchases — exactly MERGE
    semantics (streaming/sinks.py:foreach_batch_merge)."""
    import tempfile

    from etl_utils_spark.streaming import windows as W
    from etl_utils_spark.streaming.sinks import foreach_batch_merge

    base = tempfile.mkdtemp(prefix="cdc_merge_")
    target_path = base + "/dim_user_last_event"
    e = _t(spark, sf_dir, "events")
    e.filter(F.col("event_type") == "signup").select(
        "user_id", "event_id", "ts"
    ).write.mode("overwrite").parquet(target_path)

    s = W.read_events_stream(spark, sf_dir)
    purchases = s.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    q = foreach_batch_merge(
        purchases,
        target_path,
        key="user_id",
        checkpoint=base + "/ckpt",
        order_cols=["ts", "event_id"],
    )
    try:
        q.awaitTermination(timeout=300)
    finally:
        if q.isActive:
            q.stop()
    return spark.read.parquet(target_path)


@query(
    "stream_dedup_within_watermark",
    oracle="SELECT event_id, user_id, event_type FROM events",
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10d+C10e executed as a stream: watermark + stateful dedup on a
    deliberately DOUBLED input stream (events ∪ events) — the dedup
    must reduce it back to exactly the distinct event set."""
    from etl_utils_spark.streaming import windows as W

    s = W.read_events_stream(spark, sf_dir)
    doubled = s.unionByName(s)
    out = W.dedup_within_watermark(doubled, delay="10 minutes").select(
        "event_id", "user_id", "event_type"
    )
    return W.run_stream_to_batch(spark, out, output_mode="append")


@query(
    "markov_event_transitions",
    oracle="""
        WITH seq AS (
            SELECT event_type,
                   lead(event_type) OVER (PARTITION BY user_id ORDER BY ts)
                       AS next_type
            FROM events
        ),
        pairs AS (
            SELECT event_type, next_type, count(*) AS n
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY event_type, next_type
        )
        SELECT event_type, next_type, n,
               ROUND(n::DOUBLE / SUM(n) OVER (PARTITION BY event_type), 6) AS p
        FROM pairs
    """,
)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: lead() pairs adjacent events, one hash aggregate counts
    transitions, a tiny window normalizes rows into probabilities —
    the session-flow model behind next-action prediction.  The heavy
    shuffle is the per-user window; the normalization window runs on
    the aggregated (type × type) matrix, which is constant-size at any
    data scale."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    pairs = (
        e.select("event_type", F.lead("event_type").over(w).alias("next_type"))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wn = Window.partitionBy("event_type")
    return pairs.select(
        "event_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wn), 6).alias("p"),
    )


@query(
    "attribution_last_touch",
    oracle="""
        WITH touches AS (
            SELECT user_id, ts, event_type FROM events
            WHERE event_type IN ('view', 'click', 'signup')
        ),
        purch AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'purchase'
        ),
        attr AS (
            SELECT p.event_id, p.value, arg_max(t.event_type, t.ts) AS channel
            FROM purch p LEFT JOIN touches t
              ON t.user_id = p.user_id AND t.ts <= p.ts
            GROUP BY p.event_id, p.value
        )
        SELECT coalesce(channel, 'direct') AS channel,
               count(*) AS n_purchases,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   AS attributed_value
        FROM attr GROUP BY 1
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase's value is
    credited to the user's most recent preceding touch event (view /
    click / signup), falling back to 'direct' when none precedes it.
    Rides the union-and-carry as-of join (one shuffle on user_id, no
    candidate-pair explosion — the oracle's join+argmax materializes
    every touch≤purchase pair; this never does), then a
    channel-cardinality hash aggregate.  (user_id, ts) is unique in
    the fixture, so the carried last touch is deterministic."""
    e = _t(spark, sf_dir, "events")
    touches = e.filter(
        F.col("event_type").isin("view", "click", "signup")
    ).select("user_id", "ts", F.col("event_type").alias("channel"))
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    j = asof_join(purchases, touches, on="user_id", right_cols=["channel"])
    return j.groupBy(
        F.coalesce("right_channel", F.lit("direct")).alias("channel")
    ).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("attributed_value"),
    )


@query(
    "attribution_first_touch",
    oracle="""
        WITH touches AS (
            SELECT user_id, ts, event_type FROM events
            WHERE event_type IN ('view', 'click', 'signup')
        ),
        purch AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'purchase'
        ),
        attr AS (
            SELECT p.event_id, p.value, arg_min(t.event_type, t.ts) AS channel
            FROM purch p LEFT JOIN touches t
              ON t.user_id = p.user_id AND t.ts <= p.ts
            GROUP BY p.event_id, p.value
        )
        SELECT coalesce(channel, 'direct') AS channel,
               count(*) AS n_purchases,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   AS attributed_value
        FROM attr GROUP BY 1
    """,
)
def attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution — the acquisition-credit counterpart of
    attribution_last_touch: each purchase credits the user's EARLIEST
    touch at or before it.  Same union-and-carry discipline, but the
    carried value is a running first(ignorenulls) instead of last —
    still one user_id exchange, no candidate pairs.  (user_id, ts)
    unique in the fixture ⇒ deterministic."""
    e = _t(spark, sf_dir, "events")
    touches = e.filter(
        F.col("event_type").isin("view", "click", "signup")
    ).select(
        "user_id", "ts", F.lit(0).alias("_side"), F.col("event_type").alias("_ch"),
        F.lit(None).cast("double").alias("value"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("_side"),
        F.lit(None).cast("string").alias("_ch"), "value",
    )
    u = touches.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_first_ch", F.first("_ch", ignorenulls=True).over(w))
    return (
        carried.filter(F.col("_side") == 1)
        .groupBy(F.coalesce("_first_ch", F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("attributed_value"),
        )
    )


@query(
    "join_interval_overlap_binned",
    oracle="""
        WITH spans AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   min(ts) AS s_start, max(ts) AS s_end
            FROM events GROUP BY user_id, CAST(ts AS DATE)
        ),
        wins AS (
            SELECT w_start, w_start + INTERVAL 90 MINUTE AS w_end
            FROM (SELECT unnest(generate_series(
                     TIMESTAMP '2024-01-01 10:00:00',
                     TIMESTAMP '2024-01-31 10:00:00',
                     INTERVAL 1 DAY)) AS w_start)
            UNION ALL
            SELECT w_start, w_start + INTERVAL 60 MINUTE AS w_end
            FROM (SELECT unnest(generate_series(
                     TIMESTAMP '2024-01-01 22:00:00',
                     TIMESTAMP '2024-01-31 22:00:00',
                     INTERVAL 1 DAY)) AS w_start)
        )
        SELECT s.user_id, s.day, w.w_start,
               CAST(epoch_us(least(s.s_end, w.w_end))
                    - epoch_us(greatest(s.s_start, w.w_start)) AS BIGINT)
                   AS overlap_us
        FROM spans s JOIN wins w
          ON s.s_start < w.w_end AND w.w_start < s.s_end
    """,
)
def join_interval_overlap_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP JOIN without the theta product: per-user daily
    activity spans × synthetic maintenance windows (two per day,
    engine-replayable from literals).  Each interval explodes into the
    HOUR BINS it covers and candidates meet on an equi-join over the
    bin key — any overlapping pair shares the hour containing their
    intersection, so binning is recall-1 — then the exact overlap
    predicate verifies and the exact integer microsecond overlap is
    emitted.  The oracle runs the direct theta join, so the hash match
    certifies bin completeness.  At 100 TB the bin key is the shuffle
    partitioner (interval join = equi join + bounded dup factor =
    interval_len/bin_width + 1), the same move Spark's streaming
    interval join makes internally."""
    e = _t(spark, sf_dir, "events")
    spans = e.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    wins = (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.to_timestamp(F.lit("2024-01-01 10:00:00")),
                    F.to_timestamp(F.lit("2024-01-31 10:00:00")),
                    F.expr("interval 1 day"),
                )
            ).alias("w_start")
        )
        .select("w_start", (F.col("w_start") + F.expr("interval 90 minutes")).alias("w_end"))
        .unionByName(
            spark.range(1)
            .select(
                F.explode(
                    F.sequence(
                        F.to_timestamp(F.lit("2024-01-01 22:00:00")),
                        F.to_timestamp(F.lit("2024-01-31 22:00:00")),
                        F.expr("interval 1 day"),
                    )
                ).alias("w_start")
            )
            .select("w_start", (F.col("w_start") + F.expr("interval 60 minutes")).alias("w_end"))
        )
    )

    def hour_bins(start, end):
        return F.sequence(
            F.date_trunc("hour", start), F.date_trunc("hour", end),
            F.expr("interval 1 hour"),
        )

    s_b = spans.select(
        "user_id", "day", "s_start", "s_end",
        F.explode(hour_bins(F.col("s_start"), F.col("s_end"))).alias("bin"),
    )
    w_b = wins.select(
        "w_start", "w_end",
        F.explode(hour_bins(F.col("w_start"), F.col("w_end"))).alias("bin"),
    )
    cand = (
        s_b.join(w_b, "bin")
        .select("user_id", "day", "s_start", "s_end", "w_start", "w_end")
        .distinct()
    )
    ov = cand.filter(
        (F.col("s_start") < F.col("w_end")) & (F.col("w_start") < F.col("s_end"))
    )
    return ov.select(
        "user_id",
        "day",
        "w_start",
        (
            F.unix_micros(F.least("s_end", "w_end"))
            - F.unix_micros(F.greatest("s_start", "w_start"))
        ).alias("overlap_us"),
    )


@query(
    "attribution_position_based",
    oracle="""
        WITH touches AS (
            SELECT user_id, ts, event_type FROM events
            WHERE event_type IN ('view', 'click', 'signup')
        ),
        purch AS (
            SELECT event_id, user_id, ts,
                   CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'
        ),
        pairs AS (
            SELECT p.event_id, p.cents, t.event_type AS channel,
                   row_number() OVER (
                       PARTITION BY p.event_id ORDER BY t.ts
                   ) AS pos,
                   count(*) OVER (PARTITION BY p.event_id) AS k
            FROM purch p JOIN touches t
              ON t.user_id = p.user_id
             AND t.ts <= p.ts
             AND t.ts >= p.ts - INTERVAL 24 HOURS
        ),
        credited AS (
            SELECT channel, event_id,
                   CAST(floor(
                       (CASE WHEN k = 1 THEN 1.0
                             WHEN k = 2 THEN 0.5
                             WHEN pos = 1 OR pos = k THEN 0.4
                             ELSE 0.2 / (k - 2) END)
                       * cents * 1048576.0 + 0.5) AS BIGINT) AS q
            FROM pairs
        )
        SELECT channel,
               count(*)::BIGINT AS n_touches,
               count(DISTINCT event_id)::BIGINT AS n_purchases,
               CAST(SUM(q) AS DOUBLE) / 1048576.0 AS attributed_cents
        FROM credited GROUP BY channel
    """,
)
def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped 40/20/40) attribution over a bounded
    24-hour lookback: every touch in the day before a purchase gets
    credit — 40% to the first and last, the middle 20% split evenly —
    the model between first/last-touch (one winner) and linear (no
    position signal).  The lookback bound is the scale contract: the
    pair join is user-keyed with a range post-filter, so candidate
    pairs are (purchases x touches-per-day) per user, never the full
    touch history; the position window partitions by purchase id
    (bounded partitions).  Weights are shared-literal IEEE doubles
    times exact integer cents, quantized per-term at 2^-20 and summed
    as integers, so the per-channel total is an exact dyadic emitted
    unrounded (cents units)."""
    e = _t(spark, sf_dir, "events")
    touches = e.filter(
        F.col("event_type").isin("view", "click", "signup")
    ).select("user_id", F.col("ts").alias("tts"), F.col("event_type").alias("channel"))
    purch = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    pairs = purch.join(touches, "user_id").filter(
        (F.col("tts") <= F.col("ts"))
        & (F.col("tts") >= F.col("ts") - F.expr("INTERVAL 24 HOURS"))
    )
    wpos = Window.partitionBy("event_id").orderBy("tts")
    wk = Window.partitionBy("event_id")
    ranked = pairs.select(
        "event_id",
        "cents",
        "channel",
        F.row_number().over(wpos).alias("pos"),
        F.count(F.lit(1)).over(wk).alias("k"),
    )
    w = (
        F.when(F.col("k") == 1, F.lit(1.0))
        .when(F.col("k") == 2, F.lit(0.5))
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("k")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("k") - 2))
    )
    q = F.floor(w * F.col("cents") * 1048576.0 + 0.5).cast("long")
    return ranked.select("channel", "event_id", q.alias("q")).groupBy(
        "channel"
    ).agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.countDistinct("event_id").alias("n_purchases"),
        (F.sum("q").cast("double") / 1048576.0).alias("attributed_cents"),
    )
