"""Modern SQL function surface: bitwise/boolean aggregates, error-safe
``try_*`` scalar functions, calendar edge functions, and the remaining
advanced string functions.

Reference parity: the delegated-SQL capability tier — the reference
wrapper forwards arbitrary scalar/aggregate SQL to the host engine
(query_wrapper.sql:255); these pin the engine-function corners the
earlier scalar_funcs/misc_funcs packs did not cover.  All row-local or
single hash-aggregate — nothing here shuffles more than once, and every
expression stays inside whole-stage codegen (no UDFs).

Cross-engine notes baked into each oracle:
- Spark ``try_divide``/``try_cast`` return NULL where DuckDB would
  raise or return inf — oracles express the identical semantics with
  CASE/NULLIF/TRY_CAST.
- Spark ``add_months``/``last_day`` and DuckDB ``+ INTERVAL``/
  ``last_day`` both clamp to month ends — semantics agree.
- Spark ``weekofyear`` and DuckDB ``week`` are both ISO weeks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "agg_bitwise_boolean_ops",
    oracle="""
        SELECT event_type,
               bit_and(event_id)::BIGINT AS band,
               bit_or(event_id)::BIGINT AS bor,
               bit_xor(event_id)::BIGINT AS bxor,
               bool_and(value > 1.0) AS all_above1,
               bool_or(value > 900.0) AS any_above900,
               count(*)::BIGINT AS n
        FROM events GROUP BY event_type
    """,
)
def agg_bitwise_boolean_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise (bit_and/bit_or/bit_xor) and boolean (bool_and/bool_or)
    aggregates per event type — the sketch-adjacent aggregate family
    (the Bloom operator builds on bit_or of shifted masks;
    operators/bloom.py).  All five are commutative-associative hash
    aggregates — map-side partials merge exactly, so the result is
    partition-layout-independent by construction."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.bit_and("event_id").alias("band"),
        F.bit_or("event_id").alias("bor"),
        F.bit_xor("event_id").alias("bxor"),
        F.bool_and(F.col("value") > 1.0).alias("all_above1"),
        F.bool_or(F.col("value") > 900.0).alias("any_above900"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "scalar_try_functions",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN (l_quantity - 25.0) = 0.0 THEN NULL
                    ELSE l_extendedprice / (l_quantity - 25.0) END AS unit_margin,
               TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
               TRY_CAST(substr(CAST(l_shipdate AS VARCHAR), 1, 4) AS INTEGER)
                   AS ship_year_parsed
        FROM lineitem
    """,
)
def scalar_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar functions: ``try_divide`` (NULL instead of a
    divide-by-zero error under ANSI mode) and ``try_cast`` (NULL
    instead of a cast failure) — the functions that keep a 100 TB
    batch job alive when one row in a billion is malformed, instead of
    failing the stage.  The oracle spells out the identical semantics
    with CASE/TRY_CAST."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide("l_extendedprice", F.col("l_quantity") - 25.0).alias(
            "unit_margin"
        ),
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),
        F.substring(F.col("l_shipdate").cast("string"), 1, 4)
        .try_cast("int")
        .alias("ship_year_parsed"),
    )


@query(
    "date_edge_functions",
    oracle="""
        SELECT o_orderkey,
               last_day(CAST(o_orderdate AS DATE)) AS month_end,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
                   AS plus3mo,
               quarter(o_orderdate)::INT AS qtr,
               week(o_orderdate)::INT AS iso_week,
               (CAST(date_trunc('month', o_orderdate) AS DATE)
                    = CAST(o_orderdate AS DATE)) AS is_month_start
        FROM orders
    """,
)
def date_edge_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar edge functions: last_day, clamped month arithmetic
    (add_months == DuckDB's + INTERVAL MONTH, both clamp Jan 31 + 1 →
    Feb 28/29), quarter, ISO week (Spark weekofyear == DuckDB week),
    and a month-start predicate.  Row-local, codegen'd, scan-pruned to
    two columns."""
    o = _t(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.last_day(od).alias("month_end"),
        F.add_months(od, 3).alias("plus3mo"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.weekofyear("o_orderdate").cast("int").alias("iso_week"),
        (F.date_trunc("month", "o_orderdate").cast("date") == od).alias(
            "is_month_start"
        ),
    )


@query(
    "string_advanced_funcs",
    oracle="""
        SELECT n_nationkey,
               split_part(n_name, 'A', 1) AS before_first_a,
               translate(n_name, 'AEIOU', 'aeiou') AS vowels_lowered,
               reverse(n_name) AS reversed,
               printf('%s#%02d', n_name, n_nationkey) AS tagged,
               array_to_string(regexp_extract_all(n_name, '[AEIOU]+'), '-')
                   AS vowel_runs,
               len(regexp_extract_all(n_name, '[A-Z]')) AS n_letters
        FROM nation
    """,
)
def string_advanced_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Advanced string functions not covered by the earlier string
    packs: split_part, translate, reverse, printf-style formatting
    (Spark format_string == DuckDB printf), regexp_extract_all with
    array_join, and a regex-match count.  Row-local over the bounded
    nation dim — the capability under test is function parity, not
    volume."""
    n = _t(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.split_part(F.col("n_name"), F.lit("A"), F.lit(1)).alias("before_first_a"),
        F.translate("n_name", "AEIOU", "aeiou").alias("vowels_lowered"),
        F.reverse("n_name").alias("reversed"),
        F.format_string("%s#%02d", F.col("n_name"), F.col("n_nationkey")).alias(
            "tagged"
        ),
        F.array_join(
            F.expr("regexp_extract_all(n_name, '[AEIOU]+', 0)"), "-"
        ).alias("vowel_runs"),
        F.size(F.expr("regexp_extract_all(n_name, '[A-Z]', 0)")).alias("n_letters"),
    )


@query(
    "user_activity_bitmap",
    oracle="""
        WITH d AS (
            SELECT user_id,
                   date_diff('day', TIMESTAMP '2024-01-01', ts) AS day
            FROM events
        ),
        bm AS (
            SELECT user_id,
                   bit_or(CAST(1 AS BIGINT) << CAST(day AS INT)) AS bitmap
            FROM d GROUP BY user_id
        )
        SELECT user_id,
               bitmap::BIGINT AS bitmap,
               bit_count(bitmap)::BIGINT AS active_days,
               bit_count(bitmap & 127)::BIGINT AS active_w1,
               bit_count(bitmap & (CAST(127 AS BIGINT) << 7))::BIGINT
                   AS active_w2,
               (bitmap & 127) <> 0 AND (bitmap & (CAST(127 AS BIGINT) << 7)) <> 0
                   AS retained_w1_w2
        FROM bm
    """,
)
def user_activity_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index engagement analytics: each user's January activity
    packed into ONE BIGINT (bit d = active on day d) via a bit_or
    aggregate of shifted masks, then day counts / weekly cohorts /
    W1→W2 retention read back with bit_count and mask ANDs — the
    audience-engine trick that turns per-user daily activity into
    word-level bit arithmetic.  Exact integers end-to-end.

    100 TB shape: bit_or is a commutative-associative hash aggregate
    (map-side partials merge exactly) and every downstream metric is
    row-local bit math on the packed word — one shuffle keyed by
    user_id carries 8 bytes of state per user where a day-grain
    retention join would carry 30 rows; week masks are compile-time
    literals, so cohort redefinition is a constant change, not a
    re-aggregation."""
    e = _t(spark, sf_dir, "events")
    d = e.select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("day"),
    )
    bm = d.groupBy("user_id").agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(day AS INT))")
        ).alias("bitmap")
    )
    m1 = F.lit(127).cast("long")
    m2 = F.expr("shiftleft(CAST(127 AS BIGINT), 7)")
    return bm.select(
        "user_id",
        "bitmap",
        F.bit_count("bitmap").cast("long").alias("active_days"),
        F.bit_count(F.col("bitmap").bitwiseAND(m1)).cast("long").alias("active_w1"),
        F.bit_count(F.col("bitmap").bitwiseAND(m2)).cast("long").alias("active_w2"),
        (
            (F.col("bitmap").bitwiseAND(m1) != 0)
            & (F.col("bitmap").bitwiseAND(m2) != 0)
        ).alias("retained_w1_w2"),
    )


@query(
    "cohort_retention_bitmap",
    oracle="""
        WITH d AS (
            SELECT user_id,
                   date_diff('day', TIMESTAMP '2024-01-01', ts) AS day
            FROM events
        ),
        bm AS (
            SELECT user_id,
                   CAST(min(day) // 7 AS BIGINT) AS cohort,
                   bit_or(CAST(1 AS BIGINT) << CAST(day AS INT)) AS bitmap
            FROM d GROUP BY user_id
        ),
        g AS (
            SELECT cohort, unnest(generate_series(0, 4 - CAST(cohort AS INT)))
                       AS offset_w,
                   bitmap
            FROM bm
        )
        SELECT cohort, CAST(offset_w AS BIGINT) AS offset_w,
               count(*)::BIGINT AS n_cohort,
               SUM(CASE WHEN (bitmap
                              & (CAST(127 AS BIGINT)
                                 << CAST(7 * (cohort + offset_w) AS INT))) <> 0
                        THEN 1 ELSE 0 END)::BIGINT AS n_active,
               CAST(SUM(CASE WHEN (bitmap
                              & (CAST(127 AS BIGINT)
                                 << CAST(7 * (cohort + offset_w) AS INT))) <> 0
                        THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS retention
        FROM g GROUP BY cohort, offset_w
    """,
)
def cohort_retention_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weekly cohort-retention TRIANGLE computed from activity
    bitmaps: cohort = a user's first active week, retention(cohort,
    +j) = share of the cohort with any activity in week cohort+j —
    read as one mask test against the user's packed month
    (``user_activity_bitmap``'s representation), so the whole triangle
    is ONE per-user aggregate + one bounded explode over week offsets;
    the classic formulation self-joins a (user, week) activity table
    per matrix cell.  Counts are exact integers; retention is a single
    IEEE division of exact counts, emitted unrounded."""
    e = _t(spark, sf_dir, "events")
    d = e.select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("day"),
    )
    bm = d.groupBy("user_id").agg(
        F.floor(F.min("day") / 7).cast("long").alias("cohort"),
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(day AS INT))")
        ).alias("bitmap"),
    )
    g = bm.select(
        "cohort",
        F.explode(
            F.sequence(F.lit(0), F.lit(4) - F.col("cohort").cast("int"))
        ).alias("offset_w"),
        "bitmap",
    )
    mask = F.expr(
        "shiftleft(CAST(127 AS BIGINT), CAST(7 * (cohort + offset_w) AS INT))"
    )
    active = F.when(F.col("bitmap").bitwiseAND(mask) != 0, 1).otherwise(0)
    return g.groupBy("cohort", F.col("offset_w").cast("long").alias("offset_w")).agg(
        F.count(F.lit(1)).alias("n_cohort"),
        F.sum(active).cast("long").alias("n_active"),
        (
            F.sum(active).cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("retention"),
    )
