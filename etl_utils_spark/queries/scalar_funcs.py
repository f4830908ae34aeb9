"""Scalar-function query surface (SURVEY.md §2 B8, B17, C6a–C6f).

Built-in pyspark.sql.functions only — each stays inside whole-stage
codegen; nothing here leaves the JVM.

Dialect parity notes (Spark vs DuckDB) are documented per query; where
semantics could drift (timestamp format strings, regex flavors, float
formatting) the expressions are chosen so both engines agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "string_funcs_part",
    oracle="""
        SELECT
            p_partkey,
            upper(p_brand)                         AS brand_upper,
            lower(p_type)                          AS type_lower,
            substr(p_name, 1, 12)                  AS name_prefix,
            length(p_name)                         AS name_len,
            concat(p_brand, ':', p_type)           AS brand_type,
            trim(p_name)                           AS name_trim,
            (p_type LIKE '%BRASS%')                AS is_brass,
            regexp_extract(p_type, '([A-Z]+)', 1)  AS first_word
        FROM part
    """,
)
def string_funcs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substr/length/concat/trim/LIKE/regexp_extract —
    the string surface an ETL wrapper's SQL jobs lean on (the reference
    itself uses trim + find + truncation, query_wrapper.sql:32-36,73-79)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 12).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.trim("p_name").alias("name_trim"),
        F.col("p_type").like("%BRASS%").alias("is_brass"),
        F.regexp_extract("p_type", r"([A-Z]+)", 1).alias("first_word"),
    )


@query(
    "string_truncate_rules",
    oracle="""
        SELECT
            doc_id,
            CASE WHEN length(lang) > 10
                 THEN substr(lang, 1, 7) || '...'
                 ELSE lang END AS lvl_trunc,
            CASE WHEN length(text) > 200
                 THEN substr(text, 1, 195) || '...'
                 ELSE text END AS msg_trunc
        FROM documents
    """,
)
def string_truncate_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference log-truncation rules as a relational transform:
    level >10 chars → first 7 + '...' (query_wrapper.sql:73-75),
    message over-limit → prefix + '...' (query_wrapper.sql:77-79;
    bound scaled 20000→200 for the fixture)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.when(
            F.length("lang") > 10, F.concat(F.substring("lang", 1, 7), F.lit("..."))
        )
        .otherwise(F.col("lang"))
        .alias("lvl_trunc"),
        F.when(
            F.length("text") > 200, F.concat(F.substring("text", 1, 195), F.lit("..."))
        )
        .otherwise(F.col("text"))
        .alias("msg_trunc"),
    )


@query(
    "date_funcs_orders",
    oracle="""
        SELECT
            o_orderkey,
            year(o_orderdate)                              AS order_year,
            month(o_orderdate)                             AS order_month,
            day(o_orderdate)                               AS order_day,
            CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
            date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
        FROM orders
    """,
)
def date_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract year/month/day, date_trunc, datediff. Spark datediff(end,
    start) == DuckDB date_diff('day', start, end) — argument order
    differs by dialect; pinned here so results agree."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_2002"
        ),
    )


@query(
    "date_to_timestamp",
    oracle="""
        SELECT
            o_orderkey,
            strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                     '%Y-%m-%d %H:%M:%S') AS ts_roundtrip
        FROM orders
    """,
)
def date_to_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TO_TIMESTAMP(string, fmt) round-trip — the reference's log-time
    parse (query_wrapper.sql:98, Exasol 'YYYY-MM-DD HH24:MI:SS'); Spark
    uses JDK patterns ('yyyy-MM-dd HH:mm:ss'), DuckDB strptime '%Y…' —
    three dialects, one semantics."""
    o = _t(spark, sf_dir, "orders")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return o.select(
        "o_orderkey",
        F.to_timestamp(F.date_format("o_orderdate", fmt), fmt).alias("ts_roundtrip"),
    )


@query(
    "math_funcs_lineitem",
    oracle="""
        SELECT
            l_orderkey,
            l_linenumber,
            CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE) AS discount_amount,
            ABS(l_quantity - 25.0)                 AS qty_dev,
            POWER(l_quantity, 2)                   AS qty_sq,
            ROUND(SQRT(l_extendedprice), 6)        AS price_sqrt,
            CAST(FLOOR(l_quantity) AS BIGINT)      AS qty_floor,
            CAST(CEIL(l_tax * 100) AS BIGINT)      AS tax_pct_ceil,
            l_linenumber % 5                       AS line_mod
        FROM lineitem
    """,
)
def math_funcs_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/pow/sqrt/floor/ceil/mod over lineitem measures."""
    l = _t(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice").cast("decimal(18,2)") * F.col("l_discount").cast("decimal(18,2)"))
        .cast("double")
        .alias("discount_amount"),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_tax") * 100).alias("tax_pct_ceil"),
        (F.col("l_linenumber") % 5).alias("line_mod"),
    )


@query(
    "case_when_segments",
    oracle="""
        SELECT
            CASE WHEN c_acctbal < 0    THEN 'negative'
                 WHEN c_acctbal < 5000 THEN 'mid'
                 ELSE 'high' END AS balance_band,
            COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_label,
            count(*) AS n
        FROM customer
        GROUP BY 1, 2
    """,
)
def case_when_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / COALESCE / NULLIF banding + group count."""
    c = _t(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("balance_band")
    )
    label = F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")).alias(
        "segment_label"
    )
    return c.groupBy(band, label).agg(F.count(F.lit(1)).alias("n"))


@query(
    "json_extract_props",
    oracle="""
        SELECT
            event_id,
            CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
        FROM events
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the events.props JSON-string column.
    At scale this stays columnar: get_json_object is codegen'd, no UDF."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
    )


@query(
    "array_explode_tokens",
    oracle="""
        SELECT token, count(*) AS n
        FROM (
            SELECT unnest(string_split(text, ' ')) AS token
            FROM documents
        )
        GROUP BY token
    """,
)
def array_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split → explode → count: the array/lateral surface, and the seed
    of the text-analysis token pipeline (C9b shares this shape)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "array_funcs_embeddings",
    oracle="""
        SELECT
            vec_id,
            len(embedding)                 AS dim,
            ROUND(list_aggregate(list_transform(embedding, x -> x * x), 'sum'), 4)
                                           AS norm_sq
        FROM embeddings
    """,
)
def array_funcs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform + aggregate) over the
    embedding vectors: squared L2 norm, computed JVM-side — the same
    primitive the cosine top-k operator builds on (no UDF)."""
    e = _t(spark, sf_dir, "embeddings")
    norm_sq = F.aggregate(
        F.transform("embedding", lambda x: x * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(norm_sq, 4).alias("norm_sq"),
    )
