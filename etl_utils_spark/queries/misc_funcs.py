"""Remaining scalar/nested-type surface: pad/case/split_part string
functions, from_json struct parsing, NA handling, and the engine's
self-measuring LSH recall diagnostic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_utils_spark.queries.registry import query
from etl_utils_spark.queries.shared import jaccard_pair_graph
from etl_utils_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "string_pad_case_split",
    oracle="""
        SELECT n_nationkey,
               lpad(n_name, 12, '.')          AS name_lpad,
               rpad(n_name, 12, '.')          AS name_rpad,
               split_part(n_name, 'A', 1)     AS first_piece,
               reverse(n_name)                AS name_rev,
               replace(n_name, 'A', '@')      AS name_repl,
               repeat('-', n_nationkey % 4)   AS dashes
        FROM nation
    """,
)
def string_pad_case_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lpad/rpad/split_part/reverse/replace/repeat — the remaining
    C6a string functions."""
    n = _t(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.lpad("n_name", 12, ".").alias("name_lpad"),
        F.rpad("n_name", 12, ".").alias("name_rpad"),
        F.split_part("n_name", F.lit("A"), F.lit(1)).alias("first_piece"),
        F.reverse("n_name").alias("name_rev"),
        F.replace("n_name", F.lit("A"), F.lit("@")).alias("name_repl"),
        F.repeat(F.lit("-"), (F.col("n_nationkey") % 4)).alias("dashes"),
    )


@query(
    "json_struct_parse",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
               (CAST(json_extract_string(props, '$.k') AS BIGINT) > 50) AS k_high
        FROM events
    """,
)
def json_struct_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6e via the TYPED path: from_json into a StructType and field
    access — the schema-enforced alternative to get_json_object."""
    e = _t(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = F.from_json("props", schema)
    return e.select(
        "event_id",
        parsed["k"].alias("k_typed"),
        (parsed["k"] > 50).alias("k_high"),
    )


@query(
    "null_handling_join_fill",
    oracle="""
        SELECT c_custkey,
               COALESCE(o_orderkey, -1)     AS order_or_default,
               COALESCE(o_totalprice, 0.0)  AS price_filled,
               (o_orderkey IS NULL)         AS never_ordered
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    """,
)
def null_handling_join_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NA handling over outer-join nulls: na.fill + null predicates
    (DataFrameNaFunctions surface)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey",
        F.col("o_orderkey").alias("order_or_default"),
        F.col("o_totalprice").alias("price_filled"),
        F.col("o_orderkey").isNull().alias("never_ordered"),
    )
    return j.na.fill({"order_or_default": -1, "price_filled": 0.0})


@query("diag_lsh_recall", oracle=None)
def diag_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-measurement: MinHash-LSH recall against the exact Jaccard
    join on the same corpus/threshold — the metric that tunes
    (num_hashes, bands) at scale (rows-only: diagnostic)."""
    from etl_utils_spark.operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    exact = jaccard_pair_graph(spark, sf_dir).select("id_a", "id_b")
    lsh = minhash_lsh_pairs(docs, n=3, num_hashes=32, bands=8, threshold=0.1).select(
        "id_a", "id_b"
    )
    n_exact = exact.count()
    n_hit = exact.join(lsh, ["id_a", "id_b"], "left_semi").count()
    return spark.createDataFrame(
        [("minhash32_band8", n_exact, n_hit, (n_hit / n_exact) if n_exact else 1.0)],
        "variant string, n_exact long, n_found long, recall double",
    )


@query(
    "gate_minhash_recall_floor",
    oracle="SELECT 'minhash32_band8' AS variant, CAST(true AS BOOLEAN) AS recall_ge_080",
)
def gate_minhash_recall_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked quality gate for MinHash-LSH dedup: recall vs the
    exact n-gram Jaccard join must be ≥ 0.80.  Deterministic (seeded
    hash family), so the boolean is a stable oracle at every SF."""
    from etl_utils_spark.operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    exact = jaccard_pair_graph(spark, sf_dir).select("id_a", "id_b")
    lsh = minhash_lsh_pairs(docs, n=3, num_hashes=32, bands=8, threshold=0.1).select(
        "id_a", "id_b"
    )
    n_exact = exact.count()
    n_hit = exact.join(lsh, ["id_a", "id_b"], "left_semi").count()
    recall = (n_hit / n_exact) if n_exact else 1.0
    return spark.createDataFrame(
        [("minhash32_band8", recall >= 0.80)], "variant string, recall_ge_080 boolean"
    )
