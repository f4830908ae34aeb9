"""Corpus statistics v3 (round 4): Zipf-law fit and Heaps-law
vocabulary growth — the two classical sanity curves a corpus-curation
pipeline plots before/after dedup (a post-dedup corpus should keep the
Zipf slope but flatten Heaps growth).

Scale posture: both queries reduce the token stream with hash
aggregates before anything ordered happens; the only ordered windows
run over BOUNDED frames (top-100 ranks, 100 doc-id buckets), never
over the raw token stream — the standard "aggregate first, then rank
the tiny result" discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_utils_spark.operators import exact_moments
from etl_utils_spark.queries.registry import query

_zipf_moments = exact_moments.moments_sql("qx", "qy")
_zipf_slope = exact_moments.slope_sql()
_zipf_r2 = exact_moments.r2_sql()
from etl_utils_spark.sources.tables import load_table as _t


@query(
    "zipf_slope_vocab",
    oracle="""
        WITH tf AS (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ),
        freq AS (
            SELECT token, CAST(count(*) AS BIGINT) AS n
            FROM tf WHERE token <> '' GROUP BY token
        ),
        top AS (
            SELECT token, n,
                   row_number() OVER (ORDER BY n DESC, token) AS rnk
            FROM freq
            ORDER BY n DESC, token LIMIT 100
        ),
        q AS (
            SELECT CAST(floor(ln(CAST(rnk AS DOUBLE)) * 1048576.0 + 0.5)
                        AS BIGINT) AS qx,
                   CAST(floor(ln(CAST(n AS DOUBLE)) * 1048576.0 + 0.5)
                        AS BIGINT) AS qy
            FROM top
        ),
        m AS (SELECT {MOMENTS} FROM q)
        SELECT n AS n_terms,
               {SLOPE} AS zipf_slope,
               {R2} AS fit_r2
        FROM m
    """.replace("{MOMENTS}", _zipf_moments).replace(
        "{SLOPE}", _zipf_slope).replace("{R2}", _zipf_r2),
)
def zipf_slope_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the top-100 token frequencies: OLS slope of
    ln(freq) on ln(rank) via the engine-native regr_slope/regr_r2
    aggregates (a healthy natural-language corpus fits slope ~ -1).
    One token-count aggregate, a top-100 rank (deterministic
    frequency-then-token order), and a 100-row regression — the raw
    token stream is never sorted."""
    d = _t(spark, sf_dir, "documents")
    tf = d.select(F.explode(F.split("text", " ")).alias("token")).filter(
        F.col("token") != ""
    )
    freq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    top = (
        freq.orderBy(F.desc("n"), "token")
        .limit(100)
        .select(
            "token",
            "n",
            F.row_number().over(Window.orderBy(F.desc("n"), "token")).alias("rnk"),
        )
    )
    # ln values quantized at 2^-20 to exact BIGINTs (slope/r2 are
    # scale-invariant, so the shared grid cancels), then the OLS fit is
    # one shared IEEE expression over exact integer moments — builtin
    # regr_* accumulates doubles engine-specifically and a ROUND on
    # top flips digits (the r5 rolling-corr red class).  Outputs are
    # emitted unrounded (rationals of exact integers).
    q = top.select(
        F.floor(F.log(F.col("rnk").cast("double")) * 1048576.0 + 0.5)
        .cast("long")
        .alias("qx"),
        F.floor(F.log(F.col("n").cast("double")) * 1048576.0 + 0.5)
        .cast("long")
        .alias("qy"),
    )
    m = exact_moments.moments_agg(q, F.col("qx"), F.col("qy"))
    return m.select(
        F.col("n").alias("n_terms"),
        exact_moments.slope_col().alias("zipf_slope"),
        exact_moments.r2_col().alias("fit_r2"),
    )


@query(
    "heaps_vocab_growth",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents
        ),
        clean AS (SELECT doc_id, token FROM toks WHERE token <> ''),
        width AS (
            SELECT max(doc_id) // 100 + 1 AS w FROM documents
        ),
        tok_b AS (
            SELECT doc_id // (SELECT w FROM width) AS bucket,
                   CAST(count(*) AS BIGINT) AS n_tokens
            FROM clean GROUP BY 1
        ),
        first_occ AS (
            SELECT token, min(doc_id) AS fd FROM clean GROUP BY token
        ),
        new_b AS (
            SELECT fd // (SELECT w FROM width) AS bucket,
                   CAST(count(*) AS BIGINT) AS new_types
            FROM first_occ GROUP BY 1
        )
        SELECT t.bucket AS bucket,
               t.n_tokens,
               COALESCE(n.new_types, 0) AS new_types,
               CAST(sum(t.n_tokens) OVER (ORDER BY t.bucket) AS BIGINT)
                   AS cum_tokens,
               CAST(sum(COALESCE(n.new_types, 0)) OVER (ORDER BY t.bucket)
                   AS BIGINT) AS cum_vocab
        FROM tok_b t LEFT JOIN new_b n ON t.bucket = n.bucket
    """,
)
def heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth curve: cumulative distinct types vs
    cumulative tokens in doc-id order, bucketed into ~100 doc-id ranges
    so the cumulative window runs over 100 rows, not the corpus (a
    global prefix-sum over raw docs would serialize into one task at
    scale).  'First occurrence' is a min(doc_id) hash aggregate per
    token — no ordered scan of the token stream."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    width = d.agg(
        (F.floor(F.max("doc_id") / 100) + 1).alias("w")
    )
    tok_b = (
        toks.crossJoin(F.broadcast(width))
        .groupBy(F.floor(F.col("doc_id") / F.col("w")).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_tokens"))
    )
    first_occ = toks.groupBy("token").agg(F.min("doc_id").alias("fd"))
    new_b = (
        first_occ.crossJoin(F.broadcast(width))
        .groupBy(F.floor(F.col("fd") / F.col("w")).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    joined = tok_b.join(new_b, "bucket", "left").select(
        "bucket",
        "n_tokens",
        F.coalesce("new_types", F.lit(0)).alias("new_types"),
    )
    w_cum = Window.orderBy("bucket")
    return joined.select(
        "bucket",
        "n_tokens",
        "new_types",
        F.sum("n_tokens").over(w_cum).cast("long").alias("cum_tokens"),
        F.sum("new_types").over(w_cum).cast("long").alias("cum_vocab"),
    )
