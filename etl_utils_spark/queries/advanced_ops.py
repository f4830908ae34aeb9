"""Advanced-operator queries: dedup clustering (connected components),
Python UDTF, custom stateful streaming."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_utils_spark.operators.clustering import dedup_clusters
from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table


@query("dedup_cluster_documents", oracle=None)
def dedup_cluster_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup PAIRS → dedup CLUSTERS via iterative min-label
    connected components (operators/clustering.py); output one row per
    cluster with the kept representative (rows-only: iterative
    fixpoint; invariants in tests/test_clustering.py)."""
    from etl_utils_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.1)
    return dedup_clusters(pairs)


@query("udtf_tokenize_docs", oracle=None)
def udtf_tokenize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7c Python UDTF in LATERAL position: per-doc (pos, token) rows
    for the shortest documents (rows-only: Python-side generator; the
    built-in split/explode pipeline is the JVM fast path)."""
    from etl_utils_spark.operators.py_udtf import register_udtfs

    register_udtfs(spark)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") < 150)
    docs.createOrReplaceTempView("udtf_docs_v")
    return spark.sql(
        """
        SELECT doc_id, t.pos, t.token
        FROM udtf_docs_v, LATERAL tokenize_udtf(text) t
        """
    )


_INTERVAL_JOIN_ORACLE = """
    SELECT p.event_id  AS event_id,
           p.user_id   AS user_id,
           p.ts        AS ts,
           c.event_id  AS r_event_id,
           c.ts        AS r_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND epoch_us(c.ts) <= epoch_us(p.ts)
     AND epoch_us(c.ts) > epoch_us(p.ts) - 600000000
"""


@query("stream_interval_join_live", oracle=_INTERVAL_JOIN_ORACLE)
def stream_interval_join_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM inner join (purchases ↔ same-user clicks within
    the prior 10 minutes) with watermarks bounding both sides' state —
    executed as a real stream; the single-batch result hash-matches
    the batch join oracle (streaming/joins.py)."""
    from etl_utils_spark.streaming import windows as W
    from etl_utils_spark.streaming.joins import interval_join

    s = W.read_events_stream(spark, sf_dir)
    purchases = s.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = s.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    joined = interval_join(purchases, clicks, on="user_id", lookback="10 minutes")
    return W.run_stream_to_batch(spark, joined, output_mode="append")


@query(
    "stream_stateful_user_counts",
    oracle="""
        SELECT user_id, count(*) AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM events
        GROUP BY user_id
    """,
)
def stream_stateful_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10 custom stateful operator executed as a REAL stream
    (applyInPandasWithState over readStream, AvailableNow): the final
    state hash-matches the plain batch aggregate oracle."""
    from etl_utils_spark.streaming import windows as W
    from etl_utils_spark.streaming.stateful import running_user_counts

    s = W.read_events_stream(spark, sf_dir)
    return W.run_stream_to_batch(spark, running_user_counts(s), output_mode="update")
