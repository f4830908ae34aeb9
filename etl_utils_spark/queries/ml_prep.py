"""Training-data-prep queries: deterministic splits, vocab, packing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_utils_spark.operators import ml_prep
from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "split_train_test_docs",
    oracle="""
        SELECT doc_id, lang,
               CASE WHEN
                   (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10) >= 8
               THEN 'test' ELSE 'train' END AS split
        FROM documents
    """,
)
def split_train_test_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/20 hash split on doc_id — engine-portable md5
    bucketing, stable under data growth (operators/ml_prep.py)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return ml_prep.train_test_split(d, "doc_id", test_buckets=2, n_buckets=10)


@query("split_leakage_safe_docs", oracle=None)
def split_leakage_safe_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe split: near-dup clusters (trigram Jaccard →
    connected components) travel together — no train/test
    contamination (rows-only: iterative CC; invariants tested)."""
    from etl_utils_spark.operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    pairs = ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), n=3, threshold=0.1)
    return ml_prep.leakage_safe_split(docs, pairs)


@query(
    "vocab_top_tokens",
    oracle="""
        WITH counts AS (
            SELECT token, count(*) AS n FROM (
                SELECT unnest(string_split(text, ' ')) AS token FROM documents
            ) WHERE token != ''
            GROUP BY token
        )
        SELECT token, n,
               row_number() OVER (ORDER BY n DESC, token) - 1 AS token_id
        FROM counts
        QUALIFY token_id < 50
    """,
)
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary (top-50, deterministic tie-break) —
    the tokenizer-training precursor."""
    return ml_prep.build_vocab(_t(spark, sf_dir, "documents"), top_k=50)


@query(
    "pack_sequences_docs",
    oracle="""
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS n_tokens,
               CAST(FLOOR(
                   (SUM(len(string_split(text, ' '))) OVER (
                        PARTITION BY lang ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    ) - len(string_split(text, ' '))) / 2048.0
               ) AS BIGINT) AS bin_id
        FROM documents
    """,
)
def pack_sequences_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing into 2048-token shards, per language —
    deterministic contiguous packing (operators/ml_prep.py)."""
    return ml_prep.pack_sequences(
        _t(spark, sf_dir, "documents"), budget=2048, part_col="lang"
    )
