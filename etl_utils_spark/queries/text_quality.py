"""Training-data text-quality queries: corpus bigram statistics,
Gopher-style repetition filtering, and PII-shaped redaction — the
document-curation layer on top of the token/language/quality surface
in ``queries/llm.py``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_utils_spark.operators import text
from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "ngram_top_bigrams",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z]+'),
                               x -> x <> '') AS toks
            FROM documents
        ),
        idx AS (
            SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - 1)) AS i
            FROM t
        ),
        b AS (SELECT toks[i] || ' ' || toks[i + 1] AS bigram FROM idx)
        SELECT bigram, count(*)::BIGINT AS cnt
        FROM b GROUP BY bigram
        ORDER BY cnt DESC, bigram
        LIMIT 20
    """,
)
def ngram_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus bigrams with a total-order tie-break — adjacent
    pairs built array-side (slice+zip_with, no per-doc window), one
    hash aggregate, TakeOrderedAndProject for the top-k."""
    d = _t(spark, sf_dir, "documents")
    return (
        text.bigram_counts(d)
        .orderBy(F.desc("cnt"), "bigram")
        .limit(20)
    )


@query(
    "quality_repetition_ratio",
    oracle="""
        WITH tok AS (
            SELECT doc_id,
                   unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                      x -> x <> '')) AS tok
            FROM documents
        ),
        cnt AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok)
        SELECT doc_id,
               SUM(c)::BIGINT AS n_tokens,
               ROUND(MAX(c)::DOUBLE / SUM(c), 6) AS top_token_ratio,
               (MAX(c)::DOUBLE / SUM(c)) < 0.2 AS keep
        FROM cnt GROUP BY doc_id
    """,
)
def quality_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: most-frequent-token share per
    document + keep flag (two map-combined hash aggregates)."""
    return text.repetition_ratio(_t(spark, sf_dir, "documents"))


@query(
    "text_redact_numbers",
    oracle="""
        SELECT doc_id,
               regexp_replace(text, '[0-9]+', '<NUM>', 'g') AS redacted,
               len(regexp_extract_all(text, '[0-9]+'))::INT AS n_redactions
        FROM documents
    """,
)
def text_redact_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-scrub shape: digit runs replaced by a placeholder plus a
    redaction count — pure regexp codegen, the template for
    email/phone scrubbing at corpus scale."""
    return text.redact_numbers(_t(spark, sf_dir, "documents"))
