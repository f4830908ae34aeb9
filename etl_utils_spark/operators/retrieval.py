"""Corpus retrieval primitives: BM25 ranking and a bounded inverted
index — the search-side companions to the dedup/quality curation
operators (reference parity: the LLM-corpus tooling tier of
SURVEY.md §2; no single reference file — public Okapi BM25
formulation, Robertson & Walker 1994).

Scale notes (100 TB):
- BM25 is two hash aggregates (per (doc, term) tf, per-term df) plus a
  broadcast of the per-term idf table — the corpus-sized side never
  shuffles more than once, and the query-term filter prunes the
  exploded token stream before the first aggregate.
- The inverted index bounds per-token posting lists with a window
  row_number BEFORE any collect_list, so executor state per token is
  O(cap), not O(corpus).  Unbounded postings via collect_list would
  OOM on stopword-grade tokens at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_utils_spark.operators.text import _alpha_tokens


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 score of every document against a fixed term set.

    idf uses the +1 ("BM25+"-style) form ``ln(1 + (N - df + 0.5) /
    (df + 0.5))`` so scores stay positive.  Returns (id, bm25): each
    per-term contribution is a deterministic shared-IEEE double,
    2^-30-quantized before the per-doc sum (an unordered hash
    aggregate over raw doubles would be summation-order-dependent),
    so the emitted score SUM(q)/2^30 is an exact dyadic — bit-stable
    across engines with no rounding, and safe to use as a rank key.
    """
    toks = df.select(F.col(id_col), _alpha_tokens(text_col).alias("toks"))
    dl = toks.select(id_col, F.size("toks").alias("dl"))
    # One-row corpus stats frame, broadcast into the scoring join.
    # avgdl as an explicit exact-int division (engine-builtin avg over
    # ints may accumulate differently).
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
    )
    term_tok = toks.select(
        F.col(id_col), F.explode("toks").alias("tok")
    ).filter(F.col("tok").isin(*terms))
    tf = term_tok.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
    q = F.floor(contrib * 1073741824.0 + 0.5).cast("long")
    return (
        scored.withColumn("q", q)
        .groupBy(id_col)
        .agg((F.sum("q").cast("double") / 1073741824.0).alias("bm25"))
    )


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 50,
    postings_cap: int = 8,
) -> DataFrame:
    """Token → (document frequency, first-``postings_cap`` posting ids
    as a csv string).  Posting lists are truncated with a window
    row_number BEFORE aggregation, so per-token state is bounded at
    any corpus size; df is counted over the full distinct pair set.

    r12 (guide §2.4): ONE token-partitioned window computes the
    truncation rank AND df (count over the full partition — equal
    row-for-row to the former separate groupBy count), the min_df
    filter runs before the postings aggregate, and that aggregate
    reuses the window's partitioning — the old shape re-derived the
    distinct pair set twice (dfreq + window branches) and shuffle-
    joined the two frames back together."""
    pairs = (
        df.select(F.col(id_col), F.explode(_alpha_tokens(text_col)).alias("token"))
        .distinct()
    )
    w = Window.partitionBy("token").orderBy(F.col(id_col).asc())
    w_full = Window.partitionBy("token").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    kept = (
        pairs.withColumn("rn", F.row_number().over(w))
        .withColumn("df", F.count(F.lit(1)).over(w_full))
        .filter((F.col("rn") <= postings_cap) & (F.col("df") >= min_df))
    )
    return kept.groupBy("token").agg(
        F.first("df").alias("df"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.col(id_col))),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings_csv"),
    ).select("token", "df", "postings_csv")
