"""Corpus retrieval primitives: BM25 ranking and a bounded inverted
index — the search-side companions to the dedup/quality curation
operators (reference parity: the LLM-corpus tooling tier of
SURVEY.md §2; no single reference file — public Okapi BM25
formulation, Robertson & Walker 1994).

Scale notes (100 TB):
- BM25 runs ONE tokenize pass: per-term tf and dl are row-local array
  reductions materialized into a narrow per-doc frame (id, dl, k tf
  ints — the term set is a bounded query, so the frame is fixed-width),
  and corpus stats + per-term df collapse into a single 1-row aggregate
  broadcast back.  Zero corpus-keyed shuffles; the only exchanges are
  1-row aggregates.
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
    per_doc = bm25_per_doc(df, terms, id_col=id_col, text_col=text_col)
    scored = per_doc.crossJoin(F.broadcast(bm25_consts(per_doc, terms)))
    total_q = bm25_quantized_sum(terms, k1=k1, b=b)
    return scored.filter(any_term_present(terms)).select(
        F.col(id_col),
        (total_q.cast("double") / 1073741824.0).alias("bm25"),
    )


def bm25_per_doc(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ONE tokenize pass → narrow per-doc frame (id, dl, tf_0..tf_k).

    Per-term tf is a row-local array reduction (``size(filter(toks,
    t = term))`` — identical counts to the explode + GROUP BY (doc,
    term) formulation), so no corpus-keyed exchange ever exists.  The
    token array is projected in its OWN select before the tf columns
    reference it (the r12 shingle lesson: inlined, the split() would be
    substituted into every tf filter and re-tokenize per term).  The
    frame is eagerly localCheckpointed: it feeds both the 1-row consts
    aggregate and the scoring projection, and one scan + a fixed-width
    int frame beats re-tokenizing the corpus per consumer."""
    toks = df.select(F.col(id_col), _alpha_tokens(text_col).alias("toks"))

    def _eq(w: str):
        # factory, not a default-arg lambda: F.filter inspects the
        # callable's arity, and a (t, w=w) signature would be taken for
        # the 2-arg (element, index) form.
        return lambda t: t == F.lit(w)

    tf_cols = [
        F.size(F.filter(F.col("toks"), _eq(w))).cast("long").alias(f"tf_{i}")
        for i, w in enumerate(terms)
    ]
    return toks.select(
        F.col(id_col), F.size("toks").cast("long").alias("dl"), *tf_cols
    ).localCheckpoint(eager=True)


def bm25_consts(per_doc: DataFrame, terms: list[str]) -> DataFrame:
    """1-row corpus-constants frame: n_docs, avgdl, per-term df — ONE
    aggregate over the per-doc frame.  avgdl stays the explicit
    exact-int division (engine-builtin avg over ints may accumulate
    differently); df_i counts docs containing term i, exactly the row
    count of the old per-(doc, term) tf GROUP BY."""
    return per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )


def bm25_q_col(i: int, k1: float = 1.2, b: float = 0.75) -> F.Column:
    """Term i's 2^-30-quantized BM25 contribution over the per-doc ×
    consts frame — the SAME IEEE expression as the old per-(doc, term)
    row (idf from df_i, tf and dl as longs), floor-quantized to a
    BIGINT.  Meaningful only where tf_i > 0 (the old formulation had no
    row there at all)."""
    tf = F.col(f"tf_{i}")
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col(f"df_{i}") + 0.5)
        / (F.col(f"df_{i}") + 0.5)
    )
    denom = tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * (tf * (k1 + 1.0)) / denom
    return F.floor(contrib * 1073741824.0 + 0.5).cast("long")


def bm25_quantized_sum(
    terms: list[str], k1: float = 1.2, b: float = 0.75
) -> F.Column:
    """Row-local Σ of per-term quantized contributions (terms with
    tf = 0 contribute exactly 0, mirroring their absence from the old
    per-(doc, term) frame).  An integer sum over a fixed term order
    equals the old hash aggregate's unordered integer sum
    bit-for-bit."""
    total = F.lit(0).cast("long")
    for i in range(len(terms)):
        q = F.when(
            F.col(f"tf_{i}") > 0, bm25_q_col(i, k1=k1, b=b)
        ).otherwise(F.lit(0).cast("long"))
        total = total + q
    return total


def any_term_present(terms: list[str]) -> F.Column:
    """True where the doc contains at least one query term — the docs
    the old per-(doc, term) GROUP BY emitted."""
    cond = F.lit(False)
    for i in range(len(terms)):
        cond = cond | (F.col(f"tf_{i}") > 0)
    return cond


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
