"""Retrieval-pruning & data-selection pack (round 6):

- ``bm25_topk_maxscore`` — MaxScore/WAND-style upper-bound pruned
  BM25 top-k (Turtle & Flood 1995; Broder et al., CIKM 2003): score
  upper bounds prune the candidate set BEFORE exact scoring, and the
  oracle brute-forces the exact top-k — the hash match is a machine-
  checked recall-1 certificate for the pruned plan.  At 100 TB this
  is the difference between exact-scoring every posting and scoring
  the small upper-bound-surviving slice.
- ``dsir_importance_resample`` — DSIR-style data selection (Xie et
  al., 2023): hashed-unigram importance weights ln(p_target/p_raw)
  over a fixed bucket space, then a deterministic top-K selection of
  raw documents that look most like the target domain.  The bucket
  log-ratios are quantized to exact integers ONCE (256 buckets), so
  every per-document weight is EXACT integer arithmetic — no float
  summation anywhere in the corpus-sized path.

Scale shapes: both queries reduce the corpus with one token-count
hash aggregate; all scoring arithmetic runs on bounded frames (terms,
256 buckets) broadcast back; final cuts are TakeOrdered heaps.
Reference parity: delegated-SQL tier (query_wrapper.sql:255) —
capability-surface queries per SURVEY.md §2 LLM-pipeline tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table

_TOKS_SQL = "list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')"
_Q30 = "1073741824.0"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ------------------------------------------------- MaxScore-pruned BM25

_MS_TERMS = ("hash", "join", "vector", "stream")
_MS_K = 20

_MS_ORACLE = f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    dl AS (SELECT doc_id, len(toks) AS dl FROM t),
    stats AS (SELECT count(*) AS n_docs,
                     CAST(SUM(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                         AS avgdl FROM dl),
    tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    tf AS (
        SELECT doc_id, tok, count(*) AS tf FROM tok
        WHERE tok IN ({", ".join(f"'{w}'" for w in _MS_TERMS)})
        GROUP BY doc_id, tok
    ),
    dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    contrib AS (
        SELECT tf.doc_id,
               CAST(floor(
                   ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                   * (tf.tf * 2.2)
                   / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
                   * {_Q30} + 0.5) AS BIGINT) AS q
        FROM tf JOIN dfreq d USING (tok) JOIN dl USING (doc_id), stats s
    )
    SELECT doc_id, CAST(SUM(q) AS DOUBLE) / {_Q30} AS bm25
    FROM contrib GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT {_MS_K}
"""


@query("bm25_topk_maxscore", oracle=_MS_ORACLE)
def bm25_topk_maxscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MaxScore-style upper-bound pruned exact BM25 top-k.

    Plan: (1) per-(doc, term) quantized contributions q (exact BIGINT
    — same shared-IEEE scoring expression as the oracle); (2) per-term
    upper bound ub_t = max(q) (a |terms|-row broadcast frame); (3) per-
    doc upper bound S_ub = Σ ub_t over the terms the doc CONTAINS —
    membership only, no scoring math; (4) θ = the k-th best EXACT
    score among the top-k docs by S_ub (a k-row candidate probe; the
    k-th best of any k-subset lower-bounds the true k-th best);
    (5) exact-score only docs with S_ub ≥ θ, TakeOrdered top-k.

    Soundness (the oracle hash-certifies it): every true top-k doc has
    exact ≥ s_k ≥ θ and S_ub ≥ exact, so none is pruned; a pruned doc
    has exact ≤ S_ub < θ ≤ s_k, so it cannot even tie the cut.  The
    oracle brute-force scores EVERY matching doc — equality is a
    recall-1 certificate for the pruned plan, not a spot check.  All
    scores are exact dyadics (SUM of quantized BIGINT / 2^30).

    r12 shape: ONE tokenize pass builds the checkpointed narrow per-doc
    frame (id, dl, per-term tf — operators/retrieval.bm25_per_doc);
    corpus stats + df, the per-term upper bounds, S_ub, the exact
    scores and θ are all row-local arithmetic over that frame plus
    1-row broadcast aggregates.  The old shape re-tokenized the corpus
    per branch and shuffled a per-(doc, term) frame; no corpus-keyed
    exchange remains."""
    from etl_utils_spark.operators import retrieval

    terms = list(_MS_TERMS)
    d = _t(spark, sf_dir, "documents")
    per_doc = retrieval.bm25_per_doc(d, terms)
    scored = per_doc.crossJoin(
        F.broadcast(retrieval.bm25_consts(per_doc, terms))
    )
    # per-term upper bounds ub_t = max q over docs containing t — one
    # more 1-row aggregate over the checkpointed frame (the old
    # |terms|-row tok-keyed frame, as columns).
    ub = scored.agg(
        *[
            F.max(
                F.when(F.col(f"tf_{i}") > 0, retrieval.bm25_q_col(i))
            ).alias(f"ub_{i}")
            for i in range(len(terms))
        ]
    )
    s_ub = F.lit(0).cast("long")
    for i in range(len(terms)):
        s_ub = s_ub + F.when(
            F.col(f"tf_{i}") > 0, F.col(f"ub_{i}")
        ).otherwise(F.lit(0).cast("long"))
    enriched = (
        scored.filter(retrieval.any_term_present(terms))
        .crossJoin(F.broadcast(ub))
        .select(
            "doc_id",
            s_ub.alias("s_ub"),
            retrieval.bm25_quantized_sum(terms).alias("qs"),
        )
    )
    # candidate probe: exact scores of the top-k docs by upper bound;
    # θ = their k-th best exact score (min of the k) — one scalar.
    theta = (
        enriched.orderBy(F.desc("s_ub"), "doc_id")
        .limit(_MS_K)
        .agg(F.min("qs").alias("th"))
        .collect()[0]["th"]
    )
    exact = enriched.filter(F.col("s_ub") >= F.lit(theta)).select(
        "doc_id", (F.col("qs").cast("double") / 1073741824.0).alias("bm25")
    )
    return exact.orderBy(F.desc("bm25"), "doc_id").limit(_MS_K)


# ----------------------------------------------- DSIR importance resampling

_DSIR_B = 256  # hashed-unigram feature buckets
_DSIR_K = 50  # selected documents
_DSIR_LAM = 0.5  # Laplace smoothing per bucket

# Portable token→bucket hash: the first two md5 hex nibbles (0..255).
# conv() does not exist in DuckDB, so nibbles map through strpos/instr
# over the hex alphabet — identical on both engines.
_BKT_SQL = (
    "((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1))"
)

_DSIR_ORACLE = f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    b AS (SELECT doc_id, {_BKT_SQL} AS bkt FROM tok),
    raw AS (SELECT bkt, count(*) AS rc FROM b GROUP BY bkt),
    tgt AS (
        SELECT b.bkt, count(*) AS tc
        FROM b JOIN documents d USING (doc_id)
        WHERE d.lang = 'en'
        GROUP BY b.bkt
    ),
    tot AS (
        SELECT (SELECT SUM(rc) FROM raw) AS rn,
               (SELECT COALESCE(SUM(tc), 0) FROM tgt) AS tn
    ),
    lr AS (
        SELECT raw.bkt,
               CAST(floor(
                   ln(((COALESCE(tgt.tc, 0) + {_DSIR_LAM})
                       / (tot.tn + {_DSIR_LAM} * {_DSIR_B}))
                      / ((raw.rc + {_DSIR_LAM})
                         / (tot.rn + {_DSIR_LAM} * {_DSIR_B})))
                   * {_Q30} + 0.5) AS BIGINT) AS qlr
        FROM raw LEFT JOIN tgt ON raw.bkt = tgt.bkt, tot
    ),
    w AS (
        SELECT b.doc_id, SUM(lr.qlr) AS wq
        FROM b JOIN lr USING (bkt)
        GROUP BY b.doc_id
    )
    SELECT w.doc_id, d.lang,
           CAST(w.wq AS DOUBLE) / {_Q30} AS log_weight
    FROM w JOIN documents d USING (doc_id)
    ORDER BY w.wq DESC, w.doc_id
    LIMIT {_DSIR_K}
"""


@query("dsir_importance_resample", oracle=_DSIR_ORACLE)
def dsir_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style domain selection: rank raw-corpus documents by the
    hashed-unigram importance weight Σ_b c_b·ln(p_target(b)/p_raw(b))
    (target = the 'en' slice) and keep the deterministic top-K — the
    data-selection step that biases a pre-training mixture toward a
    target domain without training a classifier.

    100 TB shape (r12, guide §1.2/§2.4): the raw and target bucket
    counts come from ONE token pass (a conditional count on the lang
    column carried with each exploded token — the former shape derived
    the exploded frame twice and shuffle-joined the 'en' slice), each
    token hashes ONCE (`conv(substr(md5, 1, 2))`, same value as the
    oracle's two-nibble strpos form), the per-bucket log-ratios
    quantize to exact BIGINTs on a 256-row frame, so every
    per-document weight is an exact integer dot product (c_b · qlr_b)
    — no float summation in any corpus-sized path — the final cut is
    a TakeOrdered heap, and lang attaches to the 50 SURVIVORS
    (broadcast), not to the whole corpus.  The hash match against the
    SQL replica certifies the whole chain, hashing included
    (md5-nibble bucketing is engine-portable; conv() is not, so the
    ORACLE spells it with strpos)."""
    from etl_utils_spark.operators.text import _alpha_tokens

    d = _t(spark, sf_dir, "documents")
    b = d.select(
        "doc_id", "lang", F.explode(_alpha_tokens("text")).alias("tok")
    ).select(
        "doc_id",
        "lang",
        F.conv(F.substring(F.md5("tok"), 1, 2), 16, 10).cast("int").alias("bkt"),
    )
    bc = b.groupBy("bkt").agg(
        F.count(F.lit(1)).alias("rc"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("tc"),
    )
    tot = bc.agg(
        F.sum("rc").alias("rn"), F.coalesce(F.sum("tc"), F.lit(0)).alias("tn")
    )
    lam, bkts = _DSIR_LAM, _DSIR_B
    lr = bc.crossJoin(F.broadcast(tot)).select(
        "bkt",
        F.floor(
            F.log(
                ((F.col("tc") + lam) / (F.col("tn") + lam * bkts))
                / ((F.col("rc") + lam) / (F.col("rn") + lam * bkts))
            )
            * 1073741824.0
            + 0.5
        )
        .cast("long")
        .alias("qlr"),
    )
    w = (
        b.join(F.broadcast(lr), "bkt")
        .groupBy("doc_id")
        .agg(F.sum("qlr").alias("wq"))
    )
    top = w.orderBy(F.desc("wq"), "doc_id").limit(_DSIR_K)
    return (
        top.join(d.select("doc_id", "lang"), "doc_id")
        .orderBy(F.desc("wq"), "doc_id")
        .select(
            "doc_id",
            "lang",
            (F.col("wq").cast("double") / 1073741824.0).alias("log_weight"),
        )
    )
