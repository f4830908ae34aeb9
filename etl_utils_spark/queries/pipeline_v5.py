"""Training-pipeline pack v5: the data-augmentation / split / selection
/ mining / evaluation steps a pre-training corpus pipeline runs AFTER
curation (SURVEY.md §2 LLM tier; complements ml_prep + scale_ops):

- ``augment_span_corruption`` — T5-style span-corruption mask plan over
  every document, driven by the repo's oracle-replayable LCG
  (operators/prng.py): mask decisions are a pure function of
  (doc_id, token index), so Spark and DuckDB derive the IDENTICAL mask
  set with no RNG state and no shuffle (row-local array ops only).
- ``gate_span_corruption_rate`` — pins the realized corpus mask rate
  inside [10%, 20%] with INTEGER arithmetic (tok ≤ 10·masked ∧
  5·masked ≤ tok) — no float division to drift.
- ``split_kfold_by_source`` — leakage-safe 5-fold assignment at the
  SOURCE granularity (all docs of a source share a fold, so near-dup
  docs within a source can never straddle train/val) — fold is the
  LCG uniform of the source id, floored per docs/SCALE.md.
- ``curriculum_select_budget`` — quality-ordered token-budget
  selection: docs ranked by distinct-token count, selected until a
  token budget via the DISTRIBUTED prefix sum (operators/ids.py) — the
  single-reducer ``SUM() OVER (ORDER BY quality)`` the oracle runs is
  exactly the stage the implementation avoids at 100 TB.
- ``mine_hard_negatives`` — contrastive-training negative mining: for
  each anchor vector, the most-cosine-similar vector with a DIFFERENT
  label (broadcast anchors × one corpus scan, same bounded-BNL shape
  as topk_cosine_neighbors; at 100 TB the anchor set is the small side
  by construction).
- ``lm_heldout_nll`` — honest LM evaluation: bigram counts trained on
  folds 1-4 ONLY, per-doc Laplace-smoothed negative log-likelihood
  scored on held-out fold 0 (train/test separation inside one
  statement; unseen bigrams cost (0+1)/(nu+V)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_utils_spark.operators.prng import lcg_uniform, lcg_uniform_sql
from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------- span corruption

_SPAN_B = 1024  # key multiplier: > max tokens/doc, keeps states distinct
_SPAN_P = 0.05  # span-start probability per token
_SPAN_LEN = 3  # fixed span length → expected mask rate 1-(1-p)^3 ≈ 14.3%

# The identical mask-decision uniform on the DuckDB side, for token
# index expression `i_expr` of document `doc_id`.
def _u_sql(i_expr: str) -> str:
    return lcg_uniform_sql("doc_id", i_expr, _SPAN_B)


_SPAN_ORACLE = f"""
    WITH tk AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS toks
        FROM documents
    ),
    t AS (
        SELECT doc_id, len(toks) AS n FROM tk WHERE len(toks) > 0
    ),
    i AS (
        SELECT doc_id, n, unnest(generate_series(1, n)) AS i FROM t
    ),
    f AS (
        SELECT doc_id, n, i,
               CASE WHEN {_u_sql('i')} < {_SPAN_P} THEN 1 ELSE 0 END AS s,
               CASE WHEN {_u_sql('i')} < {_SPAN_P}
                      OR (i >= 2 AND {_u_sql('(i - 1)')} < {_SPAN_P})
                      OR (i >= 3 AND {_u_sql('(i - 2)')} < {_SPAN_P})
                    THEN 1 ELSE 0 END AS m
        FROM i
    )
    SELECT doc_id, n AS n_tok,
           CAST(SUM(s) AS BIGINT) AS n_spans,
           CAST(SUM(m) AS BIGINT) AS n_masked
    FROM f GROUP BY doc_id, n
"""


@query("augment_span_corruption", oracle=_SPAN_ORACLE)
def augment_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption mask plan: token i starts a mask span
    with probability p = 5% (span length 3, overlaps merge), decided by
    the portable LCG on (doc_id, i) — deterministic, oracle-replayable,
    and embarrassingly parallel (one row-local pass per doc, NO
    shuffle: the plan is scan → project).  Emits the span/mask counts
    per doc; the masked-token materialization is the same transform
    with a sentinel substitution.  All counts are exact integers."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda t: t != "")
    base = d.select("doc_id", toks.alias("toks")).where(F.size("toks") > 0)
    n = F.size("toks")
    idx = F.sequence(F.lit(1), n)
    doc = F.col("doc_id")

    def _start(i):  # is token i a span start?
        return lcg_uniform(doc, i, _SPAN_B) < F.lit(_SPAN_P)

    # r12 (guide §1.2.2): the starts array is PROJECTED once and the
    # mask derives from it by 0-based lookups — inline, _masked(i)
    # re-ran the LCG three more times per token (4 evaluations/token).
    starts = F.transform(idx, lambda i: _start(i).cast("int"))
    staged = base.select(
        "doc_id", n.cast("long").alias("n_tok"), starts.alias("starts")
    )
    s = F.col("starts")

    def _hit(i0):  # start flag at 0-based index, false out of bounds
        return F.coalesce(F.get(s, i0) == 1, F.lit(False))

    def _masked(i):  # covered by a span starting at i, i-1 or i-2?
        return _hit(i - 1) | _hit(i - 2) | _hit(i - 3)

    masked = F.transform(
        F.sequence(F.lit(1), F.size(s)), lambda i: _masked(i).cast("int")
    )
    sum_arr = lambda a: F.aggregate(a, F.lit(0), lambda acc, v: acc + v)  # noqa: E731
    return staged.select(
        "doc_id",
        "n_tok",
        sum_arr(s).cast("long").alias("n_spans"),
        sum_arr(masked).cast("long").alias("n_masked"),
    )


@query(
    "gate_span_corruption_rate",
    oracle="""
        SELECT 'span_corruption_p05_len3' AS variant,
               CAST(true AS BOOLEAN) AS rate_in_band
    """,
)
def gate_span_corruption_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate on the realized corpus mask rate: with p = 5% and
    span length 3 the expected masked fraction is 1-(0.95)³ ≈ 14.26%;
    the gate asserts the realized rate lies in [10%, 20%] using
    INTEGER comparisons only (tok ≤ 10·masked AND 5·masked ≤ tok) —
    a drifting PRNG, tokenizer, or span expansion flips the boolean."""
    frame = augment_span_corruption(spark, sf_dir)
    s = frame.agg(
        F.sum("n_tok").cast("long").alias("tok"),
        F.sum("n_masked").cast("long").alias("masked"),
    ).collect()[0]
    tok = s["tok"] or 0  # empty/untokenizable corpus → SUM is NULL
    masked = s["masked"] or 0
    ok = tok > 0 and (tok <= 10 * masked) and (5 * masked <= tok)
    return spark.createDataFrame(
        [("span_corruption_p05_len3", bool(ok))],
        "variant string, rate_in_band boolean",
    )


# ------------------------------------------------ leakage-safe k-fold

_KFOLD = 5
_KFOLD_U = lcg_uniform_sql("src_num", "0", 1)


@query(
    "split_kfold_by_source",
    oracle=f"""
        WITH s AS (
            SELECT doc_id, lang, n_chars,
                   COALESCE(TRY_CAST(regexp_extract(source, '([0-9]+)', 1)
                                     AS BIGINT), -1)
                       AS src_num
            FROM documents
        ),
        f AS (
            SELECT lang, n_chars,
                   CAST(FLOOR({_KFOLD_U} * {_KFOLD}) AS BIGINT) AS fold
            FROM s
        )
        SELECT fold, lang, count(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM f GROUP BY fold, lang
    """,
)
def split_kfold_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe 5-fold assignment at SOURCE granularity: the fold
    is a pure LCG function of the source id, so every document of a
    source lands in the same fold (near-duplicates and boilerplate
    shared within a source can never leak across train/val) and the
    assignment is stable under corpus growth — no shuffle beyond the
    final bounded (fold × lang) aggregate.  FLOOR before the int cast
    per docs/SCALE.md (double→int truncation differs across engines
    for negatives; floor is explicit).  A digitless source id maps to
    the sentinel -1 (one deterministic fold) on BOTH engines — Spark's
    cast yields NULL while DuckDB's plain CAST would raise, so the
    oracle uses COALESCE(TRY_CAST(...), -1) and Spark mirrors it."""
    d = _t(spark, sf_dir, "documents")
    src_num = F.coalesce(
        F.regexp_extract("source", r"([0-9]+)", 1).cast("long"), F.lit(-1)
    )
    fold = F.floor(
        lcg_uniform(src_num, F.lit(0), 1) * _KFOLD
    ).cast("long")
    return (
        d.select(fold.alias("fold"), "lang", "n_chars")
        .groupBy("fold", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


# ------------------------------------- curriculum token-budget select

_CURR_BUDGET = 30_000  # token budget for the selected slice
# Composite integer order key: quality DESC then doc_id ASC, encoded so
# ONE int64 column carries the total order (prefix_sum orders by a
# single numeric key).  Quality (distinct-token count) < 2000 on any
# real document chunk; doc_id < 10^10 → key < 2^53, exact.
_CURR_ORD = "(2000 - quality) * 10000000000 + doc_id"


@query(
    "curriculum_select_budget",
    oracle=f"""
        WITH q AS (
            SELECT doc_id,
                   len(list_distinct(
                       list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                   x -> x <> ''))) AS quality,
                   len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '')) AS n_tok
            FROM documents
        ),
        k AS (
            SELECT doc_id, quality, n_tok, {_CURR_ORD} AS ord
            FROM q WHERE n_tok > 0
        ),
        c AS (
            SELECT doc_id, quality, n_tok,
                   SUM(n_tok) OVER (ORDER BY ord
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_tok
            FROM k
        )
        SELECT doc_id, quality, n_tok, CAST(cum_tok AS BIGINT) AS cum_tok
        FROM c WHERE cum_tok <= {_CURR_BUDGET}
    """,
)
def curriculum_select_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum/budget selection: rank documents by quality
    (distinct-token count, doc_id tiebreak) and keep the top slice
    whose cumulative token count fits a 30k budget.  The running total
    uses the DISTRIBUTED prefix sum over the composite integer order
    key (operators/ids.py: boundary sampling → per-bucket totals →
    per-partition cumsum) — the oracle's global ``SUM() OVER (ORDER
    BY)`` is precisely the one-reducer sort this avoids at 100 TB."""
    from etl_utils_spark.operators.ids import prefix_sum

    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda t: t != "")
    q = d.select(
        "doc_id",
        F.size(F.array_distinct(toks)).cast("long").alias("quality"),
        F.size(toks).cast("long").alias("n_tok"),
    ).where(F.col("n_tok") > 0)
    k = q.select(
        "doc_id",
        "quality",
        "n_tok",
        ((2000 - F.col("quality")) * F.lit(10_000_000_000) + F.col("doc_id")).alias(
            "ord"
        ),
    ).localCheckpoint(eager=True)  # consumed by boundary probe + sum + output
    c = prefix_sum(k, order_col="ord", value_col="n_tok", out_col="cum_tok")
    return c.where(F.col("cum_tok") <= _CURR_BUDGET).select(
        "doc_id", "quality", "n_tok", F.col("cum_tok").cast("long").alias("cum_tok")
    )


# --------------------------------------------- hard-negative mining

@query(
    "mine_hard_negatives",
    oracle="""
        WITH a AS (
            SELECT vec_id AS query_id, label AS query_label,
                   embedding::DOUBLE[] AS qv
            FROM embeddings WHERE vec_id < 8
        ),
        c AS (
            SELECT vec_id AS neighbor_id, label AS neighbor_label,
                   embedding::DOUBLE[] AS cv
            FROM embeddings
        ),
        scored AS (
            SELECT query_id, query_label, neighbor_id, neighbor_label,
                   list_cosine_similarity(qv, cv) AS cos_sim
            FROM a, c
            WHERE query_label != neighbor_label
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY round(cos_sim, 9) DESC, neighbor_id
                   ) AS rank
            FROM scored
        )
        SELECT query_id, query_label, neighbor_id, neighbor_label, cos_sim
        FROM ranked WHERE rank = 1
    """,
)
def mine_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training hard-negative mining: for each anchor (the
    8 probe vectors) find the MOST cosine-similar vector carrying a
    DIFFERENT label — the negatives that actually move an embedding
    model.  Broadcast anchors × one corpus scan (the same bounded-BNL
    shape as topk_cosine_neighbors; anchor sets are small by
    construction), exact double cosine, rank stabilized by round-9 +
    id tiebreak.  At 100 TB this composes with the IVF/LSH candidate
    generation in operators/similarity.py — mine within probed cells
    instead of the full scan."""
    from etl_utils_spark.operators.dedup import cosine, dvec

    emb = _t(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        dvec("embedding").alias("qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        dvec("embedding").alias("cv"),
    )
    scored = (
        F.broadcast(a)
        .crossJoin(c)
        .filter(F.col("query_label") != F.col("neighbor_label"))
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cos_sim", 9)), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
        .drop("rank")
    )


# ------------------------------------------------ held-out LM eval

_LM_FOLD_U = lcg_uniform_sql("doc_id", "0", 1)


@query(
    "lm_heldout_nll",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   CAST(FLOOR({_LM_FOLD_U} * 5) AS BIGINT) AS fold,
                   list_filter(string_split_regex(lower(text), '[^a-z]+'),
                               x -> x <> '') AS toks
            FROM documents
        ),
        idx AS (
            SELECT doc_id, fold, toks,
                   unnest(generate_series(1, len(toks) - 1)) AS i
            FROM t
        ),
        db AS (
            SELECT doc_id, fold, toks[i] AS w1,
                   toks[i] || ' ' || toks[i + 1] AS bigram
            FROM idx
        ),
        B AS (SELECT bigram, count(*) AS nb FROM db WHERE fold != 0
              GROUP BY bigram),
        U AS (SELECT w1, count(*) AS nu FROM db WHERE fold != 0
              GROUP BY w1),
        V AS (SELECT count(DISTINCT w1) AS v FROM db WHERE fold != 0)
        SELECT h.doc_id,
               count(*) AS n_bigrams,
               CAST(SUM(CAST(floor(-ln((COALESCE(B.nb, 0) + 1.0)
                                        / (COALESCE(U.nu, 0) + V.v))
                                   * 1073741824.0 + 0.5) AS BIGINT))
                    AS DOUBLE)
                   / (CAST(count(*) AS DOUBLE) * 1073741824.0) AS nll
        FROM db h
        LEFT JOIN B USING (bigram)
        LEFT JOIN U USING (w1)
        CROSS JOIN V
        WHERE h.fold = 0
        GROUP BY h.doc_id
    """,
)
def lm_heldout_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Honest language-model evaluation with train/test separation in
    ONE statement: bigram and unigram count tables are built from
    folds 1-4 only (fold = LCG of doc_id — same leakage-free scheme as
    split_kfold_by_source, at doc granularity so the held-out set is a
    uniform sample), then fold-0 documents are scored with the
    Laplace-smoothed per-bigram NLL −ln((nb+1)/(nu+V)).  Unseen
    held-out bigrams hit the (0+1)/(0+V) floor instead of −ln(0).
    Vocabulary size V is a bounded scalar (distinct train unigrams),
    read driver-side like the repo's other 1-row anchors.  Each term's
    NLL is 2^-30-quantized so the per-doc mean is exact-integer
    arithmetic plus one shared division (same discipline as
    lm_bigram_doc_score)."""
    from etl_utils_spark.operators.text import _alpha_tokens

    d = _t(spark, sf_dir, "documents")
    fold = F.floor(lcg_uniform(F.col("doc_id"), F.lit(0), 1) * 5).cast("long")
    base = d.select("doc_id", fold.alias("fold"), _alpha_tokens("text").alias("toks"))
    # r12 (guide §2.4, §5): train counts are WINDOW counts of the train
    # rows over the one exploded (w1, bigram) frame — `count(CASE WHEN
    # fold != 0 ...) OVER (PARTITION BY key)` equals the old
    # train-groupBy count LEFT-JOINed back (0 where no train row shares
    # the key, exactly the old coalesce(nb, 0)).  The eager
    # localCheckpoint of the instance-scale bigram frame and BOTH join
    # shuffles are gone; w1 rides the pair struct instead of re-splitting
    # the bigram string per row.  Vocabulary size V stays a bounded
    # driver-side scalar (the oracle's CROSS JOIN V), derived from a
    # column-pruned token slice — not from a checkpoint.
    pl = F.greatest(F.size("toks") - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice("toks", 1, pl),
        F.slice("toks", 2, pl),
        lambda a, b: F.struct(a.alias("w1"), F.concat_ws(" ", a, b).alias("bigram")),
    )
    db = base.select("doc_id", "fold", F.explode(pairs).alias("p")).select(
        "doc_id", "fold", F.col("p.w1").alias("w1"), F.col("p.bigram").alias("bigram")
    )
    v = (  # bounded: vocabulary size (distinct train w1 = non-final tokens)
        base.filter(F.col("fold") != 0)
        .select(F.explode(F.slice("toks", 1, pl)).alias("w1"))
        .distinct()
        .count()
    )
    train_row = F.when(F.col("fold") != 0, F.lit(1))
    nb_w = F.count(train_row).over(Window.partitionBy("bigram"))
    nu_w = F.count(train_row).over(Window.partitionBy("w1"))
    joined = (
        db.withColumn("nb", nb_w)
        .withColumn("nu", nu_w)
        .filter(F.col("fold") == 0)
    )
    nll = -F.log((F.col("nb") + 1.0) / (F.col("nu") + F.lit(v)))
    # Quantize each per-bigram NLL term at 2^-30 (shared floor IEEE
    # expression), sum exactly, divide once — the mean of irrational
    # doubles is otherwise summation-order-dependent and a ROUND on
    # top is the r5 red class.
    q = F.floor(nll * 1073741824.0 + 0.5).cast("long")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            F.sum(q).cast("double")
            / (F.count(F.lit(1)).cast("double") * 1073741824.0)
        ).alias("nll"),
    )


# ------------------------------------------------ missing-value repair

_IMPUTE_U = lcg_uniform_sql("event_id", "0", 1)


@query(
    "ml_impute_group_median",
    oracle=f"""
        WITH m AS (
            SELECT event_id, event_type, value,
                   ({_IMPUTE_U}) < 0.1 AS miss
            FROM events
        ),
        med AS (
            SELECT event_type, quantile_disc(value, 0.5) AS med
            FROM m WHERE NOT miss GROUP BY event_type
        )
        SELECT event_id, m.event_type, miss AS was_missing,
               CASE WHEN miss THEN med ELSE value END AS value_filled
        FROM m JOIN med USING (event_type)
    """,
)
def ml_impute_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value repair by per-group EXACT median: ~10% of values
    are deterministically masked (LCG of event_id — the
    oracle-replayable missingness model) and refilled with their
    event type's discrete median over the OBSERVED values.  The
    median uses the bounded count-frame decomposition of
    grouped_median_prices_by_priority (one (group, value) aggregate,
    cumulative over that bounded frame, min value past the target
    rank) — no corpus-sized per-group window — and the fill is a
    broadcast join of the |groups|-row median table back onto the
    stream.  No float arithmetic: filled values are carried doubles,
    so the compare is exact."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    miss = lcg_uniform(F.col("event_id"), F.lit(0), 1) < 0.1
    m = e.select("event_id", "event_type", "value", miss.alias("miss"))
    obs = m.filter(~F.col("miss"))
    c = obs.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = c.select("event_type", "value", F.sum("c").over(w).alias("cum"))
    tot = c.groupBy("event_type").agg(F.sum("c").alias("n"))
    med = (
        cum.join(F.broadcast(tot), "event_type")
        .filter(F.col("cum") >= F.floor((F.col("n") - 1) / 2) + 1)
        .groupBy("event_type")
        .agg(F.min("value").alias("med"))
    )
    return m.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        F.col("miss").alias("was_missing"),
        F.when(F.col("miss"), F.col("med")).otherwise(F.col("value")).alias(
            "value_filled"
        ),
    )
