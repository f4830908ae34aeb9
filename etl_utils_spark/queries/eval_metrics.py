"""Model-evaluation & inference statistics pack: distributed AUC,
Poisson-bootstrap confidence intervals, and the Mann-Kendall trend
test.

Reference parity: the reference wrapper has no statistics surface of
its own (every statistic is SQL delegated to the host engine,
query_wrapper.sql:255); this pack extends the north-star analytics
tier (SURVEY.md §2 Tier C) with the evaluation statistics a
training-data pipeline runs over label/score columns.

Scale shapes (100 TB):
- AUC: the textbook formulation ranks the whole corpus through ONE
  reducer (``rank() OVER (ORDER BY score)``).  Here ranks come from the
  per-VALUE count frame (bounded by distinct-score cardinality) run
  through the distributed ``prefix_sum`` (operators/ids.py) — the same
  decomposition the Spearman query uses — and the rank-sum collapses
  map-side.  Integer arithmetic throughout (2·midrank is an integer),
  so the result is EXACT, not a float race.
- Poisson bootstrap: the classic resample-n-rows bootstrap cannot run
  on data that does not fit one machine; the Poisson(1) approximation
  (Chamandy et al., Google 2012) gives every row an independent
  per-replicate weight, so B replicates are ONE map-side pass
  (explode ×B → partial aggregate per partition) with no resampling
  shuffle.  Weights derive from a portable integer LCG (exact 64-bit
  arithmetic on both engines), so the DuckDB oracle replays the
  identical draw — the hash match certifies the whole resampling path.
- Mann-Kendall: the corpus collapses to one bounded monthly aggregate
  FIRST; the O(k²) pair scan runs on the |months|² frame (calendar-
  bounded, never data-bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "eval_auc_purchase_value",
    oracle="""
        WITH r AS (
          SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
                 rank() OVER (ORDER BY value) AS rk,
                 count(*) OVER (PARTITION BY value) AS c
          FROM events WHERE value IS NOT NULL
        ),
        s AS (
          SELECT SUM(y)::BIGINT AS np, count(*)::BIGINT AS n,
                 SUM(CASE WHEN y = 1 THEN 2 * rk + c - 1 ELSE 0 END)::BIGINT AS rs2
          FROM r
        )
        SELECT np AS n_pos, (n - np) AS n_neg,
               CAST(rs2 - np * (np + 1) AS DOUBLE)
                   / CAST(2 * np * (n - np) AS DOUBLE) AS auc
        FROM s
    """,
)
def eval_auc_purchase_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of ``value`` as a score for purchase events — the
    Mann-Whitney U rank-sum form with midrank tie handling.

    Distributed rank assignment: per-value (count, positive-count)
    aggregate → ``prefix_sum`` over the value order → midranks by
    arithmetic.  2·midrank(v) = 2·cum_before(v) + c(v) + 1 is an
    integer, so the positive rank-sum is an exact BIGINT and the AUC
    is ONE IEEE division of exact integers (emitted unrounded,
    bit-identical to the oracle's single-reducer window formulation).
    """
    from etl_utils_spark.operators.ids import prefix_sum

    e = (
        _t(spark, sf_dir, "events")
        # NULL scores are undefined for AUC — and the engines disagree
        # on NULL rank placement (prefix_sum buckets them first,
        # DuckDB's rank() puts them last), so they must not reach the
        # rank map at all
        .filter(F.col("value").isNotNull())
        .select(
            "value",
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        )
    )
    counts = (
        e.groupBy("value")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_c"),
            F.sum("y").cast("long").alias("_p"),
        )
        .localCheckpoint(eager=True)  # prefix_sum makes three passes
    )
    pc = prefix_sum(counts, order_col="value", value_col="_c", out_col="_cum")
    # 2*midrank = 2*(cum_before) + c + 1 = 2*cum - c + 1 (integer-exact)
    mid2 = 2 * F.col("_cum") - F.col("_c") + 1
    s = pc.agg(
        F.sum("_p").cast("long").alias("np"),
        F.sum("_c").cast("long").alias("n"),
        F.sum(F.col("_p") * mid2).cast("long").alias("rs2"),
    )
    return s.select(
        F.col("np").alias("n_pos"),
        (F.col("n") - F.col("np")).alias("n_neg"),
        (
            (F.col("rs2") - F.col("np") * (F.col("np") + 1)).cast("double")
            / (2 * F.col("np") * (F.col("n") - F.col("np"))).cast("double")
        ).alias("auc"),
    )


# Portable Poisson(1) draw over the shared LCG (operators/prng.py —
# the single source of truth for both the Spark expression and the
# oracle fragment).  u is a dyadic rational and the CDF thresholds are
# identical double literals, so the CASE comparisons agree
# bit-for-bit across engines.
_POISSON_CDF = (
    0.36787944117144233,  # P(X<=0)
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,  # P(X<=7); else 8
)

_BOOT_B = 32


def _boot_oracle() -> str:
    from etl_utils_spark.operators.prng import lcg_uniform_sql

    u = lcg_uniform_sql("o_orderkey", "rep", _BOOT_B)
    cases = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POISSON_CDF)
    )
    return f"""
    WITH reps AS (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS rep),
    x AS (
      SELECT rep, o_totalprice, o_orderkey
      FROM orders CROSS JOIN reps
    ),
    w AS (
      SELECT rep, o_totalprice,
             CASE {cases}
                  ELSE 8 END AS w
      FROM x
    )
    SELECT rep, SUM(w)::BIGINT AS n_eff,
           CAST(SUM(w * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / SUM(w) AS boot_mean
    FROM w GROUP BY rep
"""


@query("stats_bootstrap_ci_mean", oracle=_boot_oracle())
def stats_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap of the mean order price: 32 replicates, each
    row weighted Poisson(1) per replicate (Chamandy et al. 2012 — the
    bootstrap that runs as one distributed pass instead of n-row
    resampling).  Output is the bootstrap DISTRIBUTION (rep, n_eff,
    boot_mean) — quantiles of these 32 means are the CI; emitting the
    replicate means keeps every value an exact-decimal sum followed by
    ONE IEEE division (bit-identical to the oracle's identical-LCG
    replay).  Explode ×B collapses map-side: the shuffle carries B
    rows per partition, not B copies of the data."""
    from etl_utils_spark.operators.prng import lcg_uniform

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    r = o.select(
        "o_orderkey",
        "o_totalprice",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("rep"),
    )
    u = lcg_uniform(F.col("o_orderkey"), F.col("rep"), _BOOT_B)
    w = F.lit(8)
    for k, t in reversed(list(enumerate(_POISSON_CDF))):
        w = F.when(u < F.lit(t), F.lit(k)).otherwise(w)
    weighted = r.select(
        "rep",
        w.alias("w"),
        (w * F.col("o_totalprice").cast("decimal(18,2)")).alias("wp"),
    )
    return weighted.groupBy("rep").agg(
        F.sum("w").cast("long").alias("n_eff"),
        (F.sum("wp").cast("double") / F.sum("w")).alias("boot_mean"),
    )


@query(
    "stats_mann_kendall_monthly",
    oracle="""
        WITH m AS (
          SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mth,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
          FROM orders GROUP BY 1
        ),
        s AS (
          SELECT SUM(CASE WHEN b.rev > a.rev THEN 1
                          WHEN b.rev < a.rev THEN -1 ELSE 0 END)::BIGINT AS s_stat
          FROM m a JOIN m b ON a.mth < b.mth
        ),
        n AS (SELECT count(*)::BIGINT AS k FROM m),
        ties AS (
          SELECT COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0)::BIGINT AS tie_term
          FROM (SELECT count(*)::BIGINT AS t FROM m GROUP BY rev HAVING count(*) > 1)
        )
        SELECT n.k AS n_months, s.s_stat AS s_stat,
               (n.k * (n.k - 1) * (2 * n.k + 5) - ties.tie_term) AS var18,
               ROUND(CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                              / sqrt((n.k * (n.k - 1) * (2 * n.k + 5) - ties.tie_term) / 18.0)
                          WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                              / sqrt((n.k * (n.k - 1) * (2 * n.k + 5) - ties.tie_term) / 18.0)
                          ELSE 0.0 END, 6) AS z_mk
        FROM s, n, ties
    """,
)
def stats_mann_kendall_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall nonparametric trend test on monthly revenue: S =
    Σ_{i<j} sign(x_j − x_i), tie-corrected variance, continuity-
    corrected Z.  The corpus collapses to one exact-decimal monthly
    aggregate FIRST; the O(k²) pair join runs on the |months|² frame
    (calendar-bounded — 80 months at any data scale).  S and 18·Var
    are exact integers; Z rounds after the sqrt (irrational → safe).
    """
    o = _t(spark, sf_dir, "orders")
    m = (
        o.groupBy(F.to_date(F.date_trunc("month", "o_orderdate")).alias("mth"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev")
        )
        .localCheckpoint(eager=True)  # three consumers of a bounded frame
    )
    a, b = m.alias("a"), m.alias("b")
    s = a.join(b, F.col("a.mth") < F.col("b.mth")).agg(
        F.sum(
            F.when(F.col("b.rev") > F.col("a.rev"), 1)
            .when(F.col("b.rev") < F.col("a.rev"), -1)
            .otherwise(0)
        )
        .cast("long")
        .alias("s_stat")
    )
    n = m.agg(F.count(F.lit(1)).cast("long").alias("k"))
    ties = (
        m.groupBy("rev")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)), F.lit(0)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    j = s.crossJoin(F.broadcast(n)).crossJoin(F.broadcast(ties))
    var18 = F.col("k") * (F.col("k") - 1) * (2 * F.col("k") + 5) - F.col("tie_term")
    sd = F.sqrt(var18 / F.lit(18.0))
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / sd)
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / sd)
        .otherwise(F.lit(0.0))
    )
    return j.select(
        F.col("k").alias("n_months"),
        "s_stat",
        var18.alias("var18"),
        F.round(z, 6).alias("z_mk"),
    )


# ------------------------------------------------- retrieval quality

# Shared scaffold for the quantized-retrieval metrics: per-vector
# symmetric int8 quantization (scale 127/max|x|, FLOOR(x·s+0.5) — the
# explicit half-up both engines agree on), broadcast anchors × one
# corpus scan, and the dual (exact_rank, quant_rank) assignment with
# round-9 + id tie-breaks.  ONE definition feeds both the NDCG and
# recall/MRR queries on BOTH engine sides — a change to the
# quantization or rank stabilization cannot desynchronize the metrics.

_QUANT_RANKED_CTE = """
    WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               127.0 / list_max(list_transform(embedding::DOUBLE[],
                                               x -> abs(x))) AS s
        FROM embeddings
    ),
    qz AS (
        SELECT vec_id, v,
               list_transform(v, x -> floor(x * s + 0.5)) AS vq
        FROM base
    ),
    a AS (SELECT vec_id AS query_id, v AS av, vq AS avq
          FROM qz WHERE vec_id < 8),
    pairs AS (
        SELECT a.query_id, c.vec_id AS neighbor_id,
               list_cosine_similarity(a.av, c.v) AS cos_e,
               list_cosine_similarity(a.avq, c.vq) AS cos_q
        FROM a, qz c WHERE a.query_id != c.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY round(cos_e, 9) DESC, neighbor_id)
                   AS exact_rank,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY round(cos_q, 9) DESC, neighbor_id)
                   AS quant_rank
        FROM pairs
    )"""


def _quantized_rank_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, exact_rank, quant_rank) per anchor×candidate — the
    Spark half of _QUANT_RANKED_CTE (docstrings on the two consumer
    queries)."""
    from pyspark.sql import Window

    from etl_utils_spark.operators.dedup import cosine, dvec

    emb = _t(spark, sf_dir, "embeddings")
    v = dvec("embedding")
    s = 127.0 / F.array_max(F.transform(v, lambda x: F.abs(x)))
    base = emb.select(
        "vec_id",
        v.alias("v"),
        F.transform(v, lambda x: F.floor(x * s + 0.5).cast("double")).alias("vq"),
    )
    a = base.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("av"),
        F.col("vq").alias("avq"),
    )
    pairs = (
        F.broadcast(a)
        .crossJoin(base)
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("av"), F.col("v")).alias("cos_e"),
            cosine(F.col("avq"), F.col("vq")).alias("cos_q"),
        )
    )
    we = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cos_e", 9)), F.asc("neighbor_id")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cos_q", 9)), F.asc("neighbor_id")
    )
    return pairs.select(
        "query_id",
        F.row_number().over(we).alias("exact_rank"),
        F.row_number().over(wq).alias("quant_rank"),
    )


@query(
    "eval_ndcg_quantized_retrieval",
    oracle=_QUANT_RANKED_CTE
    + """,
    dcg AS (
        SELECT query_id,
               SUM(CASE WHEN exact_rank <= 5 THEN
                       (6.0 - exact_rank) / log2(quant_rank + 1.0)
                   ELSE 0.0 END) AS dcg
        FROM ranked WHERE quant_rank <= 5 GROUP BY query_id
    ),
    idcg AS (
        SELECT SUM((6.0 - j) / log2(j + 1.0)) AS idcg
        FROM (SELECT unnest(generate_series(1, 5)) AS j)
    )
    SELECT query_id, ROUND(dcg / idcg, 6) AS ndcg
    FROM dcg, idcg
    """,
)
def eval_ndcg_quantized_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@5 of int8-QUANTIZED retrieval against exact-cosine ground
    truth: per anchor, the graded-relevance list is the exact top-5
    (rel = 6−rank); the system under test ranks by cosine over
    symmetric int8 vectors (_quantized_rank_frame — shared with the
    recall/MRR query on both engine sides).  The metric quantifies
    what the 4× memory compression costs in ranking quality — the
    evaluation every quantized vector store needs.  Broadcast anchors
    × one corpus scan (bounded BNL, same shape as
    topk_cosine_neighbors); log2 is the irrational map → round 6
    AFTER the DCG ratio.  IDCG is the closed five-term constant."""
    import math

    ranked = _quantized_rank_frame(spark, sf_dir)
    gain = F.when(
        F.col("exact_rank") <= 5,
        (6.0 - F.col("exact_rank")) / F.log2(F.col("quant_rank") + 1.0),
    ).otherwise(0.0)
    idcg = sum((6.0 - j) / math.log2(j + 1.0) for j in range(1, 6))
    return (
        ranked.filter(F.col("quant_rank") <= 5)
        .groupBy("query_id")
        .agg(F.round(F.sum(gain) / F.lit(idcg), 6).alias("ndcg"))
    )


@query(
    "eval_recall_mrr_quantized",
    oracle=_QUANT_RANKED_CTE
    + """
    SELECT query_id,
           CAST(SUM(CASE WHEN exact_rank <= 5 AND quant_rank <= 5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hits_at5,
           CAST(MIN(CASE WHEN exact_rank <= 5 THEN quant_rank END)
                AS BIGINT) AS first_relevant_rank
    FROM ranked GROUP BY query_id
    """,
)
def eval_recall_mrr_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 numerator and first-relevant rank (the MRR
    reciprocal's denominator) for the int8-quantized ranking against
    exact-cosine relevance — the set-overlap companions to
    eval_ndcg_quantized_retrieval, emitted as EXACT INTEGERS so no
    float crosses the engine boundary (recall@5 = n_hits_at5/5 and
    MRR = avg(1/first_relevant_rank) are single divisions downstream).
    Shares _quantized_rank_frame / _QUANT_RANKED_CTE with the NDCG
    query on both engine sides."""
    ranked = _quantized_rank_frame(spark, sf_dir)
    return ranked.groupBy("query_id").agg(
        F.sum(
            ((F.col("exact_rank") <= 5) & (F.col("quant_rank") <= 5)).cast("int")
        )
        .cast("long")
        .alias("n_hits_at5"),
        F.min(F.when(F.col("exact_rank") <= 5, F.col("quant_rank")))
        .cast("long")
        .alias("first_relevant_rank"),
    )


@query(
    "eval_calibration_bins",
    oracle="""
        WITH s AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
                   least(CAST(floor(value / 100.0) AS BIGINT), 9) AS bin,
                   CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS score_cents
            FROM events
        )
        SELECT bin,
               count(*)::BIGINT AS n,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               CAST(SUM(score_cents) AS BIGINT) AS sum_score_cents
        FROM s GROUP BY bin
    """,
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins for a score/label pair (here: event
    value as the score, purchase as the positive label): per score
    decile, the exact counts a calibration plot needs — n, positives,
    and the EXACT integer cent sum of scores (mean predicted score =
    sum/100n and empirical rate = n_pos/n are single divisions
    downstream; nothing order-dependent crosses the engine boundary).
    One hash aggregate, output bounded by the bin count — at 100 TB
    the whole metric is a 10-row frame."""
    e = _t(spark, sf_dir, "events")
    s = e.select(
        (F.col("event_type") == "purchase").cast("int").alias("y"),
        F.least(F.floor(F.col("value") / 100.0).cast("long"), F.lit(9)).alias("bin"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("score_cents"),
    )
    return s.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum("score_cents").cast("long").alias("sum_score_cents"),
    )


@query(
    "eval_roc_points",
    oracle="""
        WITH t AS (SELECT unnest([100.0, 200.0, 300.0, 400.0, 500.0,
                                  600.0, 700.0, 800.0, 900.0]::DOUBLE[])
                       AS thr),
        s AS (
            SELECT value AS score,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events
        )
        SELECT thr,
               CAST(SUM(CASE WHEN score >= thr AND y = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN score >= thr AND y = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN score <  thr AND y = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS tn,
               CAST(SUM(CASE WHEN score <  thr AND y = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS fn
        FROM t CROSS JOIN s GROUP BY thr
    """,
)
def eval_roc_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC operating points at nine fixed thresholds: the exact
    confusion-matrix integers (TP/FP/TN/FN) per threshold — TPR/FPR
    and the plotted curve are single divisions downstream, so nothing
    order-dependent crosses the engine boundary (the rank-decomposed
    AUC in eval_auc_purchase_value summarizes the same curve; these
    are the inspectable points).  ONE scan: the 9-row threshold array
    explodes against each row map-side and the conditional sums
    collapse in the partial aggregate — no 9× shuffle amplification."""
    e = _t(spark, sf_dir, "events")
    s = e.select(
        F.col("value").alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    thr = F.explode(
        F.array(*[F.lit(float(t)) for t in range(100, 1000, 100)])
    ).alias("thr")
    x = s.select("score", "y", thr)
    hit = F.col("score") >= F.col("thr")
    pos = F.col("y") == 1
    return x.groupBy("thr").agg(
        F.sum((hit & pos).cast("int")).cast("long").alias("tp"),
        F.sum((hit & ~pos).cast("int")).cast("long").alias("fp"),
        F.sum((~hit & ~pos).cast("int")).cast("long").alias("tn"),
        F.sum((~hit & pos).cast("int")).cast("long").alias("fn"),
    )
