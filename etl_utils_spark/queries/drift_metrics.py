"""Distribution-drift & information metrics pack: PSI, Jensen–Shannon
divergence, mutual information, leave-one-out target encoding, and the
language-ID confusion matrix — the monitoring layer that tells a
corpus pipeline when its mix has shifted and how informative its
metadata columns are.

Scale shapes: every metric reduces to ONE mergeable count/sum
aggregate over the corpus followed by closed-form arithmetic on a
frame bounded by bin/category cardinality.  Nothing here sorts, and
the only joins are bounded-side broadcasts.

Cross-engine determinism notes (the rules this module lives by):
- log/sqrt outputs are irrational, so ROUND(x, 6) cannot sit on a
  decimal boundary — safe to round.
- ratios of exact quantities (LOO encoding) are emitted UNROUNDED:
  numerator and denominator are exactly-represented doubles, and one
  IEEE division is bit-identical on both engines, while ROUND of a
  small-denominator rational can land exactly on a round boundary
  where Spark (decimal-string HALF_UP) and DuckDB (binary-faithful)
  legitimately disagree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------------------------------------------------- PSI
_PSI_SPLIT = "2024-01-16"
_PSI_BIN = 20.0
_PSI_SMOOTH = 0.5


@query(
    "drift_psi_value_split",
    oracle=f"""
        WITH s AS (
          SELECT CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}' THEN 'a' ELSE 'b' END AS g,
                 FLOOR(value / {_PSI_BIN})::BIGINT AS bin
          FROM events
        ),
        c AS (SELECT g, bin, count(*)::DOUBLE AS n FROM s GROUP BY 1, 2),
        tot AS (SELECT g, sum(n) AS t FROM c GROUP BY 1),
        bins AS (SELECT DISTINCT bin FROM c),
        nb AS (SELECT count(*)::DOUBLE AS b FROM bins),
        grid AS (
          SELECT b.bin, t.g,
                 (coalesce(c.n, 0) + {_PSI_SMOOTH}) / (t.t + {_PSI_SMOOTH} * nb.b) AS p
          FROM bins b CROSS JOIN tot t CROSS JOIN nb
          LEFT JOIN c ON c.bin = b.bin AND c.g = t.g
        )
        SELECT CAST(SUM(CAST(floor((a.p - b.p) * ln(a.p / b.p)
                                   * 1073741824.0 + 0.5) AS BIGINT)) AS DOUBLE)
                   / 1073741824.0 AS psi,
               (SELECT CAST(b AS BIGINT) FROM nb) AS n_bins
        FROM (SELECT bin, p FROM grid WHERE g = 'a') a
        JOIN (SELECT bin, p FROM grid WHERE g = 'b') b USING (bin)
    """,
)
def drift_psi_value_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the event-value distribution
    between the first and second half of the observation period — the
    standard production drift score (PSI > 0.2 ⇒ significant shift).
    Laplace-smoothed (+0.5 per bin) so empty bins stay finite; one
    binned count aggregate, then arithmetic over the bounded bin grid.
    """
    e = _t(spark, sf_dir, "events")
    s = e.select(
        F.when(F.col("ts") < F.lit(_PSI_SPLIT).cast("timestamp"), "a")
        .otherwise("b")
        .alias("g"),
        F.floor(F.col("value") / _PSI_BIN).alias("bin"),
    )
    c = s.groupBy("g", "bin").agg(F.count(F.lit(1)).cast("double").alias("n"))
    tot = c.groupBy("g").agg(F.sum("n").alias("t"))
    bins = c.select("bin").distinct()
    nb = bins.agg(F.count(F.lit(1)).cast("double").alias("b"))
    grid = (
        bins.crossJoin(tot)
        .crossJoin(F.broadcast(nb))
        .join(c, ["bin", "g"], "left")
        .select(
            "bin",
            "g",
            (
                (F.coalesce(F.col("n"), F.lit(0.0)) + F.lit(_PSI_SMOOTH))
                / (F.col("t") + F.lit(_PSI_SMOOTH) * F.col("b"))
            ).alias("p"),
        )
    )
    a = grid.filter(F.col("g") == "a").select("bin", F.col("p").alias("p_a"))
    b = grid.filter(F.col("g") == "b").select("bin", F.col("p").alias("p_b"))
    # Quantize each bin's PSI term at 2^-30 (shared floor IEEE
    # expression), sum exactly, divide by the power-of-two grid once —
    # summing raw double terms is order-dependent and a ROUND on top
    # is the r5 red class.
    term = (F.col("p_a") - F.col("p_b")) * F.log(F.col("p_a") / F.col("p_b"))
    q = F.floor(term * 1073741824.0 + 0.5).cast("long")
    psi = a.join(b, "bin").agg(
        (F.sum(q).cast("double") / 1073741824.0).alias("psi")
    )
    return psi.crossJoin(nb.select(F.col("b").cast("long").alias("n_bins")))


# ------------------------------------------------- streaming PSI monitor
@query(
    "stream_psi_daily_live",
    oracle=f"""
        WITH c AS (
          SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                 FLOOR(value / {_PSI_BIN})::BIGINT AS bin,
                 count(*)::DOUBLE AS n
          FROM events GROUP BY 1, 2
        ),
        bins AS (SELECT DISTINCT bin FROM c),
        nb AS (SELECT count(*)::DOUBLE AS b FROM bins),
        days AS (SELECT day, sum(n) AS nd FROM c GROUP BY 1),
        qb AS (SELECT bin, sum(n) AS nq FROM c GROUP BY 1),
        nt AS (SELECT sum(n) AS nn FROM c),
        grid AS (
          SELECT d.day, b.bin,
                 (coalesce(c.n, 0) + {_PSI_SMOOTH}) / (d.nd + {_PSI_SMOOTH} * nb.b) AS p,
                 (qb.nq + {_PSI_SMOOTH}) / (nt.nn + {_PSI_SMOOTH} * nb.b) AS q
          FROM days d CROSS JOIN bins b CROSS JOIN nb CROSS JOIN nt
          JOIN qb ON qb.bin = b.bin
          LEFT JOIN c ON c.day = d.day AND c.bin = b.bin
        )
        SELECT day,
               CAST(SUM(CAST(floor((p - q) * ln(p / q) * 1073741824.0 + 0.5)
                             AS BIGINT)) AS DOUBLE) / 1073741824.0 AS psi
        FROM grid GROUP BY 1
    """,
)
def stream_psi_daily_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day PSI drift of the event-value distribution against the
    full-period baseline, with the binned counting executed as a REAL
    stream (1-day tumbling window aggregate, AvailableNow) — the live
    monitoring twin of drift_psi_value_split.  A continuous deployment
    keeps only O(#bins) state per window; the PSI arithmetic runs on
    the bounded (days × bins) frame the stream emits, never the event
    stream itself."""
    from etl_utils_spark.streaming import windows as W

    s = W.read_events_stream(spark, sf_dir)
    binned = s.groupBy(
        F.window("ts", "1 day").alias("w"),
        F.floor(F.col("value") / _PSI_BIN).alias("bin"),
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    # localCheckpoint: (a) the PSI arithmetic below self-joins this
    # frame four ways, and the memory-sink view's attributes cannot be
    # deduplicated by the analyzer (INTERNAL_ERROR: conflicting
    # references); (b) the frame is bounded at days × bins rows.
    c = (
        W.run_stream_to_batch(spark, binned, output_mode="complete")
        .select(F.to_date(F.col("w.start")).alias("day"), "bin", "n")
        .localCheckpoint(eager=True)
    )
    bins = c.select("bin").distinct()
    nb = bins.agg(F.count(F.lit(1)).cast("double").alias("b"))
    days = c.groupBy("day").agg(F.sum("n").alias("nd"))
    qb = c.groupBy("bin").agg(F.sum("n").alias("nq"))
    nt = c.agg(F.sum("n").alias("nn"))
    grid = (
        days.crossJoin(bins)
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nt))
        .join(qb, "bin")
        .join(c, ["day", "bin"], "left")
        .select(
            "day",
            (
                (F.coalesce(F.col("n"), F.lit(0.0)) + F.lit(_PSI_SMOOTH))
                / (F.col("nd") + F.lit(_PSI_SMOOTH) * F.col("b"))
            ).alias("p"),
            (
                (F.col("nq") + F.lit(_PSI_SMOOTH))
                / (F.col("nn") + F.lit(_PSI_SMOOTH) * F.col("b"))
            ).alias("q"),
        )
    )
    term = (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))
    qq = F.floor(term * 1073741824.0 + 0.5).cast("long")
    return grid.groupBy("day").agg(
        (F.sum(qq).cast("double") / 1073741824.0).alias("psi")
    )


# ------------------------------------------------------- Jensen–Shannon
@query(
    "drift_js_lang_by_source",
    oracle="""
        WITH c AS (SELECT source, lang, count(*)::DOUBLE AS n
                   FROM documents GROUP BY 1, 2),
        st AS (SELECT source, sum(n) AS t FROM c GROUP BY 1),
        corp AS (SELECT lang, sum(n) AS cn FROM c GROUP BY 1),
        ct AS (SELECT sum(cn) AS ctot FROM corp),
        grid AS (
          SELECT st.source, corp.lang,
                 coalesce(c.n, 0) / st.t AS p,
                 corp.cn / ct.ctot AS q
          FROM st CROSS JOIN corp CROSS JOIN ct
          LEFT JOIN c ON c.source = st.source AND c.lang = corp.lang
        ),
        terms AS (
          SELECT source,
                 CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2)) ELSE 0 END AS tp,
                 CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2)) ELSE 0 END AS tq
          FROM grid
        )
        SELECT source,
               CAST(SUM(CAST(floor(tp * 1073741824.0 + 0.5) AS BIGINT))
                    + SUM(CAST(floor(tq * 1073741824.0 + 0.5) AS BIGINT)) AS DOUBLE)
                   / 2147483648.0 AS jsd
        FROM terms GROUP BY 1
    """,
)
def drift_js_lang_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence of each source's language mix from
    the corpus-wide mix — which ingestion feeds skew the blend.  One
    (source, lang) count aggregate; margins re-aggregated from it
    (never a second corpus scan); arithmetic on the bounded
    |sources|×|langs| grid.  Zero-probability cells contribute 0 by
    the x·ln x → 0 limit, encoded identically on both engines."""
    d = _t(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(F.count(F.lit(1)).cast("double").alias("n"))
    st = c.groupBy("source").agg(F.sum("n").alias("t"))
    corp = c.groupBy("lang").agg(F.sum("n").alias("cn"))
    ct = corp.agg(F.sum("cn").alias("ctot"))
    grid = (
        st.crossJoin(corp)
        .crossJoin(F.broadcast(ct))
        .join(c, ["source", "lang"], "left")
        .select(
            "source",
            "lang",
            (F.coalesce(F.col("n"), F.lit(0.0)) / F.col("t")).alias("p"),
            (F.col("cn") / F.col("ctot")).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    tp = F.when(F.col("p") > 0, F.col("p") * F.log(F.col("p") / m)).otherwise(0.0)
    tq = F.when(F.col("q") > 0, F.col("q") * F.log(F.col("q") / m)).otherwise(0.0)
    return (
        grid.select("source", tp.alias("tp"), tq.alias("tq"))
        .groupBy("source")
        .agg(
            (
                (
                    F.sum(F.floor(F.col("tp") * 1073741824.0 + 0.5).cast("long"))
                    + F.sum(F.floor(F.col("tq") * 1073741824.0 + 0.5).cast("long"))
                ).cast("double")
                / 2147483648.0
            ).alias("jsd")
        )
    )


# ------------------------------------------------------ mutual information
@query(
    "stats_mutual_info_lang_source",
    oracle="""
        WITH c AS (SELECT lang, source, count(*)::DOUBLE AS n
                   FROM documents GROUP BY 1, 2),
        n AS (SELECT sum(n) AS nn FROM c),
        rl AS (SELECT lang, sum(n) AS rt FROM c GROUP BY 1),
        cl AS (SELECT source, sum(n) AS ct FROM c GROUP BY 1)
        SELECT CAST(SUM(CAST(floor((c.n / n.nn)
                         * ln((c.n / n.nn) / ((rl.rt / n.nn) * (cl.ct / n.nn)))
                         * 1073741824.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1073741824.0
                   AS mutual_info,
               -(CAST(SUM(CAST(floor((c.n / n.nn) * ln(c.n / n.nn)
                                     * 1073741824.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1073741824.0)
                   AS joint_entropy
        FROM c
        JOIN rl USING (lang) JOIN cl USING (source) CROSS JOIN n
    """,
)
def stats_mutual_info_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(lang; source) and the joint entropy — how
    much knowing the source tells you about language (redundancy check
    for stratification keys).  Only OBSERVED cells carry mass (0·ln 0
    = 0), so no zero-cell grid is needed: one count aggregate, margin
    re-aggregation, a broadcast join, one closed-form sum."""
    d = _t(spark, sf_dir, "documents")
    c = d.groupBy("lang", "source").agg(F.count(F.lit(1)).cast("double").alias("n"))
    n = c.agg(F.sum("n").alias("nn"))
    rl = c.groupBy("lang").agg(F.sum("n").alias("rt"))
    cl = c.groupBy("source").agg(F.sum("n").alias("ct"))
    j = (
        c.join(F.broadcast(rl), "lang")
        .join(F.broadcast(cl), "source")
        .crossJoin(F.broadcast(n))
    )
    pij = F.col("n") / F.col("nn")
    pi = F.col("rt") / F.col("nn")
    pj = F.col("ct") / F.col("nn")
    return j.agg(
        (
            F.sum(
                F.floor(pij * F.log(pij / (pi * pj)) * 1073741824.0 + 0.5).cast(
                    "long"
                )
            ).cast("double")
            / 1073741824.0
        ).alias("mutual_info"),
        (
            -(
                F.sum(
                    F.floor(pij * F.log(pij) * 1073741824.0 + 0.5).cast("long")
                ).cast("double")
                / 1073741824.0
            )
        ).alias("joint_entropy"),
    )


# ------------------------------------------------- LOO target encoding
@query(
    "feature_target_encode_priority",
    oracle="""
        WITH g AS (
          SELECT o_orderpriority,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s,
                 count(*) AS n
          FROM orders GROUP BY 1
        )
        SELECT o.o_orderkey AS o_orderkey, o.o_orderpriority AS o_orderpriority,
               CASE WHEN g.n > 1
                    THEN (g.s - o.o_totalprice) / (g.n - 1) END AS loo_price
        FROM orders o JOIN g USING (o_orderpriority)
    """,
)
def feature_target_encode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of order priority by mean total
    price — the leakage-safe categorical encoder: each row's own
    target is excluded from its category mean.  Per-category exact
    decimal sums broadcast back (5 rows); the LOO value is numerator
    and denominator of EXACT doubles with one IEEE division — emitted
    unrounded because it is bit-identical across engines (see module
    docstring)."""
    o = _t(spark, sf_dir, "orders")
    g = o.groupBy("o_orderpriority").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    loo = F.when(
        F.col("n") > 1, (F.col("s") - F.col("o_totalprice")) / (F.col("n") - 1)
    )
    return (
        o.join(F.broadcast(g), "o_orderpriority")
        .select("o_orderkey", "o_orderpriority", loo.alias("loo_price"))
    )


# ------------------------------------------------- lang-id confusion
def _confusion_oracle() -> str:
    """Generate the oracle from the SAME marker table the Spark
    operator uses (operators/text.py:LANG_MARKERS) — a hand-copied
    marker list would silently drift."""
    from etl_utils_spark.operators.text import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    score_sql = ",\n".join(
        "               len(list_filter(string_split(text,' '), "
        f"t -> t IN ({', '.join(repr(m) for m in LANG_MARKERS[lang])}))) AS n_{lang}"
        for lang in langs
    )
    pred_case = (
        "CASE WHEN best = 0 THEN 'und' "
        + " ".join(f"WHEN n_{lang} = best THEN '{lang}'" for lang in langs)
        + " ELSE 'und' END"
    )
    return f"""
        WITH scored AS (
            SELECT doc_id, lang,
{score_sql}
            FROM documents
        ),
        with_best AS (
            SELECT *, greatest({", ".join("n_" + l for l in langs)}) AS best
            FROM scored
        ),
        pred AS (SELECT lang, {pred_case} AS pred_lang FROM with_best)
        SELECT lang, pred_lang, count(*) AS n FROM pred GROUP BY 1, 2
    """


@query("langid_confusion_matrix", oracle=_confusion_oracle())
def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the marker-set language-ID heuristic
    (operators/text.py:language_id) against the labeled ``lang``
    column — the accuracy audit for the classifier the curation
    pipeline gates on.  Per-row scoring is embarrassingly parallel;
    the output is one |langs|² count aggregate.  The oracle inlines
    the SAME marker sets and the same (count DESC, lang ASC)
    tie-break CASE chain."""
    from etl_utils_spark.operators.text import LANG_MARKERS, language_scores

    d = _t(spark, sf_dir, "documents")
    scores = language_scores("text")
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[scores[lang] for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    return (
        d.select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
