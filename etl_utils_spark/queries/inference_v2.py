"""Inference & prediction-evaluation pack II: randomization test,
Theil-Sen robust slope, additive seasonal decomposition, two-proportion
z-test, Markov next-event accuracy, and a Johnson-Lindenstrauss
distortion gate.

Reference parity: delegated-SQL analytics tier (query_wrapper.sql:255);
statistics surface extensions follow the same cross-engine determinism
rules as queries/stat_tests.py (docs/SCALE.md): exact-decimal sums,
single IEEE divisions emitted unrounded, rounding only after
irrational maps (sqrt), FLOOR before any double→int cast.

Scale shapes (100 TB):
- Randomization test: like the Poisson bootstrap, the B relabelings
  ride ONE exploded map-side pass (each row draws its pseudo-label
  from the portable LCG per replicate); no resampling shuffle, and the
  DuckDB oracle replays the identical draws.
- Theil-Sen / seasonal / Markov: the corpus collapses to a bounded
  aggregate FIRST (monthly revenue, daily counts, the |states|²
  transition matrix); every window/pair join runs on that bounded
  frame, never the raw data.
- JL gate: the projection is a per-row Arrow-batched matmul (no
  shuffle); the distance-pair audit runs on a fixed 100-vector probe
  sample, so the quadratic stage is constant-size at any corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ------------------------------------------------------- randomization test

_PERM_B = 64


def _perm_u_sql() -> str:
    from etl_utils_spark.operators.prng import lcg_uniform_sql

    return lcg_uniform_sql("b.event_id", "r.rep", _PERM_B)


# The uniform comes from the shared portable LCG (operators/prng.py) —
# the same primitive the Poisson bootstrap uses; the oracle fragment
# is generated from the same constants as the Spark expression.
_PERM_ORACLE = f"""
    WITH base AS (
      SELECT event_id, value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    obs AS (
      SELECT CAST(SUM(CASE WHEN grp = 1 THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
                 / SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END)
             - CAST(SUM(CASE WHEN grp = 0 THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
                 / SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS diff_obs,
             CAST(SUM(grp) AS DOUBLE) / count(*) AS p_share
      FROM base
    ),
    reps AS (SELECT unnest(generate_series(0, {_PERM_B - 1})) AS rep),
    draws AS (
      SELECT r.rep, b.value,
             CASE WHEN {_perm_u_sql()} < o.p_share
                  THEN 1 ELSE 0 END AS pgrp
      FROM base b CROSS JOIN reps r CROSS JOIN obs o
    ),
    perm AS (
      SELECT rep,
             CAST(SUM(CASE WHEN pgrp = 1 THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
                 / NULLIF(SUM(CASE WHEN pgrp = 1 THEN 1 ELSE 0 END), 0)
             - CAST(SUM(CASE WHEN pgrp = 0 THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
                 / NULLIF(SUM(CASE WHEN pgrp = 0 THEN 1 ELSE 0 END), 0) AS diff_perm
      FROM draws GROUP BY rep
    )
    SELECT o.diff_obs AS diff_obs, {_PERM_B}::BIGINT AS n_reps,
           SUM(CASE WHEN abs(p.diff_perm) >= abs(o.diff_obs) THEN 1 ELSE 0 END)::BIGINT
               AS n_extreme,
           CAST(1 + SUM(CASE WHEN abs(p.diff_perm) >= abs(o.diff_obs) THEN 1 ELSE 0 END)
                AS DOUBLE) / {_PERM_B + 1} AS p_value
    FROM perm p CROSS JOIN obs o
    GROUP BY o.diff_obs
"""


@query("stats_randomization_test_diff", oracle=_PERM_ORACLE)
def stats_randomization_test_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization test for the mean-value difference between
    purchase and click events: 64 deterministic pseudo-relabelings
    (each row draws its label from the portable LCG with the observed
    group share — the binomial variant of the permutation test that
    needs no global shuffle), p = (1 + #extreme)/(B + 1).  Group means
    are exact-decimal sums with single divisions; the extremeness
    comparison runs on bit-identical doubles on both engines."""
    e = _t(spark, sf_dir, "events")
    base = e.filter(F.col("event_type").isin("purchase", "click")).select(
        "event_id",
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("grp"),
    )
    from etl_utils_spark.operators.prng import lcg_uniform

    vdec = F.col("value").cast("decimal(18,2)")
    obs = base.agg(
        (
            F.sum(F.when(F.col("grp") == 1, vdec)).cast("double")
            / F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
            - F.sum(F.when(F.col("grp") == 0, vdec)).cast("double")
            / F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        ).alias("diff_obs"),
        (F.sum("grp").cast("double") / F.count(F.lit(1))).alias("p_share"),
    ).localCheckpoint(eager=True)  # 1-row frame with two consumers
    r = base.select(
        "event_id",
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(_PERM_B - 1))).alias("rep"),
    ).crossJoin(F.broadcast(obs))
    u = lcg_uniform(F.col("event_id"), F.col("rep"), _PERM_B)
    pgrp = F.when(u < F.col("p_share"), 1).otherwise(0)
    perm = (
        r.withColumn("pgrp", pgrp)
        .groupBy("rep")
        .agg(
            (
                F.sum(F.when(F.col("pgrp") == 1, vdec)).cast("double")
                / F.nullif(F.sum(F.when(F.col("pgrp") == 1, 1).otherwise(0)), F.lit(0))
                - F.sum(F.when(F.col("pgrp") == 0, vdec)).cast("double")
                / F.nullif(F.sum(F.when(F.col("pgrp") == 0, 1).otherwise(0)), F.lit(0))
            ).alias("diff_perm")
        )
    )
    extreme = F.when(
        F.abs(F.col("diff_perm")) >= F.abs(F.col("diff_obs")), 1
    ).otherwise(0)
    return (
        perm.crossJoin(F.broadcast(obs.select("diff_obs")))
        .groupBy("diff_obs")
        .agg(
            F.lit(_PERM_B).cast("long").alias("n_reps"),
            F.sum(extreme).cast("long").alias("n_extreme"),
            ((1 + F.sum(extreme)).cast("double") / F.lit(_PERM_B + 1)).alias("p_value"),
        )
        .select("diff_obs", "n_reps", "n_extreme", "p_value")
    )


# ------------------------------------------------------------- Theil-Sen


@query(
    "stats_theilsen_monthly",
    oracle="""
        WITH m AS (
          SELECT (CAST(date_part('year', o_orderdate) AS BIGINT) * 12
                  + CAST(date_part('month', o_orderdate) AS BIGINT)) AS mi,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
          FROM orders GROUP BY 1
        ),
        slopes AS (
          SELECT (b.rev - a.rev) / (b.mi - a.mi) AS slope, a.mi AS mi_a, b.mi AS mi_b
          FROM m a JOIN m b ON a.mi < b.mi
        ),
        ranked AS (
          SELECT slope,
                 row_number() OVER (ORDER BY slope, mi_a, mi_b) AS rn,
                 count(*) OVER () AS t
          FROM slopes
        )
        SELECT MAX(t)::BIGINT AS n_pairs, AVG(slope) AS theil_sen_slope
        FROM ranked
        WHERE rn = (t + 1) // 2 OR rn = t // 2 + 1
    """,
)
def stats_theilsen_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator on monthly revenue: the median
    of all pairwise slopes — immune to the outlier months that skew an
    OLS fit.  The corpus collapses to the exact-decimal monthly frame
    first; the O(k²) slope join and the median-rank selection run on
    the calendar-bounded pair frame.  The median is selected by RANK
    (one row if odd, the two middle rows averaged if even) rather than
    interpolated — identical selection logic on both engines, and each
    slope is one IEEE division of exact values."""
    o = _t(spark, sf_dir, "orders")
    m = (
        o.groupBy(
            (
                F.year("o_orderdate").cast("long") * 12
                + F.month("o_orderdate").cast("long")
            ).alias("mi")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev")
        )
        .localCheckpoint(eager=True)
    )
    a, b = m.alias("a"), m.alias("b")
    slopes = a.join(b, F.col("a.mi") < F.col("b.mi")).select(
        ((F.col("b.rev") - F.col("a.rev")) / (F.col("b.mi") - F.col("a.mi"))).alias(
            "slope"
        ),
        F.col("a.mi").alias("mi_a"),
        F.col("b.mi").alias("mi_b"),
    )
    w = Window.orderBy("slope", "mi_a", "mi_b")
    ranked = slopes.select(
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("t"),
    )
    mid = ranked.filter(
        (F.col("rn") == F.floor((F.col("t") + 1) / 2))
        | (F.col("rn") == F.floor(F.col("t") / 2) + 1)
    )
    return mid.agg(
        F.max("t").cast("long").alias("n_pairs"),
        F.avg("slope").alias("theil_sen_slope"),
    )


# ------------------------------------------------- seasonal decomposition


@query(
    "seasonal_decompose_daily",
    oracle="""
        WITH raw AS (
          SELECT CAST(ts AS DATE) AS day, count(*)::BIGINT AS n
          FROM events GROUP BY 1
        ),
        cal AS (
          SELECT CAST(unnest(generate_series(
                   (SELECT min(day) FROM raw),
                   (SELECT max(day) FROM raw),
                   INTERVAL 1 DAY)) AS DATE) AS day
        ),
        d AS (
          SELECT cal.day, COALESCE(raw.n, 0) AS n
          FROM cal LEFT JOIN raw USING (day)
        ),
        t AS (
          SELECT day, n,
                 SUM(n) OVER w7 AS s7,
                 COUNT(*) OVER w7 AS c7,
                 date_part('isodow', day)::BIGINT AS dow
          FROM d
          WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        ),
        seas AS (
          SELECT dow, SUM(7 * n - s7)::BIGINT AS det7_sum, COUNT(*)::BIGINT AS cnt
          FROM t WHERE c7 = 7 GROUP BY dow
        )
        SELECT t.day, t.n,
               CASE WHEN t.c7 = 7 THEN t.s7 / 7.0 END AS trend,
               CASE WHEN t.c7 = 7
                    THEN CAST(s.det7_sum AS DOUBLE) / (7 * s.cnt) END AS seasonal,
               CASE WHEN t.c7 = 7
                    THEN t.n - t.s7 / 7.0
                         - CAST(s.det7_sum AS DOUBLE) / (7 * s.cnt) END AS resid
        FROM t JOIN seas s USING (dow)
    """,
)
def seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of the daily event-count series:
    trend = centered 7-day moving average (full windows only),
    weekly seasonal = per-ISO-weekday mean of the detrended series,
    residual = observed − trend − seasonal.  The corpus collapses to
    the bounded daily frame first; every window runs over days, not
    events.  Exactness: the detrended value is kept as the INTEGER
    7n − Σ₇ (one division deferred to the end), so trend, seasonal and
    residual are each a fixed sequence of IEEE ops on exact integers —
    bit-identical cross-engine, no rounding needed."""
    e = _t(spark, sf_dir, "events")
    raw = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # Gap-fill against a dense calendar so the ROWS window really is a
    # 7-DAY average: a missing day would otherwise make the frame span
    # more than a week and smear the weekday attribution.
    cal = raw.agg(F.min("day").alias("d0"), F.max("day").alias("d1")).select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    d = cal.join(raw, "day", "left").select(
        "day", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    t = d.select(
        "day",
        "n",
        F.sum("n").over(w7).alias("s7"),
        F.count(F.lit(1)).over(w7).alias("c7"),
        (F.weekday("day").cast("long") + 1).alias("dow"),
    )
    seas = (
        t.filter(F.col("c7") == 7)
        .groupBy("dow")
        .agg(
            F.sum(7 * F.col("n") - F.col("s7")).cast("long").alias("det7_sum"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
        )
    )
    full = F.col("c7") == 7
    trend = F.col("s7") / 7.0
    seasonal = F.col("det7_sum").cast("double") / (7 * F.col("cnt"))
    return t.join(F.broadcast(seas), "dow").select(
        "day",
        "n",
        F.when(full, trend).alias("trend"),
        F.when(full, seasonal).alias("seasonal"),
        F.when(full, F.col("n") - trend - seasonal).alias("resid"),
    )


# ------------------------------------------------- two-proportion z-test


@query(
    "stats_two_proportion_ztest",
    oracle="""
        WITH s AS (
          SELECT SUM(CASE WHEN date_part('isodow', ts) >= 6 THEN 1 ELSE 0 END)::BIGINT AS n1,
                 SUM(CASE WHEN date_part('isodow', ts) >= 6
                          AND event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS x1,
                 SUM(CASE WHEN date_part('isodow', ts) < 6 THEN 1 ELSE 0 END)::BIGINT AS n2,
                 SUM(CASE WHEN date_part('isodow', ts) < 6
                          AND event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS x2
          FROM events
        )
        SELECT n1, x1, n2, x2,
               CAST(x1 AS DOUBLE) / n1 AS p1,
               CAST(x2 AS DOUBLE) / n2 AS p2,
               ROUND((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
                     / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                            * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                            * (1.0 / n1 + 1.0 / n2)), 6) AS z
        FROM s
    """,
)
def stats_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test: weekend vs weekday purchase rate — the
    A/B-test workhorse.  ONE conditional aggregate over the corpus
    (four exact counts); every derived value is a fixed sequence of
    IEEE ops on those counts, with rounding only after the sqrt
    (irrational → safe).  No joins, no windows."""
    e = _t(spark, sf_dir, "events")
    wknd = (F.weekday(F.col("ts").cast("date")) + 1) >= 6
    purch = F.col("event_type") == "purchase"
    s = e.agg(
        F.sum(F.when(wknd, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(wknd & purch, 1).otherwise(0)).cast("long").alias("x1"),
        F.sum(F.when(~wknd, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when((~wknd) & purch, 1).otherwise(0)).cast("long").alias("x2"),
    )
    p1 = F.col("x1").cast("double") / F.col("n1")
    p2 = F.col("x2").cast("double") / F.col("n2")
    pp = (F.col("x1") + F.col("x2")).cast("double") / (F.col("n1") + F.col("n2"))
    z = (p1 - p2) / F.sqrt(pp * (1.0 - pp) * (1.0 / F.col("n1") + 1.0 / F.col("n2")))
    return s.select(
        "n1", "x1", "n2", "x2",
        p1.alias("p1"), p2.alias("p2"), F.round(z, 6).alias("z"),
    )


# --------------------------------------------- Markov next-event accuracy


@query(
    "markov_top1_accuracy",
    oracle="""
        WITH seq AS (
          SELECT event_type,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS next_type
          FROM events
        ),
        c AS (
          SELECT event_type, next_type, count(*)::BIGINT AS n
          FROM seq WHERE next_type IS NOT NULL
          GROUP BY 1, 2
        ),
        best AS (
          SELECT event_type, next_type AS predicted_next, n AS n_correct,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY n DESC, next_type) AS rk,
                 SUM(n) OVER (PARTITION BY event_type) AS n_total
          FROM c
        )
        SELECT event_type, predicted_next, n_correct, n_total::BIGINT AS n_total,
               CAST(n_correct AS DOUBLE) / n_total AS accuracy
        FROM best WHERE rk = 1
    """,
)
def markov_top1_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 next-event prediction accuracy of the first-order Markov
    model, per source state: the modal transition's share of all
    transitions out of each state — how predictable the event stream
    actually is.  The per-user lead window is the one corpus-sized
    shuffle; the argmax and totals run on the |states|² matrix
    (constant at any scale).  Deterministic tie-breaks: (ts, event_id)
    sequence order, (count DESC, next_type) argmax order; accuracy is
    one IEEE division of exact counts."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = (
        e.select("event_type", F.lead("event_type").over(w).alias("next_type"))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    ws = Window.partitionBy("event_type")
    wr = Window.partitionBy("event_type").orderBy(F.desc("n"), "next_type")
    best = c.select(
        "event_type",
        F.col("next_type").alias("predicted_next"),
        F.col("n").alias("n_correct"),
        F.row_number().over(wr).alias("rk"),
        F.sum("n").over(ws).cast("long").alias("n_total"),
    )
    return best.filter(F.col("rk") == 1).select(
        "event_type",
        "predicted_next",
        "n_correct",
        "n_total",
        (F.col("n_correct").cast("double") / F.col("n_total")).alias("accuracy"),
    )


# ------------------------------------------------ JL projection gate

_JL_K = 32
_JL_PROBES = 100


@query(
    "gate_jl_distortion_bounded",
    oracle=f"""
        SELECT 'jl_pm1_k{_JL_K}_p{_JL_PROBES}' AS variant,
               CAST(true AS BOOLEAN) AS median_ratio_in_bounds
    """,
)
def gate_jl_distortion_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss distortion gate: project the 64-dim
    embeddings to k=32 with a FIXED ±1 sign matrix (seeded numpy,
    regenerated identically in every Arrow batch — no broadcast
    needed), then audit that the median squared-distance ratio
    d²_proj/d²_orig over all pairs of a 100-vector probe sample lies
    in [0.85, 1.15] (χ²₃₂/32 concentration puts the median within a
    few percent of 1).  The projection is a per-batch numpy matmul —
    embarrassingly parallel; the quadratic audit touches only the
    constant-size probe set.  Driver-visible contract: the oracle row
    is the literal bound; a distortion regression flips the boolean
    and the driver sees a red row."""
    import numpy as np
    import pandas as pd

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < _JL_PROBES)

    def _project(batches):
        signs = None
        for pdf in batches:
            if pdf.empty:
                continue
            d = len(pdf["embedding"].iloc[0])
            if signs is None:
                signs = (
                    np.random.RandomState(42)
                    .randint(0, 2, size=(d, _JL_K))
                    .astype(np.float64)
                    * 2.0
                    - 1.0
                ) / np.sqrt(_JL_K)
            mat = np.vstack(pdf["embedding"].to_numpy())
            proj = mat @ signs
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "orig": list(mat.astype(np.float64)),
                    "proj": list(proj),
                }
            )

    pv = emb.mapInPandas(
        _project, schema="vec_id long, orig array<double>, proj array<double>"
    )
    a = pv.select(
        F.col("vec_id").alias("id_a"),
        F.col("orig").alias("oa"),
        F.col("proj").alias("pa"),
    )
    b = pv.select(
        F.col("vec_id").alias("id_b"),
        F.col("orig").alias("ob"),
        F.col("proj").alias("pb"),
    )

    def _d2(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda u, v: (u - v) * (u - v)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )

    pairs = a.join(b, F.col("id_a") < F.col("id_b")).select(
        (_d2(F.col("pa"), F.col("pb")) / _d2(F.col("oa"), F.col("ob"))).alias("ratio")
    )
    med = pairs.agg(F.percentile("ratio", 0.5).alias("m"))
    return med.select(
        F.lit(f"jl_pm1_k{_JL_K}_p{_JL_PROBES}").alias("variant"),
        ((F.col("m") >= 0.85) & (F.col("m") <= 1.15)).alias(
            "median_ratio_in_bounds"
        ),
    )
