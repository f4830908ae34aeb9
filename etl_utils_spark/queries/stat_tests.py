"""Statistical-analysis & sampling pack: hypothesis tests (chi²,
Welch t, binned KS), seasonal baselines, rolling correlation,
interval-overlap concurrency, sliding distinct counts, and two exact
distributed sampling designs (bottom-k reservoir, Efraimidis–Spirakis
weighted) — the measurement layer a data-curation pipeline runs to
validate mixes, detect drift, and draw audit samples.

Scale shapes (each pinned in the docstring of its query):
- Test statistics reduce to MERGEABLE moment/count aggregates; the
  only windows run over frames bounded by category/bin cardinality,
  never the corpus.
- The concurrency sweep composes sessionize (one user-keyed shuffle)
  with the distributed ``prefix_sum`` operator (operators/ids.py) —
  the classic +1/−1 interval sweep WITHOUT the single-reducer
  ``SUM() OVER (ORDER BY ts)``.
- The reservoir sample is exact bottom-k per group at any scale: a
  threshold pre-filter (computed from exact group counts) bounds the
  survivor set, and the exact rank window runs only over survivors.

Reference parity: the reference engine (query_wrapper.sql) delegates
all analytics SQL to the host engine; these are capability-surface
queries (SURVEY.md §2 Tier C / training-data tier), each certified
against a DuckDB oracle running the same closed-form SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _md5_uniform(col: F.Column) -> F.Column:
    """Engine-portable deterministic uniform in [0,1): first 8 md5 hex
    digits as a 32-bit integer over 2^32 — an exact dyadic rational,
    so Spark and DuckDB produce bit-identical doubles."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("long")
        .cast("double")
        / 4294967296.0
    )


# ------------------------------------------------------------------ chi²
@query(
    "stats_chi2_lang_source",
    oracle="""
        WITH obs AS (SELECT lang, source, count(*)::DOUBLE AS o
                     FROM documents GROUP BY 1, 2),
             rl  AS (SELECT lang, sum(o) AS rt FROM obs GROUP BY 1),
             cl  AS (SELECT source, sum(o) AS ct FROM obs GROUP BY 1),
             n   AS (SELECT sum(o) AS n FROM obs),
             grid AS (
               SELECT rl.lang, cl.source, rl.rt * cl.ct / n.n AS e,
                      coalesce(obs.o, 0) AS o
               FROM rl CROSS JOIN cl CROSS JOIN n
               LEFT JOIN obs ON obs.lang = rl.lang AND obs.source = cl.source
             )
        SELECT CAST(SUM(CAST(floor((o - e) * (o - e) / e * 1048576.0 + 0.5)
                             AS BIGINT)) AS DOUBLE) / 1048576.0 AS chi2,
               (count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1) AS dof,
               CAST(SUM(o) AS BIGINT) AS n
        FROM grid
    """,
)
def stats_chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared test of independence for the corpus lang × source
    contingency table — the mix-drift detector for a multi-source
    training corpus.  One count aggregate (map-side combined), then all
    arithmetic runs on the |langs|×|sources| grid: margins rebuilt by
    re-aggregating the OBSERVED cells (never a second corpus scan),
    zero cells restored by the bounded cross join.  The only data that
    moves is one row per observed category pair."""
    d = _t(spark, sf_dir, "documents")
    obs = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("double").alias("o")
    )
    rl = obs.groupBy("lang").agg(F.sum("o").alias("rt"))
    cl = obs.groupBy("source").agg(F.sum("o").alias("ct"))
    n = obs.agg(F.sum("o").alias("n"))
    grid = (
        rl.crossJoin(cl)
        .crossJoin(F.broadcast(n))
        .join(obs, ["lang", "source"], "left")
        .select(
            "lang",
            "source",
            (F.col("rt") * F.col("ct") / F.col("n")).alias("e"),
            F.coalesce(F.col("o"), F.lit(0.0)).alias("o"),
        )
    )
    # Per-cell terms are deterministic shared-IEEE doubles, but their
    # SUM is summation-order-dependent: quantize each term at 2^-20
    # (shared floor expression), sum exactly, divide by the power-of-
    # two grid once — the result is an exact dyadic, bit-stable on
    # both engines with no rounding.
    term = (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")
    q = F.floor(term * 1048576.0 + 0.5).cast("long")
    return grid.agg(
        (F.sum(q).cast("double") / 1048576.0).alias("chi2"),
        (
            (F.countDistinct("lang") - F.lit(1))
            * (F.countDistinct("source") - F.lit(1))
        ).alias("dof"),
        F.sum("o").cast("long").alias("n"),
    )


# ------------------------------------------------------------- Welch t-test
@query(
    "stats_ttest_price_by_status",
    oracle="""
        WITH g AS (
          SELECT o_orderstatus AS st, count(*) AS n,
                 SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                     AS s,
                 SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                     * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                     AS sxx
          FROM orders WHERE o_orderstatus IN ('F', 'O') GROUP BY 1
        ),
        f AS (SELECT n, s, sxx FROM g WHERE st = 'F'),
        o AS (SELECT n, s, sxx FROM g WHERE st = 'O'),
        d AS (
          SELECT f.n AS nf, o.n AS no_,
                 CAST(f.s AS DOUBLE) / CAST(f.n AS DOUBLE)
                 - CAST(o.s AS DOUBLE) / CAST(o.n AS DOUBLE) AS md_c,
                 CAST(f.n * f.sxx - f.s * f.s AS DOUBLE)
                 / (CAST(f.n AS DOUBLE) * (f.n - 1) * CAST(f.n AS DOUBLE))
                     AS af,
                 CAST(o.n * o.sxx - o.s * o.s AS DOUBLE)
                 / (CAST(o.n AS DOUBLE) * (o.n - 1) * CAST(o.n AS DOUBLE))
                     AS ao
          FROM f, o
        )
        SELECT nf AS n_f, no_ AS n_o,
               md_c / 100.0 AS mean_diff,
               ROUND(md_c / sqrt(af + ao), 4) AS t_stat,
               ((af + ao) * (af + ao))
                   / (af * af / (nf - 1) + ao * ao / (no_ - 1)) AS dof
        FROM d
    """,
)
def stats_ttest_price_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test (finished vs open order prices)
    with the Welch–Satterthwaite dof: ONE moments aggregate over the
    fact table — but the moments are EXACT integer cent sums
    (n, S, Sxx), not builtin avg/var_samp, so both engines evaluate
    identical IEEE expressions (the builtin accumulators differ at the
    ulp level and a ROUND on top flips digits — the r5 rolling-corr
    red class).  a = v/n terms are each one shared division; t rounds
    4 AFTER the sqrt (irrational); mean_diff and dof are emitted
    unrounded (rationals — engine ROUND diverges on shortest-repr
    ties).  Still the A/B shape: mergeable partial aggregate, then
    closed-form arithmetic on two 1-row frames."""
    o = _t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    g = (
        o.filter(F.col("o_orderstatus").isin("F", "O"))
        .select("o_orderstatus", cents.alias("c"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c").alias("s"),
            F.sum(F.col("c").cast("decimal(18,0)") * F.col("c").cast("decimal(18,0)"))
            .alias("sxx"),
        )
    )
    f = g.filter(F.col("o_orderstatus") == "F").select(
        F.col("n").alias("nf"), F.col("s").alias("sf"), F.col("sxx").alias("sxxf")
    )
    oo = g.filter(F.col("o_orderstatus") == "O").select(
        F.col("n").alias("no_"), F.col("s").alias("so_"), F.col("sxx").alias("sxxo")
    )
    j = f.crossJoin(oo)
    md_c = F.col("sf").cast("double") / F.col("nf").cast("double") - F.col(
        "so_"
    ).cast("double") / F.col("no_").cast("double")
    sf_d = F.col("sf").cast("decimal(18,0)")
    so_d = F.col("so_").cast("decimal(18,0)")
    af = (F.col("nf") * F.col("sxxf") - sf_d * sf_d).cast("double") / (
        F.col("nf").cast("double") * (F.col("nf") - 1) * F.col("nf").cast("double")
    )
    ao = (F.col("no_") * F.col("sxxo") - so_d * so_d).cast("double") / (
        F.col("no_").cast("double") * (F.col("no_") - 1) * F.col("no_").cast("double")
    )
    return j.select(
        F.col("nf").alias("n_f"),
        F.col("no_").alias("n_o"),
        (md_c / 100.0).alias("mean_diff"),
        F.round(md_c / F.sqrt(af + ao), 4).alias("t_stat"),
        (((af + ao) * (af + ao)) / (af * af / (F.col("nf") - 1) + ao * ao / (F.col("no_") - 1))).alias(
            "dof"
        ),
    )


# ------------------------------------------------------------- binned KS
@query(
    "stats_ks_binned_prices",
    oracle="""
        WITH s AS (
          SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'a' ELSE 'b' END AS g,
                 FLOOR(o_totalprice / 2000)::BIGINT AS bin
          FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        ),
        c AS (SELECT g, bin, count(*)::DOUBLE AS n FROM s GROUP BY 1, 2),
        tot AS (SELECT g, sum(n) AS t FROM c GROUP BY 1),
        bins AS (SELECT DISTINCT bin FROM c),
        grid AS (
          SELECT b.bin, t.g, coalesce(c.n, 0) AS n, t.t
          FROM bins b CROSS JOIN tot t
          LEFT JOIN c ON c.bin = b.bin AND c.g = t.g
        ),
        cdf AS (
          SELECT bin, g,
                 SUM(n) OVER (PARTITION BY g ORDER BY bin
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     / t AS f
          FROM grid
        )
        SELECT ROUND(MAX(ABS(a.f - b.f)), 6) AS d_stat,
               (SELECT CAST(t AS BIGINT) FROM tot WHERE g = 'a') AS n_urgent,
               (SELECT CAST(t AS BIGINT) FROM tot WHERE g = 'b') AS n_low
        FROM (SELECT bin, f FROM cdf WHERE g = 'a') a
        JOIN (SELECT bin, f FROM cdf WHERE g = 'b') b USING (bin)
    """,
)
def stats_ks_binned_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov D on SHARED BINS (urgent- vs
    low-priority order prices).  The exact KS needs a global sort of
    both samples — a single-reducer stage at 100 TB; the binned form
    is the scale substitute: per-bin counts are one mergeable
    aggregate, and the ECDF cumsum window runs over the bounded bin
    frame (#bins rows), not the corpus.  Bin width 2000 bounds the
    discretization error of D at max bin mass."""
    o = _t(spark, sf_dir, "orders")
    s = o.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW")).select(
        F.when(F.col("o_orderpriority") == "1-URGENT", "a").otherwise("b").alias("g"),
        F.floor(F.col("o_totalprice") / 2000).alias("bin"),
    )
    c = s.groupBy("g", "bin").agg(F.count(F.lit(1)).cast("double").alias("n"))
    tot = c.groupBy("g").agg(F.sum("n").alias("t"))
    bins = c.select("bin").distinct()
    grid = (
        bins.crossJoin(tot)
        .join(c, ["bin", "g"], "left")
        .select("bin", "g", F.coalesce(F.col("n"), F.lit(0.0)).alias("n"), "t")
    )
    w = (
        Window.partitionBy("g")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cdf = grid.select("bin", "g", (F.sum("n").over(w) / F.col("t")).alias("f"))
    a = cdf.filter(F.col("g") == "a").select("bin", F.col("f").alias("f_a"))
    b = cdf.filter(F.col("g") == "b").select("bin", F.col("f").alias("f_b"))
    d = (
        a.join(b, "bin")
        .agg(F.round(F.max(F.abs(F.col("f_a") - F.col("f_b"))), 6).alias("d_stat"))
    )
    ta = tot.filter(F.col("g") == "a").select(F.col("t").cast("long").alias("n_urgent"))
    tb = tot.filter(F.col("g") == "b").select(F.col("t").cast("long").alias("n_low"))
    return d.crossJoin(ta).crossJoin(tb)


# -------------------------------------------------------- rolling correlation
@query(
    "stats_rolling_corr_price_qty",
    oracle="""
        WITH b AS (
          SELECT l_orderkey, l_linenumber, l_suppkey, l_partkey, l_shipdate,
                 CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS px,
                 CAST(l_quantity AS BIGINT) AS qy
          FROM lineitem
        ), w AS (
          SELECT l_orderkey, l_linenumber,
                 count(*) OVER fr AS n,
                 SUM(px) OVER fr AS sx,
                 SUM(qy) OVER fr AS sy,
                 SUM(px * qy) OVER fr AS sxy,
                 SUM(px * px) OVER fr AS sxx,
                 SUM(qy * qy) OVER fr AS syy
          FROM b
          WINDOW fr AS (PARTITION BY l_suppkey
                        ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
                        ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
        )
        SELECT l_orderkey, l_linenumber,
               CASE WHEN n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                    THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                               / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                      * CAST(n * syy - sy * sy AS DOUBLE)), 4)
                         + 0.0
               END AS rcorr
        FROM w
    """,
)
def stats_rolling_corr_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 10-row price/quantity correlation per supplier — the
    drift monitor for a joint distribution.  Window partitioned by the
    HIGH-cardinality supplier key (parallel at any scale; never a
    corpus-wide frame) with a deterministic (shipdate, orderkey,
    linenumber, partkey) total order — the fixture's (orderkey,
    linenumber) pair is NOT unique (118k duplicate groups at sf0.1),
    and the round-7 sf1 sweep caught a frame flip on the one tied
    sort key; partkey completes lineitem's unique
    (orderkey, linenumber, suppkey, partkey) key, so the frame order
    is total.  The frame moments n, Sx, Sy, Sxy, Sxx,
    Syy are EXACT BIGINT window sums over cents (price·100 and
    quantity are integer-exact), so both engines feed the identical
    IEEE inputs into one shared double expression
    (n·Sxy − Sx·Sy) / sqrt((n·Sxx − Sx²)·(n·Syy − Sy²)) and the
    round-after-sqrt is hash-stable — engine-builtin covar/stddev
    accumulate differently at the ulp level and are NOT (the r5
    driver red this replaces).  Degenerate frames yield NULL
    identically on both engines."""
    l = _t(spark, sf_dir, "lineitem")
    base = l.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        "l_partkey",
        "l_shipdate",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("px"),
        F.col("l_quantity").cast("long").alias("qy"),
    )
    fr = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_partkey")
        .rowsBetween(-9, Window.currentRow)
    )
    w = base.select(
        "l_orderkey",
        "l_linenumber",
        F.count(F.lit(1)).over(fr).alias("n"),
        F.sum("px").over(fr).alias("sx"),
        F.sum("qy").over(fr).alias("sy"),
        F.sum(F.col("px") * F.col("qy")).over(fr).alias("sxy"),
        F.sum(F.col("px") * F.col("px")).over(fr).alias("sxx"),
        F.sum(F.col("qy") * F.col("qy")).over(fr).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    rcorr = F.when(
        (F.col("n") >= 2) & (dx > 0) & (dy > 0),
        # + 0.0 canonicalizes IEEE negative zero (DuckDB's ROUND keeps
        # the sign of -0.00002 → -0.0; Spark's emits +0.0) — identity
        # for every other value on both engines.
        F.round(
            num.cast("double") / F.sqrt(dx.cast("double") * dy.cast("double")), 4
        )
        + F.lit(0.0),
    )
    return w.select("l_orderkey", "l_linenumber", rcorr.alias("rcorr"))


# ------------------------------------------------------- seasonal baseline
@query(
    "seasonal_hourly_baseline",
    oracle="""
        WITH b AS (
          SELECT event_type, EXTRACT(hour FROM ts)::BIGINT AS hr,
                 count(*) AS n,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mu,
                 sqrt(greatest(0,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))
                            * CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                   - (CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*))
                     * (CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*))
                 )) AS sigma
          FROM events GROUP BY 1, 2
        )
        SELECT e.event_type AS event_type, b.hr AS hr,
               ROUND(b.mu * b.n, 2) AS sum_value, ROUND(b.sigma, 4) AS sigma,
               b.n AS n,
               CAST(SUM(CASE WHEN e.value > b.mu + 3 * b.sigma
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM events e
        JOIN b ON b.event_type = e.event_type AND b.hr = EXTRACT(hour FROM e.ts)
        GROUP BY 1, 2, 3, 4, 5
    """,
)
def seasonal_hourly_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal baseline per event type (sum/sigma/n) with a
    3-sigma residual outlier count — seasonal-profile anomaly
    detection.  The baseline is a 24×|types| aggregate joined back by
    BROADCAST (a window partitioned by (type, hour) would funnel the
    corpus into 120 reducers).  The moments are built from EXACT
    decimal sums (value is 2-decimal; avg of a few currency values
    lands exactly on 4-decimal round boundaries, where cross-engine
    summation-order ulps flip the rounding — sum exactly, then do the
    identical double arithmetic on both engines)."""
    e = _t(spark, sf_dir, "events")
    hr = F.hour("ts").alias("hr")
    vdec = F.col("value").cast("decimal(18,2)")
    cnt = F.count(F.lit(1))
    mu = F.sum(vdec).cast("double") / cnt
    sumsq = F.sum(vdec * vdec).cast("double")
    sigma = F.sqrt(F.greatest(F.lit(0.0), sumsq / cnt - mu * mu))
    b = e.groupBy("event_type", hr).agg(
        mu.alias("mu"),
        sigma.alias("sigma"),
        cnt.alias("n"),
    )
    joined = e.select("event_type", hr, "value").join(
        F.broadcast(b), ["event_type", "hr"]
    )
    return (
        joined.groupBy("event_type", "hr")
        .agg(
            F.round(F.max("mu") * F.max("n"), 2).alias("sum_value"),
            F.round(F.max("sigma"), 4).alias("sigma"),
            F.max("n").alias("n"),
            F.sum(
                F.when(F.col("value") > F.col("mu") + 3 * F.col("sigma"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )


# --------------------------------------------------- interval concurrency
@query(
    "max_concurrent_sessions",
    oracle="""
        WITH ordered AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id,
                   SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS session_seq,
                   ts
            FROM ordered
        ),
        bounds AS (
            SELECT user_id, session_seq,
                   epoch_us(min(ts)) AS s_us, epoch_us(max(ts)) + 1 AS e_us
            FROM sess GROUP BY 1, 2
        ),
        deltas AS (
            SELECT s_us AS us, 1 AS d FROM bounds
            UNION ALL
            SELECT e_us, -1 FROM bounds
        ),
        net AS (SELECT us, SUM(d)::BIGINT AS net FROM deltas GROUP BY 1),
        run AS (
            SELECT us, SUM(net) OVER (ORDER BY us
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS conc
            FROM net
        ),
        m AS (SELECT MAX(conc) AS mx FROM run)
        SELECT CAST(m.mx AS BIGINT) AS max_concurrent,
               CAST(MIN(run.us) AS BIGINT) AS at_us
        FROM run, m WHERE run.conc = m.mx GROUP BY 1
    """,
)
def max_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak session concurrency (and the earliest microsecond instant
    it occurs): the classic +1/−1 interval sweep — sessionize gives
    [start, end] bounds per (user, session); half-open end+1µs deltas
    aggregate to a NET change per distinct timestamp; the running sum
    over that axis is concurrency.  The oracle's ``SUM() OVER (ORDER
    BY us)`` is exactly the single-reducer global sort this
    implementation avoids: the distributed ``prefix_sum``
    (operators/ids.py — literal sketch boundaries, per-bucket Arrow
    cumsum, driver-bounded offsets) computes the identical values with
    no single-partition stage."""
    from etl_utils_spark.operators.ids import prefix_sum
    from etl_utils_spark.operators.sessionize import session_stats

    e = _t(spark, sf_dir, "events")
    bounds = session_stats(e, gap_seconds=1800).select(
        F.unix_micros("session_start").alias("s_us"),
        (F.unix_micros("session_end") + 1).alias("e_us"),
    )
    deltas = bounds.select(F.col("s_us").alias("us"), F.lit(1).alias("d")).unionAll(
        bounds.select(F.col("e_us").alias("us"), F.lit(-1).alias("d"))
    )
    # prefix_sum makes three passes over its input (boundary sketch,
    # bucket totals, cumsum); materialize the bounded net frame once
    # (≤ 2·#sessions rows) so each pass reads flat blocks instead of
    # re-executing the sessionize window lineage.
    net = (
        deltas.groupBy("us")
        .agg(F.sum("d").cast("long").alias("net"))
        .localCheckpoint(eager=True)
    )
    # r13: `run` has TWO consumers (the max subquery and the final
    # join) — without a checkpoint the whole prefix machinery (bucket
    # window + totals + offsets join) executes twice per action.  Lazy
    # (no job at construction); blocks materialize at first use and the
    # second consumer reads them (guide §1.2).
    run = prefix_sum(net, order_col="us", value_col="net", out_col="conc")
    run = run.localCheckpoint(eager=False)
    m = run.agg(F.max("conc").alias("mx"))
    return (
        run.join(F.broadcast(m), run["conc"] == m["mx"])
        .agg(
            F.max("mx").alias("max_concurrent"),
            F.min("us").alias("at_us"),
        )
    )


# ------------------------------------------------- sliding distinct users
@query(
    "sliding_distinct_users_7d",
    oracle="""
        WITH ud AS (SELECT DISTINCT user_id,
                           CAST(date_trunc('day', ts) AS DATE) AS d
                    FROM events),
        exp AS (
          SELECT user_id, d + i::INTEGER AS window_end
          FROM ud, LATERAL (SELECT unnest(generate_series(0, 6)) AS i) t
        ),
        dd AS (SELECT DISTINCT user_id, window_end FROM exp)
        SELECT window_end, count(*) AS n_users FROM dd GROUP BY 1
    """,
)
def sliding_distinct_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day — the windowed
    COUNT(DISTINCT) no window function can express (distinctness must
    hold across the frame).  Scale shape: dedup to (user, day) grain
    first (the big shrink), replicate each pair to the ≤7 windows it
    belongs to, dedup again, count — three hash shuffles, all linear,
    no sort, no per-window state."""
    e = _t(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    exp = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        "d",
    ).select("user_id", F.date_add(F.col("d"), F.col("i").cast("int")).alias("window_end"))
    return (
        exp.distinct()
        .groupBy("window_end")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ------------------------------------------------------ reservoir sample
_RESERVOIR_K = 20
_RESERVOIR_OVER = 8  # oversample factor for the threshold pre-filter


@query(
    "sample_reservoir_per_type",
    oracle=f"""
        WITH u AS (
          SELECT event_type, event_id,
                 CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
                      AS DOUBLE) / 4294967296.0 AS u
          FROM events
        ),
        n AS (SELECT event_type, count(*)::DOUBLE AS n FROM u GROUP BY 1),
        surv AS (
          SELECT u.* FROM u JOIN n USING (event_type)
          WHERE u.u < LEAST(1.0, {_RESERVOIR_K * _RESERVOIR_OVER}.0 / n.n)
        ),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY u, event_id) AS r
          FROM surv
        )
        SELECT event_type, event_id, u FROM ranked WHERE r <= {_RESERVOIR_K}
    """,
)
def sample_reservoir_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform k-sample per group (k=20) — the
    distributed reservoir: keeping the k SMALLEST md5-uniform keys per
    group is an exchangeable uniform draw, and bottom-k by hash is a
    mergeable sketch.  The rank window never sees the corpus: a
    threshold pre-filter u < k·8/n (exact per-group counts from one
    aggregate, broadcast back) bounds survivors to ~k·8 per group
    first.  The u column is an exact dyadic rational — bit-identical
    across engines."""
    e = _t(spark, sf_dir, "events")
    u = e.select("event_type", "event_id", _md5_uniform(F.col("event_id")).alias("u"))
    n = u.groupBy("event_type").agg(F.count(F.lit(1)).cast("double").alias("n"))
    thresh = F.least(F.lit(1.0), F.lit(float(_RESERVOIR_K * _RESERVOIR_OVER)) / F.col("n"))
    surv = u.join(F.broadcast(n), "event_type").filter(F.col("u") < thresh)
    w = Window.partitionBy("event_type").orderBy("u", "event_id")
    return (
        surv.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= _RESERVOIR_K)
        .select("event_type", "event_id", "u")
    )


# --------------------------------------------- higher moments (skew/kurt)
@query(
    "stats_skew_kurtosis_by_type",
    oracle="""
        WITH i AS (
          SELECT event_type,
                 CAST(ROUND(value * 100) AS HUGEINT) AS v2
          FROM events
        ),
        s AS (
          SELECT event_type, count(*) AS n,
                 CAST(SUM(v2) AS DOUBLE) / 1e2 AS s1,
                 CAST(SUM(v2 * v2) AS DOUBLE) / 1e4 AS s2,
                 CAST(SUM(v2 * v2 * v2) AS DOUBLE) / 1e6 AS s3,
                 CAST(SUM(v2 * v2 * v2 * v2) AS DOUBLE) / 1e8 AS s4
          FROM i GROUP BY 1
        ),
        m AS (
          SELECT event_type, n,
                 s1 / n AS mu,
                 s2 / n - (s1 / n) * (s1 / n) AS m2,
                 s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
                 s4 / n - 4 * (s1 / n) * (s3 / n)
                        + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                        - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
          FROM s
        )
        SELECT event_type, n,
               ROUND(m3 / pow(m2, 1.5), 4) AS skewness,
               ROUND(m4 / (m2 * m2) - 3, 4) AS excess_kurtosis
        FROM m
    """,
)
def stats_skew_kurtosis_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis of value per event type
    — distribution-shape profiling for drift baselines.  Built from
    EXACT integer-scaled power sums S1..S4: value is 2-decimal, so
    100·v is an exact integer, and every power is taken in DECIMAL
    (cast BEFORE the products — a long 4th power wraps as soon as a
    single value exceeds ~$551, which the round-7 sf0.1 bitwise probe
    hit as an ANSI ARITHMETIC_OVERFLOW).  The binding ceiling is the
    4th-power product, not the (12,0) cast: c^4 must fit decimal(38,0),
    so cents stay below 10^9.5 ≈ 3.16e9 — values to ~$3.16e7 per row
    (ANSI raises loudly past that, never silently).  Within that bound
    the sums are exact to ~1e10 rows of maximal magnitude.  The
    oracle orders the same way (HUGEINT cast before its products).  Sums run
    in 128-bit exact arithmetic because the engines' built-in
    skewness/kurtosis aggregates use different estimators and
    accumulation orders and would diverge.  After the exact sums cast
    to double (same IEEE nearest on both engines), the arithmetic is
    identical and the rounding sits after pow/division
    (irrational-safe).  One mergeable aggregate, 5 output rows."""
    e = _t(spark, sf_dir, "events")
    v2 = F.round(F.col("value") * 100, 0).cast("long")
    i = e.select("event_type", v2.alias("v2"))
    vd = F.col("v2").cast("decimal(12,0)")
    cnt = F.count(F.lit(1))
    s = i.groupBy("event_type").agg(
        cnt.alias("n"),
        (F.sum(vd).cast("double") / 1e2).alias("s1"),
        (F.sum(vd * vd).cast("double") / 1e4).alias("s2"),
        (F.sum(vd * vd * vd).cast("double") / 1e6).alias("s3"),
        (F.sum(vd * vd * vd * vd).cast("double") / 1e8).alias("s4"),
    )
    mu = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mu * mu
    m3 = F.col("s3") / F.col("n") - 3 * mu * (F.col("s2") / F.col("n")) + 2 * mu * mu * mu
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * mu * (F.col("s3") / F.col("n"))
        + 6 * mu * mu * (F.col("s2") / F.col("n"))
        - 3 * mu * mu * mu * mu
    )
    return s.select(
        "event_type",
        "n",
        F.round(m3 / F.pow(m2, 1.5), 4).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3, 4).alias("excess_kurtosis"),
    )


# ------------------------------------------------- exact order statistics
@query(
    "exact_quantiles_orders",
    oracle="""
        SELECT quantile_disc(o_totalprice, 0.5) AS p50,
               quantile_disc(o_totalprice, 0.9) AS p90,
               quantile_disc(o_totalprice, 0.99) AS p99
        FROM orders
    """,
)
def exact_quantiles_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p50/p90/p99 of order prices (discrete order-statistic
    semantics) — not the approx sketch: operators/order_stats.py
    brackets each target rank with one percentile sketch, verifies the
    bracket with exact rank counts, and selects inside the bounded
    bracket via per-partition top-k heaps; recursion keeps the final
    selection bounded at any corpus size.  No global sort anywhere.
    The outputs are ACTUAL data values, so the cross-engine match is
    bit-exact with no rounding."""
    from etl_utils_spark.operators.order_stats import exact_quantiles

    o = _t(spark, sf_dir, "orders")
    # r12: one shared count + one shared sketch + one shared bracket
    # verification for all three targets (3 independent searches paid
    # 3x the full passes before); per-target work is only the bounded
    # in-bracket selection.
    vals = exact_quantiles(o, "o_totalprice", [0.5, 0.9, 0.99])
    return spark.createDataFrame([tuple(vals)], "p50 double, p90 double, p99 double")


# ---------------------------------------------- weighted exact quantiles
@query(
    "weighted_median_price_by_qty",
    oracle="""
        WITH w AS (
          SELECT l_extendedprice AS x, CAST(l_quantity AS BIGINT) AS wt
          FROM lineitem WHERE l_quantity > 0
        ),
        agg AS (SELECT x, sum(wt) AS wx FROM w GROUP BY 1),
        tot AS (SELECT sum(wx) AS tw FROM agg),
        cum AS (SELECT x, SUM(wx) OVER (ORDER BY x
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
                FROM agg)
        SELECT (SELECT min(x) FROM cum, tot WHERE cw * 2 >= tw) AS w_median,
               (SELECT min(x) FROM cum, tot WHERE cw * 10 >= 9 * tw) AS w_p90
    """,
)
def weighted_median_price_by_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted exact median and p90 of unit prices — the
    robust weighted centre ("price of the median UNIT sold", not the
    median line).  operators/order_stats.py:weighted_quantile: one
    (value → weight-sum) aggregate, the distributed prefix sum over
    the value order, and an integer-exact rank test (cw·den ≥ num·W —
    no float thresholds anywhere).  The oracle's cumulative window is
    the single-reducer stage the operator avoids.  Outputs are actual
    data values — bit-exact."""
    from etl_utils_spark.operators.order_stats import weighted_quantiles

    l = _t(spark, sf_dir, "lineitem")
    med, p90 = weighted_quantiles(
        l, "l_extendedprice", "l_quantity", [(1, 2), (9, 10)]
    )
    return spark.createDataFrame([(med, p90)], "w_median double, w_p90 double")


@query(
    "exact_percentile_cont_orders",
    oracle="""
        WITH v AS (SELECT o_totalprice AS x FROM orders),
        n AS (SELECT count(*) AS cnt FROM v),
        r AS (SELECT x, row_number() OVER (ORDER BY x) AS rn FROM v),
        k AS (SELECT CAST(FLOOR((cnt - 1) * CAST(0.9 AS DOUBLE)) AS BIGINT) AS k,
                     (cnt - 1) * CAST(0.9 AS DOUBLE)
                         - FLOOR((cnt - 1) * CAST(0.9 AS DOUBLE)) AS frac
              FROM n)
        SELECT (SELECT x FROM r, k WHERE rn = k.k + 1)
               + ((SELECT x FROM r, k, n WHERE rn = LEAST(k.k + 2, n.cnt))
                  - (SELECT x FROM r, k WHERE rn = k.k + 1))
                 * (SELECT frac FROM k) AS p90_cont,
               (SELECT CAST(cnt AS BIGINT) FROM n) AS n
    """,
)
def exact_percentile_cont_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated (percentile_cont) p90 of order prices at
    scale: the k and k+1 order statistics come from
    operators/order_stats.py:exact_rank (sketch-bracket + verified
    rank counts, no global sort), then one interpolation a+(b−a)·frac
    — the IDENTICAL double arithmetic on both engines (the oracle's
    0.9 is cast to DOUBLE so frac is the same IEEE value, and a/b are
    exact 2-decimal data values).  Emitted unrounded."""
    from etl_utils_spark.operators.order_stats import exact_ranks

    o = _t(spark, sf_dir, "orders")
    vals = o.select("o_totalprice").filter(F.col("o_totalprice").isNotNull())
    n = vals.count()
    rank = (n - 1) * 0.9
    k = int(rank)
    frac = rank - k
    # r12: both order statistics share one sketch + one verification
    # pass (exact_ranks) instead of two independent bracket searches.
    a, b = exact_ranks(o, "o_totalprice", [k, min(k + 1, n - 1)], n_hint=n)
    return spark.createDataFrame(
        [(a + (b - a) * frac, n)], "p90_cont double, n bigint"
    )


# ------------------------------------------- grouped exact median (disc)
@query(
    "grouped_median_prices_by_priority",
    oracle="""
        SELECT o_orderpriority, quantile_disc(o_totalprice, 0.5) AS median_price,
               count(*) AS n
        FROM orders GROUP BY 1
    """,
)
def grouped_median_prices_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group median (discrete order-statistic semantics) for
    LOW-cardinality groups — the case where ``percentile`` via a
    window partitioned by the group key funnels the corpus into
    |groups| reducers.  Scale shape instead: one (group, value) count
    aggregate (bounded by distinct values), a cumulative window over
    that BOUNDED frame, and the median is the smallest value whose
    cumulative count passes the target rank — selected with one more
    tiny aggregate.  Only counts ever shuffle."""
    o = _t(spark, sf_dir, "orders")
    c = o.groupBy("o_orderpriority", "o_totalprice").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = c.select(
        "o_orderpriority",
        "o_totalprice",
        F.sum("c").over(w).alias("cum"),
    )
    tot = c.groupBy("o_orderpriority").agg(F.sum("c").alias("n"))
    # 0-based target rank floor((n-1)/2); median = min value with
    # cum >= target+1
    j = cum.join(F.broadcast(tot), "o_orderpriority").filter(
        F.col("cum") >= F.floor((F.col("n") - 1) / 2) + 1
    )
    return j.groupBy("o_orderpriority").agg(
        F.min("o_totalprice").alias("median_price"),
        F.max("n").alias("n"),
    )


# ---------------------------------------------- weighted (E–S) sampling
@query(
    "sample_weighted_docs_es",
    oracle="""
        WITH k AS (
          SELECT doc_id, n_chars,
                 -ln(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                          AS DOUBLE) / 4294967296.0 + 1e-12) / n_chars AS es_key
          FROM documents
        )
        SELECT doc_id, n_chars, ROUND(es_key, 9) AS es_key
        FROM k ORDER BY es_key, doc_id LIMIT 50
    """,
)
def sample_weighted_docs_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    2006): k=50 docs with probability ∝ n_chars, via the exponential
    reformulation key = −ln(u)/w with the deterministic md5-uniform u
    (+1e-12 guards ln(0)).  Bottom-k by key is a TakeOrdered top-k —
    per-partition heaps merged on the driver, never a global sort;
    (key, doc_id) gives a total order."""
    d = _t(spark, sf_dir, "documents")
    u = _md5_uniform(F.col("doc_id"))
    key = -F.log(u + F.lit(1e-12)) / F.col("n_chars")
    return (
        d.select("doc_id", "n_chars", key.alias("es_key"))
        .orderBy("es_key", "doc_id")
        .limit(50)
        .select("doc_id", "n_chars", F.round("es_key", 9).alias("es_key"))
    )


@query(
    "stats_cramers_v_lang_source",
    oracle="""
        WITH obs AS (SELECT lang, source, count(*)::DOUBLE AS o
                     FROM documents GROUP BY 1, 2),
             rl  AS (SELECT lang, sum(o) AS rt FROM obs GROUP BY 1),
             cl  AS (SELECT source, sum(o) AS ct FROM obs GROUP BY 1),
             n   AS (SELECT sum(o) AS n FROM obs),
             grid AS (
               SELECT rl.lang, cl.source, rl.rt * cl.ct / n.n AS e,
                      coalesce(obs.o, 0) AS o
               FROM rl CROSS JOIN cl CROSS JOIN n
               LEFT JOIN obs ON obs.lang = rl.lang AND obs.source = cl.source
             )
        SELECT ROUND(sqrt(CAST(SUM(CAST(floor((o - e) * (o - e) / e
                                              * 1048576.0 + 0.5) AS BIGINT))
                               AS DOUBLE) / 1048576.0
                          / (SUM(o) * least(count(DISTINCT lang) - 1,
                                            count(DISTINCT source) - 1))), 6)
                   AS cramers_v,
               CAST(SUM(o) AS BIGINT) AS n
        FROM grid
    """,
)
def stats_cramers_v_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size for the lang × source association — the
    [0,1]-normalized companion to stats_chi2_lang_source (a chi²
    p-value says WHETHER the mix drifts with source; V says HOW MUCH,
    comparably across table sizes).  Identical bounded-grid shape: one
    count aggregate, margins from the observed cells, all arithmetic
    on the |langs|×|sources| grid; sqrt is the irrational map → round
    6 after it (docs/SCALE.md)."""
    d = _t(spark, sf_dir, "documents")
    obs = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("double").alias("o")
    )
    rl = obs.groupBy("lang").agg(F.sum("o").alias("rt"))
    cl = obs.groupBy("source").agg(F.sum("o").alias("ct"))
    n = obs.agg(F.sum("o").alias("n"))
    grid = (
        rl.crossJoin(cl)
        .crossJoin(F.broadcast(n))
        .join(obs, ["lang", "source"], "left")
        .select(
            "lang",
            "source",
            (F.col("rt") * F.col("ct") / F.col("n")).alias("e"),
            F.coalesce(F.col("o"), F.lit(0.0)).alias("o"),
        )
    )
    term = (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")
    q = F.floor(term * 1048576.0 + 0.5).cast("long")
    return grid.agg(
        F.round(
            F.sqrt(
                F.sum(q).cast("double") / 1048576.0
                / (
                    F.sum("o")
                    * F.least(
                        F.countDistinct("lang") - F.lit(1),
                        F.countDistinct("source") - F.lit(1),
                    )
                )
            ),
            6,
        ).alias("cramers_v"),
        F.sum("o").cast("long").alias("n"),
    )


@query(
    "stats_brown_forsythe_components",
    oracle="""
        WITH c AS (
            SELECT o_orderpriority,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS xc
            FROM orders
        ),
        med AS (
            SELECT o_orderpriority, quantile_disc(xc, 0.5) AS medc
            FROM c GROUP BY o_orderpriority
        ),
        z AS (
            SELECT c.o_orderpriority, abs(c.xc - m.medc) AS zc
            FROM c JOIN med m USING (o_orderpriority)
        )
        SELECT o_orderpriority,
               count(*)::BIGINT AS n,
               CAST(SUM(zc) AS DOUBLE)
                   / CAST(100 * count(*) AS DOUBLE) AS mean_z,
               CAST(SUM(zc * zc) AS DOUBLE) / 100000000.0 AS sum_z2
        FROM z GROUP BY o_orderpriority
    """,
)
def stats_brown_forsythe_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity components per group:
    |x − group median| deviations (the robust Levene variant) reduced
    to (n, mean deviation, deviation-square sum).  All moments accrue
    as SCALE-0 integers (cents): a scaled decimal with its underlying
    integer past 2^53 casts to double differently across engines
    (DuckDB divides after an inexact int128→double, Java BigDecimal
    rounds once — the round-7 bitwise sweep caught exactly that 1-ulp
    split on the old scale-4 sum), while scale-0 decimal/HUGEINT →
    double casts are driver-proven identical (the r6 exact-moments
    pattern).  The grid divisions (100·n, 10^8) are single shared IEEE
    expressions on both engines.  Median via the bounded count-frame
    decomposition, then one hash aggregate.

    r12 shape: the (priority, price-cent) count frame is built once,
    checkpointed, and EVERY face reads it — the median decomposition as
    before, and the deviation moments as count-weighted sums
    (Σ_rows |x−med| = Σ_values |x−med|·c, exact integers either way).
    The old shape re-scanned orders for the cum/tot branches and a
    third time for the deviation pass."""
    o = _t(spark, sf_dir, "orders")
    xc = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    c = (
        o.select("o_orderpriority", xc.alias("xc"))
        .groupBy("o_orderpriority", "xc")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("xc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = c.select("o_orderpriority", "xc", F.sum("c").over(w).alias("cum"))
    tot = c.groupBy("o_orderpriority").agg(F.sum("c").alias("n"))
    med = (
        cum.join(F.broadcast(tot), "o_orderpriority")
        .filter(F.col("cum") >= F.floor((F.col("n") - 1) / 2) + 1)
        .groupBy("o_orderpriority")
        .agg(F.min("xc").alias("medc"))
    )
    z = c.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        F.abs(F.col("xc") - F.col("medc")).alias("zc"),
        "c",
    )
    # decimal(18,0) BEFORE the product — zc² ≤ ~2e15 per row is long-safe
    # but the SUM is not (wraps past ~4600 rows/group at sf0.1 scale)
    zd = F.col("zc").cast("decimal(18,0)")
    return z.groupBy("o_orderpriority").agg(
        F.sum("c").cast("long").alias("n"),
        (
            F.sum(zd * F.col("c")).cast("double")
            / (F.lit(100) * F.sum("c")).cast("double")
        ).alias("mean_z"),
        (F.sum(zd * zd * F.col("c")).cast("double") / F.lit(1e8)).alias(
            "sum_z2"
        ),
    )
