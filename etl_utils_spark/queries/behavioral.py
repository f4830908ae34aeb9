"""Behavioral / customer-lifecycle analytics pack (round 4).

Reference parity: the reference wrapper (`query_wrapper.sql`) delegates
arbitrary SQL to the host engine; these queries exercise the analytics
SQL surface a reference user runs through `query()` — segmentation,
inequality metrics, robust means, survival curves, inter-event timing,
and calendar arithmetic — each re-expressed as declarative DataFrame
plans with an exact DuckDB oracle.

Scale notes (100 TB posture):
- Everything here is hash-aggregate + window-over-key work: one shuffle
  per grouping key, no cartesian products, no driver-side loops.
- Windows partition by bounded keys (customer, nation, priority,
  event_type) so state per task stays small; global scalars (horizon,
  totals) are 1-row aggregates broadcast into the plan.
- Determinism: every ntile/rank orders by (rounded value, unique id) so
  both engines produce identical tile assignments; float outputs are
  rounded on BOTH sides per the registry contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table as _t


@query(
    "rfm_segmentation",
    oracle="""
        WITH ref AS (SELECT max(o_orderdate) AS r0 FROM orders),
        base AS (
            SELECT o_custkey AS c_custkey,
                   date_diff('day', max(o_orderdate), (SELECT r0 FROM ref))
                       AS recency_days,
                   CAST(count(*) AS BIGINT) AS frequency,
                   CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                 AS BIGINT)) AS DOUBLE) / 100.0 AS monetary
            FROM orders GROUP BY o_custkey
        ),
        scored AS (
            SELECT *,
                   ntile(4) OVER (ORDER BY recency_days ASC, c_custkey) AS r_score,
                   ntile(4) OVER (ORDER BY frequency DESC, c_custkey) AS f_score,
                   ntile(4) OVER (ORDER BY monetary DESC, c_custkey) AS m_score
            FROM base
        )
        SELECT c_custkey, recency_days, frequency, monetary,
               r_score, f_score, m_score,
               CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm_cell
        FROM scored
    """,
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency/frequency/monetary) customer segmentation: one hash
    aggregate per customer, then three ntile(4) windows with unique-key
    tie-breaks so tile edges are engine-independent.  The global
    reference date is a 1-row aggregate joined broadcast-style — no
    second scan of orders."""
    o = _t(spark, sf_dir, "orders")
    ref = o.agg(F.max("o_orderdate").alias("r0"))
    base = (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            (
                F.sum(
                    (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
                ).cast("double")
                / 100.0
            ).alias("monetary"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "c_custkey",
            F.datediff(F.col("r0"), F.col("last_order")).alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    scored = base.select(
        "*",
        F.ntile(4).over(Window.orderBy(F.asc("recency_days"), "c_custkey")).alias("r_score"),
        F.ntile(4).over(Window.orderBy(F.desc("frequency"), "c_custkey")).alias("f_score"),
        F.ntile(4).over(Window.orderBy(F.desc("monetary"), "c_custkey")).alias("m_score"),
    )
    return scored.withColumn(
        "rfm_cell",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")).cast("long"),
    )


@query(
    "gini_spend_by_nation",
    oracle="""
        WITH spend AS (
            SELECT c.c_nationkey, o.o_custkey,
                   SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                            AS BIGINT)) AS sc
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT c_nationkey, sc,
                   row_number() OVER (
                       PARTITION BY c_nationkey ORDER BY sc, o_custkey
                   ) AS i
            FROM spend
        )
        SELECT n.n_name,
               CAST(count(*) AS BIGINT) AS n_customers,
               2.0 * CAST(SUM(CAST(i AS HUGEINT) * sc) AS DOUBLE)
                   / (CAST(count(*) AS DOUBLE) * CAST(SUM(sc) AS DOUBLE))
                   - (CAST(count(*) AS DOUBLE) + 1.0)
                     / CAST(count(*) AS DOUBLE) AS gini
        FROM ranked r JOIN nation n ON r.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
)
def gini_spend_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend inequality per nation via the
    rank formula G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over ascending
    spend — a window rank + one aggregate, no pairwise |x_i - x_j| join
    (the naive formulation is O(n^2) and unusable at scale).  Spend is
    EXACT integer cents end-to-end: the rank order, the rank-weighted
    sum Σi·s and the spend sum are all exact integers (decimal sums —
    rank products pass int64 at scale), and the Gini is one shared
    IEEE expression emitted unrounded (the cents scale cancels in
    2Σis/(nΣs)); a float spend sum would be summation-order-dependent
    on both the value and the tie order."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            ).alias("sc")
        )
    )
    ranked = spend.select(
        "c_nationkey",
        "sc",
        F.row_number()
        .over(Window.partitionBy("c_nationkey").orderBy("sc", "o_custkey"))
        .alias("i"),
    )
    n_d = F.count(F.lit(1)).cast("double")
    sis = F.sum(F.col("i").cast("decimal(18,0)") * F.col("sc").cast("decimal(18,0)"))
    return (
        ranked.join(F.broadcast(n), ranked.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (
                2.0 * sis.cast("double") / (n_d * F.sum("sc").cast("double"))
                - (n_d + 1.0) / n_d
            ).alias("gini"),
        )
    )


@query(
    "trimmed_mean_prices_by_priority",
    oracle="""
        WITH ranked AS (
            SELECT o_orderpriority, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY o_totalprice, o_orderkey
                   ) AS rn,
                   count(*) OVER (PARTITION BY o_orderpriority) AS n
            FROM orders
        )
        SELECT o_orderpriority,
               CAST(max(n) AS BIGINT) AS n_orders,
               CAST(count(*) AS BIGINT) AS n_kept,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS DOUBLE)
                   / (CAST(count(*) AS DOUBLE) * 100.0) AS trimmed_mean
        FROM ranked
        WHERE rn > n // 10 AND rn <= n - n // 10
        GROUP BY o_orderpriority
    """,
)
def trimmed_mean_prices_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% two-sided trimmed mean of order prices per priority — the
    robust-mean building block: rank within group (unique-key ordered),
    drop the floor(n/10) extremes on each side, average the middle.
    One window + one aggregate; the trim bound is integer arithmetic so
    both engines drop identical row sets."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wc = Window.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    kept = ranked.filter(
        (F.col("rn") > F.floor(F.col("n") / 10))
        & (F.col("rn") <= F.col("n") - F.floor(F.col("n") / 10))
    )
    _cents_mean = (
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .cast("double")
        / (F.count(F.lit(1)).cast("double") * 100.0)
    )
    return kept.groupBy("o_orderpriority").agg(
        F.max("n").cast("long").alias("n_orders"),
        F.count(F.lit(1)).alias("n_kept"),
        _cents_mean.alias("trimmed_mean"),
    )


@query(
    "kaplan_meier_user_churn",
    oracle="""
        WITH horizon AS (SELECT max(ts) AS h FROM events),
        users AS (
            SELECT user_id,
                   (epoch_us(max(ts)) - epoch_us(min(ts))) // 86400000000
                       AS duration_days,
                   CASE WHEN (SELECT epoch_us(h) FROM horizon) - epoch_us(max(ts))
                             > 86400000000
                        THEN 1 ELSE 0 END AS churned
            FROM events GROUP BY user_id
        ),
        deaths AS (
            SELECT duration_days AS t, CAST(count(*) AS BIGINT) AS d
            FROM users WHERE churned = 1 GROUP BY duration_days
        ),
        risk AS (
            SELECT d.t, d.d,
                   (SELECT CAST(count(*) AS BIGINT) FROM users u
                    WHERE u.duration_days >= d.t) AS n
            FROM deaths d
        )
        SELECT t AS duration_days, n AS n_risk, d AS n_events,
               round(exp(CAST(sum(CAST(floor(ln(1.0 - CAST(d AS DOUBLE) / n)
                                             * 1073741824.0 + 0.5) AS BIGINT))
                              OVER (ORDER BY t) AS DOUBLE) / 1073741824.0), 6)
                   AS survival
        FROM risk
    """,
)
def kaplan_meier_user_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve over user lifetimes (churn = no
    events in the final DAY of the observation window — the fixture's
    event cadence makes >1 idle day a real dropout signal, and the
    tighter cutoff keeps the death set NON-EMPTY at every SF so the
    oracle row is never vacuous; others are right-censored).  S(t) = prod(1 - d_i/n_i) computed as
    exp(cumsum(ln(...))) — a window aggregate, since neither engine has
    a product window.  The risk-set join is deaths x users bounded by
    the distinct-duration count (days in the window), so the non-equi
    join broadcast-fans a tiny death-time table — no all-pairs."""
    e = _t(spark, sf_dir, "events")
    h = e.agg(F.max(F.unix_micros("ts")).alias("h_us"))
    users = (
        e.groupBy("user_id")
        .agg(
            F.min(F.unix_micros("ts")).alias("first_us"),
            F.max(F.unix_micros("ts")).alias("last_us"),
        )
        .crossJoin(F.broadcast(h))
        .select(
            "user_id",
            ((F.col("last_us") - F.col("first_us")) / F.lit(86400000000))
            .cast("long")
            .alias("duration_days"),
            F.when(
                (F.col("h_us") - F.col("last_us")) > 86400000000, 1
            )
            .otherwise(0)
            .alias("churned"),
        )
    )
    deaths = (
        users.filter(F.col("churned") == 1)
        .groupBy(F.col("duration_days").alias("t"))
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # risk set: non-equi join of the (bounded, broadcastable) death-time
    # table against user durations
    risk = (
        users.join(F.broadcast(deaths), users.duration_days >= deaths.t)
        .groupBy("t", "d")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy("t")
    return risk.select(
        F.col("t").alias("duration_days"),
        F.col("n").alias("n_risk"),
        F.col("d").alias("n_events"),
        # Each hazard term ln(1 - d/n) is 2^-30-quantized before the
        # ordered cumulative sum: engines accumulate windowed float
        # sums in different orders (segment tree vs sequential), so
        # raw-double cumsums drift at the ulp level; the integer
        # cumsum is exact, and round 6 sits after the irrational exp.
        F.round(
            F.exp(
                F.sum(
                    F.floor(
                        F.log(1.0 - F.col("d").cast("double") / F.col("n"))
                        * 1073741824.0
                        + 0.5
                    ).cast("long")
                )
                .over(w)
                .cast("double")
                / 1073741824.0
            ),
            6,
        ).alias("survival"),
    )


@query(
    "interevent_gap_deciles",
    oracle="""
        WITH gaps AS (
            SELECT event_type, event_id,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS gap_us
            FROM events
        ),
        tiled AS (
            SELECT event_type, gap_us,
                   ntile(10) OVER (
                       PARTITION BY event_type ORDER BY gap_us, event_id
                   ) AS decile
            FROM gaps WHERE gap_us IS NOT NULL
        )
        SELECT event_type, CAST(decile AS BIGINT) AS decile,
               CAST(count(*) AS BIGINT) AS n_gaps,
               min(gap_us) AS min_gap_us,
               max(gap_us) AS max_gap_us,
               CAST(SUM(gap_us) AS DOUBLE)
                   / (CAST(count(*) AS DOUBLE) * 1000000.0) AS avg_gap_s
        FROM tiled GROUP BY event_type, decile
    """,
)
def interevent_gap_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event-time distribution per event type, summarized as
    decile buckets (ntile with unique-key tie-break): the standard
    engagement-cadence profile.  Gap computation is one lag window per
    user; the decile window partitions by event_type — two bounded
    shuffles, integer microsecond arithmetic end-to-end."""
    e = _t(spark, sf_dir, "events")
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "event_type",
        "event_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wl)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    wd = Window.partitionBy("event_type").orderBy("gap_us", "event_id")
    tiled = gaps.select(
        "event_type", "gap_us", F.ntile(10).over(wd).alias("decile")
    )
    return tiled.groupBy("event_type", F.col("decile").cast("long").alias("decile")).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        (
            F.sum("gap_us").cast("double")
            / (F.count(F.lit(1)).cast("double") * 1000000.0)
        ).alias("avg_gap_s"),
    )


@query(
    "business_days_order_to_ship",
    oracle="""
        WITH firstship AS (
            SELECT l_orderkey, min(l_shipdate) AS ship FROM lineitem
            GROUP BY l_orderkey
        ),
        j AS (
            SELECT o.o_orderkey,
                   date_diff('day', o.o_orderdate, f.ship) AS cal_days,
                   isodow(o.o_orderdate) - 1 AS w
            FROM orders o JOIN firstship f ON o.o_orderkey = f.l_orderkey
            WHERE year(o.o_orderdate) = 1995 AND f.ship >= o.o_orderdate
        )
        SELECT o_orderkey, CAST(cal_days AS BIGINT) AS cal_days,
               CAST(5 * (cal_days // 7) +
                    (SELECT count(*) FROM
                        (SELECT unnest(generate_series(1, cal_days % 7)) AS jj) t
                     WHERE (w + jj) % 7 <= 4)
                    AS BIGINT) AS business_days
        FROM j
    """,
)
def business_days_order_to_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day (Mon-Fri) lead time from order date to first
    shipment, in closed form: 5 * full_weeks + a <=6-element weekday
    scan for the remainder — O(1) per row, no calendar-table explode
    (a naive per-day explode multiplies the scan by the mean lead time,
    which at 100 TB is a 60x blowup)."""
    o = _t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1995)
    li = _t(spark, sf_dir, "lineitem")
    firstship = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("ship"))
    # the synthetic fixture contains ship-before-order rows; a lead
    # time is defined only forward in time (also keeps the remainder
    # arithmetic in non-negative territory where both engines' integer
    # division agrees)
    j = o.join(firstship, o.o_orderkey == firstship.l_orderkey).filter(
        F.col("ship") >= F.col("o_orderdate")
    ).select(
        "o_orderkey",
        F.datediff("ship", "o_orderdate").alias("cal_days"),
        F.weekday("o_orderdate").alias("w"),
    )
    rem = F.col("cal_days") % 7
    extra = F.when(rem == 0, F.lit(0)).otherwise(
        F.size(
            F.filter(
                F.sequence(F.lit(1), rem),
                lambda jj: (F.col("w") + jj) % 7 <= 4,
            )
        )
    )
    return j.select(
        "o_orderkey",
        F.col("cal_days").cast("long").alias("cal_days"),
        (5 * F.floor(F.col("cal_days") / 7) + extra).cast("long").alias(
            "business_days"
        ),
    )


# ------------------------------------------------------ windowed funnel

from etl_utils_spark.queries.shared import (  # noqa: E402
    FUNNEL_WINDOW_US as _FUNNEL_WINDOW_US,
    funnel_stage_ctes as _funnel_ctes,
)


@query(
    "funnel_conversion_windowed",
    oracle=f"""
        WITH {_funnel_ctes()}
        SELECT (SELECT count(*) FROM u1)::BIGINT AS n_signup,
               (SELECT count(*) FROM u2)::BIGINT AS n_click_7d,
               (SELECT count(*) FROM u3)::BIGINT AS n_purchase_7d,
               CAST((SELECT count(*) FROM u2) AS DOUBLE)
                   / CAST((SELECT count(*) FROM u1) AS DOUBLE) AS conv_1_2,
               CAST((SELECT count(*) FROM u3) AS DOUBLE)
                   / CAST((SELECT count(*) FROM u2) AS DOUBLE) AS conv_2_3
    """,
)
def funnel_conversion_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (signup → click → purchase) with a
    7-day window per step, greedy-earliest semantics: step k+1 must
    occur within 7 days AFTER the user's earliest qualifying step-k
    time.  The product-analytics staple that plain grouped counts get
    wrong (they ignore order and windows).

    100 TB shape: one min-aggregate per stage over the (shrinking)
    funnel population, chained through user_id-keyed joins — no
    windows over the corpus, no per-user event sorting; all time
    arithmetic in exact integer microseconds, conversion ratios as
    single IEEE divisions of exact counts (unrounded)."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("tus")
    )
    u1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("tus").alias("t1"))
    )
    u2 = (
        e.filter(F.col("event_type") == "click")
        .join(u1, "user_id")
        .filter(
            (F.col("tus") >= F.col("t1"))
            & (F.col("tus") <= F.col("t1") + _FUNNEL_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("tus").alias("t2"))
    )
    u3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(u2, "user_id")
        .filter(
            (F.col("tus") >= F.col("t2"))
            & (F.col("tus") <= F.col("t2") + _FUNNEL_WINDOW_US)
        )
        .groupBy("user_id")
        .agg(F.min("tus").alias("t3"))
    )
    n1 = u1.agg(F.count(F.lit(1)).alias("n_signup"))
    n2 = u2.agg(F.count(F.lit(1)).alias("n_click_7d"))
    n3 = u3.agg(F.count(F.lit(1)).alias("n_purchase_7d"))
    return (
        n1.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(n3))
        .select(
            "n_signup",
            "n_click_7d",
            "n_purchase_7d",
            (
                F.col("n_click_7d").cast("double")
                / F.col("n_signup").cast("double")
            ).alias("conv_1_2"),
            (
                F.col("n_purchase_7d").cast("double")
                / F.col("n_click_7d").cast("double")
            ).alias("conv_2_3"),
        )
    )
