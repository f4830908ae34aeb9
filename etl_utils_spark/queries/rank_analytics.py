"""Rank-based analytics pack: Spearman rank correlation computed with
DISTRIBUTED rank assignment (no corpus-wide window), a Benford
first-digit audit, LATERAL-join top-k-per-group, and the remaining
analytic window functions (nth_value / cume_dist).

The Spearman query is the scale statement of the pack: the textbook
formulation — ``rank() OVER (ORDER BY x)`` per column — funnels the
entire fact table through ONE reducer per column.  Here each column's
min-rank is derived from its per-VALUE count frame (bounded by
distinct-value cardinality) via the distributed ``prefix_sum``
(operators/ids.py): min_rank(v) = 1 + Σ counts(values < v).  The
oracle runs the single-node window formulation and certifies the
distributed one value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_utils_spark.operators import exact_moments
from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table

# Identical SQL text runs on Spark and the DuckDB oracle — the LATERAL
# correlated-subquery surface itself is the capability under test.
# Spark decorrelates it into a partial+final WindowGroupLimit (map-side
# top-k per customer before the exchange — the plan a hand-written
# row_number()<=2 would produce, derived automatically).
_LATERAL_SQL = """
SELECT c.c_custkey AS c_custkey, t.o_orderkey AS o_orderkey,
       t.o_totalprice AS o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t
"""


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _value_counts(df: DataFrame, col: str) -> DataFrame:
    """Per-value count frame (bounded by distinct cardinality),
    localCheckpointed because prefix_sum makes three passes over it."""
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
        .localCheckpoint(eager=True)
    )


def _min_rank_map(
    df: DataFrame,
    col: str,
    rank_col: str,
    counts: DataFrame | None = None,
    boundaries: list | None = None,
) -> DataFrame:
    """(value → competition/min rank) built WITHOUT a global sort: one
    per-value count aggregate, then the distributed prefix sum over the
    value order.  min_rank(v) = cum_counts_inclusive(v) − count(v) + 1
    — exactly ``rank()`` ties semantics.  ``counts``/``boundaries``
    let a caller building SEVERAL rank maps share frames and fuse the
    boundary sketches into one driver job (r13, guide §1.2)."""
    from etl_utils_spark.operators.ids import prefix_sum

    if counts is None:
        counts = _value_counts(df, col)
    pc = prefix_sum(
        counts, order_col=col, value_col="_c", out_col="_cum",
        boundaries=boundaries,
    )
    return pc.select(col, (F.col("_cum") - F.col("_c") + 1).alias(rank_col))


@query(
    "stats_spearman_price_qty",
    oracle="""
        WITH r AS (
          SELECT rank() OVER (ORDER BY l_extendedprice) AS rx,
                 rank() OVER (ORDER BY l_quantity) AS ry
          FROM lineitem
        ),
        m AS (SELECT {moments} FROM r)
        SELECT {corr} AS spearman, n
        FROM m
    """.format(
        moments=exact_moments.moments_sql("rx", "ry"),
        corr=exact_moments.corr_sql(4),
    ),
)
def stats_spearman_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of price vs quantity: Pearson over
    min-ranks, with both rank maps built by the distributed
    per-value-count + prefix-sum composition (module docstring) — the
    oracle's two corpus-wide ``rank()`` windows are exactly the
    single-reducer sorts this avoids.  The quantity rank map is ~50
    rows → broadcast; the price map joins on the value key.  The
    Pearson step uses EXACT integer moments (ranks are BIGINT; sums
    as Spark decimal(38,0) / DuckDB HUGEINT — rank products overflow
    int64 past ~1M rows) feeding one shared IEEE expression, because
    engine-builtin corr() accumulates differently at the ulp level
    and can flip the rounded digit (the r5 rolling-corr red class)."""
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"
    )
    # r13: the two rank maps' boundary sketches run as ONE driver job
    # (a crossJoin of the two 1-row percentile aggregates) instead of
    # two sequential collects — same literals, one fewer job (§1.2).
    cx = _value_counts(l, "l_extendedprice")
    cy = _value_counts(l, "l_quantity")
    fracs = [i / 16 for i in range(1, 16)]
    brow = (
        cx.agg(
            F.percentile_approx("l_extendedprice", fracs, 10_000).alias("bx")
        )
        .crossJoin(
            cy.agg(F.percentile_approx("l_quantity", fracs, 10_000).alias("by"))
        )
        .collect()[0]
    )
    rx = _min_rank_map(
        l, "l_extendedprice", "rx", counts=cx, boundaries=list(brow["bx"] or [])
    )
    ry = _min_rank_map(
        l, "l_quantity", "ry", counts=cy, boundaries=list(brow["by"] or [])
    )
    j = l.join(rx, "l_extendedprice").join(F.broadcast(ry), "l_quantity")
    m = exact_moments.moments_agg(j, F.col("rx"), F.col("ry"))
    return m.select(exact_moments.corr_col(4).alias("spearman"), "n")


@query(
    "dq_benford_totalprice",
    oracle="""
        WITH d AS (
          SELECT substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                     AS digit
          FROM orders WHERE o_totalprice >= 1
        ),
        c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        tot AS (SELECT sum(n) AS t FROM c)
        SELECT digit, n,
               CAST(n AS DOUBLE) / CAST(t AS DOUBLE) AS obs_p,
               ROUND(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford_p
        FROM c CROSS JOIN tot
    """,
)
def dq_benford_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order prices — the fraud/synthetic-
    data smell test (genuine financial magnitudes follow log10(1+1/d);
    generators that draw uniform magnitudes do not, and the fixture
    shows exactly that signature).  One digit-count aggregate + a
    1-row total.  obs_p is ONE IEEE division of exact counts (emitted
    unrounded — bit-identical across engines); benford_p is irrational
    → safe to round."""
    o = _t(spark, sf_dir, "orders")
    d = o.filter(F.col("o_totalprice") >= 1).select(
        F.substring(F.floor("o_totalprice").cast("long").cast("string"), 1, 1).alias(
            "digit"
        )
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = c.agg(F.sum("n").alias("t"))
    return c.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        (F.col("n").cast("double") / F.col("t").cast("double")).alias("obs_p"),
        F.round(F.log10(1.0 + 1.0 / F.col("digit").cast("double")), 6).alias(
            "benford_p"
        ),
    )


@query("join_lateral_top_orders", oracle=_LATERAL_SQL)
def join_lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 orders per customer by
    price) — the IDENTICAL SQL text runs on both engines
    (_LATERAL_SQL); Spark's decorrelation rewrites it to a
    partial+final WindowGroupLimit, i.e. map-side top-k per key before
    any exchange — the plan that scales."""
    from etl_utils_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_LATERAL_SQL)


@query(
    "window_nth_cume_dist",
    oracle="""
        SELECT o_orderkey,
               o_custkey,
               nth_value(o_totalprice, 2) OVER (
                 PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS second_highest,
               cume_dist() OVER (
                 PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
               ) AS cd
        FROM orders
    """,
)
def window_nth_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value + cume_dist — the two analytic window functions not
    yet covered by the extended-windows pack.  Partitioned by the
    high-cardinality customer key (parallel at scale); the explicit
    full frame makes nth_value see the whole partition on both
    engines; (price, orderkey) total order removes tie ambiguity, so
    cume_dist is an exact count ratio — one IEEE division, emitted
    unrounded."""
    o = _t(spark, sf_dir, "orders")
    w_full = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_cd = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.nth_value("o_totalprice", 2).over(w_full).alias("second_highest"),
        F.cume_dist().over(w_cd).alias("cd"),
    )


@query(
    "topk_similar_doc_pairs",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id,
                   w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
            FROM toks, LATERAL (
                SELECT unnest(generate_series(1, len(w) - 2)) AS i
            ) t
        ),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT id_a, id_b,
                   CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.1
        )
        SELECT id_a, id_b, jaccard FROM pairs
        ORDER BY jaccard DESC, id_a, id_b LIMIT 20
    """,
)
def topk_similar_doc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global closest-pairs: the 20 most-similar document pairs by
    exact trigram Jaccard — the audit view a dedup-threshold decision
    is made from.  Rides the shared materialized pair graph
    (queries/shared.py — built once per application, localCheckpointed)
    and takes top-k with a TakeOrdered heap under the (jaccard DESC,
    id_a, id_b) total order; jaccard itself is one exact-count division
    (unrounded, bit-identical cross-engine)."""
    from etl_utils_spark.queries.shared import jaccard_pair_graph

    pairs = jaccard_pair_graph(spark, sf_dir, n=3, threshold=0.1)
    return pairs.orderBy(F.col("jaccard").desc(), "id_a", "id_b").limit(20)


@query(
    "revenue_wow_change",
    oracle="""
        WITH w AS (
          SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          FROM orders GROUP BY 1
        )
        SELECT week_start, revenue,
               (revenue - lag(revenue) OVER (ORDER BY week_start))
                   / lag(revenue) OVER (ORDER BY week_start) AS wow_change
        FROM w
    """,
)
def revenue_wow_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue change — the core reporting recurrence.
    The corpus collapses to one exact-decimal weekly aggregate FIRST;
    the unpartitioned lag window then runs over the bounded weekly
    frame (#weeks rows — bounded by calendar, not data).  wow_change
    is arithmetic on exactly-represented doubles (2-decimal sums) —
    emitted unrounded, bit-identical across engines."""
    o = _t(spark, sf_dir, "orders")
    wk = o.groupBy(
        F.to_date(F.date_trunc("week", "o_orderdate")).alias("week_start")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue")
    )
    w = Window.orderBy("week_start")
    prev = F.lag("revenue").over(w)
    return wk.select(
        "week_start",
        "revenue",
        ((F.col("revenue") - prev) / prev).alias("wow_change"),
    )


@query(
    "copurchase_lift_pairs",
    oracle="""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        nord AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS n FROM op),
        marg AS (SELECT l_partkey, count(*)::BIGINT AS n_part FROM op GROUP BY 1),
        pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   count(*)::BIGINT AS n_orders
            FROM op a JOIN op b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            ORDER BY n_orders DESC, part_a ASC, part_b ASC
            LIMIT 20
        )
        SELECT part_a, part_b, n_orders,
               CAST(n_orders * nord.n AS DOUBLE)
                   / CAST(ma.n_part * mb.n_part AS DOUBLE) AS lift
        FROM pairs
        JOIN marg ma ON ma.l_partkey = part_a
        JOIN marg mb ON mb.l_partkey = part_b
        CROSS JOIN nord
    """,
)
def copurchase_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association lift for the top co-purchased part pairs:
    lift = P(a,b) / (P(a)·P(b)) = n_ab·N / (n_a·n_b) — the signal that
    separates genuinely-associated items from merely-popular ones.
    Margins join AFTER the top-k cut (20 rows), so the lift stage
    touches 20 rows + the margin aggregate; the ratio is one IEEE
    division of exact counts (unrounded, bit-identical)."""
    from etl_utils_spark.queries.scale_ops import (
        copurchase_pair_counts,
        order_part_baskets,
    )

    li = _t(spark, sf_dir, "lineitem")
    # r12 (guide §2.4): baskets replace the op self-join — the basket
    # exchange is built once and REUSED by all three readers below
    # (pairs / margins / order count), so the whole query runs off one
    # data-scale exchange plus bounded aggregates.
    baskets = order_part_baskets(li)
    nord = baskets.agg(F.count(F.lit(1)).alias("n"))
    marg = (
        baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_part"))
    )
    pairs = copurchase_pair_counts(li)
    ma = marg.select(F.col("l_partkey").alias("part_a"), F.col("n_part").alias("na"))
    mb = marg.select(F.col("l_partkey").alias("part_b"), F.col("n_part").alias("nb"))
    return (
        pairs.join(ma, "part_a")
        .join(mb, "part_b")
        .crossJoin(F.broadcast(nord))
        .select(
            "part_a",
            "part_b",
            "n_orders",
            (
                (F.col("n_orders") * F.col("n")).cast("double")
                / (F.col("na") * F.col("nb")).cast("double")
            ).alias("lift"),
        )
    )


@query(
    "xcorr_click_purchase_hourly",
    oracle="""
        WITH h AS (
          SELECT date_trunc('hour', ts) AS h, event_type, count(*)::BIGINT AS n
          FROM events WHERE event_type IN ('click', 'purchase')
          GROUP BY 1, 2
        ),
        c AS (SELECT h, n FROM h WHERE event_type = 'click'),
        p AS (SELECT h, n FROM h WHERE event_type = 'purchase'),
        j AS (
          SELECT c.n AS cn, p.n AS pn
          FROM c JOIN p ON p.h = c.h + INTERVAL 1 HOUR
        ),
        m AS (SELECT {moments} FROM j)
        SELECT {corr} AS xcorr_lag1h, n AS n_hours
        FROM m
    """.format(
        moments=exact_moments.moments_sql("cn", "pn"),
        corr=exact_moments.corr_sql(4),
    ),
)
def xcorr_click_purchase_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1-hour cross-correlation between the click and purchase
    hourly series — does click volume predict purchases an hour
    later?  The corpus collapses to one hourly count aggregate FIRST;
    the lagged self-alignment and correlation run on the bounded
    hours×2 frame.  Hours with zero events drop from both series
    identically on both engines (inner join)."""
    e = _t(spark, sf_dir, "events")
    h = (
        e.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            F.date_trunc("hour", "ts").alias("h"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    c = h.filter(F.col("event_type") == "click").select(
        F.col("h").alias("ch"), F.col("n").alias("cn")
    )
    p = h.filter(F.col("event_type") == "purchase").select(
        F.col("h").alias("ph"), F.col("n").alias("pn")
    )
    j = c.join(p, p["ph"] == c["ch"] + F.expr("INTERVAL 1 HOUR"))
    # Exact integer moments + one shared IEEE expression (module
    # operators/exact_moments.py) — engine-builtin corr is ulp-unstable
    # under ROUND.
    m = exact_moments.moments_agg(j, F.col("cn"), F.col("pn"))
    return m.select(
        exact_moments.corr_col(4).alias("xcorr_lag1h"),
        F.col("n").alias("n_hours"),
    )


# -------------------------------------------- two-sample rank tests
#
# Both tests compare l_extendedprice between returned ('R') and
# accepted ('A') line items.  The textbook formulations sort the
# combined sample once per test (rank()/ECDF over ONE reducer); here
# every rank-dependent quantity is derived from the per-VALUE count
# frame (bounded by distinct-price cardinality) via the distributed
# ``prefix_sum`` — the same decomposition as the Spearman query above.
# All rank sums are exact integers (Spark decimal(38,0) / DuckDB
# HUGEINT), so both engines feed the SAME bits into the one IEEE
# division (KS) or the post-sqrt z-score (MWU).


@query(
    "stats_ks_two_sample_price",
    oracle="""
        WITH s AS (
          SELECT CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS v,
                 CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS i1,
                 CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS i2
          FROM lineitem WHERE l_returnflag IN ('R', 'A')
        ),
        c AS (SELECT v, sum(i1) AS c1, sum(i2) AS c2 FROM s GROUP BY v),
        cum AS (
          SELECT v,
                 sum(c1) OVER (ORDER BY v) AS cum1,
                 sum(c2) OVER (ORDER BY v) AS cum2
          FROM c
        ),
        n AS (SELECT CAST(sum(i1) AS HUGEINT) AS n1,
                     CAST(sum(i2) AS HUGEINT) AS n2 FROM s),
        d AS (
          SELECT max(abs(CAST(cum1 AS HUGEINT) * n.n2
                         - CAST(cum2 AS HUGEINT) * n.n1)) AS ksnum
          FROM cum CROSS JOIN n
        )
        SELECT CAST(ksnum AS DOUBLE)
                   / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS ks_d,
               CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2
        FROM d CROSS JOIN n
    """,
)
def stats_ks_two_sample_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic, distributed: D =
    max_v |F1(v) - F2(v)| taken over the per-value count frame, with
    both ECDFs kept as EXACT integer rationals — the max is over
    |cum1*n2 - cum2*n1| (common denominator n1*n2), so no float
    comparison ever happens; the single IEEE division at the end is
    bit-identical across engines.  The oracle's two cumulative windows
    are the single-reducer sort this formulation avoids: the count
    frame is value-cardinality-bounded and the prefix sums run
    through the bucketed three-pass ``prefix_sum``."""
    from etl_utils_spark.operators.ids import prefix_sum

    s = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag").isin("R", "A"))
        .select(
            F.floor(F.col("l_extendedprice") * 100.0 + 0.5)
            .cast("long")
            .alias("v"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("i1"),
            F.when(F.col("l_returnflag") == "A", 1).otherwise(0).alias("i2"),
        )
    )
    c = (
        s.groupBy("v")
        .agg(
            F.sum("i1").cast("long").alias("c1"),
            F.sum("i2").cast("long").alias("c2"),
        )
        .localCheckpoint(eager=True)  # prefix_sum re-reads it twice
    )
    # r12: BOTH ECDFs ride one multi-column prefix_sum (one bucketing,
    # one window exchange) instead of two chained full calls, and the
    # sample sizes come from the value-cardinality-bounded count frame
    # (exact integer sums — identical values), not a second corpus pass.
    pc = prefix_sum(c, "v", value_cols={"c1": "cum1", "c2": "cum2"})
    n = c.agg(
        F.sum("c1").cast("decimal(18,0)").alias("n1"),
        F.sum("c2").cast("decimal(18,0)").alias("n2"),
    )
    d = (
        pc.crossJoin(F.broadcast(n))
        .select(
            F.abs(
                F.col("cum1").cast("decimal(18,0)") * F.col("n2")
                - F.col("cum2").cast("decimal(18,0)") * F.col("n1")
            ).alias("num")
        )
        .agg(F.max("num").alias("ksnum"))
    )
    return d.crossJoin(F.broadcast(n)).select(
        (
            F.col("ksnum").cast("double")
            / (F.col("n1").cast("double") * F.col("n2").cast("double"))
        ).alias("ks_d"),
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
    )


@query(
    "stats_mann_whitney_price",
    oracle="""
        WITH s AS (
          SELECT CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS v,
                 CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS i1
          FROM lineitem WHERE l_returnflag IN ('R', 'A')
        ),
        c AS (SELECT v, sum(i1) AS c1, count(*) AS ct FROM s GROUP BY v),
        cum AS (
          SELECT v, c1, ct, sum(ct) OVER (ORDER BY v) AS cumt FROM c
        ),
        agg AS (
          SELECT sum(CAST(c1 AS HUGEINT) * (2 * cumt - ct + 1)) AS sum2r1,
                 sum(CAST(ct AS HUGEINT) * ct * ct - ct) AS tsum
          FROM cum
        ),
        n AS (SELECT CAST(sum(i1) AS HUGEINT) AS n1,
                     CAST(count(*) AS HUGEINT) AS nn FROM s),
        f AS (
          SELECT sum2r1, tsum, n1, nn, nn - n1 AS n2,
                 sum2r1 - n1 * (n1 + 1) - n1 * (nn - n1) AS za,
                 n1 * (nn - n1) * ((nn * nn * nn - nn) - tsum) AS varnum,
                 12 * nn * (nn - 1) AS varden
          FROM agg CROSS JOIN n
        )
        SELECT CAST(sum2r1 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1,
               CASE WHEN varnum > 0 THEN
                 ROUND(CAST(za AS DOUBLE)
                       / (2.0 * sqrt(CAST(varnum AS DOUBLE)
                                     / CAST(varden AS DOUBLE))), 6) + 0.0
               END AS z_score,
               CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2
        FROM f
    """,
)
def stats_mann_whitney_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U test (rank-sum, tie-corrected normal
    approximation), distributed: average ranks come from the per-value
    count frame — 2*avg_rank(v) = 2*cumt(v) - ct(v) + 1 stays an exact
    integer, so 2*R1 = sum(c1 * that) is an exact decimal(38,0)/
    HUGEINT sum, U1 an exact dyadic (one /2.0), and the z-score
    numerator/variance are exact-integer ratios — both engines feed
    identical bits into the ONE sqrt, so rounding after it is safe
    (docs/SCALE.md: round only post-irrational-map).  Tie correction
    sum(t^3 - t) reuses the same count frame; no global rank sort
    anywhere (the oracle's cumulative window is the single-reducer
    plan this avoids)."""
    from etl_utils_spark.operators.ids import prefix_sum

    s = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag").isin("R", "A"))
        .select(
            F.floor(F.col("l_extendedprice") * 100.0 + 0.5)
            .cast("long")
            .alias("v"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("i1"),
        )
    )
    c = (
        s.groupBy("v")
        .agg(
            F.sum("i1").cast("long").alias("c1"),
            F.count(F.lit(1)).alias("ct"),
        )
        .localCheckpoint(eager=True)
    )
    pc = prefix_sum(c, "v", "ct", out_col="cumt")
    dct = F.col("ct").cast("decimal(18,0)")
    agg = pc.agg(
        F.sum(
            F.col("c1").cast("decimal(18,0)")
            * (
                2 * F.col("cumt").cast("decimal(18,0)")
                - F.col("ct").cast("decimal(18,0)")
                + 1
            )
        ).alias("sum2r1"),
        F.sum(dct * dct * dct - dct).alias("tsum"),
    )
    # r12: sample sizes from the count frame, not a second corpus pass
    # (exact integer sums — identical values).
    n = c.agg(
        F.sum("c1").cast("decimal(18,0)").alias("n1"),
        F.sum("ct").cast("decimal(18,0)").alias("nn"),
    )
    f = agg.crossJoin(F.broadcast(n)).select(
        "sum2r1",
        "tsum",
        "n1",
        "nn",
        (F.col("nn") - F.col("n1")).alias("n2"),
        (
            F.col("sum2r1")
            - F.col("n1") * (F.col("n1") + 1)
            - F.col("n1") * (F.col("nn") - F.col("n1"))
        ).alias("za"),
        (
            F.col("n1")
            * (F.col("nn") - F.col("n1"))
            * (
                (F.col("nn") * F.col("nn") * F.col("nn") - F.col("nn"))
                - F.col("tsum")
            )
        ).alias("varnum"),
        (12 * F.col("nn") * (F.col("nn") - 1)).alias("varden"),
    )
    return f.select(
        (
            (F.col("sum2r1") - F.col("n1") * (F.col("n1") + 1)).cast("double")
            / 2.0
        ).alias("u1"),
        F.when(
            F.col("varnum") > 0,
            F.round(
                F.col("za").cast("double")
                / (
                    2.0
                    * F.sqrt(
                        F.col("varnum").cast("double")
                        / F.col("varden").cast("double")
                    )
                ),
                6,
            )
            + F.lit(0.0),
        ).alias("z_score"),
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
    )


@query(
    "pareto_frontier_orders",
    oracle="""
        WITH ship AS (
            SELECT l_orderkey, min(l_shipdate) AS fs
            FROM lineitem GROUP BY l_orderkey
        ),
        base AS (
            SELECT CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS pc,
                   date_diff('day', o.o_orderdate, s.fs) AS dd
            FROM orders o JOIN ship s ON o.o_orderkey = s.l_orderkey
        ),
        pv AS (SELECT pc, min(dd) AS dmin FROM base GROUP BY pc),
        w AS (
            SELECT pc, dmin,
                   min(dmin) OVER (
                       ORDER BY pc DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS excmin
            FROM pv
        )
        SELECT pc AS price_cents, dmin::BIGINT AS delay_days
        FROM w WHERE excmin IS NULL OR dmin < excmin
    """,
)
def pareto_frontier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (skyline): the orders not dominated on
    (maximize total price, minimize order→first-ship delay) — the
    multi-criteria shortlist operator.  The O(n log n) sweep
    decomposes distributed: collapse to the per-price-value min-delay
    frame (value-cardinality-bounded), then a STRICTLY-preceding
    prefix-min in descending price order — a point is on the frontier
    iff its delay beats every higher-priced point's best.  The
    prefix-min runs through the bucketed three-pass ``prefix_min``
    (operators/ids.py), not the oracle's single-reducer window; all
    comparisons are exact integers (cents, days), so the frontier set
    is hash-stable."""
    from etl_utils_spark.operators.ids import prefix_min

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ship = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("fs"))
    base = o.join(ship, o.o_orderkey == ship.l_orderkey).select(
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias("pc"),
        F.datediff(F.col("fs").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("dd"),
    )
    pv = (
        base.groupBy("pc")
        .agg(F.min("dd").alias("dmin"))
        .withColumn("negp", -F.col("pc"))
        .localCheckpoint(eager=True)  # prefix_min makes three passes
    )
    pm = prefix_min(pv, "negp", "dmin", out_col="incmin", exclusive_out="excmin")
    return pm.filter(
        F.col("excmin").isNull() | (F.col("dmin") < F.col("excmin"))
    ).select(
        F.col("pc").alias("price_cents"),
        F.col("dmin").cast("long").alias("delay_days"),
    )
