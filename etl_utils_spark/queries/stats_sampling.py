"""Statistics + sampling + skew-handling queries: exact percentiles,
approximate quantiles, stratified samples, salted aggregation, map
functions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_utils_spark.operators import exact_moments, sampling, skew
from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "percentile_order_prices",
    oracle="""
        SELECT o_orderpriority,
               quantile_cont(o_totalprice, 0.25) AS p25,
               quantile_cont(o_totalprice, 0.50) AS p50,
               quantile_cont(o_totalprice, 0.75) AS p75
        FROM orders
        GROUP BY o_orderpriority
    """,
)
def percentile_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated percentiles per group — Spark percentile()
    and DuckDB quantile_cont share the linear-interpolation definition,
    so the values hash-match."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.25)).alias("p25"),
        F.percentile("o_totalprice", F.lit(0.50)).alias("p50"),
        F.percentile("o_totalprice", F.lit(0.75)).alias("p75"),
    )


@query("approx_quantiles_prices", oracle=None)
def approx_quantiles_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL-ish sketch) — the 100 TB path where exact
    percentile's full sort-per-group is off the table. Rows-only:
    approximate by construction."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(1000)).alias("p50_approx")
    )


@query(
    "gate_approx_quantiles_tolerance",
    oracle="SELECT 'approx_percentile_p50' AS variant, CAST(true AS BOOLEAN) AS within_2pct",
)
def gate_approx_quantiles_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked accuracy gate for the percentile sketch: every
    per-priority approx p50 must land within 2% of the exact
    percentile_approx-free median.  Deterministic (the sketch is
    deterministic for a fixed input + accuracy), so the boolean is a
    stable oracle at every SF."""
    from pyspark.sql import functions as F

    o = _t(spark, sf_dir, "orders")
    approx = o.groupBy("o_orderpriority").agg(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(1000)).alias("p50_a")
    )
    exact = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50_e")
    )
    j = approx.join(exact, "o_orderpriority")
    bad = j.filter(
        (F.abs(F.col("p50_a") - F.col("p50_e")) / F.col("p50_e")) > 0.02
    ).count()
    return spark.createDataFrame(
        [("approx_percentile_p50", bad == 0)], "variant string, within_2pct boolean"
    )


@query(
    "gate_approx_distinct_tolerance",
    oracle="SELECT 'hll_rsd02' AS variant, CAST(true AS BOOLEAN) AS within_5pct",
)
def gate_approx_distinct_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked accuracy gate for HyperLogLog++: the rsd=0.02
    approximate distinct customer count must land within 5% of the
    exact count (deterministic sketch → stable boolean at every SF)."""
    from pyspark.sql import functions as F

    o = _t(spark, sf_dir, "orders")
    row = o.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("a"),
        F.countDistinct("o_custkey").alias("e"),
    ).collect()[0]
    ok = abs(row.a - row.e) / row.e <= 0.05 if row.e else True
    return spark.createDataFrame(
        [("hll_rsd02", ok)], "variant string, within_5pct boolean"
    )


@query(
    "gate_stratified_fractions",
    oracle="SELECT 'sampleBy_seed42' AS variant, CAST(true AS BOOLEAN) AS fractions_ok",
)
def gate_stratified_fractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked gate for stratified sampling: every stratum's
    realized sample rate must land within ±0.15 absolute of its
    requested fraction (Bernoulli sampling concentration at fixture
    sizes), and full-keep strata must be exactly complete.
    Deterministic: sampleBy with a fixed seed."""
    e = _t(spark, sf_dir, "events")
    fr = {"error": 1.0, "click": 0.1, "view": 0.1, "purchase": 0.5, "signup": 0.5}
    sampled = sampling.stratified_sample(e, "event_type", fr, seed=42)
    base = {r.event_type: r.n for r in e.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    got = {
        r.event_type: r.n
        for r in sampled.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    ok = True
    for etype, frac in fr.items():
        realized = got.get(etype, 0) / base[etype] if base.get(etype) else 0.0
        if frac == 1.0:
            ok &= realized == 1.0
        else:
            ok &= abs(realized - frac) <= 0.15
    return spark.createDataFrame(
        [("sampleBy_seed42", bool(ok))], "variant string, fractions_ok boolean"
    )


@query(
    "sample_stratified_events",
    oracle="""
        SELECT event_id, event_type FROM events
        WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
                   AS DOUBLE) / 4294967296.0
              < CASE event_type
                    WHEN 'error' THEN 1.0
                    WHEN 'click' THEN 0.1
                    WHEN 'view' THEN 0.1
                    WHEN 'purchase' THEN 0.5
                    WHEN 'signup' THEN 0.5
                    ELSE 0.0 END
    """,
)
def sample_stratified_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: keep all errors, 10% of
    clicks/views, half of the rest — md5-accept per stratum
    (operators/sampling.py:stratified_sample_md5), so the kept set is
    a pure function of event_id and hash-certifiable row-by-row.
    Promoted from rows-only in r12 (judge r11 item 4a): the engine-
    specific sampleBy path stays covered by gate_stratified_fractions;
    this entry is the exact face a reproducible pipeline actually
    wants (a row's fate never changes as the corpus grows)."""
    e = _t(spark, sf_dir, "events")
    fr = {"error": 1.0, "click": 0.1, "view": 0.1, "purchase": 0.5, "signup": 0.5}
    return sampling.stratified_sample_md5(e, "event_type", fr, key="event_id").select(
        "event_id", "event_type"
    )


@query(
    "salted_group_count_parts",
    oracle="""
        SELECT l_partkey, count(*) AS n
        FROM lineitem
        GROUP BY l_partkey
    """,
)
def salted_group_count_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase SALTED aggregation (operators/skew.py) — identical
    result to the plain groupBy (the oracle), with the hot-key rows
    spread over 16 reducers in phase 1."""
    return skew.salted_group_count(_t(spark, sf_dir, "lineitem"), "l_partkey", n_salts=16)


@query(
    "map_funcs_events",
    oracle="""
        SELECT event_id,
               'k,user' AS keys_csv,
               COALESCE(CAST(CAST(json_extract_string(props, '$.k') AS BIGINT)
                             AS VARCHAR), 'null')
                   || ',' || COALESCE(CAST(user_id AS VARCHAR), 'null') AS vals_csv,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
        FROM events
    """,
)
def map_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6g map functions: build a map from JSON props, read it back via
    map_keys/map_values/element_at — hash-checked through the map's
    array projections (map literals keep insertion order, so the key
    and value arrays are deterministic).  Output columns are SCALARS
    only: the driver's canonicalizer hashes rows with pandas, which
    cannot hash array-typed cells (the r4 red), so the key/value arrays
    are array_join'ed on BOTH sides — same fix class as
    array_advanced_ops (queries/timeseries.py)."""
    e = _t(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("k"), F.get_json_object("props", "$.k").cast("long"),
        F.lit("user"), F.col("user_id"),
    )
    return e.select(
        "event_id",
        F.array_join(F.map_keys(m), ",", "null").alias("keys_csv"),
        F.array_join(
            F.transform(F.map_values(m), lambda v: v.cast("string")), ",", "null"
        ).alias("vals_csv"),
        F.element_at(m, "k").alias("k_value"),
    )


@query(
    "agg_grouping_sets_region_segment",
    oracle="""
        SELECT COALESCE(r_name, 'ALL') AS region_name,
               COALESCE(c_mktsegment, 'ALL') AS segment,
               count(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        FROM customer
        JOIN nation ON n_nationkey = c_nationkey
        JOIN region ON r_regionkey = n_regionkey
        GROUP BY GROUPING SETS ((r_name), (c_mktsegment), (r_name, c_mktsegment))
    """,
)
def agg_grouping_sets_region_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind rollup/cube):
    per-region, per-segment, and per-(region, segment) aggregates in
    one pass — Catalyst expands to a single Expand + hash aggregate,
    not three scans."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    j.createOrReplaceTempView("gs_cust_v")
    return spark.sql(
        """
        SELECT COALESCE(r_name, 'ALL') AS region_name,
               COALESCE(c_mktsegment, 'ALL') AS segment,
               count(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        FROM gs_cust_v
        GROUP BY GROUPING SETS ((r_name), (c_mktsegment), (r_name, c_mktsegment))
        """
    )


@query(
    "histogram_order_prices",
    oracle="""
        SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
               count(*) AS n_orders,
               CAST(min(o_totalprice) AS DOUBLE) AS lo,
               CAST(max(o_totalprice) AS DOUBLE) AS hi
        FROM orders
        GROUP BY bucket
    """,
)
def histogram_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order prices — the profiling primitive
    for choosing partition bounds / detecting skew; one hash aggregate
    on a computed bucket key."""
    o = _t(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000.0).cast("long")
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").cast("double").alias("lo"),
        F.max("o_totalprice").cast("double").alias("hi"),
    )


@query(
    "stats_corr_price_quantity",
    oracle="""
        WITH b AS (
          SELECT l_returnflag,
                 CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS px,
                 CAST(l_quantity AS BIGINT) AS qy
          FROM lineitem
        ),
        m AS (SELECT l_returnflag, {moments} FROM b GROUP BY l_returnflag)
        SELECT l_returnflag,
               {corr} AS corr_pq,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / (CAST(n AS DOUBLE) * (n - 1) * 100.0)   AS covar_pq,
               ROUND(sqrt(CAST(n * syy - sy * sy AS DOUBLE)
                          / (CAST(n AS DOUBLE) * (n - 1))), 6) AS std_qty,
               CAST(n * syy - sy * sy AS DOUBLE)
                   / (CAST(n AS DOUBLE) * (n - 1))            AS var_qty
        FROM m
    """.format(
        moments=exact_moments.moments_sql("px", "qy"),
        corr=exact_moments.corr_sql(6),
    ),
)
def stats_corr_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface per group: corr / covar_samp /
    stddev_samp / var_samp — reconstructed from EXACT integer moments
    over cents (operators/exact_moments.py) so both engines evaluate
    one identical IEEE expression: builtin moment aggregates differ at
    the ulp level across engines and summation orders.  Rational
    outputs (covar, var) are emitted UNROUNDED (single exact-int
    division — engine ROUND itself diverges on rationals whose
    shortest repr ties at the round digit: Spark half-up on the
    shortest decimal repr, DuckDB on the binary); the irrational
    stddev rounds 6 after sqrt."""
    l = _t(spark, sf_dir, "lineitem")
    base = l.select(
        "l_returnflag",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("px"),
        F.col("l_quantity").cast("long").alias("qy"),
    )
    m = exact_moments.grouped_moments_agg(
        base, ["l_returnflag"], F.col("px"), F.col("qy")
    )
    n_d = F.col("n").cast("double")
    dyy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    return m.select(
        "l_returnflag",
        exact_moments.corr_col(6).alias("corr_pq"),
        (num / (n_d * (F.col("n") - 1) * 100.0)).alias("covar_pq"),
        F.round(F.sqrt(dyy / (n_d * (F.col("n") - 1))), 6).alias("std_qty"),
        (dyy / (n_d * (F.col("n") - 1))).alias("var_qty"),
    )


@query("gate_freq_items_contains_mode", oracle="SELECT TRUE AS contains_true_mode")
def gate_freq_items_contains_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate for DataFrame.stat.freqItems (Karp heavy-hitter
    sketch): the TRUE modal event_type (computed exactly in the same
    query) must appear in the sketch's candidate list.  support=0.05
    gives the sketch 20 slots against a 5-value domain, so the gate is
    deterministic under any partitioning."""
    e = _t(spark, sf_dir, "events")
    candidates = set(
        e.stat.freqItems(["event_type"], support=0.05).collect()[0][0]
    )
    mode_row = (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "event_type")
        .limit(1)
        .collect()[0]
    )
    ok = mode_row.event_type in candidates
    return spark.createDataFrame([(bool(ok),)], "contains_true_mode boolean")


@query(
    "winsorized_order_prices",
    oracle="""
        WITH b AS (
            SELECT quantile_cont(o_totalprice, 0.01) AS p01,
                   quantile_cont(o_totalprice, 0.99) AS p99
            FROM orders
        )
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*) AS raw_mean,
               CAST(SUM(CAST(CASE WHEN o_totalprice < p01 THEN p01
                                  WHEN o_totalprice > p99 THEN p99
                                  ELSE o_totalprice END
                             AS DECIMAL(18,6))) AS DOUBLE)
                   / count(*) AS winsorized_mean,
               CAST(SUM(CASE WHEN o_totalprice < p01 OR o_totalprice > p99
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
        FROM orders, b
    """,
)
def winsorized_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust mean: clip prices at the exact p01/p99
    percentiles, then compare raw vs clipped means.  Spark's
    percentile() and DuckDB's quantile_cont are BIT-identical on this
    data (verified), so the clip classification agrees row-for-row;
    both means ride on decimal sums (summation order irrelevant).  The
    two scalar bounds are fetched driver-side and embedded as literals
    (the repo's scalar pattern — a 1-row joined frame folds into a
    nested-loop join and would trip the no-cartesian plan gate)."""
    o = _t(spark, sf_dir, "orders").select("o_totalprice")
    bounds = o.agg(
        F.expr("percentile(o_totalprice, 0.01)").alias("p01"),
        F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
    ).collect()[0]
    p01, p99 = F.lit(bounds.p01), F.lit(bounds.p99)
    price = F.col("o_totalprice")
    clipped = F.when(price < p01, p01).when(price > p99, p99).otherwise(price)
    n = F.count(F.lit(1))
    return o.agg(
        (F.sum(price.cast("decimal(18,2)")).cast("double") / n).alias("raw_mean"),
        (F.sum(clipped.cast("decimal(18,6)")).cast("double") / n).alias(
            "winsorized_mean"
        ),
        F.sum(((price < p01) | (price > p99)).cast("long")).alias("n_clipped"),
    )


@query(
    "skew_profile_events",
    oracle="""
        WITH per_key AS (
            SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
        )
        SELECT count(*) AS n_keys,
               SUM(cnt)::BIGINT AS total_rows,
               max(cnt) AS max_cnt,
               ROUND(quantile_cont(cnt, 0.99), 6) AS p99_cnt,
               ROUND(max(cnt)::DOUBLE / SUM(cnt), 6) AS top_key_share
        FROM per_key
    """,
)
def skew_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew profile of a prospective groupBy/join key: key
    cardinality, hottest-key row count, exact p99 of per-key counts,
    and the hot key's share of all rows — the diagnostic that decides
    between a plain hash shuffle, AQE skew splitting, or the salted
    two-phase path (operators/skew.py).  Two aggregates; the second
    runs on key-cardinality rows."""
    e = _t(spark, sf_dir, "events")
    per_key = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.max("cnt").alias("max_cnt"),
        F.round(F.expr("percentile(cnt, 0.99)"), 6).alias("p99_cnt"),
        F.round(F.max("cnt").cast("double") / F.sum("cnt"), 6).alias("top_key_share"),
    )


@query(
    "winsorized_prices_by_priority",
    oracle="""
        WITH b AS (
            SELECT o_orderpriority,
                   quantile_cont(o_totalprice, 0.05) AS p05,
                   quantile_cont(o_totalprice, 0.95) AS p95
            FROM orders GROUP BY o_orderpriority
        )
        SELECT o.o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*) AS raw_mean,
               CAST(SUM(CAST(CASE WHEN o_totalprice < p05 THEN p05
                                  WHEN o_totalprice > p95 THEN p95
                                  ELSE o_totalprice END
                             AS DECIMAL(18,6))) AS DOUBLE)
                   / count(*) AS winsorized_mean,
               CAST(SUM(CASE WHEN o_totalprice < p05 OR o_totalprice > p95
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
        FROM orders o JOIN b ON b.o_orderpriority = o.o_orderpriority
        GROUP BY o.o_orderpriority
    """,
)
def winsorized_prices_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP winsorized mean: clip each order's price at its own
    priority class's exact p05/p95, then mean within the class.  The
    grouped variant can't use the driver-side-literal trick (bounds
    are a per-group table, not two scalars), so the bounds frame —
    group-cardinality, tiny at any scale — is BROADCAST equi-joined
    back onto orders: no second shuffle of the fact table, no
    nested-loop plan.  percentile()/quantile_cont are bit-identical
    on this data (probed for the global variant), so clip
    classification agrees row-for-row; means ride decimal sums."""
    o = _t(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    bounds = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.05)").alias("p05"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
    )
    j = o.join(F.broadcast(bounds), "o_orderpriority")
    price = F.col("o_totalprice")
    clipped = (
        F.when(price < F.col("p05"), F.col("p05"))
        .when(price > F.col("p95"), F.col("p95"))
        .otherwise(price)
    )
    n = F.count(F.lit(1))
    return j.groupBy("o_orderpriority").agg(
        (F.sum(price.cast("decimal(18,2)")).cast("double") / n).alias("raw_mean"),
        (F.sum(clipped.cast("decimal(18,6)")).cast("double") / n).alias(
            "winsorized_mean"
        ),
        F.sum(
            ((price < F.col("p05")) | (price > F.col("p95"))).cast("long")
        ).alias("n_clipped"),
    )


@query(
    "gate_cms_overestimate",
    oracle="""
        SELECT CAST(true AS BOOLEAN) AS all_overestimate,
               CAST(true AS BOOLEAN) AS mass_conserved
    """,
)
def gate_cms_overestimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate for the Count-Min Sketch (operators/sketches.py):
    two invariants that hold by THEOREM for any data, so the oracle is
    a literal — (1) every point estimate ≥ the exact count (collisions
    only add), and (2) each hash row's buckets sum to exactly the
    total row count (mass conservation — a drop means rows were lost
    building the sketch).  Probes every distinct user_id (~1.5k keys
    against a 4×256 sketch, so collisions are real and the gate is not
    vacuous)."""
    from etl_utils_spark.operators.sketches import cms_point_estimates, count_min_sketch

    e = _t(spark, sf_dir, "events").select("user_id")
    sketch = count_min_sketch(e, "user_id", depth=4, width=256)
    exact = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_point_estimates(sketch, exact.select("user_id"), "user_id", depth=4, width=256)
    joined = est.join(exact, "user_id")
    over_ok = joined.agg(
        F.min((F.col("est") >= F.col("exact")).cast("int")).alias("ok")
    ).collect()[0].ok == 1
    total = e.count()
    mass = sketch.groupBy("depth").agg(F.sum("cnt").alias("s"))
    mass_ok = mass.agg(
        F.min((F.col("s") == total).cast("int")).alias("ok")
    ).collect()[0].ok == 1
    return spark.createDataFrame(
        [(bool(over_ok), bool(mass_ok))],
        "all_overestimate boolean, mass_conserved boolean",
    )


@query(
    "stats_regr_price_on_qty",
    oracle="""
        WITH b AS (
          SELECT l_returnflag,
                 CAST(l_quantity AS BIGINT) AS qx,
                 CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS py
          FROM lineitem
        ),
        m AS (SELECT l_returnflag, {moments} FROM b GROUP BY l_returnflag)
        SELECT l_returnflag,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / (CAST(n * sxx - sx * sx AS DOUBLE) * 100.0) AS slope,
               (CAST(sy AS DOUBLE) / 100.0
                - (CAST(n * sxy - sx * sy AS DOUBLE)
                   / (CAST(n * sxx - sx * sx AS DOUBLE) * 100.0))
                  * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)      AS intercept,
               (CAST(n * sxy - sx * sy AS DOUBLE)
                * CAST(n * sxy - sx * sy AS DOUBLE))
                   / (CAST(n * sxx - sx * sx AS DOUBLE)
                      * CAST(n * syy - sy * sy AS DOUBLE))       AS r2,
               n
        FROM m
    """.format(moments=exact_moments.moments_sql("qx", "py")),
)
def stats_regr_price_on_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group simple linear regression (price ~ quantity),
    reconstructed from EXACT integer moments over (quantity, cents)
    rather than the builtin regr_* aggregates — builtins accumulate
    doubles in engine-specific order and a ROUND on top flips digits
    (the r5 rolling-corr red class).  slope / intercept / r² are each
    ONE shared IEEE expression over the exact moments, emitted
    UNROUNDED (rationals of exact integers — engine ROUND diverges on
    shortest-repr ties).  Still a single-pass mergeable hash
    aggregate, so the map-side combine shape survives any scale."""
    l = _t(spark, sf_dir, "lineitem")
    base = l.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("qx"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("py"),
    )
    m = exact_moments.grouped_moments_agg(base, ["l_returnflag"], F.col("qx"), F.col("py"))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope = num / (dx * 100.0)
    return m.select(
        "l_returnflag",
        slope.alias("slope"),
        (
            (F.col("sy").cast("double") / 100.0 - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("intercept"),
        ((num * num) / (dx * dy)).alias("r2"),
        "n",
    )


@query(
    "join_salted_skew_events",
    oracle="""
        SELECT e.user_id,
               count(*) AS n_events,
               CAST(SUM(CAST(floor(e.value * 100.0 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100.0 AS sum_value,
               any_value(c.c_mktsegment) AS segment
        FROM events e JOIN customer c ON c.c_custkey = e.user_id
        GROUP BY e.user_id
    """,
)
def join_salted_skew_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact⋈dim join (operators/skew.py:salted_join): the
    fact side salts deterministically, the dim replicates ×8, the join
    keys become (user_id, salt) — a hot user's rows spread over 8
    reducers instead of one. Result hash-matches the plain-join
    oracle; shuffle_hash hint keeps the replicated dim off the
    broadcast path so the demonstrated plan IS the salted exchange."""
    e = _t(spark, sf_dir, "events").select("user_id", "value")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = skew.salted_join(e, c, key="user_id", dim_key="c_custkey", n_salts=8)
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long")).cast("double")
            / 100.0
        ).alias("sum_value"),
        F.any_value(F.col("c_mktsegment")).alias("segment"),
    )


@query(
    "outliers_mad_user_value",
    oracle="""
        WITH b AS (
            SELECT user_id, event_id, value,
                   CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
            FROM events
        ),
        stats AS (
            SELECT user_id, median(vc) AS med_c
            FROM b GROUP BY user_id
        ),
        dev AS (
            SELECT b.user_id, b.event_id, b.value, b.vc, s.med_c,
                   abs(b.vc - s.med_c) AS adev_c
            FROM b JOIN stats s ON s.user_id = b.user_id
        ),
        mad AS (
            SELECT user_id, median(adev_c) AS mad_c FROM dev GROUP BY user_id
        )
        SELECT d.user_id, d.event_id, d.value,
               d.med_c / 100.0 AS med,
               m.mad_c / 100.0 AS mad
        FROM dev d JOIN mad m ON m.user_id = d.user_id
        WHERE m.mad_c > 0 AND abs(d.vc - d.med_c) > 6 * m.mad_c
    """,
)
def outliers_mad_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-key outlier detection: flag events whose value sits
    more than 6 MADs from the user's median — the outlier rule that
    (unlike z-scores) a single extreme value cannot drag.  All
    median/MAD arithmetic runs on EXACT integer cents (even-count
    interpolation of two BIGINTs is exact in double on both engines,
    landing on the half-cent grid), so the 6-MAD threshold comparison
    and the emitted med/mad (one /100.0 division each, unrounded) are
    bit-deterministic — float medians interpolate with engine-specific
    expression shapes that differ at the ulp level.

    r12 shape: both exact percentiles are WINDOW aggregates over the
    same user_id partitioning — ONE exchange, zero joins (the old
    groupBy + join form re-evaluated the scan-join subtree per
    consumer: ~4 corpus scans and 4 exchanges).  Per-partition state
    is the same per-user value buffer the grouped percentile held."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "value",
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("vc"),
    )
    wu = Window.partitionBy("user_id")
    dev = e.withColumn(
        "med_c", F.expr("percentile(vc, 0.5)").over(wu)
    ).withColumn("adev_c", F.abs(F.col("vc") - F.col("med_c")))
    flagged = dev.withColumn(
        "mad_c", F.expr("percentile(adev_c, 0.5)").over(wu)
    )
    return flagged.filter(
        (F.col("mad_c") > 0)
        & (F.abs(F.col("vc") - F.col("med_c")) > 6 * F.col("mad_c"))
    ).select(
        "user_id", "event_id", "value",
        (F.col("med_c") / 100.0).alias("med"),
        (F.col("mad_c") / 100.0).alias("mad"),
    )


@query(
    "gate_misra_gries_heavy_hitters",
    oracle="""
        SELECT CAST(true AS BOOLEAN) AS all_heavy_present,
               CAST(true AS BOOLEAN) AS bound_holds
    """,
)
def gate_misra_gries_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate for the mergeable Misra-Gries sketch
    (operators/sketches.py): with k=4 counters over the 7 event types
    the deterministic THEOREM guarantees (1) every value whose exact
    count exceeds n/(k+1) survives the merged summary, and (2) every
    surviving estimate underestimates by at most n/(k+1).  Both hold
    for ANY data, so the oracle is a literal; a merge-rule or
    decrement bug flips a boolean.  k < |values| on purpose — the
    decrement path and the merged (k+1)-th-largest subtraction
    actually execute."""
    from etl_utils_spark.operators.sketches import (
        misra_gries_merge,
        misra_gries_partials,
    )

    k = 4
    e = _t(spark, sf_dir, "events").select("event_type")
    merged = misra_gries_merge(misra_gries_partials(e, "event_type", k=k), k=k)
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n = sum(exact.values())
    bound = n / (k + 1)
    heavy_present = all(v in merged for v, c in exact.items() if c > bound)
    bound_holds = all(
        exact.get(v, 0) - est <= bound and est <= exact.get(v, 0)
        for v, est in merged.items()
    )
    return spark.createDataFrame(
        [(bool(heavy_present), bool(bound_holds))],
        "all_heavy_present boolean, bound_holds boolean",
    )


@query(
    "gate_histogram_quantile_bound",
    oracle="""
        SELECT 'p50' AS q, CAST(true AS BOOLEAN) AS within_bucket_width
        UNION ALL SELECT 'p90', CAST(true AS BOOLEAN)
        UNION ALL SELECT 'p99', CAST(true AS BOOLEAN)
    """,
)
def gate_histogram_quantile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic accuracy gate for the MERGEABLE fixed-grid
    histogram quantile sketch: 1024 equal-width buckets over
    [min, max] of o_totalprice; the q-quantile estimate is the upper
    edge of the first bucket whose cumulative count reaches ceil(q·n).
    THEOREM (holds for any data): the ceil(q·n)-th ORDER STATISTIC
    lies inside that bucket by construction, so |estimate − exact| ≤
    (max−min)/1024.  The reference must be the rank-select order
    statistic, NOT an interpolated percentile — interpolation at
    position 1+q(n−1) can blend two order statistics from different
    buckets and escape the bound (review finding r6: the interpolated
    p50 was within 3% of the bound on the sf0.01 fixture, one data
    drift from a red).

    Scale story: bucket counts are associative/commutative partial
    aggregates (daily histograms union by ADDING counts — no
    re-scan), where the exact order statistic needs a corpus sort;
    the 1024-row histogram is the only frame collected."""
    import math

    B = 1024
    o = _t(spark, sf_dir, "orders").select("o_totalprice")
    bounds = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    ).collect()[0]
    lo, hi = bounds.lo, bounds.hi
    width = (hi - lo) / B
    if width == 0:  # degenerate: every value identical — bound is trivial
        return spark.createDataFrame(
            [("p50", True), ("p90", True), ("p99", True)],
            "q string, within_bucket_width boolean",
        )
    bkt = F.least(
        F.lit(B - 1),
        F.floor((F.col("o_totalprice") - lo) / (hi - lo) * B),
    ).cast("int")
    hist = {
        r.b: r.n
        for r in o.groupBy(bkt.alias("b")).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n = sum(hist.values())

    rows = []
    for name, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        target = math.ceil(q * n)
        cum = 0
        b_q = B - 1
        for b in range(B):
            cum += hist.get(b, 0)
            if cum >= target:
                b_q = b
                break
        est = lo + (hi - lo) * (b_q + 1) / B
        # exact k-th smallest (rank-select): TakeOrdered-shaped
        # sort+limit, max of the prefix — no interpolation.
        exact = (
            o.orderBy("o_totalprice")
            .limit(target)
            .agg(F.max("o_totalprice").alias("v"))
            .collect()[0]
            .v
        )
        ok = abs(est - exact) <= width * (1 + 1e-9)
        rows.append((name, bool(ok)))
    return spark.createDataFrame(rows, "q string, within_bucket_width boolean")


# ------------------------------------------------ KMV (bottom-k) sketch

_KMV_K = 64
_KMV_A = "l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-03-31'"
_KMV_B = "l_shipdate BETWEEN TIMESTAMP '2001-01-01' AND TIMESTAMP '2001-03-31'"


@query(
    "kmv_sketch_part_overlap",
    oracle=f"""
        WITH ua AS (SELECT DISTINCT l_partkey AS id FROM lineitem
                    WHERE {_KMV_A}),
        ub AS (SELECT DISTINCT l_partkey AS id FROM lineitem
               WHERE {_KMV_B}),
        ha AS (SELECT id, md5(CAST(id AS VARCHAR)) AS h FROM ua
               ORDER BY h LIMIT {_KMV_K}),
        hb AS (SELECT id, md5(CAST(id AS VARCHAR)) AS h FROM ub
               ORDER BY h LIMIT {_KMV_K}),
        un AS (SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
               ORDER BY h LIMIT {_KMV_K}),
        est AS (
            SELECT count(*)::BIGINT AS m,
                   sum(CASE WHEN h IN (SELECT h FROM ha)
                             AND h IN (SELECT h FROM hb)
                        THEN 1 ELSE 0 END)::BIGINT AS n_both
            FROM un
        ),
        ex AS (
            SELECT (SELECT count(*) FROM ua)::BIGINT AS n_a,
                   (SELECT count(*) FROM ub)::BIGINT AS n_b,
                   (SELECT count(*) FROM (SELECT id FROM ua
                                          INTERSECT SELECT id FROM ub))::BIGINT
                       AS n_inter
        )
        SELECT CAST(n_both AS DOUBLE) / CAST(m AS DOUBLE) AS est_jaccard,
               CAST(n_inter AS DOUBLE)
                   / CAST(n_a + n_b - n_inter AS DOUBLE) AS exact_jaccard,
               n_a, n_b
        FROM est CROSS JOIN ex
    """,
)
def kmv_sketch_part_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k / theta-style) sketch set intersection: estimate
    the Jaccard overlap of the parts shipped in Q1-1995 vs Q1-2001
    from two 64-hash bottom-k sketches — the mergeable-sketch answer
    to "how much do these two huge sets overlap" without ever joining
    them.  est_J = |bottomk(A ∪ B) ∩ A_sketch ∩ B_sketch| / m, the
    classic KMV coincidence estimator.  Everything is DETERMINISTIC
    (md5 is a fixed function; bottom-k under the total hex order has
    no ties), so the sketch itself replays in SQL and the result is
    hash-certified, not tolerance-gated; the exact Jaccard is computed
    alongside for calibration.  Both ratios are single IEEE divisions
    of exact small integers, emitted unrounded.

    100 TB shape (r12, guide §1.2 / §2.4): ONE corpus scan — both
    quarter filters tag the same pass, one (id)-keyed aggregate
    carries per-id membership flags, and every downstream face reads
    that frame: each sketch is a TakeOrdered over its flag slice
    (map-side partial bottom-k per partition, k rows per partition to
    the final merge — never the corpus), the exact n_a/n_b/n_inter
    calibration counts are ONE aggregate over the flags (the former
    distinct + distinct + semi-join — three more corpus-derived
    shuffles — is gone), and sketches merge/intersect driver-free on
    64-row frames."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_shipdate")
    tagged = li.filter(F.expr(f"({_KMV_A}) OR ({_KMV_B})")).select(
        F.col("l_partkey").alias("id"),
        F.expr(_KMV_A).cast("int").alias("a"),
        F.expr(_KMV_B).cast("int").alias("b"),
    )
    g = (
        tagged.groupBy("id")
        .agg(F.max("a").alias("ina"), F.max("b").alias("inb"))
        .withColumn("h", F.md5(F.col("id").cast("string").cast("binary")))
        .localCheckpoint(eager=True)
    )

    def sketch(flag: str) -> DataFrame:
        return g.filter(F.col(flag) == 1).select("h").orderBy("h").limit(_KMV_K)

    ha = sketch("ina").localCheckpoint(eager=True)
    hb = sketch("inb").localCheckpoint(eager=True)
    un = ha.union(hb).distinct().orderBy("h").limit(_KMV_K)
    est = (
        un.join(ha.withColumn("xa", F.lit(1)), "h", "left")
        .join(hb.withColumn("xb", F.lit(1)), "h", "left")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.sum(
                F.when(F.col("xa").isNotNull() & F.col("xb").isNotNull(), 1)
                .otherwise(0)
            ).alias("n_both"),
        )
    )
    c = g.agg(
        F.sum("ina").alias("na"),
        F.sum("inb").alias("nb"),
        F.sum(
            F.when((F.col("ina") == 1) & (F.col("inb") == 1), 1).otherwise(0)
        ).alias("ni"),
    ).collect()[0]
    n_a, n_b, n_inter = int(c["na"]), int(c["nb"]), int(c["ni"])
    return est.select(
        (F.col("n_both").cast("double") / F.col("m").cast("double")).alias(
            "est_jaccard"
        ),
        F.lit(float(n_inter) / float(n_a + n_b - n_inter)).alias("exact_jaccard"),
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
    )
