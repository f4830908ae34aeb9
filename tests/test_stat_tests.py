"""Invariant tests for the statistics & sampling and drift packs —
properties the DuckDB parity gate cannot express (parity certifies
engine agreement; these pin mathematical shape)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_utils_spark.queries import REGISTRY


def _run(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


def test_chi2_nonnegative_and_dof(spark, sf_dir):
    row = _run("stats_chi2_lang_source", spark, sf_dir).collect()[0]
    assert row["chi2"] >= 0.0
    assert row["dof"] > 0
    assert row["n"] > 0


def test_welch_dof_between_group_sizes(spark, sf_dir):
    """Welch–Satterthwaite dof lies in [min(n)-1, n_f+n_o-2]."""
    row = _run("stats_ttest_price_by_status", spark, sf_dir).collect()[0]
    assert min(row["n_f"], row["n_o"]) - 1 <= row["dof"] <= row["n_f"] + row["n_o"] - 2


def test_ks_d_in_unit_interval(spark, sf_dir):
    row = _run("stats_ks_binned_prices", spark, sf_dir).collect()[0]
    assert 0.0 <= row["d_stat"] <= 1.0


def test_rolling_corr_bounded(spark, sf_dir):
    df = _run("stats_rolling_corr_price_qty", spark, sf_dir)
    bad = df.filter(
        F.col("rcorr").isNotNull() & (F.abs("rcorr") > 1.0 + 1e-9)
    ).count()
    assert bad == 0


def test_max_concurrent_sanity(spark, sf_dir):
    """Peak concurrency is >=1 and cannot exceed the distinct-user
    count (a user holds at most one open session at a time)."""
    from etl_utils_spark.sources.tables import load_table

    row = _run("max_concurrent_sessions", spark, sf_dir).collect()[0]
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert 1 <= row["max_concurrent"] <= n_users


def test_sliding_distinct_dominates_daily(spark, sf_dir):
    """The 7-day trailing distinct count is >= the same day's 1-day
    distinct count for every day that has events."""
    from etl_utils_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select("user_id", F.to_date(F.date_trunc("day", "ts")).alias("d"))
        .distinct()
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n1"))
    )
    win = _run("sliding_distinct_users_7d", spark, sf_dir)
    joined = daily.join(win, daily["d"] == win["window_end"])
    bad = joined.filter(F.col("n_users") < F.col("n1")).count()
    assert bad == 0


def test_reservoir_exact_k_and_uniform_keys(spark, sf_dir):
    """Exactly k rows per group whenever the group has >= k rows, and
    every kept u is in [0, 1)."""
    from etl_utils_spark.queries.stat_tests import _RESERVOIR_K
    from etl_utils_spark.sources.tables import load_table

    out = _run("sample_reservoir_per_type", spark, sf_dir)
    sizes = {
        r["event_type"]: r["c"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    kept = {r["event_type"]: r["c"] for r in out.groupBy("event_type").agg(F.count(F.lit(1)).alias("c")).collect()}
    for t, n in sizes.items():
        assert kept.get(t, 0) == min(_RESERVOIR_K, n), (t, n, kept.get(t))
    assert out.filter((F.col("u") < 0) | (F.col("u") >= 1)).count() == 0


def test_weighted_sample_prefers_long_docs(spark, sf_dir):
    """E–S sampling with w = n_chars must skew the kept set long: the
    kept mean n_chars exceeds the corpus mean (overwhelmingly likely
    for k=50 of >=500 docs; deterministic given the fixed md5 keys)."""
    from etl_utils_spark.sources.tables import load_table

    out = _run("sample_weighted_docs_es", spark, sf_dir)
    kept_mean = out.agg(F.avg("n_chars")).collect()[0][0]
    corpus_mean = (
        load_table(spark, sf_dir, "documents").agg(F.avg("n_chars")).collect()[0][0]
    )
    assert kept_mean > corpus_mean


def test_psi_nonnegative(spark, sf_dir):
    row = _run("drift_psi_value_split", spark, sf_dir).collect()[0]
    assert row["psi"] >= 0.0


def test_jsd_bounded_by_ln2(spark, sf_dir):
    df = _run("drift_js_lang_by_source", spark, sf_dir)
    bad = df.filter((F.col("jsd") < -1e-9) | (F.col("jsd") > math.log(2) + 1e-9)).count()
    assert bad == 0


def test_mutual_info_bounds(spark, sf_dir):
    """0 <= I(X;Y) <= H(X,Y)."""
    row = _run("stats_mutual_info_lang_source", spark, sf_dir).collect()[0]
    assert -1e-9 <= row["mutual_info"] <= row["joint_entropy"] + 1e-9


def test_loo_encoding_excludes_self(spark, sf_dir):
    """For any category with n>1, the LOO value differs from the plain
    category mean wherever the row's own price differs from the mean —
    spot-check: loo * (n-1) + own = category sum."""
    from etl_utils_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy("o_orderpriority").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    out = _run("feature_target_encode_priority", spark, sf_dir)
    j = (
        out.join(o.select("o_orderkey", "o_totalprice"), "o_orderkey")
        .join(g, "o_orderpriority")
        .filter(F.col("n") > 1)
    )
    bad = j.filter(
        F.abs(F.col("loo_price") * (F.col("n") - 1) + F.col("o_totalprice") - F.col("s"))
        > 1e-6 * F.abs(F.col("s"))
    ).count()
    assert bad == 0


def test_exact_quantile_matches_sorted_rank(spark, sf_dir):
    """exact_quantile == the literal sorted-array order statistic for
    several q, on real data with heavy duplicate mass (value has 2
    decimals) — ties exercise the rank arithmetic."""
    from etl_utils_spark.operators.order_stats import exact_quantile
    from etl_utils_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    vals = sorted(r["value"] for r in e.select("value").collect())
    n = len(vals)
    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        expect = vals[int((n - 1) * q)]
        got = exact_quantile(e, "value", q)
        assert got == expect, (q, got, expect)


def test_exact_quantile_edge_cases(spark):
    from etl_utils_spark.operators.order_stats import exact_quantile

    empty = spark.createDataFrame([], "x double")
    assert exact_quantile(empty, "x", 0.5) is None
    const = spark.createDataFrame([(7.0,)] * 100, "x double")
    assert exact_quantile(const, "x", 0.5) == 7.0
    with_nulls = spark.createDataFrame(
        [(None,), (1.0,), (3.0,), (2.0,), (None,)], "x double"
    )
    assert exact_quantile(with_nulls, "x", 0.5) == 2.0


def test_exact_quantile_small_take_limit_recurses(spark, sf_dir):
    """Force the recursion path (take_limit=1 → every bracket is 'too
    large' until it collapses or pins a single rank window)."""
    from etl_utils_spark.operators.order_stats import exact_quantile
    from etl_utils_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events").limit(500)
    vals = sorted(r["value"] for r in e.select("value").collect())
    got = exact_quantile(e, "value", 0.5, accuracy=100, take_limit=1)
    assert got == vals[int((len(vals) - 1) * 0.5)]


def test_langid_confusion_totals(spark, sf_dir):
    """Confusion-matrix cell counts sum to the corpus size."""
    from etl_utils_spark.sources.tables import load_table

    out = _run("langid_confusion_matrix", spark, sf_dir)
    total = out.agg(F.sum("n")).collect()[0][0]
    assert total == load_table(spark, sf_dir, "documents").count()


def test_vocab_coverage_bounds(spark, sf_dir):
    row = _run("vocab_coverage_top100", spark, sf_dir).collect()[0]
    assert 0.0 < row["coverage"] <= 1.0
    assert 0 < row["covered_tokens"] <= row["total_tokens"]


def test_referential_integrity_shape(spark, sf_dir):
    rows = _run("dq_referential_integrity", spark, sf_dir).collect()
    assert len(rows) == 5
    assert all(r["violations"] >= 0 for r in rows)


def test_weighted_quantile_matches_expanded_multiset(spark):
    """weighted_quantile == unweighted order statistic of the
    weight-expanded multiset (smallest x with cum weight >= q*W)."""
    from etl_utils_spark.operators.order_stats import weighted_quantile

    rows = [(1.0, 1), (2.0, 5), (3.0, 2), (4.0, 1)]  # W = 9
    df = spark.createDataFrame(rows, "x double, w int")
    expanded = sorted(x for x, w in rows for _ in range(w))

    def manual(qn, qd):
        W = len(expanded)
        cum = 0
        seen = {}
        for x in expanded:
            cum += 1
            seen.setdefault(x, cum)
        # smallest x whose cumulative weight passes qn/qd of W
        run = 0
        for x, w in rows:
            run += w
            if run * qd >= qn * W:
                return x
        raise AssertionError

    for qn, qd in [(1, 2), (1, 4), (9, 10), (1, 1)]:
        assert weighted_quantile(df, "x", "w", qn, qd) == manual(qn, qd), (qn, qd)


def test_weighted_quantile_zero_weight(spark):
    from etl_utils_spark.operators.order_stats import weighted_quantile

    df = spark.createDataFrame([(1.0, 0), (2.0, 0)], "x double, w int")
    assert weighted_quantile(df, "x", "w", 1, 2) is None


def test_exact_rank_bounds(spark):
    import pytest

    from etl_utils_spark.operators.order_stats import exact_rank

    df = spark.createDataFrame([(float(i),) for i in range(10)], "x double")
    assert exact_rank(df, "x", 0) == 0.0
    assert exact_rank(df, "x", 9) == 9.0
    with pytest.raises(ValueError):
        exact_rank(df, "x", 10)
