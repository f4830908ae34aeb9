"""Invariant tests for the eval-metrics and pairs/retrieval packs —
property checks that hold independently of the DuckDB oracle (which
certifies cross-engine value parity; these certify the STATISTICS are
the statistics they claim to be).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_utils_spark.queries import REGISTRY
from etl_utils_spark.sources.tables import load_table


def _run(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


# ------------------------------------------------------------------ AUC


def test_auc_matches_bruteforce_midrank(spark, sf_dir):
    """The distributed prefix-sum AUC must equal the literal
    Mann-Whitney midrank computation on the collected column."""
    row = _run("eval_auc_purchase_value", spark, sf_dir).collect()[0]
    e = load_table(spark, sf_dir, "events").select("value", "event_type").collect()
    scored = sorted((r["value"], r["event_type"] == "purchase") for r in e)
    # midranks via per-value tie groups
    from itertools import groupby

    rank_sum, i = 0.0, 0
    n_pos = sum(1 for _, y in scored if y)
    for _, grp in groupby(scored, key=lambda t: t[0]):
        grp = list(grp)
        mid = i + (len(grp) + 1) / 2.0  # 1-based midrank
        rank_sum += mid * sum(1 for _, y in grp if y)
        i += len(grp)
    n = len(scored)
    expect = (rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * (n - n_pos))
    assert row["n_pos"] == n_pos and row["n_neg"] == n - n_pos
    assert abs(row["auc"] - expect) < 1e-12
    assert 0.0 <= row["auc"] <= 1.0


# ------------------------------------------------------------ bootstrap


def test_bootstrap_replicates_shape_and_concentration(spark, sf_dir):
    rows = _run("stats_bootstrap_ci_mean", spark, sf_dir).collect()
    assert len(rows) == 32
    n = load_table(spark, sf_dir, "orders").count()
    true_mean = (
        load_table(spark, sf_dir, "orders")
        .agg(F.avg("o_totalprice").alias("m"))
        .collect()[0]["m"]
    )
    means = [r["boot_mean"] for r in rows]
    for r in rows:
        # Poisson(1) weights: n_eff concentrates around n (±15% is
        # ~6 sigma at the smallest fixture)
        assert 0.8 * n < r["n_eff"] < 1.2 * n
    # the bootstrap distribution must straddle the point estimate
    assert min(means) < true_mean < max(means)
    # and actually vary (distinct LCG draws per replicate)
    assert len(set(means)) > 16


# ---------------------------------------------------------- Mann-Kendall


def test_mann_kendall_bounds(spark, sf_dir):
    row = _run("stats_mann_kendall_monthly", spark, sf_dir).collect()[0]
    k = row["n_months"]
    assert abs(row["s_stat"]) <= k * (k - 1) // 2
    assert row["var18"] > 0
    assert row["z_mk"] == row["z_mk"]  # not NaN


# -------------------------------------------------------------- skyline


def test_skyline_is_exactly_the_pareto_frontier(spark, sf_dir):
    sky = {
        (r["o_totalprice"], r["od"])
        for r in _run("skyline_orders_pareto", spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders")
    pts = {
        (r["o_totalprice"], r["od"])
        for r in o.select(
            "o_totalprice", F.col("o_orderdate").cast("date").alias("od")
        ).collect()
    }

    def dominated(a, pts):
        return any(
            b[0] >= a[0] and b[1] >= a[1] and b != a for b in pts
        )

    for p in pts:
        assert (p in sky) == (not dominated(p, pts)), p


# ------------------------------------------------------------------ RRF


def test_rrf_scores_are_rank_consistent(spark, sf_dir):
    rows = _run("rrf_fuse_multi_query", spark, sf_dir).collect()
    assert len(rows) <= 20 and rows
    for r in rows:
        expect = 0.0
        if r["rank_a"] is not None:
            assert 1 <= r["rank_a"] <= 100
            expect += 1.0 / (60 + r["rank_a"])
        if r["rank_b"] is not None:
            assert 1 <= r["rank_b"] <= 100
            expect += 1.0 / (60 + r["rank_b"])
        assert abs(r["rrf"] - expect) < 1e-15
    # descending fused order with doc_id tie-break
    vals = [(-r["rrf"], r["doc_id"]) for r in rows]
    assert vals == sorted(vals)


# --------------------------------------------- sorted-neighborhood dedup


def test_snm_catches_exact_duplicates_and_orders_pairs(spark, sf_dir):
    out = _run("dedup_sorted_neighborhood", spark, sf_dir).collect()
    assert all(r["id_a"] < r["id_b"] for r in out)
    assert all(r["jaccard"] >= 0.5 for r in out)
    # exact-duplicate texts sort adjacent within their block, so every
    # doc_id-adjacent exact-dup pair must be recovered at jaccard 1.0
    d = load_table(spark, sf_dir, "documents")
    dups = (
        d.groupBy("text")
        .agg(F.collect_list("doc_id").alias("ids"), F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") == 2)
        .collect()
    )
    found = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
    for r in dups:
        pair = tuple(sorted(r["ids"]))
        assert found.get(pair) == 1.0, pair


# ----------------------------------------------------- inference_v2 pack


def test_randomization_test_pvalue_bounds(spark, sf_dir):
    row = _run("stats_randomization_test_diff", spark, sf_dir).collect()[0]
    assert row["n_reps"] == 64
    assert 0 <= row["n_extreme"] <= 64
    assert 0.0 < row["p_value"] <= 1.0
    assert row["diff_obs"] == row["diff_obs"]  # not NaN


def test_theilsen_pair_count_and_finiteness(spark, sf_dir):
    row = _run("stats_theilsen_monthly", spark, sf_dir).collect()[0]
    k = (
        load_table(spark, sf_dir, "orders")
        .select(F.date_trunc("month", "o_orderdate"))
        .distinct()
        .count()
    )
    assert row["n_pairs"] == k * (k - 1) // 2
    assert abs(row["theil_sen_slope"]) < 1e12


def test_seasonal_decomposition_identity_and_edges(spark, sf_dir):
    rows = _run("seasonal_decompose_daily", spark, sf_dir).collect()
    days = sorted(r["day"] for r in rows)
    for r in rows:
        edge = r["day"] in days[:3] or r["day"] in days[-3:]
        if edge:
            assert r["trend"] is None and r["resid"] is None
        else:
            assert r["trend"] is not None
            # additive identity holds exactly by construction
            assert abs(r["n"] - r["trend"] - r["seasonal"] - r["resid"]) < 1e-9


def test_two_proportion_ztest_sane(spark, sf_dir):
    row = _run("stats_two_proportion_ztest", spark, sf_dir).collect()[0]
    assert 0.0 <= row["p1"] <= 1.0 and 0.0 <= row["p2"] <= 1.0
    assert row["x1"] <= row["n1"] and row["x2"] <= row["n2"]
    assert abs(row["z"]) < 50


def test_markov_top1_accuracy_bounds(spark, sf_dir):
    rows = _run("markov_top1_accuracy", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_correct"] <= r["n_total"]
        # the modal transition's share must be at least uniform (5 states)
        assert r["accuracy"] >= 1.0 / 5 - 0.1


def test_jl_gate_passes(spark, sf_dir):
    row = _run("gate_jl_distortion_bounded", spark, sf_dir).collect()[0]
    assert row["median_ratio_in_bounds"] is True


def test_snm_shingles_safe_on_short_docs(spark):
    """Spark's sequence(0, -1) is [0, -1], not empty — docs with <3
    tokens must yield an empty shingle set, not an index crash."""
    from etl_utils_spark.operators.text import _alpha_tokens
    from etl_utils_spark.queries.pairs_retrieval import _trigram_shingles

    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "one two"), (4, "a b c d")],
        "doc_id long, text string",
    )
    rows = (
        df.select("doc_id", _alpha_tokens("text").alias("toks"))
        .select("doc_id", _trigram_shingles().alias("sh"))
        .collect()
    )
    got = {r["doc_id"]: r["sh"] for r in rows}
    assert got[1] == [] and got[2] == [] and got[3] == []
    assert got[4] == ["a b c", "b c d"]
