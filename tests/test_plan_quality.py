"""Plan-quality gates: the physical plans must be the ones that
survive a 100× scale-up — pushdown, pruning, broadcast, top-k
compilation, no accidental cartesians. These tests pin the .explain
output, not just the results."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_utils_spark.plans import (
    formatted_plan,
    has_broadcast_join,
    has_cartesian_or_bnl,
    pushed_filters,
    read_schema_columns,
)
from etl_utils_spark.queries import REGISTRY
from etl_utils_spark.sources.tables import load_table


def _q(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = _q("filter_conj_events", spark, sf_dir)
    pf = " ".join(pushed_filters(df))
    assert "event_type" in pf and "value" in pf, pf


def test_projection_prunes_scan(spark, sf_dir):
    df = _q("project_orders_cols", spark, sf_dir)
    schemas = read_schema_columns(df)
    assert schemas and schemas[0] == {"o_orderkey", "o_custkey", "o_totalprice"}, schemas


def test_count_star_prunes_all_columns(spark, sf_dir):
    df = _q("scan_count_lineitem", spark, sf_dir)
    schemas = read_schema_columns(df)
    assert schemas and all(len(s) == 0 for s in schemas), schemas


def test_dim_join_broadcasts(spark, sf_dir):
    assert has_broadcast_join(_q("join_broadcast_nation_region", spark, sf_dir))
    assert has_broadcast_join(_q("agg_rollup_nation_region", spark, sf_dir))


def test_topk_compiles_to_take_ordered(spark, sf_dir):
    plan = formatted_plan(_q("topk_orders_by_price", spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan[:800]


def test_window_rank_uses_group_limit(spark, sf_dir):
    plan = formatted_plan(_q("window_rank_orders_by_price", spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan[:800]


def test_range_join_is_not_nested_loop(spark, sf_dir):
    """The equi-key must make the range join a hash/sort-merge join
    with the range as post-condition — NOT BroadcastNestedLoopJoin."""
    df = _q("join_range_events", spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    ), plan[:1200]


def test_no_accidental_cartesians_across_registry(spark, sf_dir):
    """Only the explicitly-cross queries may contain a cartesian/BNL
    operator (topk_cosine brute force is an intentional broadcast NLJ).

    The allowed set is the intentional-BNL inventory; every entry must
    have a bounded build side:
    - join_cross_region_nation: declared cross join of two bounded dims.
    - topk_cosine_neighbors[_lsh]: brute-force / LSH probe joins with a
      broadcast (bounded) probe set.
    - knn_majority_label: reuses the brute-force probe join above.
    - bm25_rank_docs / bm25_topk_maxscore / time_decay_user_score:
      1-row corpus-stats frames (aggregate without grouping; maxscore
      adds the 1-row per-term upper-bound frame) broadcast via
      crossJoin — the no-collect scalar-anchor pattern; build sides
      are provably one row.
    - stats_chi2_lang_source: margins grid cross join bounded by the
      category product |langs|×|sources| (fixture: 5×16) plus a 1-row N.
    - stats_ttest_price_by_status: two 1-row moment frames.
    - stats_ks_binned_prices: bins × tot cross join — tot is provably
      2 rows (one per sample), plus two 1-row total frames at the end.
    - max_concurrent_sessions / sliding ...: 1-row max frame joined
      back on a non-equi predicate (conc == mx).
    """
    allowed = {
        "join_cross_region_nation",
        "topk_cosine_neighbors",
        "topk_cosine_neighbors_lsh",
        "knn_majority_label",
        "bm25_rank_docs",
        "bm25_topk_maxscore",
        "time_decay_user_score",
        "stats_chi2_lang_source",
        "stats_ttest_price_by_status",
        "stats_ks_binned_prices",
        "max_concurrent_sessions",
        # drift pack: grids bounded by bin/category cardinality plus
        # 1-row total frames (PSI: bins×2-sample totals×1-row bin
        # count; JS: |sources|×|langs|×1-row corpus total; MI: 1-row
        # corpus total cross join)
        "drift_psi_value_split",
        "drift_js_lang_by_source",
        "stats_mutual_info_lang_source",
        # benford: 1-row total frame broadcast via crossJoin
        "dq_benford_totalprice",
        # vocab coverage: two 1-row aggregates cross-joined
        "vocab_coverage_top100",
        # lift: 1-row distinct-order total cross-joined onto 20 rows
        "copurchase_lift_pairs",
        # behavioral/timeseries/text packs: bounded-anchor BNLs —
        # rfm: 1-row max-date frame; kaplan_meier: 1-row horizon frame
        # + broadcast death-time table bounded by distinct durations;
        # acf: 12-row lag grid; heaps: 1-row bucket-width frame ×2
        "rfm_segmentation",
        "kaplan_meier_user_churn",
        "acf_hourly_events",
        "heaps_vocab_growth",
        # randomization test: 1-row observed-stats frame crossJoined
        # (scalar-anchor); theilsen: O(k²) slope join on the
        # calendar-bounded monthly frame; JL gate: distance-pair audit
        # on the fixed 100-vector probe sample
        "stats_randomization_test_diff",
        "stats_theilsen_monthly",
        "gate_jl_distortion_bounded",
        # RRF fusion: reuses bm25_scores' 1-row corpus-stats crossJoin
        # (the no-collect scalar-anchor pattern), twice
        "rrf_fuse_multi_query",
        # Mann-Kendall: the O(k²) sign-pair join runs on the monthly
        # aggregate (calendar-bounded, ~80 rows at any data scale)
        # plus two 1-row n/tie frames cross-joined at the end
        "stats_mann_kendall_monthly",
        # hard-negative mining / NDCG eval: broadcast anchor set (8
        # vectors) × one corpus scan — the same bounded-BNL shape as
        # topk_cosine_neighbors (the NDCG query also cross-joins the
        # 1-row IDCG constant on the oracle side only)
        "mine_hard_negatives",
        "eval_ndcg_quantized_retrieval",
        "eval_recall_mrr_quantized",
        # Cramér's V: the same |langs|×|sources| margins grid + 1-row N
        # cross join as the allowlisted stats_chi2_lang_source
        "stats_cramers_v_lang_source",
        # DSIR: the 1-row (raw-total, target-total) scalar-anchor frame
        # cross-joined into the 256-row bucket log-ratio table — the
        # no-collect scalar pattern; every corpus-sized join is keyed
        "dsir_importance_resample",
        # funnel: three 1-row stage-count frames cross-joined into the
        # single summary row (scalar-anchor); the corpus-sized joins
        # are all user_id-keyed
        "funnel_conversion_windowed",
        # KS / Mann-Whitney: 1-row sample-size frames (n1, n2 / n1, N)
        # cross-joined onto the value-cardinality-bounded count frame
        # and the 1-row max/moment frame — scalar-anchor pattern; the
        # rank machinery itself is keyed prefix_sum, no corpus BNL
        "stats_ks_two_sample_price",
        "stats_mann_whitney_price",
    }
    offenders = []
    for name, q in sorted(REGISTRY.items()):
        if name in allowed or name.startswith("stream_"):
            continue  # streaming plans need execution to materialize
        df = q.fn(spark, sf_dir)
        if has_cartesian_or_bnl(df):
            offenders.append(name)
    assert not offenders, offenders


def test_salted_join_spreads_key_and_avoids_broadcast(spark, sf_dir):
    """The salted join must actually demonstrate salting: a shuffled
    join keyed on (user_id, _salt) — if Spark broadcast the replicated
    dim, the salt would be decorative."""
    df = _q("join_salted_skew_events", spark, sf_dir)
    plan = formatted_plan(df)
    assert "ShuffledHashJoin" in plan, plan[:1200]
    assert "BroadcastHashJoin" not in plan, plan[:1200]
    assert "_salt" in plan


def test_semi_join_prunes_probe_columns(spark, sf_dir):
    df = _q("join_semi_customer_with_orders", spark, sf_dir)
    schemas = read_schema_columns(df)
    # the orders-side scan must read ONLY the join key
    assert {"o_custkey"} in schemas, schemas


def test_asof_join_single_shuffle(spark, sf_dir):
    """The union-and-carry as-of join must shuffle once on the key,
    not create a join explosion."""
    df = _q("asof_purchase_last_click", spark, sf_dir)
    plan = formatted_plan(df)
    assert "Join" not in plan, plan[:1200]
    n_exchanges = plan.count("+- Exchange") + plan.count("   Exchange")
    assert n_exchanges == 1 and "hashpartitioning" in plan, plan[:1500]


def test_connected_components_plan_depth_constant(spark):
    """CC lineage must be truncated per round (localCheckpoint): on a
    chain graph forcing many propagation rounds, the final plan must be
    a scan of the checkpointed RDD — not a replay of every join round
    (r1's plan doubled per iteration)."""
    from etl_utils_spark.operators.clustering import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    # driver_side_limit=0 forces the DISTRIBUTED propagation loop —
    # this test pins ITS lineage; the driver-side union-find path has
    # no lineage to bound
    labels = connected_components(chain, driver_side_limit=0)
    plan = formatted_plan(labels)
    assert "Join" not in plan, plan
    comps = {r.comp for r in labels.collect()}
    assert comps == {0}


def test_q6_predicates_push_to_scan(spark, sf_dir):
    df = _q("q6_forecast_revenue", spark, sf_dir)
    pf = " ".join(pushed_filters(df))
    assert "l_shipdate" in pf and "l_quantity" in pf and "l_discount" in pf, pf


def test_q8_dimension_joins_broadcast(spark, sf_dir):
    df = _q("q8_market_share", spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert not has_cartesian_or_bnl(df), plan


def test_q4_uses_semi_join(spark, sf_dir):
    plan = formatted_plan(_q("q4_order_priority", spark, sf_dir))
    assert "LeftSemi" in plan or "left_semi" in plan.lower(), plan


def test_q22_anti_join_no_cartesian(spark, sf_dir):
    df = _q("q22_sales_opportunity", spark, sf_dir)
    plan = formatted_plan(df)
    assert "LeftAnti" in plan or "left_anti" in plan.lower(), plan
    assert not has_cartesian_or_bnl(df), plan


def test_q10_topk_compiles_to_take_ordered(spark, sf_dir):
    plan = formatted_plan(_q("q10_returned_items", spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_io_partitioned_scan_prunes_partitions(spark, sf_dir):
    df = _q("io_partitioned_prune", spark, sf_dir)
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan and "order_year" in plan.split("PartitionFilters", 1)[1][:200], plan


def test_ewma_single_shuffle_no_window(spark, sf_dir):
    """The EWMA recurrence must be exactly one hash shuffle on the key
    into a partition-local sort + mapInPandas scan (one Python call per
    Arrow batch, NOT per key) — no window stage, no join."""
    plan = formatted_plan(_q("ewma_user_value", spark, sf_dir))
    assert "MapInPandas" in plan, plan[:1200]
    assert "Join" not in plan and "Window" not in plan, plan[:1200]
    assert plan.count("Exchange (") == 1 and "hashpartitioning(user_id" in plan, plan[:1500]


def test_bigrams_no_per_doc_window(spark, sf_dir):
    """Bigram pairing is array-side (slice+zip_with): the plan must be
    explode → hash aggregate with NO Window operator and NO join."""
    plan = formatted_plan(_q("ngram_top_bigrams", spark, sf_dir))
    assert "explode(zip_with" in plan, plan[:2500]
    assert "Window" not in plan and "Join" not in plan, plan[:1200]
    assert "TakeOrderedAndProject" in plan, plan[:1200]


def test_incremental_refresh_prunes_and_partials(spark, sf_dir):
    """Both branch scans must push the date filter and read only the
    three needed columns (at 100 TB the delta branch touches one
    partition)."""
    df = _q("incremental_agg_refresh", spark, sf_dir)
    pf = " ".join(pushed_filters(df))
    assert "o_orderdate" in pf, pf
    for s in read_schema_columns(df):
        assert s <= {"o_orderstatus", "o_orderdate", "o_totalprice"}, s


def test_q15_max_subquery_is_broadcast_hash_join(spark, sf_dir):
    """The Q15 scalar-max filter must compile to broadcast HASH joins
    (equi-join on the max value) — no nested-loop, no cartesian."""
    df = _q("q15_top_supplier", spark, sf_dir)
    assert not has_cartesian_or_bnl(df), formatted_plan(df)[:1500]
    assert has_broadcast_join(df)


def test_winsorize_by_group_broadcasts_bounds(spark, sf_dir):
    """Per-group winsorize must broadcast the group-bounds frame back
    onto the fact table — a shuffled join would re-exchange orders."""
    df = _q("winsorized_prices_by_priority", spark, sf_dir)
    assert has_broadcast_join(df)
    assert not has_cartesian_or_bnl(df)


def test_tfidf_topk_uses_window_group_limit(spark, sf_dir):
    """Top-3 per doc must prune via WindowGroupLimit before the final
    sort — rank-then-filter over the full scored set would sort every
    (doc, term) row."""
    plan = formatted_plan(_q("tfidf_top_terms", spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan[:800]


def test_attribution_single_shuffle_no_pairs(spark, sf_dir):
    """Last-touch attribution rides the union-and-carry as-of join:
    no cartesian/BNL, and at most the one user_id exchange plus the
    final channel aggregate."""
    df = _q("attribution_last_touch", spark, sf_dir)
    assert not has_cartesian_or_bnl(df)
    plan = formatted_plan(df)
    import re

    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 2, f"{n_exchanges} exchanges\n{plan[:1200]}"


def test_funnel_windows_share_one_exchange(spark, sf_dir):
    """The three chained funnel windows all partition by user_id, so
    the plan must contain ONE exchange for them (plus the final
    single-row aggregate)."""
    df = _q("funnel_view_click_purchase", spark, sf_dir)
    plan = formatted_plan(df)
    hash_exchanges = plan.count("Exchange hashpartitioning")
    assert hash_exchanges <= 1, f"{hash_exchanges} hash exchanges\n{plan[:1200]}"


def test_binning_no_sort_no_window(spark, sf_dir):
    """Equal-frequency binning must assign buckets via scan-side
    comparisons against driver literals — a global ntile would show a
    single-partition Sort + Window."""
    plan = formatted_plan(_q("binning_decile_prices", spark, sf_dir))
    assert "Window" not in plan, plan[:800]
    assert "Exchange SinglePartition" not in plan.split("Aggregate")[0], plan[:800]


def test_dq_expectations_single_scan(spark, sf_dir):
    """All five quality checks must ride one scan of orders — five
    separate jobs would read the table five times."""
    import re

    plan = formatted_plan(_q("dq_expectations_orders", spark, sf_dir))
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 1, f"{n_scans} scans\n{plan[:1200]}"


def test_triangle_join_no_cartesian(spark, sf_dir):
    """Degree-oriented triangle enumeration must stay hash/sort-merge
    joins — no BNL, no cartesian — and the closing edge must be a
    (left)semi join so wedges are never duplicated."""
    df = _q("triangle_local_clustering", spark, sf_dir)
    assert not has_cartesian_or_bnl(df)
    plan = formatted_plan(df)
    assert "Semi" in plan, plan[:1200]


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """Spark's runtime bloom-filter join filter must inject a
    might_contain() predicate on the fact side when the dim side is
    selectively filtered and the join is shuffled — the row-level
    runtime pruning that cuts shuffle volume on selective joins at
    scale.  (Thresholds are lowered because the fixture is tiny; at
    production scale the defaults fire on their own.)"""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        l = load_table(spark, sf_dir, "lineitem")
        j = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = formatted_plan(j)
        assert "might_contain" in plan, plan[:1500]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_cbo_statistics_surface(spark, sf_dir, tmp_path):
    """ANALYZE TABLE feeds the cost-based optimizer: after computing
    table + column statistics, the optimized logical plan must carry a
    row count, and a stats-informed join must broadcast the small
    side without an explicit hint."""
    import uuid

    from etl_utils_spark.sources.tables import load_table

    name = f"cbo_probe_{uuid.uuid4().hex[:8]}"
    load_table(spark, sf_dir, "nation").write.saveAsTable(name)
    try:
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR ALL COLUMNS")
        stats = spark.sql(f"DESCRIBE EXTENDED {name}").collect()
        stat_row = [r for r in stats if r.col_name == "Statistics"]
        assert stat_row and "rows" in stat_row[0].data_type, stats
        # stats-informed planning: joining the analyzed 25-row table
        # against a fact frame broadcasts it with NO hint
        orders = load_table(spark, sf_dir, "orders")
        j = orders.join(
            spark.table(name), orders.o_custkey % 25 == spark.table(name).n_nationkey
        )
        from etl_utils_spark.plans import has_broadcast_join

        assert has_broadcast_join(j)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_dir, tmp_path):
    """Dynamic partition pruning: a fact table PARTITIONED BY join key,
    joined to a dimension with a selective filter, must prune fact
    partitions at RUNTIME via a dynamicpruning subquery on the scan —
    at 100 TB this is the difference between scanning one partition
    and scanning the table.  (Static pruning is pinned by
    io_partitioned_prune; this pins the join-driven form.)"""
    fact_dir = str(tmp_path / "dpp_fact")
    events = load_table(spark, sf_dir, "events")
    events.withColumn("type_key", F.col("event_type")).write.partitionBy(
        "type_key"
    ).parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    # An aggregated dim with a PREFIX filter on the join key: the
    # sargable prefix transposes statically, and the exact key set is
    # enforced at runtime through the dynamicpruning IN-subquery (a
    # literal equality would be fully transposed and need no DPP).
    dim = (
        events.groupBy(F.col("event_type").alias("type_key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("type_key").startswith("p"))
    )
    j = fact.join(dim, "type_key").select("type_key", "event_id")
    plan = formatted_plan(j)
    assert "dynamicpruning" in plan.lower(), plan[:1500]
    # and the pruned scan must actually return only the one 'p' type
    assert j.select("type_key").distinct().count() == 1


def test_kmeans_centroid_join_broadcasts(spark, sf_dir):
    """Distributed Lloyd must join the corpus against the k x dim
    centroid table via BROADCAST (512-row build side) — a shuffled or
    nested-loop centroid join would add a corpus exchange per
    iteration."""
    df = _q("kmeans_embed_lloyd2", spark, sf_dir)
    assert has_broadcast_join(df)
    assert not has_cartesian_or_bnl(df)


def test_kmv_sketch_compiles_to_take_ordered(spark, sf_dir):
    """The bottom-k sketch build must compile to TakeOrdered (map-side
    partial bottom-k, k rows per partition to the final merge) — a
    global sort before the LIMIT would be a single-reducer sketch."""
    plan = formatted_plan(_q("kmv_sketch_part_overlap", spark, sf_dir))
    assert "TakeOrdered" in plan, plan[:1200]


def test_aqe_coalesces_shuffle_partitions(spark, sf_dir):
    """AQE must be live in the session (session.py pins it on): after
    execution, a small post-shuffle stage should show an AQEShuffleRead
    that coalesced the configured shuffle partitions down to the data's
    actual size — the runtime re-plan this engine relies on instead of
    hand-tuning spark.sql.shuffle.partitions per query."""
    df = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .count()
    )
    df.collect()  # adaptive plans finalize on execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan, plan[:1200]
    assert "coalesced" in plan, plan[:1200]


def test_duplicate_spans_semi_join_no_cartesian(spark, sf_dir):
    """The span detector's back-join must stay a LEFT-SEMI on the gram
    hash (positions join a DISTINCT hash set — pair explosion is
    structurally impossible) with no cartesian anywhere."""
    plan = formatted_plan(_q("dedup_duplicate_spans", spark, sf_dir))
    assert "LeftSemi" in plan, plan[:800]
    assert not has_cartesian_or_bnl(_q("dedup_duplicate_spans", spark, sf_dir))


def test_strip_spans_anti_join_no_cartesian(spark, sf_dir):
    """The corpus-map rebuild anti-joins covered positions and must
    never widen into a cartesian; the rebuild is an aggregate, not a
    corpus window."""
    df = _q("text_strip_duplicate_spans", spark, sf_dir)
    plan = formatted_plan(df)
    assert "LeftAnti" in plan, plan[:800]
    assert not has_cartesian_or_bnl(df)


def test_bounded_simhash_no_cartesian_and_star_is_projection(spark, sf_dir):
    """The capped candidate stage adds ONE window over the bucket key
    and a union of two join-free/star branches — no cartesian, and the
    small-bucket self-join keeps its shuffled-hash shape (Zipfian
    bucket keys degrade sort-merge)."""
    df = _q("dedup_documents_simhash", spark, sf_dir)
    plan = formatted_plan(df)
    assert not has_cartesian_or_bnl(df)
    assert "ShuffledHashJoin" in plan, plan[:800]
    assert "Union" in plan, plan[:800]
