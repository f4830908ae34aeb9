"""Partition-count independence: the engine's results must be
IDENTICAL under different parallelism — the property that makes AQE
re-planning and cluster resizing safe. Decimal money math is what
guarantees it for aggregates."""

from __future__ import annotations

import pytest

from etl_utils_spark.queries import REGISTRY

SAMPLE = [
    "agg_pricing_summary",
    "window_running_sum_orders",
    "q5_local_supplier_volume",
    "dedup_documents_exact",
    "sessionize_events",
    # round-4 reps: iterative graph, hash sampling, composed pipeline
    "graph_bfs_reachability",
    "mixture_rebalance_langs",
    "pipeline_corpus_curation",
    # session-3 reps: the layout-sensitive classes — partition-local
    # Pareto prune, prefix-sum ranks, LCG resampling, heap-cut ranks
    "skyline_orders_pareto",
    "eval_auc_purchase_value",
    "stats_bootstrap_ci_mean",
    "rrf_fuse_multi_query",
]


@pytest.mark.parametrize("name", SAMPLE)
def test_result_independent_of_shuffle_partitions(spark, sf_dir, name):
    from etl_utils_spark.queries import shared

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # clear the memoized pair graph so BOTH runs rebuild it under
        # their own parallelism — otherwise the graph consumers reuse
        # one materialization and the heaviest stage goes untested
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        shared._CACHE.clear()
        low = sorted(tuple(r) for r in REGISTRY[name].fn(spark, sf_dir).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        shared._CACHE.clear()
        high = sorted(tuple(r) for r in REGISTRY[name].fn(spark, sf_dir).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shared._CACHE.clear()
    assert low == high
