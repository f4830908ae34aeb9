"""Semantic-dedup pack (queries/semdedup.py): keeper-election semantics
and the scale-shape plan gate (aggregate keeper, NOT a corpus window).
Bitwise oracle parity is covered by the registry-wide suites +
scripts/check_exact.py; these tests pin what the hash can't see."""

from __future__ import annotations

from etl_utils_spark.plans import formatted_plan
from etl_utils_spark.queries import REGISTRY
from etl_utils_spark.queries.semdedup import _TAU, _cos_to_centroid


def test_semdedup_keeper_is_never_dup(spark, sf_dir):
    rows = REGISTRY["dedup_semdedup_prune"].fn(spark, sf_dir).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        keeper = max(members, key=lambda r: (r.cos_centroid, -r.vec_id))
        assert keeper.is_dup == 0, (cid, keeper)
        # every flagged member clears tau and is not the keeper
        for r in members:
            if r.is_dup:
                assert r.vec_id != keeper.vec_id
                assert r.cos_centroid >= _TAU


def test_prototype_prune_drops_quartile(spark, sf_dir):
    full = REGISTRY["dedup_semdedup_prune"].fn(spark, sf_dir).collect()
    kept = REGISTRY["prune_prototypes_percluster"].fn(spark, sf_dir).collect()
    n_by_cluster: dict[int, int] = {}
    for r in full:
        n_by_cluster[r.cluster_id] = n_by_cluster.get(r.cluster_id, 0) + 1
    kept_by_cluster: dict[int, int] = {}
    for r in kept:
        kept_by_cluster[r.cluster_id] = kept_by_cluster.get(r.cluster_id, 0) + 1
    for cid, n in n_by_cluster.items():
        dropped = n - kept_by_cluster.get(cid, 0)
        assert dropped == (n + 3) // 4, (cid, n, dropped)


def test_semdedup_keeper_is_aggregate_not_window(spark, sf_dir):
    """The keeper election must stay a k-row aggregate joined back via
    broadcast — a per-cluster window over the corpus would funnel n/k
    rows through single partitions at 100 TB.  The cosv frame is
    localCheckpointed (it has two consumers), so the final plan shows
    only the election stage; the centroid pipeline is gated separately
    on the helper's pre-checkpoint lineage."""
    plan = formatted_plan(REGISTRY["dedup_semdedup_prune"].fn(spark, sf_dir))
    assert "Window" not in plan, plan[:1200]
    assert "BroadcastHashJoin" in plan, plan[:1200]


def test_cosine_pipeline_broadcasts_centroids(spark, sf_dir):
    """Inside the cosine helper, the k×64 centroid frame and the k-row
    norm frame must broadcast back onto the corpus — shuffling the
    corpus against a k-row side would be the wrong plan at any scale.
    Gate the checkpoint=False variant, whose lineage is the plan the
    eager checkpoints execute."""
    plan = formatted_plan(_cos_to_centroid(spark, sf_dir, checkpoint=False))
    assert plan.count("BroadcastHashJoin") >= 2, plan[:1500]
    assert "Window" not in plan, plan[:1500]
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan

