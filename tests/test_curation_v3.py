"""Round-5 curation-pack gates: plan-quality pins (the shapes that
survive a 100× scale-up) and algebraic invariants, on top of the
registry-wide oracle parity that already covers value correctness."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from etl_utils_spark.plans import formatted_plan, has_broadcast_join
from etl_utils_spark.queries import REGISTRY


def _q(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


# ------------------------------------------------------------ plan gates

def test_gopher_rules_zero_exchange(spark, sf_dir):
    """Per-row array-side quality rules must compile to a single scan
    stage — any Exchange means a per-doc shuffle snuck in."""
    plan = formatted_plan(_q("quality_gopher_rules", spark, sf_dir))
    assert not re.findall(r"\(\d+\) Exchange", plan), plan[:1200]


def test_dup_ngram_fraction_zero_exchange(spark, sf_dir):
    plan = formatted_plan(_q("quality_dup_ngram_fraction", spark, sf_dir))
    assert not re.findall(r"\(\d+\) Exchange", plan), plan[:1200]


def test_bm25_broadcasts_stats_and_idf(spark, sf_dir):
    """r12 shape: the corpus-sized stream never shuffles AT ALL — tf/dl
    are row-local array reductions over the checkpointed per-doc frame,
    and the only join is the broadcast cross of the 1-row consts frame
    (n_docs, avgdl, per-term df).  Any hash/sort-merge join or a
    doc/tok-keyed exchange means the per-(doc, term) shuffle crept
    back."""
    df = _q("bm25_rank_docs", spark, sf_dir)
    plan = formatted_plan(df)
    assert "BroadcastExchange" in plan, plan[:1200]
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, (
        plan[:1200]
    )
    assert "hashpartitioning" not in plan, plan[:1200]
    assert "TakeOrderedAndProject" in plan, plan[:1200]


def test_bitsig_single_aggregate_exchange(spark, sf_dir):
    """Sign-bit dedup is one hash aggregate on the bigint signature:
    exactly one Exchange (the aggregate's), nothing else."""
    plan = formatted_plan(_q("dedup_embeddings_bitsig", spark, sf_dir))
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, f"{n_exchanges} exchanges\n{plan[:1200]}"


def test_knn_probes_are_broadcast(spark, sf_dir):
    """Probe side must broadcast; the corpus side must stream (no
    corpus-wide cartesian materialization)."""
    assert has_broadcast_join(_q("knn_majority_label", spark, sf_dir))


def test_cusum_single_key_exchange(spark, sf_dir):
    """The recurrence costs ONE hash exchange on the key; the sort is
    partition-local."""
    plan = formatted_plan(_q("cusum_user_value", spark, sf_dir))
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1 and "hashpartitioning(user_id" in plan, plan[:1500]


# ------------------------------------------------------------ invariants

def test_dup_ngram_fraction_bounds(spark, sf_dir):
    rows = _q("quality_dup_ngram_fraction", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.dup_fraction <= 1.0
        assert r.n_distinct <= r.n_ngrams


def test_gopher_rules_ratio_bounds(spark, sf_dir):
    rows = _q("quality_gopher_rules", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.symbol_ratio <= 1.0
        assert 0 <= r.stop_hits <= 8


def test_bm25_scores_positive_and_bounded_count(spark, sf_dir):
    rows = _q("bm25_rank_docs", spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    assert all(r.bm25 > 0 for r in rows)
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_inverted_index_postings_sorted_and_capped(spark, sf_dir):
    rows = _q("build_inverted_index", spark, sf_dir).collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r.postings_csv.split(",")]
        assert ids == sorted(ids)
        assert len(ids) <= 8
        assert r.df >= 50


def test_mixture_weights_sum_to_one(spark, sf_dir):
    rows = _q("mixture_temperature_weights", spark, sf_dir).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.p_raw for r in rows) - 1.0) < 1e-4
    # temperature < 1 upweights tail languages: the rarest language's
    # weight must exceed its raw share, the most common must shrink
    lo = min(rows, key=lambda r: r.n_docs)
    hi = max(rows, key=lambda r: r.n_docs)
    assert lo.weight >= lo.p_raw
    assert hi.weight <= hi.p_raw


def test_bitsig_partitions_all_vectors(spark, sf_dir):
    out = _q("dedup_embeddings_bitsig", spark, sf_dir)
    total = out.agg(F.sum("n_vecs")).collect()[0][0]
    from etl_utils_spark.sources.tables import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    assert total == n


def test_cusum_non_negative_and_resets(spark, sf_dir):
    rows = _q("cusum_user_value", spark, sf_dir).collect()
    assert rows
    assert all(r.cusum >= 0.0 for r in rows)


def test_stream_cusum_matches_batch_operator(spark, sf_dir):
    batch = {
        (r.user_id, r.event_id): r.cusum
        for r in _q("cusum_user_value", spark, sf_dir).collect()
    }
    stream = {
        (r.user_id, r.event_id): r.cusum
        for r in _q("stream_cusum_live", spark, sf_dir).collect()
    }
    assert batch == stream


def test_quality_score_extra_cols_passthrough(spark, sf_dir):
    """r12: extra_cols rides the row-local projection — values must be
    identical to the old join-the-corpus-back shape, with the score
    columns unchanged."""
    from etl_utils_spark.operators.text import quality_score
    from etl_utils_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    merged = {
        r.doc_id: (r.lang, r.quality_score)
        for r in quality_score(docs, extra_cols=("lang",)).collect()
    }
    joined = {
        r.doc_id: (r.lang, r.quality_score)
        for r in quality_score(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .collect()
    }
    assert merged == joined
