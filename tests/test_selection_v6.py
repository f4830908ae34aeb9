"""Round-6 selection/pruning pack: the MaxScore prune must be
non-vacuous (it actually skips exact-scoring work) and sound, and the
DSIR weights must prefer the target domain."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_utils_spark.queries.registry import REGISTRY


def test_maxscore_prune_is_nonvacuous_and_sound(spark, sf_dir):
    """The upper-bound prune must drop a real fraction of matching
    docs (otherwise the query silently degenerates to brute force),
    and the pruned top-k must equal the brute-force top-k."""
    from etl_utils_spark.operators.text import _alpha_tokens
    from etl_utils_spark.queries.selection_v6 import (
        _MS_K,
        _MS_TERMS,
        bm25_topk_maxscore,
    )
    from etl_utils_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", _alpha_tokens("text").alias("toks"))
    matching = (
        toks.select("doc_id", F.explode("toks").alias("tok"))
        .filter(F.col("tok").isin(*_MS_TERMS))
        .select("doc_id")
        .distinct()
        .count()
    )
    # Replicate the survivor count: docs with S_ub >= theta.
    pruned_topk = [
        (r.doc_id, r.bm25) for r in bm25_topk_maxscore(spark, sf_dir).collect()
    ]
    assert len(pruned_topk) == _MS_K
    # Brute force in-test (independent of the DuckDB oracle): score
    # every matching doc and cut deterministically.
    from etl_utils_spark.operators import retrieval

    brute = (
        retrieval.bm25_scores(d, list(_MS_TERMS))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(_MS_K)
        .collect()
    )
    assert [(r.doc_id, r.bm25) for r in brute] == pruned_topk
    # Non-vacuous: there must be more matching docs than the top-k cut,
    # i.e. the prune had something to do.
    assert matching > _MS_K


def test_dsir_selects_target_lang_majority(spark, sf_dir):
    """Importance weights trained toward lang='en' must select a
    top-K that is majority-en (the fixture's en docs share an English
    token distribution) — a degenerate hash function or a flipped
    log-ratio sign would invert this."""
    sel = REGISTRY["dsir_importance_resample"].fn(spark, sf_dir).collect()
    langs = [r.lang for r in sel]
    assert len(sel) == 50
    assert langs.count("en") > len(langs) / 2, langs


def test_bpe_compression_ratio_bounds(spark, sf_dir):
    """Merges can only shrink the token stream: 0 < ratio <= 1, and
    token counts are consistent per language."""
    rows = REGISTRY["bpe_compression_by_lang"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.compression <= 1.0
        assert r.n_tokens_after <= r.n_tokens_before
