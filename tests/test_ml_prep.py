"""Training-data-prep operator invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_utils_spark.operators import ml_prep
from etl_utils_spark.sources.tables import load_table


def test_split_is_stable_under_subsetting(spark, sf_dir):
    """A key's split never changes when the dataset grows/shrinks —
    the hash-split property random() cannot give."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    full = {r.doc_id: r.split for r in ml_prep.train_test_split(d, "doc_id").collect()}
    half = {
        r.doc_id: r.split
        for r in ml_prep.train_test_split(d.filter(F.col("doc_id") % 2 == 0), "doc_id").collect()
    }
    assert all(full[k] == v for k, v in half.items())
    # both sides populated, ratio near 80/20
    n_test = sum(1 for v in full.values() if v == "test")
    assert 0.1 < n_test / len(full) < 0.3


def test_leakage_safe_split_keeps_clusters_together(spark, sf_dir):
    from etl_utils_spark.operators.clustering import connected_components
    from etl_utils_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    pairs = ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), n=3, threshold=0.1
    ).cache()
    split = {
        r.doc_id: r.split
        for r in ml_prep.leakage_safe_split(docs, pairs).collect()
    }
    comp = {r.node: r.comp for r in connected_components(pairs).collect()}
    by_comp: dict = {}
    for node, c in comp.items():
        by_comp.setdefault(c, set()).add(split[node])
    assert all(len(sides) == 1 for sides in by_comp.values()), by_comp


def test_pack_sequences_bins_are_contiguous_and_bounded(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    packed = ml_prep.pack_sequences(docs, budget=2048, part_col="lang").collect()
    by_lang: dict = {}
    for r in sorted(packed, key=lambda r: (r.lang, r.doc_id)):
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rows in by_lang.items():
        bins = [r.bin_id for r in rows]
        assert bins[0] == 0
        assert all(b2 - b1 in (0, 1) or b2 > b1 for b1, b2 in zip(bins, bins[1:]))
        assert all(b2 >= b1 for b1, b2 in zip(bins, bins[1:]))
        # each bin's token mass stays within budget + one straddling doc
        mass: dict = {}
        for r in rows:
            mass[r.bin_id] = mass.get(r.bin_id, 0) + r.n_tokens
        max_doc = max(r.n_tokens for r in rows)
        assert all(m <= 2048 + max_doc for m in mass.values())
