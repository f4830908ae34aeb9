"""Semantic invariants for the north-star operators — properties the
oracle harness can't express (approximation soundness, recall, session
gap laws)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_utils_spark.operators import dedup, sessionize, similarity
from etl_utils_spark.sources.tables import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_minhash_pairs_subset_of_exact(spark, sf_dir):
    """LSH may miss pairs (false negatives) but must never emit a pair
    below threshold (all candidates are exactly verified)."""
    docs = _docs(spark, sf_dir)
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.2).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.2).collect()
    }
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert abs(v - exact[k]) < 1e-12


def test_jaccard_prefix_filter_is_lossless(spark, sf_dir):
    # prefix filtering must return EXACTLY the brute inverted-index
    # result at the same threshold — recall 1 is the theorem, not a gate
    docs = _docs(spark, sf_dir)
    brute = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.6).collect()
    }
    pref = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_prefix_pairs(docs, n=3, threshold=0.6).collect()
    }
    assert set(pref) == set(brute)
    for k in pref:
        assert abs(pref[k] - brute[k]) < 1e-12


def test_overlap_containment_dominates_jaccard(spark, sf_dir):
    # overlap = |A∩B|/min ≥ |A∩B|/|A∪B| = jaccard, so every Jaccard-
    # threshold pair must appear in the overlap join at the same cut
    docs = _docs(spark, sf_dir)
    jac = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.8).collect()
    }
    ovl = {
        (r.id_a, r.id_b): r.overlap
        for r in dedup.overlap_coefficient_pairs(docs, n=3, threshold=0.8).collect()
    }
    assert jac <= set(ovl)
    assert all(0.8 <= v <= 1.0 + 1e-12 for v in ovl.values())


def test_simhash_pairs_hamming_bound(spark, sf_dir):
    pairs = dedup.simhash_pairs(_docs(spark, sf_dir), max_hamming=3).collect()
    assert all(0 <= r.hamming <= 3 for r in pairs)
    # banding guarantee: hamming <= bands-1 pairs are all found; here we
    # just check ids are ordered and unique
    keys = [(r.id_a, r.id_b) for r in pairs]
    assert all(a < b for a, b in keys)
    assert len(keys) == len(set(keys))


def test_lsh_topk_subset_and_exact_scores(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    brute = similarity.cosine_topk_bruteforce(emb, queries, k=5).collect()
    lsh = similarity.cosine_topk_lsh(emb, queries, k=5, n_planes=4).collect()
    # every LSH hit is a real corpus vector with an exactly-computed
    # cosine: cross-check against the brute-force full score map
    full = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in similarity.cosine_topk_bruteforce(emb, queries, k=10**9).collect()
    }
    for r in lsh:
        assert abs(full[(r.query_id, r.neighbor_id)] - r.cos_sim) < 1e-12
    assert len(brute) == 8 * 5


def test_ivf_topk_exact_scores_and_determinism(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    a = similarity.cosine_topk_ivf(emb, queries, k=5, n_cells=8, n_probe=3).collect()
    b = similarity.cosine_topk_ivf(emb, queries, k=5, n_cells=8, n_probe=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    full = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in similarity.cosine_topk_bruteforce(emb, queries, k=10**9).collect()
    }
    for r in a:
        assert abs(full[(r.query_id, r.neighbor_id)] - r.cos_sim) < 1e-12
    # each (query, neighbor) appears at most once (single-cell corpus
    # assignment → no candidate duplication)
    keys = [(r.query_id, r.neighbor_id) for r in a]
    assert len(keys) == len(set(keys))


def test_topk_shuffle_path_matches_broadcast(spark, sf_dir):
    # broadcast_queries=False (big-query-side fallback) must return the
    # same neighbors as the broadcast path for both index layouts
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    for fn, kw in (
        (similarity.cosine_topk_ivf, dict(n_cells=8, n_probe=3)),
        (similarity.cosine_topk_lsh, dict(n_planes=4)),
    ):
        bcast = fn(emb, queries, k=5, **kw).collect()
        shuf = fn(emb, queries, k=5, broadcast_queries=False, **kw).collect()
        assert sorted(map(tuple, bcast)) == sorted(map(tuple, shuf))


def test_pq_rerank_exact_scores_and_determinism(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    a = similarity.pq_rerank_topk(emb, queries, k=5, shortlist=50).collect()
    b = similarity.pq_rerank_topk(emb, queries, k=5, shortlist=50).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    # re-ranked scores are EXACT cosines — check against the full map
    full = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in similarity.cosine_topk_bruteforce(emb, queries, k=10**9).collect()
    }
    for r in a:
        assert abs(full[(r.query_id, r.neighbor_id)] - r.cos_sim) < 1e-12
    assert len(a) == 8 * 5
    # codes are m ints in [0, k)
    B = similarity.train_pq_codebooks(emb, m=8, k=16)
    codes = similarity.pq_encode(emb, B).collect()
    assert all(len(r.codes) == 8 and all(0 <= c < 16 for c in r.codes) for r in codes)


def test_ivf_more_probes_more_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk_bruteforce(emb, queries, k=5).collect()
    }

    def recall(n_probe):
        got = {
            (r.query_id, r.neighbor_id)
            for r in similarity.cosine_topk_ivf(
                emb, queries, k=5, n_cells=16, n_probe=n_probe
            ).collect()
        }
        return len(exact & got) / len(exact)

    r_full = recall(16)  # probing every cell == exact
    assert r_full == 1.0
    assert recall(2) <= recall(6) <= 1.0


def test_sessionize_gap_law(spark, sf_dir):
    """Within a session consecutive gaps ≤ 30min; session boundaries
    have gap > 30min."""
    s = sessionize.sessionize(_events(spark, sf_dir), gap_seconds=1800)
    rows = sorted(
        s.select("user_id", "ts", "session_seq").collect(),
        key=lambda r: (r.user_id, r.ts),
    )
    for prev, cur in zip(rows, rows[1:]):
        if prev.user_id != cur.user_id:
            continue
        gap = (cur.ts - prev.ts).total_seconds()
        if cur.session_seq == prev.session_seq:
            assert gap <= 1800
        else:
            assert gap > 1800
            assert cur.session_seq == prev.session_seq + 1


def test_asof_join_matches_argmax(spark, sf_dir):
    e = _events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    out = {
        r.event_id: (r.right_ts, r.right_event_id)
        for r in sessionize.asof_join(
            purchases, clicks, on="user_id", right_cols=["event_id"]
        ).collect()
    }
    # reference: join + max_by
    ref_df = (
        purchases.alias("p")
        .join(
            clicks.alias("c"),
            (F.col("c.user_id") == F.col("p.user_id")) & (F.col("c.ts") <= F.col("p.ts")),
            "left",
        )
        .groupBy(F.col("p.event_id").alias("pid"))
        .agg(
            F.max(F.col("c.ts")).alias("mts"),
            F.max_by(F.col("c.event_id"), F.col("c.ts")).alias("mid"),
        )
    )
    ref = {r.pid: (r.mts, r.mid) for r in ref_df.collect()}
    assert set(out) == set(ref)
    for k in out:
        assert out[k] == ref[k], f"purchase {k}: {out[k]} != {ref[k]}"


def test_asof_tolerance(spark, sf_dir):
    e = _events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    out = sessionize.asof_join(
        purchases, clicks, on="user_id", right_cols=["event_id"], tolerance_seconds=600
    ).collect()
    for r in out:
        if r.right_ts is not None:
            assert (r.ts - r.right_ts).total_seconds() <= 600


def test_exact_dedup_generic(spark, sf_dir):
    d = _docs(spark, sf_dir)
    assert dedup.exact_dedup(d, ["lang"]).count() == d.select("lang").distinct().count()


def test_table_fingerprint_order_independent_and_null_safe(spark):
    from etl_utils_spark.operators.validation import table_fingerprint

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "2"), (1, "a")], "k int, v string"
    )
    a = table_fingerprint(df, ["k", "v"]).collect()[0]
    b = table_fingerprint(df.orderBy("v").repartition(5), ["k", "v"]).collect()[0]
    assert a == b  # partitioning/order independent
    assert a.n_rows == 4 and a.n_distinct_rows == 3
    # (2, NULL) and (NULL, '2') must digest differently
    mixed = spark.createDataFrame([(2, None)], "k int, v string")
    swapped = spark.createDataFrame([(None, "2")], "k int, v string")
    d1 = table_fingerprint(mixed, ["k", "v"]).collect()[0].min_digest
    d2 = table_fingerprint(swapped, ["k", "v"]).collect()[0].min_digest
    assert d1 != d2


def test_salted_join_same_key_name_and_matches_plain(spark, sf_dir):
    from etl_utils_spark.operators.skew import salted_join

    e = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"), "value"
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("uid"), "c_mktsegment"
    )
    # key == dim_key (the ambiguity case the frame-qualified condition
    # exists for) must resolve, keep a SINGLE key column, and support
    # the normal by-name consumer pattern (groupBy on the key)
    salted = salted_join(e, c, key="uid", dim_key="uid", n_salts=4)
    assert salted.columns.count("uid") == 1
    plain = e.join(c, "uid")
    assert salted.count() == plain.count()
    got = {
        (r.uid, r.n) for r in salted.groupBy("uid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want = {
        (r.uid, r.n) for r in plain.groupBy("uid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_count_min_sketch_invariants(spark):
    """CMS theorem checks on a skewed key set: estimates always
    overestimate, are exact when width makes collisions impossible,
    and each hash row conserves total mass."""
    from etl_utils_spark.operators.sketches import (
        cms_point_estimates,
        count_min_sketch,
    )

    rows = [(k,) for k, n in [("a", 50), ("b", 30), ("c", 3)] for _ in range(n)]
    df = spark.createDataFrame(rows, "k string")
    exact = {"a": 50, "b": 30, "c": 3}

    # tight sketch: collisions possible → overestimate only
    sk = count_min_sketch(df, "k", depth=3, width=2)
    keys = df.select("k").distinct()
    est = {
        r.k: r.est
        for r in cms_point_estimates(sk, keys, "k", depth=3, width=2).collect()
    }
    assert all(est[k] >= exact[k] for k in exact), est
    mass = {r.depth: r.s for r in sk.groupBy("depth").agg(F.sum("cnt").alias("s")).collect()}
    assert set(mass.values()) == {83}, mass

    # wide sketch: 3 keys into 4096 buckets → exact with overwhelming
    # margin (deterministic hashes; verified no collision for this data)
    sk2 = count_min_sketch(df, "k", depth=3, width=4096)
    est2 = {
        r.k: r.est
        for r in cms_point_estimates(sk2, keys, "k", depth=3, width=4096).collect()
    }
    assert est2 == exact, est2


def test_zorder_blocks_are_bounded_boxes(spark, sf_dir):
    """Every 256-value Z-block must be an axis-aligned 16×16 box in
    (x, y) space — the property that gives BOTH dimensions bounded
    file-level min/max spans (single-column sort would leave one
    dimension spanning the full range)."""
    from etl_utils_spark.queries.registry import REGISTRY

    rows = REGISTRY["zorder_block_locality"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.max_x - r.min_x <= 15, r
        assert r.max_y - r.min_y <= 15, r


def test_prefix_min_matches_window_semantics(spark):
    """prefix_min (bucketed three-pass) must equal the single-reducer
    MIN() OVER (ORDER BY ...) on both the inclusive and the
    strictly-preceding (exclusive) frames, including the NULL for the
    global first row."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_utils_spark.operators.ids import prefix_min

    rows = [(k, ((k * 37) % 19) - 7) for k in range(211)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r.k: (r.inc, r.exc)
        for r in prefix_min(
            df, "k", "v", num_partitions=7, out_col="inc", exclusive_out="exc"
        ).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    we = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r.k: (r.inc, r.exc)
        for r in df.select(
            "k", F.min("v").over(w).alias("inc"), F.min("v").over(we).alias("exc")
        ).collect()
    }
    assert got == want


def test_md5_60_hash_family_parity_and_dispatch(spark):
    """md5_60 must be pinned cross-engine (DuckDB computes the same
    values in the replay oracles) and always non-negative; unknown
    hash families must fail loudly, not fall back."""
    import duckdb
    import pytest

    vals = ["abc", "hello world", "", "0:12345"]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = {
        r["s"]: r["h"]
        for r in df.select("s", dedup.md5_60(F.col("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    for v in vals:
        exp = con.execute(
            "SELECT ('0x'||substr(md5(?),1,15))::BIGINT", [v]
        ).fetchone()[0]
        assert got[v] == exp and got[v] >= 0, (v, got[v], exp)
    # pinned value: a silent md5/conv change must trip this, not just drift
    assert got["abc"] == 648541476951500027
    with pytest.raises(ValueError, match="hash_family"):
        dedup._hash60(F.lit("x"), "fnv")


def test_simhash_md5_flavor_bits_bound(spark, sf_dir):
    """The 60-bit md5_60 simhash signature must never set bits 60-63
    (the replay oracle's signed shifts rely on positivity)."""
    sg = dedup.simhash_sig(
        _docs(spark, sf_dir).limit(50), hash_family="md5_60", bits=60
    )
    bad = sg.filter(
        (F.col("sig") < 0) | (F.shiftrightunsigned("sig", 60) != 0)
    ).count()
    assert bad == 0


def test_duplicate_span_runs_semantics(spark):
    """Hand-built corpus: the shared 10-token run surfaces as ONE
    maximal span per doc at the right positions; unique text never
    enters a span; k=3 anchors."""
    shared = "a b c d e f g h i j"
    rows = [
        (1, "x1 y1 z1 " + shared + " q1 r1"),   # span at tokens 3..12
        (2, shared + " u2 v2 w2"),              # span at tokens 0..9
        (3, "only unique words here nothing shared at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.duplicate_span_runs(df, k=3).collect()
    spans = {(r.doc_id, r.span_start, r.span_end, r.span_tokens) for r in out}
    assert spans == {(1, 3, 12, 10), (2, 0, 9, 10)}


def test_duplicate_span_short_docs_no_grams(spark):
    """Documents SHORTER than k tokens emit no grams and no spans (and
    pass through strip unchanged) — guards the r12 row-local gram
    rewrite: an unguarded sequence(0, size-k) would count DOWN for
    short docs and fabricate out-of-range positions."""
    rows = [
        (1, "a b"),                # 2 tokens < k=3: no grams possible
        (2, "a b"),                # identical, still no 3-gram to share
        (3, "x y z w"),
        (4, "x y z w"),            # shared full 3-gram run: spans 0..3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = {(r.doc_id, r.span_start, r.span_end)
             for r in dedup.duplicate_span_runs(df, k=3).collect()}
    assert spans == {(3, 0, 3), (4, 0, 3)}
    out = {r.doc_id: r for r in dedup.strip_duplicate_spans(df, k=3).collect()}
    assert out[1].clean_text == "a b" and out[1].n_tokens_removed == 0
    assert out[2].clean_text == "a b" and out[2].n_tokens_removed == 0
    assert out[3].clean_text == "" and out[3].n_tokens_removed == 4


def test_simhash_bucket_cap_star_semantics(spark):
    """With a cap of 1 every bucket star-pairs: identical docs (one
    clique) emit exactly the rep-to-member star, not the C(n,2)
    clique, and the uncapped run emits the full clique — the bounded
    face VERDICT r9 weak item 1 asked for."""
    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(1, 5)]
    rows.append((9, "totally different words nothing shared here ok"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = dedup.simhash_pairs(df, max_hamming=0)
    capped = dedup.simhash_pairs(df, max_hamming=0, bucket_cap=1)
    full_pairs = {(r.id_a, r.id_b) for r in full.collect()}
    star_pairs = {(r.id_a, r.id_b) for r in capped.collect()}
    assert full_pairs == {(a, b) for a in range(1, 5) for b in range(1, 5) if a < b}
    assert star_pairs == {(1, 2), (1, 3), (1, 4)}  # min-id rep star
    # cluster recovery: the star's connected component equals the clique
    comp = {1}
    for a, b in sorted(star_pairs):
        if a in comp:
            comp.add(b)
    assert comp == {1, 2, 3, 4}


def test_simhash_bucket_stats_no_collision_corpus(spark):
    """On a corpus with NO bucket of size >= 2 the gate's booleans must
    be True, not NULL — the oracle's constant-true/coalesce form and
    the engine must agree on the trivially-honored cap (code-review
    r10)."""
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "epsilon zeta eta theta"),
        (3, "iota kappa lambda mu"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = dedup.simhash_bucket_stats(df, bucket_cap=4).collect()[0]
    assert r.n_buckets == 0
    assert r.matches_analytic is True
    assert r.bound_ok is True


def test_strip_duplicate_spans_semantics(spark):
    """Hand-built corpus (k=3): shared run removed from both docs,
    unique text intact; the all-unique doc passes through unchanged
    with zero removals."""
    shared = "a b c d e f g h i j"
    rows = [
        (1, "x1 y1 z1 " + shared + " q1 r1"),
        (2, shared + " u2 v2 w2"),
        (3, "only unique words here nothing shared at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.strip_duplicate_spans(df, k=3).collect()}
    assert out[1].clean_text == "x1 y1 z1 q1 r1"
    assert out[1].n_tokens_removed == 10 and out[1].n_tokens_kept == 5
    assert out[2].clean_text == "u2 v2 w2"
    assert out[2].n_tokens_removed == 10 and out[2].n_tokens_kept == 3
    assert out[3].clean_text == rows[2][1]
    assert out[3].n_tokens_removed == 0
