"""Round-5 corpus-curation pack: Gopher-style quality rules,
duplicate-n-gram repetition, per-source contamination stats, BM25
retrieval, a bounded inverted index, temperature-scaled mixture
weights, embedding sign-bit semantic dedup, k-NN label voting, and a
CUSUM drift recurrence.

These extend the training-data-pipeline tier of SURVEY.md §2 (the
reference's corpus tooling has no single source file — semantics are
the public Gopher/RefinedWeb/Okapi formulations), each with a DuckDB
oracle for the driver's t2 gate.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_utils_spark.operators import retrieval, text
from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_TOKS_SQL = "list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')"


@query(
    "quality_gopher_rules",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents
        )
        SELECT doc_id,
               len(toks)::INT AS n_words,
               ROUND(list_sum(list_transform(toks, x -> len(x)))::DOUBLE
                     / len(toks), 6) AS mean_word_len,
               ROUND(len(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g'))::DOUBLE
                     / len(text), 6) AS symbol_ratio,
               len(list_intersect(
                   list_distinct(toks),
                   ['the','a','of','and','to','in','is','it']))::INT AS stop_hits,
               (len(toks) BETWEEN 50 AND 100000
                AND (list_sum(list_transform(toks, x -> len(x)))::DOUBLE / len(toks))
                     BETWEEN 3.0 AND 10.0
                AND (len(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g'))::DOUBLE
                     / len(text)) < 0.1
                AND len(list_intersect(
                        list_distinct(toks),
                        ['the','a','of','and','to','in','is','it'])) >= 2) AS keep
        FROM t
    """,
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality gate (word count, mean word length,
    symbol ratio, stopword presence) — all array-side per row, zero
    shuffles; the canonical first-pass pretraining filter."""
    return text.gopher_rules(_t(spark, sf_dir, "documents"))


@query(
    "quality_dup_ngram_fraction",
    oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        g AS (
            SELECT doc_id,
                   CASE WHEN len(toks) >= 3 THEN
                       list_transform(generate_series(1, len(toks) - 2),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                   ELSE [] END AS grams
            FROM t
        )
        SELECT doc_id,
               len(grams)::INT AS n_ngrams,
               len(list_distinct(grams))::INT AS n_distinct,
               CASE WHEN len(grams) > 0 THEN
                   ROUND(1.0 - len(list_distinct(grams))::DOUBLE / len(grams), 6)
               ELSE 0.0 END AS dup_fraction,
               (CASE WHEN len(grams) > 0 THEN
                   ROUND(1.0 - len(list_distinct(grams))::DOUBLE / len(grams), 6)
               ELSE 0.0 END) <= 0.4 AS keep
        FROM g
    """,
)
def quality_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate word-trigram fraction per document (Gopher repetition
    family): flags boilerplate/looping text.  Array-side distinct —
    per-doc state bounded by doc length, not corpus size."""
    return text.dup_ngram_fraction(_t(spark, sf_dir, "documents"), n=3)


@query(
    "source_contamination_stats",
    oracle="""
        SELECT source,
               count(*)::BIGINT AS n_docs,
               count(DISTINCT md5(text))::BIGINT AS n_distinct_texts,
               1.0 - count(DISTINCT md5(text))::DOUBLE
                     / CAST(count(*) AS DOUBLE)        AS dup_rate,
               CAST(SUM(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   AS avg_chars
        FROM documents
        GROUP BY source
    """,
)
def source_contamination_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus governance: exact-duplicate rate (md5 key)
    and size profile — the report that decides which crawl sources to
    downweight.  One hash aggregate; the md5 digest (not the text)
    is what shuffles."""
    d = _t(spark, sf_dir, "documents")
    n = F.count(F.lit(1))
    nd = F.countDistinct(F.md5("text"))
    return d.groupBy("source").agg(
        n.alias("n_docs"),
        nd.alias("n_distinct_texts"),
        (1.0 - nd.cast("double") / n.cast("double")).alias("dup_rate"),
        (F.sum("n_chars").cast("double") / n.cast("double")).alias("avg_chars"),
    )


_BM25_TERMS = ["hash", "join", "vector"]


@query(
    "bm25_rank_docs",
    oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
        dl AS (SELECT doc_id, len(toks) AS dl FROM t),
        stats AS (SELECT count(*) AS n_docs,
                         CAST(SUM(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                             AS avgdl FROM dl),
        tok AS (
            SELECT doc_id, unnest(toks) AS tok FROM t
        ),
        tf AS (
            SELECT doc_id, tok, count(*) AS tf FROM tok
            WHERE tok IN ('hash', 'join', 'vector')
            GROUP BY doc_id, tok
        ),
        dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        contrib AS (
            SELECT tf.doc_id,
                   ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                   * (tf.tf * 2.2)
                   / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) AS c
            FROM tf JOIN dfreq d USING (tok) JOIN dl USING (doc_id), stats s
        )
        SELECT doc_id,
               CAST(SUM(CAST(floor(c * 1073741824.0 + 0.5) AS BIGINT)) AS DOUBLE)
                   / 1073741824.0 AS bm25
        FROM contrib GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id
        LIMIT 20
    """,
)
def bm25_rank_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 documents for a fixed query term set — two
    hash aggregates plus broadcast idf/corpus-stats joins; the
    corpus-sized stream shuffles once."""
    scored = retrieval.bm25_scores(_t(spark, sf_dir, "documents"), _BM25_TERMS)
    return scored.orderBy(F.desc("bm25"), "doc_id").limit(20)


@query(
    "build_inverted_index",
    oracle=f"""
        WITH pairs AS (
            SELECT DISTINCT doc_id, unnest({_TOKS_SQL}) AS token
            FROM documents
        ),
        dfreq AS (SELECT token, count(*) AS df FROM pairs GROUP BY token),
        capped AS (
            SELECT token, doc_id,
                   row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn
            FROM pairs
        ),
        postings AS (
            SELECT token,
                   string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings_csv
            FROM capped WHERE rn <= 8 GROUP BY token
        )
        SELECT token, df::BIGINT AS df, postings_csv
        FROM dfreq JOIN postings USING (token)
        WHERE df >= 50
    """,
)
def build_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded inverted index: token → document frequency + first-8
    posting ids.  Posting lists are truncated with a window row_number
    BEFORE aggregation so per-token executor state is O(cap) at any
    corpus size."""
    return retrieval.inverted_index(
        _t(spark, sf_dir, "documents"), min_df=50, postings_cap=8
    )


@query(
    "mixture_temperature_weights",
    oracle="""
        WITH l AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        s AS (
            SELECT lang, n, n::DOUBLE / SUM(n) OVER () AS p,
                   (n::DOUBLE / SUM(n) OVER ()) ^ 0.7 AS w_raw
            FROM l
        )
        SELECT lang, n::BIGINT AS n_docs,
               ROUND(p, 6) AS p_raw,
               ROUND(w_raw / SUM(w_raw) OVER (), 6) AS weight,
               FLOOR(10000 * w_raw / SUM(w_raw) OVER ())::BIGINT AS expected_docs
        FROM s
    """,
)
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.7) language-mixture sampling
    weights — the multilingual rebalancing rule that upweights tail
    languages.  Aggregate to |langs| rows first; the window totals run
    over that tiny frame, never the corpus."""
    d = _t(spark, sf_dir, "documents")
    l = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    w_all = Window.partitionBy()
    p = F.col("n_docs").cast("double") / F.sum("n_docs").over(w_all)
    w_raw = F.pow(p, 0.7)
    weight = w_raw / F.sum(w_raw).over(w_all)
    return l.select(
        "lang",
        "n_docs",
        F.round(p, 6).alias("p_raw"),
        F.round(weight, 6).alias("weight"),
        F.floor(10000 * weight).cast("long").alias("expected_docs"),
    )


@query(
    "dedup_embeddings_bitsig",
    oracle="""
        WITH s AS (
            SELECT vec_id,
                   list_sum(list_transform(generate_series(1, 32),
                       i -> CASE WHEN embedding[i] > 0
                                 THEN CAST(2 ** (i - 1) AS BIGINT)
                                 ELSE 0 END))::BIGINT AS bitsig
            FROM embeddings
        )
        SELECT bitsig, count(*)::BIGINT AS n_vecs,
               min(vec_id) AS keep_vec_id
        FROM s GROUP BY bitsig
    """,
)
def dedup_embeddings_bitsig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup by 32-bit sign signature of the embedding (a
    degenerate 32-plane SimHash with axis-aligned planes): vectors in
    the same orthant bucket together; keep the minimum id.  One hash
    aggregate on a bigint key — the cheapest embedding-dedup pass
    before any pairwise verification."""
    e = _t(spark, sf_dir, "embeddings")
    bitsig = F.aggregate(
        F.sequence(F.lit(1), F.lit(32)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(
            F.element_at("embedding", i) > 0,
            F.pow(F.lit(2.0), i - 1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return (
        e.select(bitsig.alias("bitsig"), "vec_id")
        .groupBy("bitsig")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("vec_id").alias("keep_vec_id"),
        )
    )


@query(
    "knn_majority_label",
    oracle="""
        WITH q AS (
            SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
            FROM embeddings WHERE vec_id < 40
        ),
        c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
                     label FROM embeddings),
        scored AS (
            SELECT query_id, neighbor_id, label,
                   list_cosine_similarity(qv, cv) AS cos_sim
            FROM q, c WHERE query_id != neighbor_id
        ),
        ranked AS (
            SELECT query_id, label,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY round(cos_sim, 9) DESC, neighbor_id
                   ) AS rank
            FROM scored
        ),
        votes AS (
            SELECT query_id, label, count(*) AS n_votes
            FROM ranked WHERE rank <= 5 GROUP BY query_id, label
        ),
        best AS (
            SELECT query_id, label, n_votes,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY n_votes DESC, label
                   ) AS vr
            FROM votes
        )
        SELECT query_id, label AS pred_label, n_votes::BIGINT AS n_votes
        FROM best WHERE vr = 1
    """,
)
def knn_majority_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label propagation: predict each probe's label by majority
    vote of its 5 nearest neighbors (cosine), ties to the smaller
    label — the standard quality-classifier bootstrap over a small
    labeled seed set.  Probe side broadcast; corpus side streams."""
    from etl_utils_spark.operators.similarity import cosine_topk_bruteforce

    e = _t(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 40)
    topk = cosine_topk_bruteforce(e, probes, k=5)
    # measured r12: broadcasting the ≤|probes|·k topk frame here is
    # 2× SLOWER (the broadcast build serializes the whole BNL+window
    # subplan before the main job); the shuffle join overlaps it.
    votes = (
        topk.join(
            e.select(F.col("vec_id").alias("neighbor_id"), "label"),
            "neighbor_id",
        )
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("n_votes"), F.asc("label"))
    return (
        votes.withColumn("vr", F.row_number().over(w))
        .filter(F.col("vr") == 1)
        .select("query_id", F.col("label").alias("pred_label"), "n_votes")
    )


@query(
    "cusum_user_value",
    oracle="""
        WITH RECURSIVE seq AS (
            SELECT user_id, event_id, value,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
            FROM events
        ),
        r AS (
            SELECT user_id, event_id, value, rn,
                   greatest(0, 0 + value - 5.0) AS cusum
            FROM seq WHERE rn = 1
            UNION ALL
            SELECT s.user_id, s.event_id, s.value, s.rn,
                   greatest(0, r.cusum + s.value - 5.0) AS cusum
            FROM seq s JOIN r ON s.user_id = r.user_id AND s.rn = r.rn + 1
        )
        SELECT user_id, event_id, value, cusum, cusum > 10.0 AS alert
        FROM r
    """,
)
def cusum_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detector per user (drift=5, alert>10) —
    the sequential change-point recurrence window frames cannot
    express, via the same single-shuffle ``mapInPandas`` shape as
    EWMA.  Bit-identical to the DuckDB recursive CTE (same IEEE
    evaluation order), so no rounding is needed."""
    from etl_utils_spark.operators.recurrence import cusum

    e = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    out = cusum(e, "user_id", "ts", "value", drift=5.0)
    return out.select(
        "user_id",
        "event_id",
        "value",
        "cusum",
        (F.col("cusum") > 10.0).alias("alert"),
    )


@query(
    "stream_cusum_live",
    oracle="""
        WITH RECURSIVE seq AS (
            SELECT user_id, event_id, value,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
            FROM events
        ),
        r AS (
            SELECT user_id, event_id, value, rn,
                   greatest(0, 0 + value - 5.0) AS cusum
            FROM seq WHERE rn = 1
            UNION ALL
            SELECT s.user_id, s.event_id, s.value, s.rn,
                   greatest(0, r.cusum + s.value - 5.0) AS cusum
            FROM seq s JOIN r ON s.user_id = r.user_id AND s.rn = r.rn + 1
        )
        SELECT user_id, event_id, value, cusum FROM r
    """,
)
def stream_cusum_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-key CUSUM executed as a REAL stream
    (applyInPandasWithState, AvailableNow): O(1) drift-accumulator
    state per user — the live data-quality alerting shape.  The result
    hash-matches the SAME recursive-CTE oracle as the batch operator
    (streaming/stateful.py:running_cusum), bit-identical doubles."""
    from etl_utils_spark.streaming import windows as W
    from etl_utils_spark.streaming.stateful import running_cusum

    s = W.read_events_stream(spark, sf_dir)
    return W.run_stream_to_batch(
        spark, running_cusum(s), output_mode="update", python_stateful=True
    ).select(
        "user_id", "event_id", "value", "cusum"
    )


@query(
    "io_orc_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def io_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source/sink surface: parquet → ORC sink → ORC source must be
    lossless — hash-checked against the original table (completes the
    parquet/csv/json/orc format matrix of sources/io.py)."""
    from etl_utils_spark.sources.io import read_any, write_any

    out = tempfile.mkdtemp(prefix="io_orc_") + "/nation"
    df = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    write_any(df, out, fmt="orc", mode="overwrite")
    return read_any(spark, out, fmt="orc")
