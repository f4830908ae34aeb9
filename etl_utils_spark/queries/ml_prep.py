"""Training-data-prep queries: deterministic splits, vocab, packing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_utils_spark.operators import ml_prep
from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "split_train_test_docs",
    oracle="""
        SELECT doc_id, lang,
               CASE WHEN
                   (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10) >= 8
               THEN 'test' ELSE 'train' END AS split
        FROM documents
    """,
)
def split_train_test_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/20 hash split on doc_id — engine-portable md5
    bucketing, stable under data growth (operators/ml_prep.py)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return ml_prep.train_test_split(d, "doc_id", test_buckets=2, n_buckets=10)


@query(
    "sample_quality_weighted",
    oracle="""
        WITH scored AS (
            SELECT doc_id,
                   least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) * 0.4
                       + (1.0 - CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
                             / length(text)) * 0.3
                       + (CAST(len(list_filter(string_split(text, ' '),
                            t -> t IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE)
                             / len(string_split(text, ' '))) * 0.3 AS quality_score
            FROM documents
        )
        SELECT doc_id, quality_score FROM scored
        WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE)
              / 4294967296.0 < quality_score
    """,
)
def sample_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bernoulli(quality) corpus sampling: keep doc iff
    md5-uniform(doc_id) < quality_score — seedless, engine-exact,
    growth-stable (operators/ml_prep.py:quality_weighted_sample over
    operators/text.py:quality_score)."""
    from etl_utils_spark.operators import text as text_ops

    scored = text_ops.quality_score(_t(spark, sf_dir, "documents")).select(
        "doc_id", "quality_score"
    )
    return ml_prep.quality_weighted_sample(scored, "doc_id", "quality_score")


@query(
    "split_leakage_safe_docs",
    oracle="""
        WITH RECURSIVE toks AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
            FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w) - 2)) AS i) t
        ),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT id_a, id_b FROM inter
            JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.1
        ),
        edges AS (
            SELECT id_a AS u, id_b AS v FROM pairs
            UNION SELECT id_b, id_a FROM pairs
        ),
        cc AS (
            SELECT u AS node, u AS comp FROM edges
            UNION
            SELECT e.u, c.comp FROM edges e JOIN cc c ON e.v = c.node
            WHERE c.comp < e.u
        ),
        labels AS (SELECT node, min(comp) AS comp FROM cc GROUP BY node)
        SELECT d.doc_id, d.lang,
               CASE WHEN
                   (('0x' || substr(md5(CAST(COALESCE(l.comp, d.doc_id) AS VARCHAR)), 1, 8))::BIGINT % 10) >= 8
               THEN 'test' ELSE 'train' END AS split
        FROM documents d LEFT JOIN labels l ON l.node = d.doc_id
    """,
)
def split_leakage_safe_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe split: near-dup clusters (trigram Jaccard →
    connected components) travel together — no train/test
    contamination.  Hash-checked end-to-end against a DuckDB
    recursive-CTE closure + the same md5 bucket rule."""
    from etl_utils_spark.queries.shared import jaccard_pair_graph

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    pairs = jaccard_pair_graph(spark, sf_dir)
    return ml_prep.leakage_safe_split(docs, pairs)


@query(
    "vocab_top_tokens",
    oracle="""
        WITH counts AS (
            SELECT token, count(*) AS n FROM (
                SELECT unnest(string_split(text, ' ')) AS token FROM documents
            ) WHERE token != ''
            GROUP BY token
        )
        SELECT token, n,
               row_number() OVER (ORDER BY n DESC, token) - 1 AS token_id
        FROM counts
        QUALIFY token_id < 50
    """,
)
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary (top-50, deterministic tie-break) —
    the tokenizer-training precursor."""
    return ml_prep.build_vocab(_t(spark, sf_dir, "documents"), top_k=50)


@query(
    "pack_sequences_docs",
    oracle="""
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS n_tokens,
               CAST(FLOOR(
                   (SUM(len(string_split(text, ' '))) OVER (
                        PARTITION BY lang ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    ) - len(string_split(text, ' '))) / 2048.0
               ) AS BIGINT) AS bin_id
        FROM documents
    """,
)
def pack_sequences_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing into 2048-token shards, per language —
    deterministic contiguous packing (operators/ml_prep.py)."""
    return ml_prep.pack_sequences(
        _t(spark, sf_dir, "documents"), budget=2048, part_col="lang"
    )


@query(
    "tokenize_docs_to_ids",
    oracle="""
        WITH counts AS (
            SELECT token, count(*) AS n FROM (
                SELECT unnest(string_split(text, ' ')) AS token FROM documents
            ) WHERE token != ''
            GROUP BY token
        ),
        vocab AS (
            SELECT token, row_number() OVER (ORDER BY n DESC, token) - 1 AS token_id
            FROM counts
            QUALIFY token_id < 50
        ),
        exploded AS (
            SELECT doc_id, CAST(g.i - 1 AS INT) AS pos, toks[g.i] AS token
            FROM (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents WHERE doc_id < 50) d,
            LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) g
            WHERE toks[g.i] != ''
        )
        SELECT e.doc_id, e.pos,
               CAST(COALESCE(v.token_id, -1) AS BIGINT) AS token_id
        FROM exploded e LEFT JOIN vocab v ON v.token = e.token
    """,
)
def tokenize_docs_to_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer-apply step of a training pipeline: map every token
    to its vocabulary id (top-50 frequency vocab, OOV → -1) via a
    BROADCAST join — the vocab is model-scale, so tokenization is
    map-side at any corpus size; no shuffle touches the corpus."""
    docs = _t(spark, sf_dir, "documents")
    vocab = ml_prep.build_vocab(docs, top_k=50).select("token", "token_id")
    toks = (
        docs.filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("pos", "token"),
        )
        .filter(F.col("token") != "")
    )
    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .select(
            "doc_id",
            "pos",
            F.coalesce(F.col("token_id"), F.lit(-1)).cast("long").alias("token_id"),
        )
    )


@query(
    "embedding_quantize_int8",
    oracle="""
        WITH s AS (
            SELECT vec_id,
                   list_max(list_transform(embedding::DOUBLE[], x -> abs(x)))
                       / 127.0 AS scale
            FROM embeddings
        )
        SELECT e.vec_id,
               ROUND(s.scale, 9) AS scale,
               array_to_string(
                   list_transform(e.embedding::DOUBLE[],
                                  x -> CAST(CAST(floor(x / s.scale + 0.5) AS INTEGER)
                                            AS VARCHAR)), ',') AS q_csv
        FROM embeddings e JOIN s ON e.vec_id = s.vec_id
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column (per-vector
    absmax scale) — the storage/bandwidth step before shipping vectors
    to an ANN index; 4× smaller than float32, pure higher-order array
    functions (no Python).  floor(x/scale + 0.5) is used on BOTH
    engines instead of round() so half-way ties break identically.
    The int8 vector is emitted array_join'ed to one CSV scalar: the
    driver's pandas canonicalizer cannot hash array cells (the
    map_funcs_events r4 red), and the join certifies every element in
    order anyway."""
    emb = _t(spark, sf_dir, "embeddings")
    xs = F.transform("embedding", lambda x: x.cast("double"))
    scale = F.array_max(F.transform(xs, F.abs)) / 127.0
    # the intermediate is named raw_scale, NOT scale: when the output
    # alias shadows the input name, the analyzer binds the lambda's
    # F.col("scale") to the ROUNDED sibling — Spark then divides by
    # round(scale, 9) while the oracle divides by the raw scale, a
    # 1-ulp split that flips floor() on near-tie elements (caught by
    # the 10x bitwise sweep on perturbed embeddings; invisible at every
    # driver fixture scale).
    return (
        emb.select("vec_id", xs.alias("xs"), scale.alias("raw_scale"))
        .select(
            "vec_id",
            F.round("raw_scale", 9).alias("scale"),
            F.array_join(
                F.transform(
                    "xs",
                    lambda x: F.floor(x / F.col("raw_scale") + 0.5)
                    .cast("int")
                    .cast("string"),
                ),
                ",",
            ).alias("q_csv"),
        )
    )


@query(
    "embedding_label_stats",
    oracle="""
        WITH dims AS (
            SELECT label, g.i AS dim,
                   CAST(floor(embedding[g.i]::DOUBLE * 1048576.0 + 0.5)
                        AS BIGINT) AS xq
            FROM embeddings, generate_series(1, 64) AS g(i)
        ),
        per_dim AS (
            SELECT label, dim, count(*) AS n, SUM(xq) AS s,
                   count(*) * SUM(xq * xq) - SUM(xq) * SUM(xq) AS d
            FROM dims GROUP BY label, dim
        )
        SELECT label,
               CAST(SUM(d) AS DOUBLE)
                   / (CAST(MAX(n) AS DOUBLE) * CAST(MAX(n) AS DOUBLE)
                      * 1099511627776.0) AS trace_var,
               CAST(SUM(CASE WHEN dim = 1 THEN s ELSE 0 END) AS DOUBLE)
                   / (CAST(MAX(n) AS DOUBLE) * 1048576.0) AS mu_d1
        FROM per_dim GROUP BY label
    """,
)
def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding statistics: variance trace (total spread
    around the class centroid) and the centroid's first coordinate —
    the drift/compactness monitor for a labeled vector corpus.  One
    posexplode (64 rows per vector, all JVM) and two hash aggregates;
    at 100 TB the shuffle key is (label, dim) — cardinality
    classes × 64, independent of corpus size."""
    emb = _t(spark, sf_dir, "embeddings")
    # 2^-20-quantized elements -> exact integer per-dim moments; the
    # variance trace sums the EXACT integer d = n*Sxx - S^2 across dims
    # (n identical for every dim of a label), and mu_d1 is one shared
    # division — builtin avg/var_pop over floats accumulate engine-
    # specifically (the r5 red class) and the 64-dim float sum of
    # variances is summation-order-dependent.
    dims = emb.select(
        "label", F.posexplode(F.transform("embedding", lambda x: x.cast("double")))
    ).select(
        "label",
        (F.col("pos") + 1).alias("dim"),
        F.floor(F.col("col") * 1048576.0 + 0.5)
        .cast("long")
        .cast("decimal(18,0)")
        .alias("xq"),
    )
    per_dim = dims.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xq").alias("s"),
        (
            F.count(F.lit(1)) * F.sum(F.col("xq") * F.col("xq"))
            - F.sum("xq") * F.sum("xq")
        ).alias("d"),
    )
    n_d = F.max("n").cast("double")
    return per_dim.groupBy("label").agg(
        (
            F.sum("d").cast("double") / (n_d * n_d * 1099511627776.0)
        ).alias("trace_var"),
        (
            F.sum(F.when(F.col("dim") == 1, F.col("s")).otherwise(0)).cast("double")
            / (n_d * 1048576.0)
        ).alias("mu_d1"),
    )


@query(
    "binning_decile_prices",
    oracle="""
        WITH b AS (
            SELECT quantile_cont(o_totalprice,
                       [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS q
            FROM orders
        ),
        assigned AS (
            SELECT o_totalprice,
                   1 + (o_totalprice > q[1])::INT + (o_totalprice > q[2])::INT
                     + (o_totalprice > q[3])::INT + (o_totalprice > q[4])::INT
                     + (o_totalprice > q[5])::INT + (o_totalprice > q[6])::INT
                     + (o_totalprice > q[7])::INT + (o_totalprice > q[8])::INT
                     + (o_totalprice > q[9])::INT AS bucket
            FROM orders, b
        )
        SELECT bucket, count(*) AS n,
               min(o_totalprice) AS min_price,
               max(o_totalprice) AS max_price
        FROM assigned GROUP BY bucket
    """,
)
def binning_decile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency decile binning of a numeric feature — the
    standard quantile-bucket transform for feature engineering and
    histogram-balanced sampling.  NOT ntile(): a global ntile needs a
    single-partition total sort (dead at 100 TB).  Instead the nine
    decile boundaries are computed by exact percentile (bit-identical
    to DuckDB's quantile_cont — probed on this data), pulled to the
    driver as nine metadata-scale literals, and bucket assignment is
    nine codegen comparisons folded into the scan — no sort, no
    window, one final group-by-bucket aggregate."""
    o = _t(spark, sf_dir, "orders").select("o_totalprice")
    qs = [i / 10.0 for i in range(1, 10)]
    bounds = o.agg(
        F.expr(
            "percentile(o_totalprice, array({}))".format(
                ", ".join(str(q) for q in qs)
            )
        ).alias("q")
    ).collect()[0].q
    price = F.col("o_totalprice")
    bucket = F.lit(1)
    for b in bounds:
        bucket = bucket + (price > F.lit(float(b))).cast("int")
    return (
        o.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(price).alias("min_price"),
            F.max(price).alias("max_price"),
        )
    )


@query(
    "chunk_tokens_sliding",
    oracle="""
        WITH d AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        s AS (
            SELECT doc_id, w, g.s, CAST((g.s - 1) / 16 AS INT) AS chunk_idx
            FROM d, LATERAL (
                SELECT unnest(generate_series(1, len(w), 16)) AS s
            ) g
        )
        SELECT doc_id, chunk_idx,
               array_to_string(list_slice(w, s, least(s + 31, len(w))), ' ')
                   AS chunk_text,
               CAST(least(s + 31, len(w)) - s + 1 AS INT) AS n_tokens
        FROM s
    """,
)
def chunk_tokens_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token chunking (window 32, stride 16): the
    context-window preprocessing step — each document becomes
    half-overlapping chunks so no token span is split across a chunk
    boundary without also appearing whole in a neighbor. Pure
    sequence/slice arithmetic inside codegen; the explode amplifies
    rows ~n_tokens/stride with no shuffle at all."""
    d = _t(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    starts = F.sequence(F.lit(1), F.size(w), F.lit(16))
    d = d.select(
        "doc_id", w.alias("w"), F.posexplode(starts).alias("chunk_idx", "s")
    )
    chunk = F.slice(F.col("w"), F.col("s"), F.lit(32))
    return d.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).alias("n_tokens"),
    )


@query(
    "mixture_rebalance_langs",
    oracle="""
        WITH tot AS (SELECT count(*) AS n FROM documents),
        ranked AS (
            SELECT doc_id, lang,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn
            FROM documents
        )
        SELECT doc_id, lang FROM ranked, tot
        WHERE rn <= floor(
            CASE lang WHEN 'en' THEN 0.40 WHEN 'zh' THEN 0.15
                      WHEN 'de' THEN 0.15 WHEN 'es' THEN 0.15
                      ELSE 0.15 END * tot.n * 0.5)
    """,
)
def mixture_rebalance_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data-mixture rebalancing: resample the corpus to
    target language proportions (en 40%, others 15% each) over a 50%
    budget by taking each language's lowest-md5 documents up to its
    quota. Seedless and growth-stable like every sampler here; the
    corpus total enters as a driver literal (metadata-scale). A
    language short of quota contributes everything it has — mixture
    weights are targets, not guarantees, exactly like production
    corpus mixing.

    Scale note: the per-lang row_number ranks each language's docs on
    one reducer — exact, right for fixture-scale oracle parity, but a
    hot-language sort at 100 TB. The scale path keeps the same
    selection statistically: approxQuantile the md5-hash column at the
    quota fraction per language and keep hash < threshold — a
    scan-side filter, no sort, same growth-stable doc choice up to
    quantile error."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    # corpus total as a driver literal (1 scalar — metadata-scale, the
    # binning_decile_prices precedent), keeping the quota compare a
    # plain codegen filter with no 1-row join in the plan
    total = d.count()
    frac = (
        F.when(F.col("lang") == "en", 0.40)
        .when(F.col("lang") == "zh", 0.15)
        .when(F.col("lang") == "de", 0.15)
        .when(F.col("lang") == "es", 0.15)
        .otherwise(0.15)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = d.withColumn("rn", F.row_number().over(w))
    return ranked.filter(
        F.col("rn") <= F.floor(frac * F.lit(float(total)) * F.lit(0.5))
    ).select("doc_id", "lang")


@query(
    "decontaminate_test_split",
    oracle="""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (
            SELECT DISTINCT doc_id,
                   w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||
                   w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7] AS g
            FROM toks, LATERAL (
                SELECT unnest(generate_series(1, len(w) - 7)) AS i
            ) t
        ),
        lab AS (
            SELECT doc_id,
                   (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10) >= 8
                       AS is_test
            FROM documents
        ),
        tr AS (SELECT DISTINCT g FROM sh JOIN lab USING(doc_id) WHERE NOT is_test),
        te AS (SELECT doc_id, g FROM sh JOIN lab USING(doc_id) WHERE is_test)
        SELECT te.doc_id, CAST(count(DISTINCT te.g) AS BIGINT) AS n_shared_ngrams
        FROM te JOIN tr ON te.g = tr.g
        GROUP BY te.doc_id
    """,
)
def decontaminate_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval decontamination: test documents sharing any verbatim 8-gram
    with ANY train document (the standard benchmark-leakage check) —
    output is (test doc, distinct shared 8-grams). Same md5 split rule
    as split_train_test_docs; grams are xxhash64 longs (the 64-bit
    space keeps cross-collision odds ~1e-9 at fixture scale and far
    below 1 even at 100 TB gram counts), so the exchange carries
    8-byte keys, never gram text.

    r12 shape (guide §2.4): the split flag is a PURE FUNCTION of
    doc_id, so it is computed row-locally on the shingle frame (the
    former lab join + eager localCheckpoint of the joined frame are
    gone), and ONE groupBy(gram) builds a posting row per gram —
    any-train flag + test doc list.  Exploding the test lists of
    in-train grams emits each (gram, test doc) exactly once (shingles
    are distinct per doc), so the per-doc tally is a plain count — the
    former train-distinct exchange, shuffle-hash join and two-phase
    count_distinct all collapse into that single posting aggregate
    plus one bounded count."""
    from etl_utils_spark.operators.dedup import hashed_shingles
    from etl_utils_spark.operators.ml_prep import hash_bucket

    docs = _t(spark, sf_dir, "documents")
    sh = hashed_shingles(docs, "doc_id", "text", n=8).withColumnRenamed("sid", "doc_id")
    sh = sh.withColumn(
        "is_test", hash_bucket(F.col("doc_id").cast("string"), 10) >= 8
    )
    posting = sh.groupBy("sh").agg(
        F.max(~F.col("is_test")).alias("in_train"),
        F.collect_list(F.when(F.col("is_test"), F.col("doc_id"))).alias("test_ids"),
    )
    return (
        posting.filter("in_train")
        .select(F.explode("test_ids").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )


@query(
    "pipeline_corpus_curation",
    oracle="""
        WITH RECURSIVE toks AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
            FROM toks, LATERAL (SELECT unnest(generate_series(1, len(w) - 2)) AS i) t
        ),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT id_a, id_b FROM inter
            JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.1
        ),
        edges AS (
            SELECT id_a AS u, id_b AS v FROM pairs
            UNION SELECT id_b, id_a FROM pairs
        ),
        cc AS (
            SELECT u AS node, u AS comp FROM edges
            UNION
            SELECT e.u, c.comp FROM edges e JOIN cc c ON e.v = c.node
            WHERE c.comp < e.u
        ),
        labels AS (SELECT node, min(comp) AS comp FROM cc GROUP BY node),
        quality AS (
            SELECT doc_id, lang,
                   least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) * 0.4
                       + (1.0 - CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
                             / length(text)) * 0.3
                       + (CAST(len(list_filter(string_split(text, ' '),
                            t -> t IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE)
                             / len(string_split(text, ' '))) * 0.3 AS quality_score
            FROM documents
        ),
        member AS (
            SELECT q.doc_id, q.lang, q.quality_score,
                   coalesce(l.comp, q.doc_id) AS comp
            FROM quality q LEFT JOIN labels l ON l.node = q.doc_id
            WHERE q.quality_score >= 0.5
        ),
        survivor AS (
            SELECT comp, doc_id, lang, quality_score,
                   row_number() OVER (
                       PARTITION BY comp ORDER BY quality_score DESC, doc_id
                   ) AS rn
            FROM member
        )
        SELECT doc_id, lang, quality_score,
               CASE WHEN
                   (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10) >= 8
               THEN 'test' ELSE 'train' END AS split
        FROM survivor WHERE rn = 1
    """,
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation pipeline as ONE statement — the end-to-end a
    reference user actually runs: quality gate (score ≥ 0.5) → near-dup
    clustering (shared pair graph → CC, singletons included) → one
    survivor per cluster (best quality, ties to lowest id) → 80/20
    hash split. Leakage safety falls out structurally: one survivor
    per near-dup cluster means no cluster can straddle the split.
    Every stage is individually oracle-verified elsewhere; this query
    hash-checks their COMPOSITION (the classic place bugs hide —
    filter-before-vs-after-clustering ordering, singleton handling,
    tie-breaks)."""
    from etl_utils_spark.operators.clustering import connected_components
    from etl_utils_spark.operators.text import quality_score
    from etl_utils_spark.queries.shared import jaccard_pair_graph
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    labels = connected_components(jaccard_pair_graph(spark, sf_dir))
    # lang rides the row-local scoring projection — no corpus self-join
    # just to reattach a column of the same scan.
    quality = quality_score(docs, extra_cols=("lang",)).select(
        "doc_id", "lang", "quality_score"
    )
    member = (
        quality.filter(F.col("quality_score") >= 0.5)
        .join(labels.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id", "lang", "quality_score",
            F.coalesce("comp", "doc_id").alias("comp"),
        )
    )
    w = Window.partitionBy("comp").orderBy(F.desc("quality_score"), F.asc("doc_id"))
    survivors = (
        member.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "quality_score")
    )
    split = ml_prep.train_test_split(survivors, "doc_id", test_buckets=2, n_buckets=10)
    return split.select("doc_id", "lang", "quality_score", "split")
