"""Training-data text-quality queries: corpus bigram statistics,
Gopher-style repetition filtering, and PII-shaped redaction — the
document-curation layer on top of the token/language/quality surface
in ``queries/llm.py``."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_utils_spark.operators import text
from etl_utils_spark.queries.registry import query
from etl_utils_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "ngram_top_bigrams",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z]+'),
                               x -> x <> '') AS toks
            FROM documents
        ),
        idx AS (
            SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - 1)) AS i
            FROM t
        ),
        b AS (SELECT toks[i] || ' ' || toks[i + 1] AS bigram FROM idx)
        SELECT bigram, count(*)::BIGINT AS cnt
        FROM b GROUP BY bigram
        ORDER BY cnt DESC, bigram
        LIMIT 20
    """,
)
def ngram_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus bigrams with a total-order tie-break — adjacent
    pairs built array-side (slice+zip_with, no per-doc window), one
    hash aggregate, TakeOrderedAndProject for the top-k."""
    d = _t(spark, sf_dir, "documents")
    return (
        text.bigram_counts(d)
        .orderBy(F.desc("cnt"), "bigram")
        .limit(20)
    )


@query(
    "quality_repetition_ratio",
    oracle="""
        WITH tok AS (
            SELECT doc_id,
                   unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                      x -> x <> '')) AS tok
            FROM documents
        ),
        cnt AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok)
        SELECT doc_id,
               SUM(c)::BIGINT AS n_tokens,
               ROUND(MAX(c)::DOUBLE / SUM(c), 6) AS top_token_ratio,
               (MAX(c)::DOUBLE / SUM(c)) < 0.2 AS keep
        FROM cnt GROUP BY doc_id
    """,
)
def quality_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: most-frequent-token share per
    document + keep flag (two map-combined hash aggregates)."""
    return text.repetition_ratio(_t(spark, sf_dir, "documents"))


@query(
    "text_redact_numbers",
    oracle="""
        SELECT doc_id,
               regexp_replace(text, '[0-9]+', '<NUM>', 'g') AS redacted,
               len(regexp_extract_all(text, '[0-9]+'))::INT AS n_redactions
        FROM documents
    """,
)
def text_redact_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-scrub shape: digit runs replaced by a placeholder plus a
    redaction count — pure regexp codegen, the template for
    email/phone scrubbing at corpus scale."""
    return text.redact_numbers(_t(spark, sf_dir, "documents"))


@query(
    "lm_bigram_doc_score",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z]+'),
                               x -> x <> '') AS toks
            FROM documents
        ),
        idx AS (
            SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - 1)) AS i
            FROM t
        ),
        db AS (
            SELECT doc_id, toks[i] AS w1,
                   toks[i] || ' ' || toks[i + 1] AS bigram
            FROM idx
        ),
        B AS (SELECT bigram, count(*) AS nb FROM db GROUP BY bigram),
        U AS (SELECT w1, count(*) AS nu FROM db GROUP BY w1)
        SELECT doc_id,
               CAST(SUM(CAST(floor(ln(nb::DOUBLE / nu) * 1073741824.0 + 0.5)
                             AS BIGINT)) AS DOUBLE)
                   / (CAST(count(*) AS DOUBLE) * 1073741824.0) AS avg_loglik
        FROM db JOIN B USING (bigram) JOIN U USING (w1)
        GROUP BY doc_id
    """,
)
def lm_bigram_doc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model quality score: per-document average
    log-likelihood under the corpus's own MLE bigram model — the
    classic fluency/outlier filter (documents whose transitions are
    rare in the corpus score low).  Train and score in one pipeline:
    bigram + unigram count tables (two hash aggregates on the same
    exploded pairs, vocabulary-sized) joined back to the per-doc
    pairs.  Spark's and DuckDB's ln() agree bit-for-bit on the
    fixtures; each term is 2^-30-quantized so the per-doc mean is
    exact-integer arithmetic plus one shared division."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda t: t != "")
    n = F.size(toks)
    pl = F.greatest(n - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, pl), F.slice(toks, 2, pl),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    db = d.select("doc_id", F.explode(bigrams).alias("bigram")).withColumn(
        "w1", F.split("bigram", " ")[0]
    )
    # r12 (guide §2.4): the MLE count tables are WINDOW counts over the
    # exploded frame instead of two groupBy frames joined back — the
    # explode runs once (was three times: both count branches and the
    # probe side re-derived it) and the plan drops from 5 exchanges
    # (2 aggregates + 2 join shuffles + final) to 3 (two window sorts +
    # final groupBy).  `count() OVER (PARTITION BY k)` equals the
    # joined `GROUP BY k` count row-for-row, so results are identical
    # (verified bitwise).  Hot-bigram skew lands on one window task
    # exactly as it landed on one join task before.
    nb_w = F.count(F.lit(1)).over(Window.partitionBy("bigram"))
    nu_w = F.count(F.lit(1)).over(Window.partitionBy("w1"))
    joined = db.withColumn("nb", nb_w).withColumn("nu", nu_w)
    # Per-term log-likelihoods are irrational doubles; averaging them
    # directly is summation-order-dependent (a ROUND on top is the r5
    # red class).  Quantize each term at 2^-30 with the shared
    # floor(x*2^30+0.5) IEEE expression, sum exactly as BIGINT, and
    # divide once — bit-identical on both engines.
    q = F.floor(
        F.log(F.col("nb").cast("double") / F.col("nu")) * 1073741824.0 + 0.5
    ).cast("long")
    return joined.groupBy("doc_id").agg(
        (
            F.sum(q).cast("double")
            / (F.count(F.lit(1)).cast("double") * 1073741824.0)
        ).alias("avg_loglik")
    )


@query(
    "text_char_entropy",
    oracle="""
        WITH ch AS (
            SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
        ),
        cnt AS (
            SELECT doc_id, c, count(*) AS n FROM ch
            WHERE c <> '' GROUP BY doc_id, c
        )
        SELECT doc_id,
               CAST(SUM(n) AS BIGINT) AS n_chars_total,
               count(*) AS n_distinct_chars,
               ROUND(log2(SUM(n)::DOUBLE)
                     - (CAST(SUM(CAST(floor(n::DOUBLE * ln(n::DOUBLE)
                                            * 1073741824.0 + 0.5) AS BIGINT))
                             AS DOUBLE) / 1073741824.0)
                       / (SUM(n)::DOUBLE * 0.6931471805599453), 6)
                   AS entropy_bits
        FROM cnt GROUP BY doc_id
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution Shannon entropy per document — the cheap
    degenerate-text detector (padding runs, single-char spam score
    near 0; natural prose lands ~4-4.5 bits).  Aggregate-identity
    form, no per-row probabilities (operators/text.py:char_entropy);
    ln()/log2() agree to round-6 across engines (probed, same policy
    as lm_bigram_doc_score)."""
    return text.char_entropy(_t(spark, sf_dir, "documents"))


@query(
    "tfidf_top_terms",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z]+'),
                               x -> x <> '') AS toks
            FROM documents
        ),
        tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        n AS (SELECT count(*) AS n FROM documents),
        scored AS (
            SELECT doc_id, term,
                   ROUND(tf * ln(n.n::DOUBLE / df), 6) AS tfidf
            FROM tf JOIN dfreq USING (term), n
        ),
        ranked AS (
            SELECT doc_id, term, tfidf,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY tfidf DESC, term
                   ) AS rnk
            FROM scored
        )
        SELECT doc_id, term, tfidf, rnk FROM ranked WHERE rnk <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the classic keyword/topic
    fingerprint used for corpus browsing and near-topic dedup.  tf and
    df come from the SAME (doc, term) aggregate: df is a plain count
    window over the tf frame's term partition (exactly tf's row count
    per term), so the tf lineage is evaluated ONCE — no second tokenize
    scan, no count-distinct shuffle, no term-keyed join back.  The
    corpus size N is a driver-side metadata scalar embedded as a
    literal.  Ranking orders by the ROUND-6 score on both engines so
    float ulp noise can't flip ranks (term asc breaks exact ties);
    WindowGroupLimit prunes to 3 rows per doc before the final sort."""
    d = _t(spark, sf_dir, "documents")
    n_docs = d.count()
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda t: t != "")
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # df = number of docs containing the term = tf's row count per term.
    # A whole-partition count window shares the same skew profile as the
    # old groupBy(term)+join (a hot term lands on one task either way)
    # but shuffles the tf frame once instead of twice-plus-join.
    scored = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    ).select(
        "doc_id",
        "term",
        F.round(
            F.col("tf").cast("double")
            * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tfidf", "rnk")
    )


@query(
    "vocab_coverage_top100",
    oracle="""
        WITH tc AS (
          SELECT t AS tok, count(*)::BIGINT AS c
          FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
          GROUP BY 1
        ),
        top AS (SELECT c FROM tc ORDER BY c DESC, tok LIMIT 100),
        agg AS (SELECT CAST(sum(c) AS BIGINT) AS total_tokens FROM tc),
        cov AS (SELECT CAST(sum(c) AS BIGINT) AS covered_tokens FROM top)
        SELECT 100 AS vocab_size, total_tokens, covered_tokens,
               CAST(covered_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)
                   AS coverage
        FROM agg, cov
    """,
)
def vocab_coverage_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token coverage of a top-100 frequency vocabulary — the metric
    that sizes a tokenizer's vocab against a corpus (what fraction of
    running tokens a k-word vocab explains).  Everything after the one
    explode+count aggregate runs on the token-count frame: top-k is a
    TakeOrdered heap (count DESC, token ASC total order), totals are
    1-row aggregates, and coverage is one IEEE division of exact
    counts (emitted unrounded — bit-identical cross-engine)."""
    d = _t(spark, sf_dir, "documents")
    tc = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = tc.orderBy(F.col("c").desc(), "tok").limit(100)
    agg = tc.agg(F.sum("c").alias("total_tokens"))
    cov = top.agg(F.sum("c").alias("covered_tokens"))
    return agg.crossJoin(cov).select(
        F.lit(100).alias("vocab_size"),
        "total_tokens",
        "covered_tokens",
        (
            F.col("covered_tokens").cast("double")
            / F.col("total_tokens").cast("double")
        ).alias("coverage"),
    )


@query(
    "lm_kneser_ney_source_ce",
    oracle="""
        WITH t AS (
            SELECT source,
                   list_filter(string_split_regex(lower(text), '[^a-z]+'),
                               x -> x <> '') AS toks
            FROM documents
        ),
        idx AS (
            SELECT source, toks,
                   unnest(generate_series(1, len(toks) - 1)) AS i
            FROM t
        ),
        db AS (
            SELECT source, toks[i] AS w1, toks[i + 1] AS w2,
                   toks[i] || ' ' || toks[i + 1] AS bigram
            FROM idx
        ),
        B AS (SELECT bigram, count(*) AS nb FROM db GROUP BY bigram),
        U AS (SELECT w1, count(*) AS nu,
                     count(DISTINCT w2) AS n1f FROM db GROUP BY w1),
        C AS (SELECT w2, count(DISTINCT w1) AS n1b FROM db GROUP BY w2),
        NB AS (SELECT count(DISTINCT bigram) AS nbt FROM db)
        SELECT h.source,
               count(*) AS n_bigrams,
               CAST(SUM(CAST(floor(-ln(
                       (CAST(B.nb AS DOUBLE) - 0.75) / CAST(U.nu AS DOUBLE)
                       + (0.75 * CAST(U.n1f AS DOUBLE) / CAST(U.nu AS DOUBLE))
                         * (CAST(C.n1b AS DOUBLE) / CAST(NB.nbt AS DOUBLE)))
                       * 1073741824.0 + 0.5) AS BIGINT)) AS DOUBLE)
                   / (CAST(count(*) AS DOUBLE) * 1073741824.0) AS kn_ce
        FROM db h
        JOIN B USING (bigram)
        JOIN U USING (w1)
        JOIN C USING (w2)
        CROSS JOIN NB
        GROUP BY h.source
    """,
)
def lm_kneser_ney_source_ce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram cross-entropy per source — the
    CCNet-style corpus-quality signal, one step past the MLE score in
    ``lm_bigram_doc_score``: p_KN(w2|w1) = max(c(w1,w2) - D, 0)/c(w1)
    + D·N1+(w1,·)/c(w1) · N1+(·,w2)/|bigram types|, with the standard
    discount D = 0.75 (an exact dyadic, so c - D is exact in double).
    Self-scoring the training corpus means every scored bigram has
    c >= 1, so no zero floor is needed and the expression is total.

    Scale shape (r12, guide §2.3/§2.4): ONE instance-scale exchange
    collapses the exploded pairs to per-(source, w1, w2) counts; every
    KN count table is then a WINDOW sum over that TYPE-scale frame —
    nb/first-flag share one (w1,w2) sort, nu/N1+(w1,·) share one (w1)
    sort, N1+(·,w2) one (w2) sort — and the per-instance q·count sums
    fold from the same rows.  The former shape hash-aggregated three
    count tables AND shuffle-joined each back onto the full instance
    stream (3 instance-scale join exchanges, now gone).  The
    bigram-type count stays the one collected scalar.  Each term's
    -ln is 2^-30-quantized (shared floor IEEE expression), so the
    per-source mean is exact-integer arithmetic plus one shared
    division — summing raw irrational doubles is summation-order-
    dependent across engines (docs/SCALE.md)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda t: t != "")
    pl = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, 1, pl),
        F.slice(toks, 2, pl),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    gs = (
        d.select("source", F.explode(pairs).alias("p"))
        .groupBy("source", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("cs"))
        .localCheckpoint(eager=True)  # type-scale; reused by 4 readers
    )
    _FULL = (Window.unboundedPreceding, Window.unboundedFollowing)
    w_bg = Window.partitionBy("w1", "w2").orderBy("source")
    g1 = gs.select(
        "source",
        "w1",
        "w2",
        "cs",
        F.sum("cs").over(w_bg.rowsBetween(*_FULL)).alias("nb"),
        # marks ONE row per distinct (w1, w2): summing it over the w1
        # (resp. w2) window below IS countDistinct(w2) per w1 (resp.
        # countDistinct(w1) per w2), which window functions can't
        # express directly
        F.when(F.row_number().over(w_bg) == 1, 1).otherwise(0).alias("first"),
    )
    w1w = Window.partitionBy("w1").rowsBetween(*_FULL)
    w2w = Window.partitionBy("w2").rowsBetween(*_FULL)
    g2 = g1.select(
        "source",
        "w2",
        "cs",
        "nb",
        "first",
        F.sum("cs").over(w1w).alias("nu"),
        F.sum("first").over(w1w).alias("n1f"),
    )
    g3 = g2.select(
        "source", "cs", "nb", "nu", "n1f", F.sum("first").over(w2w).alias("n1b")
    )
    nbt = gs.select("w1", "w2").distinct().count()  # bounded: bigram type count
    p_kn = (F.col("nb").cast("double") - 0.75) / F.col("nu").cast("double") + (
        0.75 * F.col("n1f").cast("double") / F.col("nu").cast("double")
    ) * (F.col("n1b").cast("double") / F.lit(float(nbt)))
    q = F.floor(-F.log(p_kn) * 1073741824.0 + 0.5).cast("long")
    return g3.groupBy("source").agg(
        F.sum("cs").alias("n_bigrams"),
        (
            F.sum(F.col("cs") * q).cast("double")
            / (F.sum("cs").cast("double") * 1073741824.0)
        ).alias("kn_ce"),
    )


@query(
    "pmi_top_collocations",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z]+'),
                               x -> x <> '') AS toks
            FROM documents
        ),
        tok AS (SELECT unnest(toks) AS w FROM t),
        U AS (SELECT w, count(*) AS nu FROM tok GROUP BY w),
        NT AS (SELECT count(*) AS nt FROM tok),
        idx AS (
            SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - 1)) AS i
            FROM t
        ),
        db AS (SELECT toks[i] AS w1, toks[i + 1] AS w2 FROM idx),
        B AS (SELECT w1, w2, count(*) AS nb FROM db GROUP BY w1, w2
              HAVING count(*) >= 5),
        NB AS (SELECT count(*) AS nbig FROM db),
        scored AS (
            SELECT w1 || ' ' || w2 AS bigram, nb,
                   CAST(floor(ln(
                       CAST(CAST(nb AS HUGEINT) * nt * nt AS DOUBLE)
                       / CAST(CAST(nbig AS HUGEINT) * u1.nu * u2.nu AS DOUBLE))
                       * 1073741824.0 + 0.5) AS BIGINT) AS q
            FROM B
            JOIN U u1 ON u1.w = B.w1
            JOIN U u2 ON u2.w = B.w2
            CROSS JOIN NT CROSS JOIN NB
        )
        SELECT bigram, nb::BIGINT AS nb,
               CAST(q AS DOUBLE) / 1073741824.0 AS pmi
        FROM scored
        ORDER BY q DESC, bigram
        LIMIT 20
    """,
)
def pmi_top_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by pointwise mutual information —
    PMI = ln(p(w1,w2) / (p(w1)·p(w2))) with min-support 5, the classic
    phrase-mining signal (high-PMI pairs are multiword expressions BPE
    and phrase tokenizers should keep whole).  The probability ratio
    is ONE exact-integer rational nb·Nt² / (Nb·nu1·nu2) evaluated as a
    single shared IEEE division, so the ln input is bit-identical on
    both engines; the score is 2^-30-quantized and the top-20 is
    ordered by (quantized score, bigram) — a total order no ulp can
    flip.  Count tables are the same inverted-index hash aggregates
    as the bigram-LM family; the final cut is TakeOrdered.

    r12 shape: two corpus passes (unigram counts, bigram counts), both
    checkpointed type-scale frames; Nt and Nb are Σnu / Σnb over those
    count tables (the old shape re-tokenized the corpus twice more to
    count() them), and the token array is projected once before the
    pair zip_with (the shingle-stage lesson: inlined, split() is
    re-substituted per reference)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda t: t != "")
    t = d.select(toks.alias("toks"))
    u = (
        t.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("nu"))
        .localCheckpoint(eager=True)
    )
    nt = u.agg(F.sum("nu")).collect()[0][0]  # total tokens = Σ nu
    pairs = F.zip_with(
        F.slice("toks", 1, F.greatest(F.size("toks") - 1, F.lit(0))),
        F.slice("toks", 2, F.greatest(F.size("toks") - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bfull = (
        t.select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("nb"))
        .localCheckpoint(eager=True)
    )
    nbig = bfull.agg(F.sum("nb")).collect()[0][0]  # total bigrams = Σ nb
    b = bfull.filter(F.col("nb") >= 5)
    u1 = u.select(F.col("w").alias("w1"), F.col("nu").alias("nu1"))
    u2 = u.select(F.col("w").alias("w2"), F.col("nu").alias("nu2"))
    num = (
        F.col("nb").cast("decimal(18,0)")
        * F.lit(nt).cast("decimal(18,0)")
        * F.lit(nt).cast("decimal(18,0)")
    )
    den = (
        F.lit(nbig).cast("decimal(18,0)")
        * F.col("nu1").cast("decimal(18,0)")
        * F.col("nu2").cast("decimal(18,0)")
    )
    scored = (
        b.join(u1, "w1")
        .join(u2, "w2")
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            "nb",
            F.floor(
                F.log(num.cast("double") / den.cast("double")) * 1073741824.0
                + 0.5
            )
            .cast("long")
            .alias("q"),
        )
    )
    return (
        scored.orderBy(F.desc("q"), "bigram")
        .limit(20)
        .select(
            "bigram",
            F.col("nb").cast("long").alias("nb"),
            (F.col("q").cast("double") / 1073741824.0).alias("pmi"),
        )
    )
