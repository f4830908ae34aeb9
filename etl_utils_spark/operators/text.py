"""Text-analysis operators over document tables (SURVEY.md §2 C9b/C9c
+ north-star text analysis: language-ID, quality scoring, token
counting, fingerprinting).

All pure built-in-function pipelines — explode/filter/higher-order
array functions, no Python UDFs: at 100 TB the per-doc work stays in
whole-stage codegen and the only shuffles are the final aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker stopword sets for the n-gram/marker language heuristic.
# Deterministic and tiny — broadcast as literals into the plan.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),  # pinyin-ish markers
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# BPE-ish token pattern: word pieces, digit runs, single punctuation.
TOKEN_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens_col(text: str | Column = "text") -> Column:
    return F.split(text, " ")


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document token statistics: whitespace tokens, distinct
    tokens, regex (BPE-ish) tokens, average token length."""
    w = tokens_col(text_col)
    return df.select(
        id_col,
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_unique_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_REGEX), F.lit(0))).alias(
            "n_regex_tokens"
        ),
        (
            F.aggregate(w, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)).cast("double")
            / F.size(w)
        ).alias("avg_token_len"),
    )


def language_scores(text_col: str | Column = "text") -> dict[str, Column]:
    """Marker-hit count per language for a text column."""
    w = tokens_col(text_col)

    def hit_count(markers: tuple[str, ...]) -> Column:
        return F.size(F.filter(w, lambda t: t.isin(*markers)))

    return {lang: hit_count(markers) for lang, markers in LANG_MARKERS.items()}


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of marker-set hit counts with a
    deterministic tie-break (language name order); 'und' when no
    marker hits at all."""
    scores = language_scores(text_col)
    # argmax with (count DESC, lang ASC) tie-break as a chained CASE —
    # SQL-mirrorable on any engine.
    langs = sorted(scores)
    best_n = F.greatest(*[scores[lang] for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties → apply last
        pred = F.when(scores[lang] == best_n, F.lit(lang)).otherwise(pred)
    pred = F.when(best_n == 0, F.lit("und")).otherwise(pred)
    cols = [F.col(id_col), pred.alias("pred_lang")]
    cols += [scores[lang].alias(f"n_{lang}") for lang in langs]
    return df.select(*cols)


def quality_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Heuristic quality scoring: length, punctuation ratio, stopword
    ratio, mean word length → bounded score in [0,1].

    The formula is rational arithmetic only (no transcendentals) so any
    engine computes it bit-identically.

    ``extra_cols`` are carried through the (row-local) projection so a
    caller needing e.g. ``lang`` alongside the score doesn't have to
    join the corpus back to itself to reattach it."""
    w = tokens_col(text_col)
    n_chars = F.length(text_col)
    n_tokens = F.size(w)
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[a-zA-Z0-9\s]", ""))
    n_stop = F.size(F.filter(w, lambda t: t.isin(*STOPWORDS)))
    punct_ratio = n_punct.cast("double") / n_chars
    stop_ratio = n_stop.cast("double") / n_tokens
    len_score = F.least(n_tokens.cast("double") / 100.0, F.lit(1.0))
    score = len_score * 0.4 + (1.0 - punct_ratio) * 0.3 + stop_ratio * 0.3
    return df.select(
        id_col,
        *extra_cols,
        n_chars.alias("n_chars_computed"),
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def _alpha_tokens(text_col: str | Column) -> Column:
    """Lowercased alphabetic tokens (regex split, empties dropped)."""
    return F.filter(F.split(F.lower(text_col), "[^a-z]+"), lambda t: t != "")


def bigram_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus bigram counts without a per-document window sort: the
    adjacent-pair list is built array-side (slice + zip_with, all
    whole-stage codegen), then a single explode + hash aggregate.  At
    100 TB this is one shuffle on the bigram key — no doc-partitioned
    window state."""
    toks = _alpha_tokens(text_col)
    n = F.size(toks)
    pair_len = F.greatest(n - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, pair_len),
        F.slice(toks, 2, pair_len),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        df.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ngrams_array(toks: Column, n: int) -> Column:
    """Word ``n``-gram strings built array-side (slice + zip_with, all
    whole-stage codegen) — the generalization of the bigram trick in
    :func:`bigram_counts`.  Empty array when the doc has < n tokens."""
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    out = F.slice(toks, 1, cnt)
    for i in range(2, n + 1):
        out = F.zip_with(
            out, F.slice(toks, i, cnt), lambda a, b: F.concat_ws(" ", a, b)
        )
    return out


def gopher_rules(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, public):
    word count bounds, mean word length bounds, symbol-to-char ratio,
    and a minimum number of distinct stopwords present.  Everything is
    computed array-side per row — no explode, no shuffle, one codegen
    stage over the scan; the shape that survives 100 TB unchanged."""
    toks = _alpha_tokens(text_col)
    n_words = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    )
    mean_word_len = F.round(sum_len.cast("double") / n_words, 6)
    n_chars = F.length(text_col)
    n_symbols = F.length(F.regexp_replace(F.lower(text_col), r"[a-z0-9\s]", ""))
    symbol_ratio = F.round(n_symbols.cast("double") / n_chars, 6)
    stop_hits = F.size(
        F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(s) for s in STOPWORDS]))
    )
    keep = (
        n_words.between(50, 100000)
        & mean_word_len.between(3.0, 10.0)
        & (symbol_ratio < 0.1)
        & (stop_hits >= 2)
    )
    return df.select(
        id_col,
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        stop_hits.alias("stop_hits"),
        keep.alias("keep"),
    )


def dup_ngram_fraction(
    df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_fraction: float = 0.4,
) -> DataFrame:
    """Duplicate word-n-gram fraction per document (the Gopher
    repetition family): share of a doc's n-grams that are repeats of
    an earlier n-gram in the SAME doc.  High values flag boilerplate
    and degenerate loops.  Array-side (`array_distinct`), zero
    shuffles — per-doc state is bounded by doc length, not corpus."""
    toks = _alpha_tokens(text_col)
    grams = ngrams_array(toks, n)
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    frac = F.when(total > 0, F.round(1.0 - distinct.cast("double") / total, 6)).otherwise(
        F.lit(0.0)
    )
    return df.select(
        id_col,
        total.alias("n_ngrams"),
        distinct.alias("n_distinct"),
        frac.alias("dup_fraction"),
        (frac <= max_fraction).alias("keep"),
    )


def repetition_ratio(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_ratio: float = 0.2
) -> DataFrame:
    """Gopher-style repetition quality filter: fraction of a document's
    tokens taken by its single most frequent token; documents above
    ``max_ratio`` are flagged for drop.  Two hash aggregates (per
    (doc, token), then per doc) — map-side partials keep the shuffle
    proportional to vocabulary, not corpus size."""
    tok = df.select(id_col, F.explode(_alpha_tokens(text_col)).alias("tok"))
    per_tok = tok.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    ratio = F.max("c").cast("double") / F.sum("c")
    return per_tok.groupBy(id_col).agg(
        F.sum("c").alias("n_tokens"),
        F.round(ratio, 6).alias("top_token_ratio"),
        (ratio < F.lit(max_ratio)).alias("keep"),
    )


def redact_numbers(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII-scrub shape: replace digit runs with a placeholder and count
    redactions — the pattern generalizes to email/phone/SSN regexes.
    Pure regexp_replace/regexp_extract_all, stays in codegen."""
    return df.select(
        id_col,
        F.regexp_replace(F.col(text_col), r"[0-9]+", "<NUM>").alias("redacted"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[0-9]+"), F.lit(0))).alias(
            "n_redactions"
        ),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase
    text — the exact-dedup key that is robust to spacing/case noise.
    (A rolling/content-defined-chunking variant would layer on top for
    partial-overlap detection; md5-of-normalized is the deterministic
    core both engines share.)"""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(
        id_col,
        F.md5(norm).alias("fingerprint"),
        F.length(norm).alias("norm_len"),
    )


def char_entropy(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Character-distribution Shannon entropy per document (bits).

    Low entropy flags degenerate training text (repeated characters,
    padding, single-token spam); the standard cheap companion to the
    repetition-ratio filter.  Uses the aggregate identity
    H = log2(n) - (Σ c·ln c) / (n·ln 2), so the whole thing is two
    map-combined hash aggregates keyed by doc_id — no per-row
    probability column, no window, all codegen.  The per-doc char
    alphabet is bounded (≤ alphabet size), so second-stage frames are
    constant-size regardless of corpus scale."""
    ln2 = 0.6931471805599453
    chars = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), "")).alias("ch")
    ).filter(F.col("ch") != "")
    per_char = chars.groupBy(id_col, "ch").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c").cast("double")
    c = F.col("c").cast("double")
    # The c·ln(c) terms are irrational doubles: quantize each at 2^-30
    # (shared floor IEEE expression) so the per-doc sum is exact
    # integer arithmetic — raw float sums are summation-order-dependent
    # and a ROUND on top flips digits across engines.
    q = F.floor(c * F.log(c) * 1073741824.0 + 0.5).cast("long")
    return per_char.groupBy(id_col).agg(
        F.sum("c").alias("n_chars_total"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
        F.round(
            F.log2(n)
            - (F.sum(q).cast("double") / 1073741824.0) / (n * F.lit(ln2)),
            6,
        ).alias("entropy_bits"),
    )
