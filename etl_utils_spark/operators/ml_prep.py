"""Training-data preparation operators (north star): deterministic
splits, vocabulary building, sequence packing, leakage-safe splits.

Scale notes:
- splits are HASH-based (content/key hash → bucket), never random():
  reproducible across runs, engines, and cluster sizes, and requiring
  no shuffled state.
- packing runs per partition-key (language here): a global greedy pack
  would serialize on one task; per-key packing parallelizes across
  keys and matches how training shards are usually built (per-language
  / per-source shards).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(col: str | Column, n_buckets: int = 10) -> Column:
    """Deterministic bucket in [0, n_buckets) from the md5 of a value —
    engine-portable (md5 hex → first 8 chars → int), unlike xxhash64
    which is Spark-specific."""
    h = F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(n_buckets))


def md5_uniform(key: str | Column) -> Column:
    """u(key) ∈ [0,1): md5 hex → first 8 chars → 32-bit int / 2^32.
    An exact dyadic rational, so `<`-compares against it have no
    float-rounding ambiguity either engine could resolve differently.
    THE accept-test primitive for every deterministic sampler in the
    repo (quality_weighted_sample, sampling.stratified_sample_md5) and
    the expression every sampling oracle mirrors verbatim — one
    definition, or the engine and its hash certification silently
    desynchronize (code-review r12)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(4294967296.0)


def quality_weighted_sample(
    df: DataFrame, key: str, score_col: str
) -> DataFrame:
    """Deterministic Bernoulli(score) sampling: keep a row iff its
    md5-derived uniform u(key) ∈ [0,1) is below ``score_col``.

    The curation shape for corpus mixing — high-quality docs are kept
    with probability ≈ their score, low-quality ones mostly drop, and
    the decision is a pure function of the key: re-runs, engines, and
    cluster sizes all agree row-by-row (no RNG state, no seed plumbing),
    and a doc's fate never changes as the corpus grows. u is an exact
    dyadic rational (32-bit int / 2^32), so the `<` compare has no
    float-rounding ambiguity either engine could resolve differently."""
    return df.filter(md5_uniform(key) < F.col(score_col))


def train_test_split(
    df: DataFrame, key: str, test_buckets: int = 2, n_buckets: int = 10
) -> DataFrame:
    """Add a 'split' column: 'test' for keys hashing into the last
    ``test_buckets`` buckets, else 'train'. Stable under any data
    growth — a key's split never changes."""
    b = hash_bucket(F.col(key).cast("string"), n_buckets)
    return df.withColumn(
        "split", F.when(b >= n_buckets - test_buckets, "test").otherwise("train")
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    test_buckets: int = 2,
    n_buckets: int = 10,
) -> DataFrame:
    """Split where near-duplicate CLUSTERS stay on one side (no
    train/test contamination): hash the cluster representative, not
    the document."""
    from etl_utils_spark.operators.clustering import connected_components

    cc = connected_components(pairs, src="id_a", dst="id_b").withColumnRenamed(
        "node", id_col
    )
    with_comp = docs.join(cc, id_col, "left").withColumn(
        "split_key", F.coalesce(F.col("comp"), F.col(id_col))
    )
    return train_test_split(with_comp, "split_key", test_buckets, n_buckets).drop(
        "split_key", "comp"
    )


def build_vocab(
    docs: DataFrame, text_col: str = "text", top_k: int = 100
) -> DataFrame:
    """Frequency-ranked vocabulary with deterministic tie-break
    (count DESC, token ASC): (token, n, token_id 0-based)."""
    counts = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    return (
        counts.withColumn("token_id", F.row_number().over(w) - 1)
        .filter(F.col("token_id") < top_k)
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    part_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Contiguous sequence packing: within each partition key, walk
    docs in id order and assign bin = floor(tokens-before / budget) —
    the shard id a training pipeline would write the doc into.

    Straddling is allowed (a doc may start in bin k and spill into
    k+1); exact no-straddle packing is a sequential decision, this
    cumulative form is the order-deterministic parallel variant."""
    n_tokens = F.size(F.split(F.col(text_col), " "))
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(n_tokens).over(w)
    return docs.select(
        id_col,
        part_col,
        n_tokens.alias("n_tokens"),
        ((cum - n_tokens) / budget).cast("long").alias("bin_id"),
    )
