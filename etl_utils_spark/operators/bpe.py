"""Distributed BPE-style merge-rule learning (Sennrich et al. 2016),
at whitespace-token granularity over the corpus: each round counts all
adjacent token pairs, picks the global argmax (ties → lexicographically
smallest pair), and rewrites the corpus with the pair fused — the
greedy left-to-right merge semantics of byte-pair encoding, applied to
words (phrase merges). Byte-level BPE is the identical algorithm over
char arrays.

Scale shape per round: ONE corpus scan → pair explode → hash aggregate
(map-side combined) → a 1-ROW argmax collected driver-side (bounded:
one row per round, the winsorized-bounds precedent) → a literal
`replace` applied lazily. The corpus is never collected; N rounds = N
scans. At 100 TB you would localCheckpoint the rewritten corpus every
few rounds to stop plan/lineage growth — noted, unnecessary at N=3.

The merge rewrite runs on a sentinel-wrapped form ``|tok||tok|...``:
each token wrapped in ``|`` so a pair match ``|a||b|`` can never span a
token partially, and consecutive overlapping occurrences resolve
left-to-right exactly as BPE defines (``|a||a||a|`` merges once) — both
Spark's and DuckDB's `replace` scan left-to-right non-overlapping, so
the DuckDB oracle certifies the semantics cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def wrapped(tokens_col):
    """Sentinel-wrap a token array: ``|tok||tok|...|``."""
    return F.concat(F.lit("|"), F.array_join(tokens_col, "||"), F.lit("|"))


def tokens_of_wrapped(col):
    """Inverse of :func:`wrapped` (accepts a Column or name)."""
    return F.split(F.btrim(col, F.lit("|")), r"\|\|")


def apply_merges(col, rules):
    """Apply learned merge rules (in order) to a sentinel-wrapped
    column — the tokenize step once training is done."""
    for _, left, right, _ in rules:
        col = F.replace(
            col, F.lit(f"|{left}||{right}|"), F.lit(f"|{left}{right}|")
        )
    return col


def learn_merges(
    corpus: DataFrame, tokens_col, n_merges: int = 3
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` merge rules; returns
    ``[(round, left, right, n_occurrences), ...]``."""
    spark = corpus.sparkSession
    cur = corpus.select(wrapped(tokens_col).alias("w"))
    rules: list[tuple[int, str, str, int]] = []
    for k in range(n_merges):
        toks = tokens_of_wrapped("w")
        pairs = F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat_ws("\t", a, b),
        )
        counts = (
            cur.select(F.explode(pairs).alias("p"))
            .where(F.col("p").contains("\t"))
            .groupBy("p")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # 1-row global argmax, deterministic tie-break on the pair text.
        best = counts.orderBy(F.desc("n"), F.asc("p")).limit(1).collect()
        if not best:
            break
        left, right = best[0]["p"].split("\t")
        n = best[0]["n"]
        rules.append((k, left, right, int(n)))
        cur = cur.withColumn(
            "w",
            F.replace(
                "w",
                F.lit(f"|{left}||{right}|"),
                F.lit(f"|{left}{right}|"),
            ),
        )
    return rules
