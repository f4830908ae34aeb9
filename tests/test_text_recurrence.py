"""Unit tests for the recurrence (EWMA) and text-quality operators —
edge cases the corpus-level oracle parity tests don't isolate."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_utils_spark.operators.recurrence import ewma
from etl_utils_spark.operators.text import bigram_counts, redact_numbers, repetition_ratio


def test_ewma_recurrence_exact(spark):
    rows = [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0), (2, 1, 5.0)]
    df = spark.createDataFrame(rows, "k long, t long, value double")
    out = {(r.k, r.t): r.ewma for r in ewma(df, "k", "t", "value", alpha=0.5).collect()}
    assert out[(1, 1)] == 10.0
    assert out[(1, 2)] == 0.5 * 20.0 + 0.5 * 10.0
    assert out[(1, 3)] == 0.5 * 30.0 + 0.5 * (0.5 * 20.0 + 0.5 * 10.0)
    assert out[(2, 1)] == 5.0  # singleton group seeds with itself


def test_ewma_order_independence_of_input(spark):
    """The recurrence must sort by order_col inside the group — input
    row order (partitioning noise) must not change the result."""
    rows = [(1, t, float(t)) for t in range(20)]
    df = spark.createDataFrame(rows, "k long, t long, value double")
    a = {r.t: r.ewma for r in ewma(df, "k", "t", "value").collect()}
    b = {
        r.t: r.ewma
        for r in ewma(df.orderBy(F.desc("t")).repartition(7), "k", "t", "value").collect()
    }
    assert a == b


def test_bigram_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, "a b a b"), (4, "  ?!  ")],
        "doc_id long, text string",
    )
    got = {r.bigram: r.cnt for r in bigram_counts(df).collect()}
    # zero- and one-token docs contribute nothing; no phantom empties
    assert got == {"a b": 2, "b a": 1}


def test_repetition_ratio_flags(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam eggs"), (2, "a b c d e f")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_ratio(df).collect()}
    assert got[1].n_tokens == 5 and not got[1].keep
    assert got[2].n_tokens == 6 and got[2].keep


def test_redact_numbers(spark):
    df = spark.createDataFrame(
        [(1, "call 555 0199 now"), (2, "no digits")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in redact_numbers(df).collect()}
    assert got[1].redacted == "call <NUM> <NUM> now" and got[1].n_redactions == 2
    assert got[2].redacted == "no digits" and got[2].n_redactions == 0


def test_cdc_chunks_are_insertion_local(spark):
    """Content-defined boundaries depend only on local bytes: editing
    the head of a long document must leave most chunk digests intact
    (fixed-size chunking would shift every subsequent chunk)."""
    from etl_utils_spark.operators.dedup import cdc_chunk_digests

    base = " ".join(f"tok{i}w{(i * 7) % 97}" for i in range(200))
    edited = "X" + base
    df = spark.createDataFrame([(1, base), (2, edited)], "doc_id long, text string")
    rows = cdc_chunk_digests(df).collect()
    a = {r.chunk_digest for r in rows if r.doc_id == 1}
    b = {r.chunk_digest for r in rows if r.doc_id == 2}
    assert len(a) > 3
    # the overwhelming majority of chunks survive the head edit
    assert len(a & b) / len(a) > 0.7, (len(a), len(a & b))
