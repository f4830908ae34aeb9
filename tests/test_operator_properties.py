"""Property-based operator laws (hypothesis over generated frames):
sessionization and merge invariants that hold for ANY input."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user_id
        st.integers(min_value=0, max_value=100_000),  # offset seconds
    ),
    min_size=1,
    max_size=25,
    unique=True,
)

kv_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=-(2**62), max_value=2**62),
    ),
    min_size=0,
    max_size=12,
)


@given(events_strategy)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_sessionize_gap_law_random(spark_prop, events):
    from pyspark.sql import functions as F

    from etl_utils_spark.operators.sessionize import sessionize

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, u, base + dt.timedelta(seconds=off)) for i, (u, off) in enumerate(events)
    ]
    df = spark_prop.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = sorted(
        sessionize(df, gap_seconds=600).select("user_id", "ts", "session_seq").collect(),
        key=lambda r: (r.user_id, r.ts),
    )
    for a, b in zip(out, out[1:]):
        if a.user_id != b.user_id:
            continue
        gap = (b.ts - a.ts).total_seconds()
        assert (b.session_seq == a.session_seq) == (gap <= 600)


@given(kv_strategy, kv_strategy)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_merge_laws_random(spark_prop, target_kv, source_kv):
    from etl_utils_spark.operators.upsert import merge_upsert

    # unique keys per side (dicts model the table invariant)
    t = list({k: v for k, v in target_kv}.items())
    s = list({k: v for k, v in source_kv}.items())
    target = spark_prop.createDataFrame(t or [(999, 0)], "k long, v long")
    source = spark_prop.createDataFrame(s or [(998, 0)], "k long, v long")
    merged = {r.k: r.v for r in merge_upsert(target, source, "k").collect()}
    td, sd = dict(t or [(999, 0)]), dict(s or [(998, 0)])
    # law: merged == target overridden by source
    assert merged == {**td, **sd}
    # idempotence: merging the source again changes nothing
    merged2 = {
        r.k: r.v
        for r in merge_upsert(
            spark_prop.createDataFrame(list(merged.items()), "k long, v long"),
            source,
            "k",
        ).collect()
    }
    assert merged2 == merged


series_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # key
        st.integers(min_value=0, max_value=10_000),  # order (unique overall)
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[1],
)


@given(series_strategy)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_ewma_laws_random(spark_prop, rows):
    """EWMA invariants for ANY series: each output lies within the
    running [min, max] of its key's prefix, and the first value per
    key is the value itself."""
    from etl_utils_spark.operators.recurrence import ewma

    df = spark_prop.createDataFrame(rows, "k long, t long, value double")
    out = sorted(
        ((r.k, r.t, r.value, r.ewma) for r in ewma(df, "k", "t", "value").collect()),
        key=lambda x: (x[0], x[1]),
    )
    prefix: dict[int, list[float]] = {}
    for k, t, v, ew in out:
        seen = prefix.setdefault(k, [])
        if not seen:
            assert ew == v
        seen.append(v)
        assert min(seen) - 1e-9 <= ew <= max(seen) + 1e-9


money_kv_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        # DECIMAL(18,2) state: values must stay money-scaled
        st.integers(min_value=-(10**9), max_value=10**9),
    ),
    min_size=0,
    max_size=12,
)


@given(money_kv_strategy, money_kv_strategy)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_incremental_merge_law_random(spark_prop, part_a, part_b):
    """Incremental-refresh law: aggregating two arbitrary slices
    separately and merging the partial states must equal aggregating
    the union from scratch — for ANY split."""
    from etl_utils_spark.operators.incremental import (
        finalize,
        merge_partials,
        partial_aggs,
    )

    a = part_a or [(0, 1)]
    b = part_b or [(1, 2)]
    fa = spark_prop.createDataFrame(a, "k long, v long")
    fb = spark_prop.createDataFrame(b, "k long, v long")
    merged = finalize(
        merge_partials(partial_aggs(fa, ["k"], "v"), partial_aggs(fb, ["k"], "v"), ["k"]),
        ["k"],
    )
    scratch = finalize(partial_aggs(fa.unionByName(fb), ["k"], "v"), ["k"])
    as_map = lambda df: {
        r.k: (r.n_rows, r.total, r.min_value, r.max_value) for r in df.collect()
    }
    assert as_map(merged) == as_map(scratch)


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=1, max_size=400))
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_cdc_chunks_partition_document(spark_prop, text):
    """CDC chunking must PARTITION the document: chunk lengths sum to
    the byte length for any ASCII text (no gaps, no overlaps)."""
    from etl_utils_spark.operators.dedup import cdc_chunk_digests

    df = spark_prop.createDataFrame([(1, text)], "doc_id long, text string")
    rows = cdc_chunk_digests(df).collect()
    assert sum(r.chunk_len for r in rows) == len(text.encode())
    assert all(r.chunk_len > 0 for r in rows)


ids_strategy = st.lists(
    st.integers(min_value=-(2**40), max_value=2**40),
    min_size=1,
    max_size=40,
    unique=True,
)


@given(ids_strategy, st.integers(min_value=1, max_value=9))
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_global_ids_equal_rank_for_any_keys_and_partitioning(
    spark_prop, keys, nparts
):
    """For ANY unique key set and ANY bucket count, assign_global_ids
    equals the rank in key order (the single-reducer formulation)."""
    from etl_utils_spark.operators.ids import assign_global_ids

    df = spark_prop.createDataFrame([(k,) for k in keys], "k long")
    out = assign_global_ids(df, "k", num_partitions=nparts).collect()
    expect = {k: i + 1 for i, k in enumerate(sorted(keys))}
    assert {r["k"]: r["global_id"] for r in out} == expect


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=9),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_prefix_sum_equals_sequential_for_any_input(spark_prop, rows, nparts):
    from etl_utils_spark.operators.ids import prefix_sum

    df = spark_prop.createDataFrame(rows, "k long, v long")
    out = {
        r["k"]: r["running_total"]
        for r in prefix_sum(df, "k", "v", num_partitions=nparts).collect()
    }
    acc = 0
    for k, v in sorted(rows):
        acc += v
        assert out[k] == acc


@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=6),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=3),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_bpe_merges_preserve_concatenation(spark_prop, docs, n_merges):
    """Merging never changes the underlying character stream: for any
    corpus, applying the learned merges preserves each doc's token
    concatenation (merges only fuse boundaries)."""
    from pyspark.sql import functions as F

    from etl_utils_spark.operators.bpe import (
        apply_merges,
        learn_merges,
        tokens_of_wrapped,
        wrapped,
    )

    df = spark_prop.createDataFrame([(d,) for d in docs], "tok string")
    # multi-token docs: one token per character
    corpus = df.select(F.split(F.col("tok"), "(?!^)(?!$)").alias("toks"))
    rules = learn_merges(corpus, F.col("toks"), n_merges)
    w = corpus.select(wrapped(F.col("toks")).alias("w0"))
    applied = w.withColumn("w1", apply_merges(F.col("w0"), rules))
    rows = applied.select(
        F.array_join(tokens_of_wrapped("w0"), "").alias("s0"),
        F.array_join(tokens_of_wrapped("w1"), "").alias("s1"),
    ).collect()
    for r in rows:
        assert r["s0"] == r["s1"]


@given(series_strategy)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_holt_linear_matches_reference_loop(spark_prop, rows):
    """Holt smoothing must equal a plain-Python reference recurrence
    bit-for-bit (the DuckDB-oracle determinism contract), for ANY
    series and any key interleaving."""
    from etl_utils_spark.operators.recurrence import holt_linear

    df = spark_prop.createDataFrame(rows, "k long, t long, value double")
    out = {
        (r.k, r.t): (r.level, r.trend)
        for r in holt_linear(df, "k", "t", "value", alpha=0.5, beta=0.3).collect()
    }
    state: dict[int, tuple[float, float]] = {}
    for k, t, x in sorted(rows, key=lambda r: (r[0], r[1])):
        if k not in state:
            state[k] = (float(x), 0.0)
        else:
            l_prev, b_prev = state[k]
            l_new = 0.5 * float(x) + 0.5 * (l_prev + b_prev)
            b_new = 0.3 * (l_new - l_prev) + 0.7 * b_prev
            state[k] = (l_new, b_new)
        assert out[(k, t)] == state[k]
