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
