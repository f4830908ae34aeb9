"""Property-based tests for operators/order_stats.py — random value
multisets (heavy duplicates, negatives, single element) against the
literal sorted-array order statistic."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_utils_spark.operators.order_stats import exact_quantile

_vals = st.lists(
    st.one_of(
        st.integers(min_value=-50, max_value=50).map(float),
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32).map(float),
    ),
    min_size=1,
    max_size=120,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=_vals, q=st.sampled_from([0.0, 0.1, 0.5, 0.9, 1.0]))
def test_exact_quantile_equals_sorted_rank(spark, vals, q):
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    expect = sorted(vals)[int((len(vals) - 1) * q)]
    # tiny accuracy + take_limit force the bracket/recursion/bisection
    # machinery even on small inputs
    got = exact_quantile(df, "x", q, accuracy=8, take_limit=4)
    assert got == expect, (vals, q, got, expect)
