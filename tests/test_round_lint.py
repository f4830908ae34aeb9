"""Cross-engine float-determinism lint over every registered oracle.

The r5 driver red (``stats_rolling_corr_price_qty``) exposed a failure
class the local 9-sig-digit rehearsal structurally cannot catch:
engine-builtin float aggregates (corr/covar/stddev/avg/...) accumulate
doubles in engine- and partition-order-specific ways, so Spark and
DuckDB disagree at the ulp level, and a ROUND on top flips the last
digit for SOME fixture — hash red.  The repo discipline
(docs/SCALE.md):

1. NEVER put ROUND over a builtin float aggregate.  Reconstruct the
   statistic from exact integer moments (operators/exact_moments.py)
   and evaluate ONE shared IEEE expression.
2. NEVER put ROUND over a SUM of float-producing terms.  Quantize each
   term with the shared ``floor(x * 2^k + 0.5)`` expression, sum
   exactly as integers, divide once.
3. Engine ROUND itself diverges on identical inputs whose shortest
   decimal repr ties at the round digit (Spark rounds the shortest
   repr half-up; DuckDB rounds the binary value), so rationals are
   emitted UNROUNDED — rounding is reserved for post-irrational maps
   (ln/sqrt/exp outputs have ~17 significant digits; a tie is
   measure-zero).

These lints parse the oracle SQL of every registered query; the Spark
side mirrors the oracle by construction, so linting the SQL covers
both engines.
"""

from __future__ import annotations

import re

from etl_utils_spark.queries import REGISTRY

_BUILTIN_FLOAT_AGGS = re.compile(
    r"\b(corr|covar_samp|covar_pop|stddev|stddev_samp|stddev_pop|"
    r"var_samp|var_pop|variance|skewness|kurtosis|avg|mean|"
    r"regr_slope|regr_intercept|regr_r2)\s*\(",
    re.I,
)

# Float-typed fixture columns: a builtin mean/median/quantile over one
# of these is only allowed via the allowlist below.
_FLOAT_COLS = r"(?:value|o_totalprice|l_extendedprice|c_acctbal|l_discount|l_tax)"
_FLOAT_ORDER_STATS = re.compile(
    r"\b(avg|mean|median|quantile_cont|percentile_cont)\s*\(\s*"
    + _FLOAT_COLS,
    re.I,
)

# Exact interpolated quantiles over raw double columns: the sorted
# input is deterministic and both engines share the linear-
# interpolation definition — probed bit-identical on every fixture and
# driver-green since r1.  Quarantined here rather than blessed: any
# NEW query should quantize to cents first (outliers_mad_user_value is
# the cents-median model).
_QUANTILE_ALLOWLIST = {
    "percentile_order_prices",
    "winsorized_order_prices",
    "winsorized_prices_by_priority",
    "binning_decile_prices",
}


def _round_args(sql: str):
    """Yield the balanced-paren argument text of every ROUND( call."""
    for m in re.finditer(r"\bROUND\s*\(", sql, re.I):
        i = m.end()
        depth = 1
        start = i
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        yield sql[start : i - 1]


def _sum_args(text: str):
    for m in re.finditer(r"\bSUM\s*\(", text, re.I):
        i = m.end()
        depth = 1
        start = i
        while i < len(text) and depth:
            if text[i] == "(":
                depth += 1
            elif text[i] == ")":
                depth -= 1
            i += 1
        yield text[start : i - 1]


def test_no_round_over_builtin_float_aggregates():
    bad = []
    for name, q in REGISTRY.items():
        if q.oracle is None:
            continue
        for arg in _round_args(q.oracle):
            m = _BUILTIN_FLOAT_AGGS.search(arg)
            if m:
                bad.append((name, m.group(0), arg.strip()[:80]))
    assert not bad, (
        "ROUND over engine-builtin float aggregates is ulp-unstable "
        f"across engines — reconstruct from exact integer moments: {bad}"
    )


def test_no_round_over_float_sums():
    bad = []
    for name, q in REGISTRY.items():
        if q.oracle is None:
            continue
        for arg in _round_args(q.oracle):
            for inner in _sum_args(arg):
                floaty = re.search(
                    r"\b(ln|log|log2|log10|exp|sqrt|pow)\s*\(|::DOUBLE|AS DOUBLE|[/*]",
                    inner,
                    re.I,
                )
                exact = re.search(
                    r"floor\(.*AS BIGINT|DECIMAL\(|AS HUGEINT", inner, re.I | re.S
                )
                if floaty and not exact:
                    bad.append((name, inner.strip()[:80]))
    assert not bad, (
        "ROUND over a SUM of float terms is summation-order-dependent — "
        f"quantize terms with floor(x*2^k+0.5) and sum exact integers: {bad}"
    )


def test_no_builtin_float_moment_aggs_anywhere():
    """Builtin float moment aggregates must not appear ANYWHERE in an
    oracle (aliased results smuggle the instability past the
    ROUND-position lints — the stats_ttest f.m/f.v pattern)."""
    strict = re.compile(
        r"\b(corr|covar_samp|covar_pop|stddev|stddev_samp|stddev_pop|"
        r"var_samp|var_pop|variance|skewness|kurtosis|"
        r"regr_slope|regr_intercept|regr_r2)\s*\(",
        re.I,
    )
    bad = []
    for name, q in REGISTRY.items():
        if q.oracle is None:
            continue
        m = strict.search(q.oracle)
        if m:
            bad.append((name, m.group(0)))
    assert not bad, (
        "builtin float moment aggregates are engine-unstable — use "
        f"operators/exact_moments.py: {bad}"
    )


def test_float_order_stats_only_in_allowlist():
    bad = []
    for name, q in REGISTRY.items():
        if q.oracle is None or name in _QUANTILE_ALLOWLIST:
            continue
        m = _FLOAT_ORDER_STATS.search(q.oracle)
        if m:
            bad.append((name, m.group(0)))
    assert not bad, (
        "mean/median/quantile over raw double columns — quantize to "
        f"cents first (see outliers_mad_user_value), or allowlist: {bad}"
    )
