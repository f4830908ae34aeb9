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


# ---------------------------------------------------- alias shadowing
# Spark's lateral-column-alias implicit resolution (default ON) makes a
# higher-order-function lambda's F.col("x") bind to a SIBLING alias
# named x in the same select, not the input column — plain refs bind to
# the input.  The r8 10x sweep caught embedding_quantize_int8 dividing
# by its sibling round(scale, 9) through exactly this.  The queries
# must be correct under the DRIVER'S bare session (default conf), so
# the fix is never a conf change: rename the intermediate instead.

def _mask_delims_in_strings(src):
    """Replace ()[]{}, inside string literals and # comments with '_'.

    The paren/comma scanners below track nesting depth textually; a
    select argument containing a delimiter inside a string (e.g.
    ``F.lit("a(b")``, a regex pattern, a concat_ws separator) would
    corrupt the depth and silently truncate or merge scanned blocks.
    Masking only the delimiter characters keeps offsets, line numbers
    and every ``\\w`` token (alias / column names) intact for the
    regexes that run on the blocks afterwards.
    """
    out = list(src)
    i, n = 0, len(src)
    delims = set("()[]{},")
    while i < n:
        ch = src[i]
        if ch in "\"'":
            q = src[i : i + 3] if src[i : i + 3] in ('"""', "'''") else ch
            i += len(q)
            while i < n:
                if src[i] == "\\":
                    # mask an escaped delimiter too (regex literals like
                    # r"\(" carry the delimiter in the NEXT char)
                    if i + 1 < n and src[i + 1] in delims:
                        out[i + 1] = "_"
                    i += 2
                    continue
                if src[i : i + len(q)] == q:
                    i += len(q)
                    break
                if src[i] in delims:
                    out[i] = "_"
                i += 1
        elif ch == "#":
            while i < n and src[i] != "\n":
                if src[i] in delims:
                    out[i] = "_"
                i += 1
        else:
            i += 1
    return "".join(out)


def _select_blocks(src):
    import re

    src = _mask_delims_in_strings(src)
    for m in re.finditer(r"\.select\(", src):
        start = m.end()
        depth, i = 1, start
        while i < len(src) and depth:
            if src[i] == "(":
                depth += 1
            elif src[i] == ")":
                depth -= 1
            i += 1
        yield src[:m.start()].count("\n") + 1, src[start : i - 1]


def _split_args(block):
    args, depth, cur = [], 0, ""
    for ch in block:
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if ch == "," and depth == 0:
            args.append(cur)
            cur = ""
        else:
            cur += ch
    if cur.strip():
        args.append(cur)
    return args


def _scan_shadowed_aliases(src, fname="<src>"):
    """All lambda-refs-a-sibling-alias violations in one source text."""
    import re

    hof = re.compile(
        r"F\.(transform|filter|aggregate|zip_with|exists|forall|reduce)\("
    )
    bad = []
    for line, block in _select_blocks(src):
        args = _split_args(block)
        alias_of = {}
        for ai, a in enumerate(args):
            for al in re.findall(r'\.alias\("(\w+)"\)', a):
                alias_of.setdefault(al, ai)
        for aj, a in enumerate(args):
            if not hof.search(a):
                continue
            for ref in set(re.findall(r'F\.col\("(\w+)"\)', a)):
                ai = alias_of.get(ref)
                if ai is not None and ai != aj:
                    bad.append(f"{fname}:{line}: lambda F.col({ref!r}) "
                               f"shadowed by sibling alias")
    return bad


def test_scanner_survives_string_delimiters():
    """A delimiter-bearing string literal inside the select must not
    corrupt the depth scan: the shadowed alias AFTER it is still caught
    (VERDICT r9 item 6's fixture), and the string's contents never
    create phantom args."""
    fixture = (
        'df.select(\n'
        '    F.lit("a(b,c").alias("scale"),\n'
        '    F.transform(F.col("xs"), lambda x: x / F.col("scale")).alias("out"),\n'
        ')\n'
    )
    bad = _scan_shadowed_aliases(fixture)
    assert len(bad) == 1 and "scale" in bad[0], bad
    # and the masked split still sees exactly two arguments
    blocks = list(_select_blocks(fixture))
    assert len(blocks) == 1
    assert len(_split_args(blocks[0][1])) == 2


def test_no_lambda_ref_to_sibling_alias():
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1] / "etl_utils_spark"
    bad = []
    for p in sorted(root.rglob("*.py")):
        bad.extend(_scan_shadowed_aliases(p.read_text(), p.name))
    assert not bad, (
        "lambda references a column name that a SIBLING select alias "
        "shadows — under lateral-column-alias resolution the lambda "
        f"binds to the sibling, not the input; rename it: {bad}"
    )


def test_lateral_alias_binds_lambda_to_sibling(spark):
    """Pin the Spark behavior the lint guards against: if an engine
    upgrade changes this default, the lint's premise must be re-checked."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(10.0, [1.0])], ["scale", "xs"])
    out = df.select(
        (F.col("scale") * 2).alias("scale"),
        F.transform("xs", lambda x: x / F.col("scale")).alias("q"),
    ).collect()[0]
    assert out["q"] == [0.05], (
        "lateral-column-alias lambda binding changed — re-evaluate "
        f"test_no_lambda_ref_to_sibling_alias: got {out['q']}"
    )
