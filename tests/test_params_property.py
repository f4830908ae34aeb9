"""Property-based tests (hypothesis) for the SQL tokenizer and param
substitution — SURVEY.md §5.5: round-trips and invariants that example
tests can't cover."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_utils_spark.params import rewrite_placeholders, substitute_sql, tokenize_sql

sql_fragments = st.text(
    alphabet=st.sampled_from(list("abcXYZ019 \n\t,.;()=<>*?:'\"`-/")), max_size=120
)


@given(sql_fragments)
@settings(max_examples=300, deadline=None)
def test_tokenizer_is_lossless(sql):
    assert "".join(t for _, t in tokenize_sql(sql)) == sql


@given(sql_fragments)
@settings(max_examples=300, deadline=None)
def test_placeholder_rewrite_preserves_non_code(sql):
    out, n = rewrite_placeholders(sql)
    # placeholders never survive in code segments; literals/comments
    # are byte-identical
    for kind, text in tokenize_sql(out):
        if kind == "code":
            assert "?" not in text
    assert n == sum(text.count("?") for k, text in tokenize_sql(sql) if k == "code")


@given(
    st.dictionaries(
        keys=st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,8}", fullmatch=True),
        values=st.one_of(st.integers(), st.text(max_size=10), st.none()),
        max_size=4,
    )
)
@settings(max_examples=200, deadline=None)
def test_value_substitution_collects_exactly_referenced(params):
    sql = " AND ".join(f"c = :{k}" for k in params) or "SELECT 1"
    out, args = substitute_sql(sql, params)
    assert set(args) == set(params)
    for k, v in params.items():
        assert args[k] == v
