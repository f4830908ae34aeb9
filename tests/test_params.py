"""Tokenizer + param substitution semantics (reference
query_wrapper.sql:195-209,303-335)."""

from __future__ import annotations

import pytest

from etl_utils_spark.params import (
    ParamError,
    quote_identifier,
    rewrite_placeholders,
    substitute_sql,
    tokenize_sql,
)


def test_tokenize_roundtrip():
    sql = "SELECT 'a''b' /* c? */ , \"q?\" -- tail?\nFROM `t?` WHERE x = ?"
    assert "".join(t for _, t in tokenize_sql(sql)) == sql


def test_placeholder_rewrite_skips_literals_and_comments():
    sql = "INSERT INTO t VALUES (?, '?', ?) -- trailing ?\n/* block ? */"
    out, n = rewrite_placeholders(sql)
    assert n == 2
    assert out.count(":PS_VAL_1") == 1 and out.count(":PS_VAL_2") == 1
    assert "'?'" in out and "-- trailing ?" in out and "/* block ? */" in out


def test_value_param_collection():
    sql, args = substitute_sql("SELECT * FROM t WHERE a = :A AND b = ':B'", {"A": 7, "B": 9})
    assert args == {"A": 7}
    assert "':B'" in sql


def test_identifier_param_quoted():
    sql, args = substitute_sql("SELECT COUNT(*) FROM ::T", {"T": "etl.job_log"})
    assert sql == "SELECT COUNT(*) FROM `etl`.`job_log`"
    assert args == {}


def test_identifier_param_rejects_injection():
    with pytest.raises(ParamError):
        substitute_sql("SELECT * FROM ::T", {"T": "x; DROP TABLE y"})


def test_missing_params_raise():
    with pytest.raises(ParamError):
        substitute_sql("SELECT :nope", {})
    with pytest.raises(ParamError):
        substitute_sql("SELECT * FROM ::nope", {})


def test_quote_identifier():
    assert quote_identifier("a.b") == "`a`.`b`"
    with pytest.raises(ParamError):
        quote_identifier("bad`tick")
