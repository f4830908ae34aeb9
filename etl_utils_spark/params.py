"""Parameterized-SQL layer: ``:NAME`` value params, ``::NAME``
identifier params, and ``?`` prepared-statement placeholders.

Reference semantics (exasol/etl-utils): the wrapper stores a param dict
passed to every query; the host engine substitutes ``:X`` as a bound
value and ``::X`` as an identifier (query_wrapper.sql:40,97-98,195-209).
``prepare`` tokenizes the SQL and rewrites each ``?`` outside string
literals/comments to a named param (query_wrapper.sql:303-335).

Spark-native mapping:
- value params  → ``spark.sql(sql, args={...})`` native named-parameter
  binding (no string interpolation, injection-safe, plan-cacheable);
- identifier params → validated + backtick-quoted textual substitution
  (Spark's IDENTIFIER() clause does not accept multi-part names built
  from args in all positions, and the reference allows dotted names
  like ``etl.job_log``);
- ``?`` rewrite → a real tokenizer (not a regex): ``?`` inside string
  literals, quoted identifiers, or comments is preserved verbatim,
  mirroring the reference's use of sqlparsing.tokenize.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

_IDENT_PART = re.compile(r"^[A-Za-z_][A-Za-z0-9_$]*$")
_PARAM_REF = re.compile(r"(::?)([A-Za-z_][A-Za-z0-9_]*)")


class ParamError(ValueError):
    pass


def tokenize_sql(sql: str) -> Iterator[tuple[str, str]]:
    """Yield (kind, text) segments: kind ∈ {'code','string','ident',
    'backtick','line_comment','block_comment'}. Lossless: concatenating
    texts reproduces the input."""
    i, n = 0, len(sql)
    code_start = i
    while i < n:
        ch = sql[i]
        two = sql[i : i + 2]
        if ch == "'":
            if code_start < i:
                yield ("code", sql[code_start:i])
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":  # escaped ''
                        j += 2
                        continue
                    break
                j += 1
            j = min(j + 1, n)
            yield ("string", sql[i:j])
            i = code_start = j
        elif ch == '"':
            if code_start < i:
                yield ("code", sql[code_start:i])
            j = i + 1
            while j < n and sql[j] != '"':
                j += 1
            j = min(j + 1, n)
            yield ("ident", sql[i:j])
            i = code_start = j
        elif ch == "`":
            if code_start < i:
                yield ("code", sql[code_start:i])
            j = i + 1
            while j < n and sql[j] != "`":
                j += 1
            j = min(j + 1, n)
            yield ("backtick", sql[i:j])
            i = code_start = j
        elif two == "--":
            if code_start < i:
                yield ("code", sql[code_start:i])
            j = sql.find("\n", i)
            j = n if j < 0 else j + 1
            yield ("line_comment", sql[i:j])
            i = code_start = j
        elif two == "/*":
            if code_start < i:
                yield ("code", sql[code_start:i])
            j = sql.find("*/", i + 2)
            j = n if j < 0 else j + 2
            yield ("block_comment", sql[i:j])
            i = code_start = j
        else:
            i += 1
    if code_start < n:
        yield ("code", sql[code_start:n])


def quote_identifier(name: str) -> str:
    """Backtick-quote a (possibly dotted) identifier after validation —
    the engine-side analog of the reference README's quote() usage
    (README.md:43-44)."""
    parts = str(name).split(".")
    for p in parts:
        if not p or ("`" in p):
            raise ParamError(f"invalid identifier part {p!r} in {name!r}")
    return ".".join(f"`{p}`" for p in parts)


def _is_safe_plain_ident(name: str) -> bool:
    return all(_IDENT_PART.match(p) for p in str(name).split("."))


def substitute_sql(sql: str, params: dict[str, object]) -> tuple[str, dict[str, object]]:
    """Resolve ``::NAME`` identifier params textually (validated +
    quoted) and collect ``:NAME`` value params referenced by the
    statement into an args dict for ``spark.sql(..., args=...)``.

    Returns (rewritten_sql, args). Unknown value params raise (the
    reference's host engine would likewise fail the bind)."""
    out: list[str] = []
    args: dict[str, object] = {}
    for kind, text in tokenize_sql(sql):
        if kind != "code":
            out.append(text)
            continue

        def repl(m: re.Match) -> str:
            marker, name = m.group(1), m.group(2)
            if marker == "::":
                if name not in params:
                    raise ParamError(f"identifier param ::{name} not set")
                val = params[name]
                if _is_safe_plain_ident(val):
                    return quote_identifier(val)
                raise ParamError(f"identifier param ::{name}={val!r} is not a valid identifier")
            if name not in params:
                raise ParamError(f"value param :{name} not set")
            args[name] = params[name]
            return f":{name}"

        out.append(_PARAM_REF.sub(repl, text))
    return "".join(out), args


def rewrite_placeholders(sql: str, prefix: str = "PS_VAL_") -> tuple[str, int]:
    """Rewrite each ``?`` outside literals/comments to ``:PS_VAL_n``
    (1-based), returning (rewritten_sql, n_placeholders) — the
    reference's prepare() token rewrite (query_wrapper.sql:305-335)."""
    out: list[str] = []
    count = 0
    for kind, text in tokenize_sql(sql):
        if kind != "code":
            out.append(text)
            continue
        buf = []
        for ch in text:
            if ch == "?":
                count += 1
                buf.append(f":{prefix}{count}")
            else:
                buf.append(ch)
        out.append("".join(buf))
    return "".join(out), count
