"""Python UDTF surface (SURVEY.md §2 C7c, Spark 3.5+/4 table
functions): a row → many-rows generator usable in FROM/LATERAL
position. The tokenizer UDTF is the canonical example — but note the
engine's own token pipelines use built-in split/explode (JVM-side);
the UDTF exists for logic that genuinely needs Python per row.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos: int, token: string")
class TokenizeUDTF:
    """Emit (position, token) rows for a text value."""

    def eval(self, text: str):  # noqa: D102
        for i, tok in enumerate((text or "").split(" ")):
            if tok:
                yield i, tok


def register_udtfs(spark) -> None:
    spark.udtf.register("tokenize_udtf", TokenizeUDTF)


class SplitColsUDTF:
    """Polymorphic UDTF (Spark 4 static ``analyze``): splits a
    delimited string into N typed columns where N comes from a LITERAL
    argument — the output schema is computed at ANALYSIS time, the
    table-function equivalent of a generic wide-split.  The reference
    has no UDTF surface at all (all Lua-side iteration,
    query_wrapper.sql:363-373); this pins Spark's dynamic-schema
    corner of C7c."""

    @staticmethod
    def analyze(text, delim, n):
        from pyspark.sql.types import StringType, StructField, StructType
        from pyspark.sql.udtf import AnalyzeResult

        if not n.isConstantExpression:
            raise Exception("n must be a literal")
        return AnalyzeResult(
            schema=StructType(
                [StructField(f"c{i}", StringType()) for i in range(int(n.value))]
            )
        )

    def eval(self, text, delim, n):
        parts = (text or "").split(delim or "-")
        yield tuple(
            parts[i] if i < len(parts) else None for i in range(int(n))
        )


def register_polymorphic_udtfs(spark) -> None:
    from pyspark.sql.functions import udtf

    spark.udtf.register("split_cols_udtf", udtf(SplitColsUDTF))
