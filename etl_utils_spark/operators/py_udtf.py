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
