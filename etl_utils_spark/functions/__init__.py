"""Shared column-expression helpers — the engine's function library.

Re-exports the building blocks the operator modules define so user
code has one import point:

    from etl_utils_spark.functions import cosine, dvec, money, quote_identifier
"""

from pyspark.sql import Column
from pyspark.sql import functions as F

from etl_utils_spark.operators.dedup import cosine, dot, dvec
from etl_utils_spark.params import quote_identifier

__all__ = ["cosine", "dot", "dvec", "money", "quote_identifier", "decimal_sum"]


def money(col: str | Column, scale: int = 2) -> Column:
    """Cast a 2-decimal double column to exact decimal — the engine's
    convention for order-independent money arithmetic."""
    return F.col(col).cast(f"decimal(18,{scale})") if isinstance(col, str) else col.cast(
        f"decimal(18,{scale})"
    )


def decimal_sum(col: str | Column, scale: int = 2) -> Column:
    """SUM(money(col)) cast back to double: exact under any partitioning."""
    return F.sum(money(col, scale)).cast("double")
