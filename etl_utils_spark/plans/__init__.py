from etl_utils_spark.plans.inspect import (
    formatted_plan,
    has_broadcast_join,
    has_cartesian_or_bnl,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_spans,
)

__all__ = [
    "formatted_plan",
    "has_broadcast_join",
    "has_cartesian_or_bnl",
    "pushed_filters",
    "read_schema_columns",
    "wholestage_codegen_spans",
]
