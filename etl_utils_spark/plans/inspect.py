"""Physical-plan introspection: the engine's scale guardrails.

At 100 TB the difference between a right and a wrong plan is the
difference between minutes and days. These helpers read the formatted
explain output so TESTS can pin plan properties: filters pushed to the
parquet scan, projections pruned into ReadSchema, bounded dims
broadcast, top-k compiled to TakeOrderedAndProject, no accidental
cartesian products, wide whole-stage-codegen spans.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read from each parquet scan (pruning)."""
    plan = formatted_plan(df)
    res = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        res.append(cols)
    return res


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_cartesian_or_bnl(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def wholestage_codegen_spans(df: DataFrame) -> int:
    return len(re.findall(r"WholeStageCodegen", formatted_plan(df)))
