"""Plan inspection helpers — the engine's "did Catalyst do what we designed
for" feedback loop. The reference has no optimizer (SURVEY.md §4); here the
optimizer is Catalyst and these helpers make its decisions testable:
tests assert broadcast joins for small frontiers, pushed filters for point
lookups, and codegen coverage for the scalar pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def pushed_filters(df: DataFrame) -> str:
    """Return the PushedFilters lines of the formatted plan (empty string if
    nothing was pushed to the scan)."""
    plan = explain_str(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "PushedFilters" in line)


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    return fragment in pushed_filters(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    plan = explain_str(df, "codegen")
    # header: "Found N WholeStageCodegen subtrees."
    for line in plan.splitlines():
        if "WholeStageCodegen subtrees" in line:
            return int(line.split()[1])
    return 0
