"""Physical-plan introspection (SURVEY.md §4; the 100 TB design contract).

Every operator family documents a plan shape it *must* produce — dim joins
broadcast, scans pruned and filter-pushed, top-k as TakeOrderedAndProject,
aggregates partial-then-final. These helpers parse ``explain('formatted')``
so tests/plan audits can assert the shape instead of eyeballing it.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin", formatted_plan(df)))


def sort_merge_join_count(df: DataFrame) -> int:
    return len(re.findall(r"SortMergeJoin", formatted_plan(df)))


def shuffle_count(df: DataFrame) -> int:
    return len(re.findall(r"Exchange hashpartitioning|Exchange rangepartitioning",
                          formatted_plan(df)))


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the scans in the plan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def read_schema(df: DataFrame) -> list[str]:
    """ReadSchema entries (one per scan) — column-pruning witness."""
    return re.findall(r"ReadSchema: ([^\n]*)", formatted_plan(df))


def codegen_stage_count(df: DataFrame) -> int:
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", formatted_plan(df))))
