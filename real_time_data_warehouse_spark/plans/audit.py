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


def _effective_plan(plan: str) -> str:
    """After a query has executed, AQE's explain shows '== Final Plan =='
    followed by '== Initial Plan ==' — counting both double-counts every
    node. Keep only the effective (final) section."""
    marker = "== Initial Plan =="
    return plan.split(marker, 1)[0] if marker in plan else plan


def _node_ids(df: DataFrame, node: str) -> set[str]:
    """Distinct plan-node ids for *node* in the effective plan. Handles
    both explain layouts: tree style ``Node (id)`` (finalized AQE tree)
    and detail style ``(id) Node`` (node detail sections); the id set
    dedupes nodes appearing in both."""
    plan = _effective_plan(formatted_plan(df))
    ids = set(re.findall(rf"\((\d+)\) {node}\b", plan))
    # tree style may carry qualifiers between name and id, e.g.
    # "BroadcastHashJoin Inner BuildRight (12)"
    ids |= set(re.findall(rf"\b{node}[^\n()]* \((\d+)\)", plan))
    return ids


def broadcast_join_count(df: DataFrame) -> int:
    return len(_node_ids(df, "BroadcastHashJoin"))


def sort_merge_join_count(df: DataFrame) -> int:
    return len(_node_ids(df, "SortMergeJoin"))


def shuffle_count(df: DataFrame) -> int:
    """Distinct shuffle exchanges in the effective plan. BroadcastExchange
    is excluded (that's the cheap dim replication, not a shuffle)."""
    return len(_node_ids(df, "Exchange"))


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the scans in the plan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def read_schema(df: DataFrame) -> list[str]:
    """ReadSchema entries (one per scan) — column-pruning witness."""
    return re.findall(r"ReadSchema: ([^\n]*)", formatted_plan(df))


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans. The formatted explain annotates
    nodes with ``[codegen id : N]`` (the tree form ``WholeStageCodegen (N)``
    only appears in simple-mode explains — matched too for robustness)."""
    plan = _effective_plan(formatted_plan(df))
    ids = set(re.findall(r"codegen id : (\d+)", plan))
    ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(ids)


def unbounded_global_windows(df: DataFrame) -> list[str]:
    """Partition-less Window nodes whose input subtree carries NO limit —
    the shape that serializes the WHOLE dataset through one task at
    scale. A global window over a top-K frame (≤K rows by a Limit below
    it) is fine and deliberate (s13's fusion ranks, t13's Zipf lattice);
    a global window over an unlimited input is a 100 TB scale bug even
    when the test-scale answer is correct. Walks the optimized LOGICAL
    plan via py4j (node names + partitionSpec arity), not string
    parsing, so it can't be fooled by formatting."""

    def bounded(node) -> bool:
        """Is this subtree's row count statically bounded? Catalyst
        already computes exactly this as ``maxRows`` (defined for
        Limits, literal Ranges/LocalRelations, and propagated through
        joins as n·m, unions as Σ, and shrinking unaries; None for
        table scans and row-expanding Generates) — so ask the plan
        instead of re-deriving it. This is strict by construction: a
        Limit on the small side of a join cannot exonerate a window
        over the unbounded side, because the join's maxRows is None
        unless BOTH sides are bounded."""
        return node.maxRows().isDefined()

    offenders: list[str] = []

    def is_global(node) -> bool:
        # a partition spec that is all-foldable (partitionBy(lit(1)) —
        # though FoldablePropagation usually folds that away entirely)
        # OR built from functions/windows.with_bounded_part's reserved
        # constant column is still ONE partition — treat it as global
        # so neither idiom can hide an unbounded window from this lint
        from real_time_data_warehouse_spark.functions.windows import (
            BOUNDED_PART,
        )

        def one_partition(e) -> bool:
            return e.foldable() or BOUNDED_PART in e.sql()

        spec = node.partitionSpec()
        return all(one_partition(spec.apply(i)) for i in range(spec.size()))

    def walk(node) -> None:
        if (
            node.nodeName() == "Window"
            and is_global(node)
            and not bounded(node)
        ):
            offenders.append(node.simpleString(100))
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return offenders


def assert_no_cartesian(df: DataFrame, what: str) -> None:
    """One-shot guard for frames built inside streaming appliers, which
    the registry-wide plan lint skips for suite economy: fail loud if
    the per-batch plan degraded to a true CartesianProduct (broadcast
    nested-loop against 1-row bounds frames remains fine)."""
    if "CartesianProduct" in formatted_plan(df):
        raise AssertionError(f"{what}: per-batch plan has CartesianProduct")
