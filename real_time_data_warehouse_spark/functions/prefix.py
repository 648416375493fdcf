"""Distributed two-phase prefix sums.

The naive global running total — ``SUM(x) OVER (ORDER BY k ROWS
UNBOUNDED PRECEDING)`` — funnels the whole table through ONE sorted
partition. This helper is the classic fix, shared by a18 (running
ledger) and t14 (vocabulary growth): bucket the rows on a
range-monotone key, compute LOCAL prefixes under a bucket-partitioned
window (parallel), run the only unpartitioned window over the
B-row bucket-totals frame, and broadcast the exclusive offsets back.

Exactness contract: measures must be EXACT, ASSOCIATIVE types (bigint
counts, DECIMAL amounts, never raw doubles) so local-prefix + offset
equals a single-threaded running sum bit-for-bit under any
partitioning — the same mergeable-partials discipline as the
streaming appliers.

At 100 TB: bucket count scales with cluster width; if per-bucket rows
overflow one node the construction nests (apply it again inside each
bucket) — a depth-2 scan tree, never a global sort. The plan shape is
pinned by tests/test_plans.py::test_a18_prefix_sum_is_two_phase.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from real_time_data_warehouse_spark.functions.windows import (
    bounded_part_col,
    with_bounded_part,
)


def bucketed_prefix(
    df: DataFrame,
    bucket: Column,
    order_cols: list[str],
    measures: dict[str, tuple[Column, Column]],
    n_buckets: int | None = None,
) -> DataFrame:
    """Append inclusive running totals over ``order_cols`` order.

    ``bucket`` must be monotone in ``order_cols`` order (a range
    bucketing of the leading order key). ``measures`` maps output
    column name → (aggregand, typed zero literal); the aggregand must
    be an exact/associative type. Returns ``df``'s rows (plus the
    ``__bucket`` column dropped) with one ``cum_<name>`` per measure.

    Pass ``n_buckets`` when the bucket expression has a static bucket
    count: it stamps a semantic no-op ``limit(n_buckets)`` on the
    totals frame (which has exactly ≤ n_buckets rows), making the "the
    only global window here runs over a bounded frame" claim a
    STRUCTURAL plan property — the registry-wide partition-less-window
    lint (tests/test_plan_lint.py) checks for that Limit instead of
    trusting a comment.

    HARD CALLER CONTRACT: ``n_buckets`` must be ≥ the bucket
    expression's true distinct count — clamp the expression (``F.least
    (…, lit(n_buckets - 1))``, the a18/c15 pattern) or derive the
    width from the key's max (t14). An understated value would make
    ``limit`` drop bucket totals; that CANNOT corrupt results silently:
    the offsets join below is a null-checked left join, and any local
    row whose bucket total was dropped fails the whole job with the
    contract message (``F.assert_true`` — JVM-side, zero extra jobs;
    pinned by tests/test_properties.py).
    """
    # one materialization serves both phases — the local-prefix window
    # and the totals aggregation each read the (possibly expensive)
    # upstream subtree, and Catalyst plans no reuse between branches
    b = df.withColumn("__bucket", bucket).localCheckpoint(eager=True)
    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = b.select(
        "*",
        *[
            F.sum(expr).over(w_in).alias(f"__loc_{name}")
            for name, (expr, _zero) in measures.items()
        ],
    )
    totals = b.groupBy("__bucket").agg(
        *[
            F.sum(expr).alias(f"__t_{name}")
            for name, (expr, _zero) in measures.items()
        ]
    )
    if n_buckets is not None:
        totals = totals.limit(n_buckets)  # no-op bound witness (≤ B rows)
    # GLOBAL ordering ON PURPOSE, over the ≤B-row totals frame (the
    # n_buckets Limit above is the structural bound, checked by the
    # registry-wide lint). The spec partitions by with_bounded_part's
    # non-foldable constant — one partition, identical execution, but
    # WindowExec stays quiet (functions/windows.py); the lint still
    # treats the reserved column as a GLOBAL spec and requires the
    # maxRows() bound.
    totals = with_bounded_part(totals, "__bucket")
    w_off = (
        Window.partitionBy(bounded_part_col())
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.select(
        "__bucket",
        *[
            F.coalesce(F.sum(f"__t_{name}").over(w_off), zero).alias(
                f"__off_{name}"
            )
            for name, (_expr, zero) in measures.items()
        ],
    )
    # LEFT join + assert_true: if the caller understated n_buckets the
    # limit dropped ≥1 bucket total, so ≥1 local row finds no offset —
    # that must kill the job with the contract message, never silently
    # drop rows (inner join) or under-count (missing middle offsets).
    out = local.join(F.broadcast(offs), "__bucket", "left")
    guard_col = f"__off_{next(iter(measures))}"
    guard = F.assert_true(
        F.col(guard_col).isNotNull(),
        F.lit(
            "bucketed_prefix: n_buckets understated — a bucket total "
            "was dropped by limit(n_buckets); fix the caller's bucket "
            "expression bound (see the HARD CALLER CONTRACT)"
        ),
    )
    for name in measures:
        out = out.withColumn(
            f"cum_{name}",
            F.when(guard.isNull(), F.col(f"__loc_{name}") + F.col(f"__off_{name}")),
        )
    drop = ["__bucket"] + [
        c
        for name in measures
        for c in (f"__loc_{name}", f"__off_{name}")
    ]
    return out.drop(*drop)
