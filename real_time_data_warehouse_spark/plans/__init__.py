"""Plan auditing: the physical-plan properties we design for (broadcasts,
pushdown, codegen, top-k) asserted programmatically."""

from real_time_data_warehouse_spark.plans.audit import (  # noqa: F401
    broadcast_join_count,
    formatted_plan,
    has_take_ordered,
    pushed_filters,
    read_schema,
    shuffle_count,
    sort_merge_join_count,
)
