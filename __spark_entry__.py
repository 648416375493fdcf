"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ``real_time_data_warehouse_spark.registry`` — every operator
module registers (spark_fn, oracle_sql) pairs there; see SURVEY.md §2 for
the inventory each name maps to.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from real_time_data_warehouse_spark.registry import oracle_map, query_map


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return query_map()["q0_flagship_trade_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return oracle_map()
