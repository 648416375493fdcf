"""DIM-layer pipeline (DimApp analog — realtime-dim/.../DimApp.java).

Topology (DimApp.java:126-146): Kafka ODS → ETL filter → broadcast config
join (route + prune columns) → HBase sink. Spark-first: CDC batch/stream →
``maxwell_etl_filter`` → broadcast join against the config table →
``map_filter`` column pruning → ``upsert_dim`` per routed sink table.

The config table (TableProcessDim: source_table, sink_table, sink_columns,
sink_row_key, op) is re-read per micro-batch — the reference's broadcast-
state race (data before config, TableProcessFunction.java:33-43 preload
workaround) cannot happen because each batch sees a complete snapshot.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_data_warehouse_spark.sources.cdc import (
    maxwell_etl_filter,
    parse_maxwell,
)
from real_time_data_warehouse_spark.streaming.sinks import upsert_dim

DIM_CONFIG_COLUMNS = ["source_table", "sink_table", "sink_columns", "sink_row_key", "op"]


def default_dim_config(spark: SparkSession) -> DataFrame:
    """The gmall2024_config.table_process_dim analog for the fixture CDC
    stream (orders → dim_order_info)."""
    return spark.createDataFrame(
        [("order_info", "dim_order_info", "id,user_id,order_status", "id", "c")],
        DIM_CONFIG_COLUMNS,
    )


def route_and_prune(cdc: DataFrame, config: DataFrame) -> DataFrame:
    """J7 + P7: broadcast config join on source table, then keep only the
    configured sink_columns keys of the `data` map
    (TableProcessFunction.java:47-105)."""
    routed = cdc.join(
        F.broadcast(config), cdc["table"] == config["source_table"], "inner"
    )
    keep = F.split(F.col("sink_columns"), ",")
    pruned = routed.withColumn(
        "data", F.map_filter(F.col("data"), lambda k, v: F.array_contains(keep, k))
    )
    seq = ["__seq"] if "__seq" in pruned.columns else []
    return pruned.select(
        "sink_table", "sink_row_key", "type", "ts", "et", "data", *seq
    )


def dim_rows(routed: DataFrame) -> DataFrame:
    """Flatten the pruned map into dim-table columns (string-typed wide
    row, the HBase column-family shape — HBaseUtil.putRow analog)."""
    seq = ["__seq"] if "__seq" in routed.columns else []
    return routed.select(
        "sink_table",
        F.element_at("data", F.col("sink_row_key")).alias("row_key"),
        "type",
        "ts",
        "data",
        *seq,
    )


def run_dim_batch(
    spark: SparkSession,
    raw_values: DataFrame,
    config: DataFrame,
    base_dir: str,
    database: str = "gmall2024",
) -> list[str]:
    """One DIM micro-batch end-to-end (callable from foreachBatch or as a
    plain batch job): returns the sink tables written."""
    cdc = maxwell_etl_filter(parse_maxwell(raw_values), database)
    routed = dim_rows(route_and_prune(cdc, config))
    # one parse/join pass shared by every sink table (the foreachBatch
    # persist pattern — without it each table re-parses the whole batch)
    routed.persist()
    try:
        sinks: list[str] = []
        for row in config.select("sink_table").distinct().collect():
            table = row["sink_table"]
            seq = ["__seq"] if "__seq" in routed.columns else []
            part = routed.where(F.col("sink_table") == table).select(
                "row_key", "type", "ts", "data", *seq
            )
            upsert_dim(
                spark,
                part,
                os.path.join(base_dir, table),
                key_cols=["row_key"],
                order_col="ts",
                type_col="type",
                seq_col="__seq",
            )
            sinks.append(table)
    finally:
        routed.unpersist()
    return sinks
