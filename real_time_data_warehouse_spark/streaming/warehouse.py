"""The full layered warehouse as one streaming topology — the integration
of SURVEY.md §0's table: ODS (raw stream) → DWD (cleaned fact streams) →
DWS (windowed aggregates) → ADS (day-partitioned serving tables).

The reference decouples layers through Kafka topics between separate Flink
jobs; the lakehouse form decouples through storage: each layer's sink
directory is the next layer's streaming source. This runner wires the
layers in-process for the integration test; in production each stage is an
independent ``writeStream`` job reading the previous stage's table (file
or Delta source), restartable from its own checkpoint.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_data_warehouse_spark.streaming.pipelines import (
    EVENTS_RAW_SCHEMA,
    dws_windowed_agg,
    log_split,
    stream_events,
)


def run_warehouse(
    spark: SparkSession, ods_path: str, base_dir: str
) -> dict[str, str]:
    """Run ODS→DWD→DWS→ADS once over the available ODS files, each layer a
    real streaming query with its own checkpoint. Returns layer paths."""
    dwd_dir = os.path.join(base_dir, "dwd")
    dws_path = os.path.join(base_dir, "dws_traffic_window")
    paths = {"dwd": dwd_dir, "dws": dws_path}

    # --- DWD: split the ODS behavior-log stream 5 ways (DwdBaseLog) ------
    ods = stream_events(spark, ods_path)

    def split_sink(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            for side, df in log_split(batch).items():
                # epoch-overwrite: a retried batch replaces partial output
                df.write.mode("overwrite").parquet(
                    os.path.join(dwd_dir, side, f"batch_id={batch_id}")
                )
        finally:
            batch.unpersist()

    q1 = (
        ods.writeStream.foreachBatch(split_sink)
        .option("checkpointLocation", os.path.join(base_dir, "ckpt_dwd"))
        .trigger(availableNow=True)
        .start()
    )
    if not q1.awaitTermination(120):
        q1.stop()
        raise TimeoutError("DWD split query did not finish in 120 s")

    # --- DWS: windowed aggregate over the DWD page stream ----------------
    # (each DWD side dir is itself a valid streaming source — the Kafka-
    # topic-between-jobs pattern, storage-decoupled)
    page = (
        spark.readStream.schema(
            # DWD sides carry the normalized µs timestamp already; batch_id
            # is the per-epoch partition dir from the idempotent split sink
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string, batch_id int"
        )
        .parquet(os.path.join(dwd_dir, "page"))
    )
    agg = dws_windowed_agg(page)
    q2 = (
        agg.writeStream.format("parquet")
        .option("path", dws_path)
        .option("checkpointLocation", os.path.join(base_dir, "ckpt_dws"))
        .partitionBy("cur_date")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q2.awaitTermination(120):
        q2.stop()
        raise TimeoutError("DWS aggregate query did not finish in 120 s")
    return paths


def ads_daily_totals(spark: SparkSession, dws_path: str, date: str) -> DataFrame:
    """ADS query over the streamed DWS table: one day partition's totals."""
    dws = spark.read.parquet(dws_path)
    return (
        dws.where(F.col("cur_date") == date)
        .groupBy("cur_date")
        .agg(
            F.sum("order_amount").alias("amount"),
            F.sum("order_ct").cast("bigint").alias("events"),
        )
    )
