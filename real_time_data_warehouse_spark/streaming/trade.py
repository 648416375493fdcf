"""Trade-side pipeline, streamed end-to-end (the reference's order flow:
DwdTradeOrderDetail → DwsTradeProvinceOrderWindow → TradeStatsController).

Layers decouple through storage, each its own streaming query:

- **ODS**: Maxwell CDC of `order_info` (raw JSON values).
- **DWD**: parse → ETL gate → first-wins dedup by order id (the ST1
  replacement for the reference's retract-dedup: CDC updates re-send the
  order; GMV must count it once) → broadcast dim enrichment
  (customer→nation = the province lookup) → epoch-partitioned parquet.
- **DWS**: daily (province, day) window aggregate in UPDATE mode,
  upserted into the serving table (the Doris stream-load analog).
- **ADS**: GMV/province queries over the serving table.

Dedup and windowed aggregation are separate queries on purpose: the layer
boundary keeps each query single-stateful-operator (no chained-stateful
restrictions) and independently restartable — the same reason the
reference splits apps across Kafka topics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_data_warehouse_spark.functions.money import dec
from real_time_data_warehouse_spark.session import tune
from real_time_data_warehouse_spark.sources.cdc import (
    maxwell_etl_filter,
    parse_maxwell,
)
from real_time_data_warehouse_spark.streaming.sinks import upsert_versioned


def stream_cdc_values(spark: SparkSession, path: str) -> DataFrame:
    """Streaming source over parquet files holding one `value` JSON string
    per row (the Kafka topic_db stand-in)."""
    tune(spark)
    return (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def dwd_trade_order(cdc_values: DataFrame, dim_user_province: DataFrame) -> DataFrame:
    """DWD transform: envelope parse → gate → order rows → first-wins
    dedup by order id → broadcast province enrichment."""
    cdc = maxwell_etl_filter(parse_maxwell(cdc_values))
    orders = cdc.where(F.col("table") == "order_info").select(
        F.col("data")["id"].cast("long").alias("order_id"),
        F.col("data")["user_id"].cast("long").alias("user_id"),
        F.col("data")["total_amount"].cast("double").alias("total_amount"),
        "et",
    )
    deduped = orders.dropDuplicates(["order_id"])
    return deduped.join(F.broadcast(dim_user_province), "user_id", "left")


def run_trade_pipeline(
    spark: SparkSession,
    ods_path: str,
    dim_user_province: DataFrame,
    base_dir: str,
) -> dict[str, str]:
    """Run ODS→DWD→DWS over the available CDC files; returns layer paths."""
    dwd_dir = os.path.join(base_dir, "dwd_trade_order")
    serving = os.path.join(base_dir, "dws_trade_province")
    paths = {"dwd": dwd_dir, "serving": serving}

    # DWD query (stateful op: dedup), epoch-partitioned idempotent sink
    dwd = dwd_trade_order(stream_cdc_values(spark, ods_path), dim_user_province)

    def dwd_sink(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("overwrite").parquet(
            os.path.join(dwd_dir, f"batch_id={batch_id}")
        )

    q1 = (
        dwd.writeStream.foreachBatch(dwd_sink)
        .option("checkpointLocation", os.path.join(base_dir, "ckpt_dwd"))
        .trigger(availableNow=True)
        .start()
    )
    if not q1.awaitTermination(180):
        q1.stop()
        raise TimeoutError("trade DWD query did not finish in 180 s")

    # DWS query (stateful op: windowed agg) in update mode → upsert serving
    dwd_stream = (
        spark.readStream.schema(
            "order_id bigint, user_id bigint, total_amount double, "
            "et timestamp, province_name string, batch_id int"
        )
        .parquet(dwd_dir)
        .withWatermark("et", "1 day")
    )
    agg = (
        dwd_stream.groupBy(
            F.window("et", "1 day"),
            F.col("province_name"),
        )
        .agg(
            F.sum(dec("total_amount")).cast("double").alias("order_amount"),
            F.count("*").alias("order_ct"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd").alias("cur_date"),
            "province_name",
            "order_amount",
            "order_ct",
        )
    )

    def dws_sink(batch: DataFrame, batch_id: int) -> None:
        upsert_versioned(spark, batch, batch_id, serving,
                         key_cols=["cur_date", "province_name"])

    q2 = (
        agg.writeStream.foreachBatch(dws_sink)
        .option("checkpointLocation", os.path.join(base_dir, "ckpt_dws"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    if not q2.awaitTermination(180):
        q2.stop()
        raise TimeoutError("trade DWS query did not finish in 180 s")
    return paths


def ads_gmv(spark: SparkSession, serving: str, date: str) -> DataFrame:
    """TradeStatsController./gmv analog over the streamed serving table."""
    return (
        spark.read.parquet(serving)
        .where(F.col("cur_date") == date)
        .groupBy("cur_date")
        .agg(
            F.sum("order_amount").alias("gmv"),
            F.sum("order_ct").cast("bigint").alias("order_ct"),
        )
    )
