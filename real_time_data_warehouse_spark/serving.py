"""ADS serving layer over *materialized* day-partitioned DWS tables —
SURVEY.md §3.3.

The reference serves REST queries from Doris with explicit partition
selection (`partition par#{date}` — TradeStatsMapper.java:16-22). The
lakehouse form: DWS streaming/batch output written `partitionBy("cur_date")`
(streaming/sinks.write_serving_partitioned), served by `spark.sql` with a
`cur_date = :d` predicate — Catalyst turns that literal predicate into
PartitionFilters, so exactly one day directory is scanned, which is the
Doris partition clause verbatim. tests/test_serving.py asserts the
partition count from the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_data_warehouse_spark.functions.money import dec
from real_time_data_warehouse_spark.tables import Tables


def materialize_dws_trade_daily(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Build + persist the dws_trade daily serving table (A7's source),
    day-partitioned like the Doris par{date} tables."""
    t = Tables(spark, sf_dir)
    daily = (
        t.orders.groupBy(
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("cur_date")
        )
        .agg(
            F.sum(dec("o_totalprice")).cast("double").alias("order_amount"),
            F.count("*").alias("order_ct"),
        )
    )
    daily.write.mode("overwrite").partitionBy("cur_date").parquet(path)


def gmv_for_date(spark: SparkSession, serving_path: str, date: str) -> DataFrame:
    """`/gmv?date=` (TradeStatsController.java:25-37): one-day sum off the
    serving table; the date literal prunes to a single partition."""
    dws = spark.read.parquet(serving_path)
    return (
        dws.where(F.col("cur_date") == date)
        .groupBy("cur_date")
        .agg(F.sum("order_amount").alias("gmv"))
    )


def materialize_dws_province_daily(
    spark: SparkSession, sf_dir: str, path: str
) -> None:
    """dws_trade_province_order_window serving table (A8's source)."""
    t = Tables(spark, sf_dir)
    daily = (
        t.orders
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("cur_date"),
            F.col("n_name").alias("province_name"),
        )
        .agg(
            F.sum(dec("o_totalprice")).cast("double").alias("order_amount"),
            F.countDistinct("o_orderkey").alias("order_ct"),
        )
    )
    daily.write.mode("overwrite").partitionBy("cur_date").parquet(path)


def province_stats(spark: SparkSession, serving_path: str, date: str) -> DataFrame:
    """`/province?date=` (TradeStatsController.java:40-57): per-province
    amounts for one day partition."""
    dws = spark.read.parquet(serving_path)
    return (
        dws.where(F.col("cur_date") == date)
        .select("province_name", "order_amount", "order_ct")
    )


def channel_topk(
    spark: SparkSession, sf_dir: str, date: str, limit: int = 3
) -> DataFrame:
    """`/ch?date=&limit=` (TrafficStatsController.java:27-48): top-k
    channels by UV for one day (TakeOrderedAndProject, no global sort)."""
    t = Tables(spark, sf_dir)
    return (
        t.events.where(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd") == date
        )
        .groupBy(F.col("event_type").alias("ch"))
        .agg(F.countDistinct("user_id").alias("uv_ct"))
        .orderBy(F.col("uv_ct").desc(), F.col("ch"))
        .limit(limit)
    )
