"""Layered-warehouse integration: ODS→DWD→DWS→ADS, every hop a streaming
query with its own checkpoint, final numbers checked against a batch
recomputation from the raw events."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from real_time_data_warehouse_spark.streaming.warehouse import (
    ads_daily_totals,
    run_warehouse,
)
from real_time_data_warehouse_spark.tables import Tables
from tests.conftest import SF_DIR


def test_layered_warehouse_end_to_end(spark, tmp_path):
    import os
    import shutil

    # ODS source dir (two time-ordered files = two micro-batches)
    src = str(tmp_path / "ods")
    os.makedirs(src)
    ev = Tables(spark, SF_DIR).events
    cut = ev.agg(F.expr("percentile_approx(cast(ts as double), 0.5)")).first()[0]
    for i, part in enumerate(
        [ev.where(F.col("ts").cast("double") <= cut),
         ev.where(F.col("ts").cast("double") > cut)]
    ):
        out = part.withColumn(
            "ts", F.unix_micros("ts") * F.lit(1000).cast("bigint")
        ).select("event_id", "ts", "user_id", "event_type", "value", "props")
        stage = str(tmp_path / f"stage{i}")
        out.coalesce(1).write.mode("overwrite").parquet(stage)
        pf = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        shutil.move(os.path.join(stage, pf), os.path.join(src, f"b{i}.parquet"))

    paths = run_warehouse(spark, src, str(tmp_path / "wh"))

    # DWD layer: split landed correctly
    page = spark.read.parquet(os.path.join(paths["dwd"], "page"))
    assert page.count() == ev.where(F.col("event_type") == "purchase").count()

    # ADS over the streamed DWS table vs batch recomputation from raw ODS.
    # Streaming append only emits windows closed by the final watermark, so
    # compare on a day fully below it.
    purchases = ev.where(F.col("event_type") == "purchase")
    max_ts = ev.agg(F.max("ts")).first()[0]
    probe_day = "2024-01-10"
    assert datetime.datetime.strptime(probe_day, "%Y-%m-%d") < (
        max_ts - datetime.timedelta(days=1)
    )
    got = ads_daily_totals(spark, paths["dws"], probe_day).first()
    exp = (
        purchases.where(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd") == probe_day
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("amount"),
            F.count("*").alias("events"),
        )
        .first()
    )
    assert got["events"] == exp["events"]
    assert abs(got["amount"] - exp["amount"]) < 1e-9
