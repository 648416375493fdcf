"""Trade pipeline integration: CDC (inserts + updates) → DWD dedup/enrich →
DWS province windows (update mode) → ADS GMV, checked against batch
recomputation from the orders fixture."""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import functions as F

from real_time_data_warehouse_spark.functions.money import dec
from real_time_data_warehouse_spark.sources.cdc import synthetic_cdc_json
from real_time_data_warehouse_spark.streaming.trade import (
    ads_gmv,
    run_trade_pipeline,
)
from real_time_data_warehouse_spark.tables import Tables
from tests.conftest import SF_DIR


def test_trade_pipeline_end_to_end(spark, tmp_path):
    t = Tables(spark, SF_DIR)
    # ODS: the synthetic Maxwell stream (insert per order + update for F
    # orders — the updates are the dedup challenge), split into 2 files
    raw = synthetic_cdc_json(t.orders)
    src = str(tmp_path / "ods")
    os.makedirs(src)
    # deterministic split (limit()+subtract() re-evaluates and can drop or
    # duplicate rows across evaluations): hash parity of the payload
    half = raw.where(F.crc32("value") % 2 == 0)
    rest = raw.where(F.crc32("value") % 2 != 0)
    from tests.conftest import write_stream_file

    for i, part in enumerate([half, rest]):
        write_stream_file(part, src, f"b{i}")

    dim = (
        t.customer.join(F.broadcast(t.nation), t.customer.c_nationkey == t.nation.n_nationkey)
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("n_name").alias("province_name"),
        )
    )
    paths = run_trade_pipeline(spark, src, dim, str(tmp_path / "wh"))

    # DWD: exactly one row per order (updates deduped), all enriched
    dwd = spark.read.parquet(paths["dwd"])
    assert dwd.count() == t.orders.count()
    assert dwd.where(F.col("province_name").isNull()).count() == 0

    # DWS/ADS: serving equals batch recomputation. Probe the busiest day
    # actually present (at sf0.001 most individual days have no orders).
    probe_day = (
        t.orders.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"))
        .count()
        .orderBy(F.desc("count"), "d")
        .first()["d"]
    )
    got = ads_gmv(spark, paths["serving"], probe_day).first()
    exp = (
        t.orders.where(F.date_format("o_orderdate", "yyyy-MM-dd") == probe_day)
        .agg(
            F.sum(dec("o_totalprice")).cast("double").alias("gmv"),
            F.count("*").alias("order_ct"),
        )
        .first()
    )
    assert got is not None
    assert got["order_ct"] == exp["order_ct"]
    assert abs(got["gmv"] - exp["gmv"]) < 1e-6

    # serving is keyed: one row per (day, province)
    serving = spark.read.parquet(paths["serving"])
    assert serving.count() == serving.select("cur_date", "province_name").distinct().count()
