"""Streaming joins: interval join (stream-stream) and lookup join
(stream-static) must match their batch twins on the watermark-closed
region."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from real_time_data_warehouse_spark.streaming.joins import (
    interval_join_purchases,
    lookup_join_dim,
)
from real_time_data_warehouse_spark.streaming.pipelines import stream_events
from real_time_data_warehouse_spark.tables import Tables, load
from tests.conftest import SF_DIR
from tests.test_streaming import events_dir  # noqa: F401 (fixture reuse)


def test_interval_join_stream_matches_batch(spark, tmp_path, events_dir):  # noqa: F811
    stream = interval_join_purchases(stream_events(spark, events_dir))
    sink, ckpt = str(tmp_path / "ij"), str(tmp_path / "ckpt_ij")
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["pay_id"], r["prior_id"])
        for r in spark.read.parquet(sink).collect()
    }

    ev = Tables(spark, SF_DIR).events
    batch = interval_join_purchases(ev)
    # Streaming inner join emits pairs as both sides arrive; with
    # availableNow everything except pairs held past the final watermark is
    # out. Compare on the region closed by the final watermark.
    max_ts = ev.agg(F.max("ts")).first()[0]
    import datetime

    horizon = max_ts - datetime.timedelta(seconds=10)
    expected = {
        (r["pay_id"], r["prior_id"])
        for r in batch.where(
            (F.col("pay_ts") < F.lit(horizon)) & (F.col("ts") < F.lit(horizon))
        ).collect()
    }
    assert expected <= got, f"missing {len(expected - got)} closed pairs"
    # everything emitted must be a true batch pair (no spurious joins)
    all_pairs = {(r["pay_id"], r["prior_id"]) for r in batch.collect()}
    assert got <= all_pairs


def test_interval_join_exact_microsecond_boundaries(spark, tmp_path):
    """Adversarial µs-edge fixture for the `ts div 1000` fix (nanos >
    2^53): pay_ns = 1700000000000000896 float-divides one µs HIGH
    (int(float(ns)/1000) = …001 vs exact …000), so double math would shift
    the [pay_ts−30min, pay_ts) boundaries and misclassify all four edge
    priors. Asserts the exact-integer contract: the boundary prior (==
    pay_ts−30min) and the adjacent prior (== pay_ts−1µs) join; the ones
    1 µs outside do not; and every emitted timestamp equals ns // 1000."""
    import shutil
    import time as _time

    from real_time_data_warehouse_spark.streaming.pipelines import stream_events

    PAY_NS = 1_700_000_000_000_000_896  # float-div rounds UP a microsecond
    assert int(float(PAY_NS) / 1000.0) != PAY_NS // 1000  # stays adversarial
    PAY_US = PAY_NS // 1000
    LOOKBACK_US = 30 * 60 * 1_000_000
    REM = 896  # give every prior the same adversarial ns remainder

    def ns(us: int) -> int:
        return us * 1000 + REM

    rows = [
        # (event_id, ns, user_id, event_type)
        (100, PAY_NS, 7, "purchase"),
        (1, ns(PAY_US - LOOKBACK_US), 7, "view"),      # == lower bound → IN
        (2, ns(PAY_US - LOOKBACK_US - 1), 7, "view"),  # 1 µs below → OUT
        (3, ns(PAY_US - 1), 7, "view"),                # 1 µs before pay → IN
        (4, ns(PAY_US), 7, "view"),                    # == pay_ts → OUT
        # far-future rows (both a purchase and a plain event) push the
        # final watermark far past every window on both join sides
        (990, PAY_NS + 10_000 * 1_000_000_000, 99, "purchase"),
        (991, PAY_NS + 10_000 * 1_000_000_000, 98, "view"),
    ]
    src = str(tmp_path / "edge_events")
    os.makedirs(src, exist_ok=True)
    df = spark.createDataFrame(
        [(i, t, u, e, 1.0, "{}") for i, t, u, e in rows],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    stage = src + "_stage"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    pf = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
    shutil.move(os.path.join(stage, pf), os.path.join(src, "b.parquet"))
    _time.sleep(0.2)

    joined = interval_join_purchases(stream_events(spark, src))
    sink, ckpt = str(tmp_path / "edge_ij"), str(tmp_path / "edge_ckpt")
    q = (
        joined.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.read.parquet(sink)
    pairs = {(r["pay_id"], r["prior_id"]) for r in out.collect()}
    assert pairs == {(100, 1), (100, 3)}, pairs
    # the conversion is exact to the microsecond on every surviving row
    exact = {
        r["prior_id"]: r["us"]
        for r in out.select(
            "prior_id", F.unix_micros("ts").alias("us")
        ).collect()
    }
    assert exact[1] == PAY_US - LOOKBACK_US
    assert exact[3] == PAY_US - 1
    pay_us = out.select(F.unix_micros("pay_ts").alias("us")).first()["us"]
    assert pay_us == PAY_US


def test_left_outer_stream_join_null_padding(spark, tmp_path):
    """J2 streaming: matched order joins its payment; unmatched order is
    emitted null-padded exactly once, after the watermark closes its
    payment window (no retractions — SURVEY §7.4.1)."""
    import shutil
    import time as _time

    from pyspark.sql import functions as F2

    from real_time_data_warehouse_spark.streaming.joins import (
        left_outer_stream_join,
    )
    from real_time_data_warehouse_spark.streaming.pipelines import stream_events

    def write_src(rows, path):
        os.makedirs(path, exist_ok=True)
        df = spark.createDataFrame(
            rows, ["event_id", "ts_s", "user_id", "event_type", "value", "props"]
        ).select(
            "event_id",
            (F2.col("ts_s").cast("bigint") * 1_000_000_000).alias("ts"),
            "user_id", "event_type", "value", "props",
        )
        stage = path + "_stage"
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        pf = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        shutil.move(os.path.join(stage, pf), os.path.join(path, "b.parquet"))
        _time.sleep(0.2)

    base = 1_700_000_000
    odir, pdir = str(tmp_path / "orders"), str(tmp_path / "pays")
    # order 1 (user 7) pays 60 s later; order 2 (user 8) never pays.
    # far-future rows on BOTH sides push the final watermark past the
    # 30-min payment window of both orders.
    write_src(
        [(1, base, 7, "order", 1.0, "{}"), (2, base + 10, 8, "order", 1.0, "{}"),
         (99, base + 10_000, 99, "order", 1.0, "{}")],
        odir,
    )
    write_src(
        [(51, base + 60, 7, "pay", 1.0, "{}"),
         (98, base + 10_000, 98, "pay", 1.0, "{}")],
        pdir,
    )
    joined = left_outer_stream_join(
        stream_events(spark, odir), stream_events(spark, pdir)
    )
    sink, ckpt = str(tmp_path / "lo"), str(tmp_path / "ckpt_lo")
    q = (
        joined.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        r["order_id"]: r["pay_id"] for r in spark.read.parquet(sink).collect()
    }
    assert rows[1] == 51        # matched within the window
    assert rows[2] is None      # unmatched → null-padded after watermark
    assert list(rows).count(2) == 1  # emitted exactly once, no retract pairs


def test_lookup_join_stream_static(spark, tmp_path, events_dir):  # noqa: F811
    # dim: user bucket → segment name (static parquet table)
    dim = spark.range(0, 200).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("segment_"), (F.col("id") % 5).cast("string")).alias(
            "segment"
        ),
    )
    dim_path = str(tmp_path / "dim_user")
    dim.write.mode("overwrite").parquet(dim_path)

    static_dim = spark.read.parquet(dim_path)
    enriched = lookup_join_dim(
        stream_events(spark, events_dir).select("event_id", "user_id"),
        static_dim,
        "user_id",
    )
    sink, ckpt = str(tmp_path / "lj"), str(tmp_path / "ckpt_lj")
    q = (
        enriched.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(sink)
    ev = Tables(spark, SF_DIR).events
    assert got.count() == ev.count()  # left join keeps every stream row
    # every matched row got the right segment
    wrong = got.where(
        F.col("segment").isNotNull()
        & (F.col("segment") != F.concat(F.lit("segment_"), (F.col("user_id") % 5).cast("string")))
    ).count()
    assert wrong == 0


def test_asof_same_instant_order_is_visible(spark):
    """j10's 'at or before' boundary: an order dated exactly at the
    event timestamp must match (the kind-ordered union sort puts order
    rows ahead of event rows at equal timestamps), and equal-date orders
    break ties to the max orderkey."""
    import datetime as dt

    from real_time_data_warehouse_spark.operators.joins import j10_asof_join

    T = dt.datetime(2024, 3, 1, 12, 0, 0)
    orders = spark.createDataFrame(
        [(100, 5, "O", 10.0, T, "1-URGENT"),
         (101, 5, "O", 20.0, T, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    events = spark.createDataFrame(
        [(1, T, 5, "click", 1.0, "{}"),
         (2, T - dt.timedelta(seconds=1), 5, "view", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        orders.write.parquet(os.path.join(d, "orders.parquet"))
        events.write.parquet(os.path.join(d, "events.parquet"))
        got = {
            r["event_id"]: r["asof_orderkey"]
            for r in j10_asof_join(spark, d).collect()
        }
    # event at T sees the same-instant orders and takes the max key;
    # the earlier event sees nothing
    assert got == {1: 101, 2: None}
