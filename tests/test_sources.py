"""Source/sink builder surface: Kafka builders construct the right plans
(transform side), and the source path fails with a clear, documented error
in this connector-less environment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_data_warehouse_spark.sources.kafka import (
    kafka_source,
    with_dynamic_topic,
    with_fixed_topic,
    with_upsert_key,
)
from real_time_data_warehouse_spark.tables import Tables
from tests.conftest import SF_DIR


def test_kafka_transform_builders(spark):
    """S4/S5/S6: the record-shaping transforms are plain DataFrame ops and
    must produce the kafka-sink contract columns on any DataFrame."""
    ev = Tables(spark, SF_DIR).events.limit(10)

    fixed = with_fixed_topic(ev, "dwd_page_log")
    assert set(fixed.columns) == {"value", "topic"}
    assert fixed.select("topic").distinct().first()[0] == "dwd_page_log"

    routed = with_dynamic_topic(
        ev.withColumn("sink_table", F.concat(F.lit("dwd_"), "event_type")),
        "sink_table",
    )
    assert set(routed.columns) == {"value", "topic"}
    topics = {r[0] for r in routed.select("topic").distinct().collect()}
    assert all(t.startswith("dwd_") for t in topics)

    keyed = with_upsert_key(ev, ["event_id"])
    assert set(keyed.columns) == {"key", "value"}
    row = keyed.first()
    assert '"event_id"' in row["key"] and '"event_type"' in row["value"]


def test_kafka_source_gated(spark):
    """S1: no kafka connector jars in this environment — the builder must
    surface Spark's own DATA_SOURCE_NOT_FOUND error (documented gap in
    COVERAGE.md), not hang or silently no-op."""
    with pytest.raises(Exception) as ei:
        kafka_source(spark, "topic_db")
    msg = str(ei.value)
    assert "kafka" in msg.lower()


def test_jsonl_roundtrip_matches_parquet(spark, tmp_path):
    """JSONL events (the Kafka-value stand-in) must normalize to EXACTLY
    the frame tables.load yields from parquet — same schema, same µs
    timestamps (div-1000 integer math), same rows."""
    from real_time_data_warehouse_spark.sources.files import (
        read_events_csv,
        read_events_jsonl,
        write_events_jsonl,
    )

    ev = Tables(spark, SF_DIR).events
    raw_nanos = ev.select(
        "event_id",
        (F.unix_micros("ts") * F.lit(1000).cast("bigint")).alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    jdir = str(tmp_path / "events_jsonl")
    write_events_jsonl(raw_nanos, jdir)
    got = read_events_jsonl(spark, jdir)
    assert got.schema == ev.select(*got.columns).schema
    a = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in ev.select(*got.columns).collect()}
    assert a == b

    cdir = str(tmp_path / "events_csv")
    raw_nanos.write.mode("overwrite").option("header", "true").csv(cdir)
    got_csv = read_events_csv(spark, cdir)
    assert {tuple(r) for r in got_csv.drop("props").collect()} == {
        tuple(r) for r in ev.select(*got.columns).drop("props").collect()
    }


def test_jsonl_stream_drives_pipeline(spark, tmp_path):
    """stream_events_jsonl is a drop-in source: the X1 log split over a
    JSONL stream equals the batch split over parquet."""
    import os
    import shutil
    import time as _time

    from real_time_data_warehouse_spark.sources.files import (
        stream_events_jsonl,
        write_events_jsonl,
    )
    from real_time_data_warehouse_spark.streaming.pipelines import log_split

    ev = Tables(spark, SF_DIR).events
    raw_nanos = ev.select(
        "event_id",
        (F.unix_micros("ts") * F.lit(1000).cast("bigint")).alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    stage = str(tmp_path / "stage")
    write_events_jsonl(raw_nanos.coalesce(2), stage)
    src = str(tmp_path / "jsonl_src")
    os.makedirs(src, exist_ok=True)
    for i, p in enumerate(sorted(os.listdir(stage))):
        if p.endswith(".json"):
            shutil.move(os.path.join(stage, p), os.path.join(src, f"b{i}.json"))
            _time.sleep(0.2)

    stream = stream_events_jsonl(spark, src)
    page = log_split(stream)["page"]
    sink, ckpt = str(tmp_path / "page_out"), str(tmp_path / "ckpt_jsonl")
    q = (
        page.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(sink)
    want = ev.where(F.col("event_type") == "purchase")
    assert got.count() == want.count()
    assert {r["event_id"] for r in got.collect()} == {
        r["event_id"] for r in want.collect()
    }


def test_orc_roundtrip_matches_parquet(spark, tmp_path):
    """ORC events (the Hive-lineage hand-off) must normalize to EXACTLY
    the frame tables.load yields from parquet, and the ORC scan must
    keep pushdown + pruning (same plan class as parquet)."""
    from real_time_data_warehouse_spark.sources.files import (
        read_events_orc,
        write_events_orc,
    )

    ev = Tables(spark, SF_DIR).events
    raw_nanos = ev.select(
        "event_id",
        (F.unix_micros("ts") * F.lit(1000).cast("bigint")).alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    odir = str(tmp_path / "events_orc")
    write_events_orc(raw_nanos, odir)
    got = read_events_orc(spark, odir)
    assert got.schema == ev.select(*got.columns).schema
    a = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in ev.select(*got.columns).collect()}
    assert a == b

    # pushdown + pruning survive the format swap
    pruned = got.where(F.col("event_type") == "page_view").select(
        "event_id", "event_type"
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "event_type" in plan


def test_schema_evolution_merge_read(spark, tmp_path):
    """A landed directory where later files carry a NEW column (schema
    evolution between producer deploys) must read as the union schema
    with nulls for old files — mergeSchema, the lakehouse contract a
    100 TB ingest directory depends on."""
    v1 = spark.createDataFrame(
        [(1, "click"), (2, "view")], "event_id long, event_type string"
    )
    v2 = spark.createDataFrame(
        [(3, "click", "mobile")],
        "event_id long, event_type string, device string",
    )
    d = str(tmp_path / "evolving")
    v1.write.mode("overwrite").parquet(d + "/day=1")
    v2.write.mode("overwrite").parquet(d + "/day=2")
    got = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(got.columns) == {"event_id", "event_type", "device", "day"}
    rows = {r["event_id"]: r["device"] for r in got.collect()}
    assert rows == {1: None, 2: None, 3: "mobile"}
