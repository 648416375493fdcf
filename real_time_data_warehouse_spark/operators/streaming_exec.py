"""Real Structured-Streaming execution as a DRIVER-CHECKED row.

Every §2.6 stateful operator already has a batch≡stream replay row, but
those replays drive the foreachBatch APPLIERS directly — the actual
``readStream → withWatermark → window agg → writeStream(append)``
runtime (trigger scheduling, watermark advancement across micro-batches,
append-mode window eviction, checkpoint commit protocol) executed only
under pytest. st14 closes that: it runs the DWS window pipeline
(streaming/pipelines.run_dws_agg_stream — the reference's
DwsTradeSkuOrderWindow shape, S7's day-partitioned file sink) as a REAL
streaming query over a multi-file time-ordered source (one file per
micro-batch, so the watermark genuinely advances between batches and
windows are emitted by eviction, not by end-of-input), then reads the
sink back and compares against the one-pass batch oracle on the
closed-window horizon.

Horizon discipline: append mode emits a window only once the watermark
(max event time − 10 s) passes its end; windows still open when the
stream ends stay in state. Spark's watermark is millisecond-truncated,
so instead of reasoning about ≤-vs-< at the exact boundary both the
read-back and the oracle restrict to ``edt ≤ max(ts) − 20 s`` — one
full window inside the guaranteed-emitted region, computable exactly by
both engines.

The stream runs ONCE per (session, sf_dir) into a cached artifact
(j12 discipline); re-runs resume from the checkpoint, find no new
files, and the read-back serves the medians — exactly how a deployment
reads a continuously-maintained DWS table rather than recomputing it.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_data_warehouse_spark.functions.money import oracle_dec_sum
from real_time_data_warehouse_spark.functions.time import oracle_tumble
from real_time_data_warehouse_spark.operators.sink_readback import (
    _artifact_dir,
)
from real_time_data_warehouse_spark.registry import register
from real_time_data_warehouse_spark.tables import Tables

_ST14_FILES = 3  # micro-batches: watermark must advance ACROSS batches
_ST14_HORIZON_S = 20  # closed-window margin (2 windows behind max ts)


def _write_single_file(df: DataFrame, src_dir: str, name: str) -> None:
    """df → ONE parquet file {src_dir}/{name}.parquet (one micro-batch);
    write order fixes mtime order, which maxFilesPerTrigger=1 follows."""
    os.makedirs(src_dir, exist_ok=True)
    stage = tempfile.mkdtemp(prefix="rtdw_st14_stage_")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
    shutil.move(
        os.path.join(stage, part), os.path.join(src_dir, f"{name}.parquet")
    )
    shutil.rmtree(stage, ignore_errors=True)


def _st14_build(spark: SparkSession, sf_dir: str) -> str:
    from real_time_data_warehouse_spark.streaming.pipelines import (
        run_dws_agg_stream,
    )

    def build(base: str) -> None:
        src = os.path.join(base, "src")
        out = os.path.join(base, "out")
        ckpt = os.path.join(base, "ckpt")
        ev = Tables(spark, sf_dir).events
        lo, hi = ev.agg(
            F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
        ).first()
        span = (hi - lo) + 1
        for b in range(_ST14_FILES):
            b_lo = lo + span * b // _ST14_FILES
            b_hi = lo + span * (b + 1) // _ST14_FILES
            part = ev.where(
                (F.unix_micros("ts") >= b_lo) & (F.unix_micros("ts") < b_hi)
            ).select(
                "event_id",
                # the raw stream carries nanos as long (S1's wire form);
                # exact ns from µs — a double round-trip loses >2^53
                (F.unix_micros("ts") * F.lit(1000).cast("bigint")).alias(
                    "ts"
                ),
                "user_id",
                "event_type",
                "value",
                "props",
            )
            _write_single_file(part, src, f"batch_{b}")
        q = run_dws_agg_stream(spark, src, out, ckpt)
        q.awaitTermination(300)

    return _artifact_dir(spark, sf_dir, "st14", build)


@register(
    "st14_dws_stream_readback",
    survey="A1,W1,W4,W7,S7",
    doc=f"REAL Structured-Streaming execution driver-checked: the DWS "
        "windowed aggregate runs as an actual readStream → "
        "withWatermark(10 s) → 10 s tumbling agg → append-mode "
        "writeStream over a {n}-file time-ordered source (one file per "
        "micro-batch — the watermark advances BETWEEN batches, so "
        "windows are emitted by watermark eviction, the production "
        "path, not by end-of-input), checkpointed, day-partitioned "
        "(streaming/pipelines.run_dws_agg_stream). The sink is read "
        "back on the closed-window horizon (edt ≤ max ts − "
        "{h} s — inside the guaranteed-emitted region on both "
        "engines) and hash-compared to the one-pass batch oracle. "
        "Covers what the foreachBatch replay rows cannot: trigger "
        "scheduling, cross-batch watermark state, append-mode "
        "eviction, and the checkpoint commit protocol."
        .format(n=_ST14_FILES, h=_ST14_HORIZON_S),
    oracle=f"""
        WITH mx AS (
            SELECT MAX(ts) - INTERVAL {_ST14_HORIZON_S} SECOND AS horizon
            FROM events
        )
        SELECT strftime({oracle_tumble('ts', 10)},
                        '%Y-%m-%d %H:%M:%S') AS stt,
               strftime({oracle_tumble('ts', 10)} + INTERVAL 10 SECOND,
                        '%Y-%m-%d %H:%M:%S') AS edt,
               event_type AS sku_group,
               {oracle_dec_sum('value', 'order_amount')},
               CAST(COUNT(*) AS BIGINT) AS order_ct
        FROM events CROSS JOIN mx
        GROUP BY {oracle_tumble('ts', 10)}, event_type, mx.horizon
        HAVING {oracle_tumble('ts', 10)} + INTERVAL 10 SECOND <= mx.horizon
    """,
)
def st14_dws_stream_readback(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    base = _st14_build(spark, sf_dir)
    ev = Tables(spark, sf_dir).events
    horizon = F.date_format(
        F.timestamp_micros(
            F.unix_micros(F.max("ts")) - _ST14_HORIZON_S * 1_000_000
        ),
        "yyyy-MM-dd HH:mm:ss",
    ).alias("horizon")
    hz = ev.agg(horizon)
    back = spark.read.parquet(os.path.join(base, "out"))
    return (
        back.crossJoin(F.broadcast(hz))  # one-row horizon scalar
        .where(F.col("edt") <= F.col("horizon"))
        .select(
            "stt",
            "edt",
            "sku_group",
            F.col("order_amount").cast("double").alias("order_amount"),
            F.col("order_ct").cast("bigint").alias("order_ct"),
        )
    )
