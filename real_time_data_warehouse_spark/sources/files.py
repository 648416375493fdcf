"""File-format sources beyond parquet: JSON-lines and CSV readers that
normalize into the same events frame `tables.load` produces, so every
downstream operator (batch or streaming) is format-agnostic.

The reference ingests newline-JSON values from Kafka
(FlinkSourceUtil.java:23-58 + the `topic_log` consumers); with the broker
env-gated, a JSONL directory is the faithful stand-in — one JSON object
per line, same fields the Kafka value would carry. CSV covers the classic
batch-dump hand-off. Both paths:

- declare an explicit schema (never `inferSchema` — a schema scan over
  100 TB is a full extra pass, and inference can silently flip a column
  type between dumps);
- normalize `ts` from epoch-nanos to the µs timestamp every operator
  expects, with the exact `div 1000` integer math (double division loses
  a µs on ~12% of nano values — see streaming/pipelines.py);
- tolerate dirty rows via PERMISSIVE mode + `_corrupt_record` so one bad
  line degrades to a null row instead of failing the 1000-executor job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# the raw events shape shared by every file format (ts = epoch NANOS)
EVENTS_FILE_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _normalize(raw: DataFrame) -> DataFrame:
    return raw.select(
        "event_id",
        F.timestamp_micros(F.expr("ts div 1000")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def read_events_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Batch JSONL → normalized events frame."""
    raw = spark.read.schema(EVENTS_FILE_SCHEMA).json(path)
    return _normalize(raw)


def stream_events_jsonl(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Streaming JSONL directory → the same frame `stream_events` yields
    from parquet; drop-in for every pipeline in streaming/pipelines.py."""
    raw = (
        spark.readStream.schema(EVENTS_FILE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )
    return _normalize(raw)


def read_events_csv(
    spark: SparkSession, path: str, header: bool = True
) -> DataFrame:
    """Batch CSV → normalized events frame (explicit schema, no inference)."""
    raw = (
        spark.read.schema(EVENTS_FILE_SCHEMA)
        .option("header", str(header).lower())
        .csv(path)
    )
    return _normalize(raw)


def write_events_jsonl(events_nanos: DataFrame, path: str) -> None:
    """Dump a raw (nanos-ts) events frame as JSONL — the test/round-trip
    twin of read_events_jsonl."""
    events_nanos.select(*_COLS).write.mode("overwrite").json(path)


def read_events_orc(spark: SparkSession, path: str) -> DataFrame:
    """Batch ORC → normalized events frame. ORC is the other columnar
    hand-off format warehouses exchange (Hive-lineage pipelines); Spark
    reads it natively with predicate pushdown and column pruning, so
    the downstream plans are identical to the parquet path."""
    raw = spark.read.schema(EVENTS_FILE_SCHEMA).orc(path)
    return _normalize(raw)


def write_events_orc(events_nanos: DataFrame, path: str) -> None:
    """Dump a raw (nanos-ts) events frame as ORC — round-trip twin of
    read_events_orc."""
    events_nanos.select(*_COLS).write.mode("overwrite").orc(path)
