"""CDC envelope schemas + parsers (SURVEY.md §1.1 items 2-3).

Two envelope dialects, exactly as the reference consumes them:

- **Maxwell** (`topic_db`): `{database, table, type, ts, data, old}` with
  epoch-seconds ts, declared as a Flink dynamic table at
  BaseSQLApp.java:56-66 (computed et = to_timestamp_ltz(ts, 0), watermark
  3 s).
- **Debezium** (Flink-CDC config stream): `{before, after, op, ts_ms}` with
  op ∈ {r,c,u,d} (DimApp.java:197-200).

Spark-first: explicit StructTypes + ``from_json`` — a codegen'd JVM
expression, applied identically to a batch column or a Kafka `value`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

_STR_MAP = MapType(StringType(), StringType())

MAXWELL_SCHEMA = StructType(
    [
        StructField("database", StringType()),
        StructField("table", StringType()),
        StructField("type", StringType()),
        StructField("ts", LongType()),  # epoch SECONDS (BaseSQLApp.java:60)
        StructField("xid", LongType()),  # binlog transaction id (monotone)
        StructField("xoffset", LongType()),  # row order within the binlog tx
        StructField("data", _STR_MAP),
        StructField("old", _STR_MAP),
    ]
)

DEBEZIUM_SCHEMA = StructType(
    [
        StructField("before", _STR_MAP),
        StructField("after", _STR_MAP),
        StructField("op", StringType()),  # r | c | u | d
        StructField("ts_ms", LongType()),  # epoch MILLIS
    ]
)


def parse_maxwell(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Raw JSON strings → typed Maxwell envelope + event time + watermark
    (BaseSQLApp.java:63-65: et = to_timestamp_ltz(ts, 0), watermark 3 s).
    Works on batch and streaming DataFrames alike; the watermark is a no-op
    in batch.

    Also surfaces ``__seq``, a true commit-order tie-break for same-second
    CDC records (Maxwell ts is epoch-SECONDS, so insert+update in one
    second tie on ts): the Kafka partition offset when the source carries
    one (Kafka keys CDC by primary key, so per-key offsets are
    commit-ordered), else ``xid * 2^20 + xoffset`` — Maxwell's binlog
    transaction id ranks first because ``xoffset`` restarts at 0 per
    transaction (two same-second records from different transactions must
    order by transaction, not by row-within-transaction). When neither is
    present ``__seq`` is NULL, and ``upsert_dim`` falls back to
    arrival-order tie-breaking instead of a meaningless constant."""
    keep = [F.col("offset").alias("__kafka_offset")] if "offset" in df.columns else []
    parsed = df.select(
        F.from_json(F.col(value_col).cast("string"), MAXWELL_SCHEMA).alias("r"),
        *keep,
    ).select("r.*", *(["__kafka_offset"] if keep else []))
    # 2^20 rows-per-transaction headroom: xids are monotone and sparse, so
    # the composite stays well under 2^63 for any realistic binlog
    tx_seq = F.when(
        F.col("xid").isNotNull(),
        F.col("xid") * F.lit(1 << 20) + F.coalesce("xoffset", F.lit(0)),
    ).otherwise(F.col("xoffset"))
    seq = F.coalesce("__kafka_offset", tx_seq) if keep else tx_seq
    parsed = parsed.withColumn("__seq", seq.cast("long"))
    if keep:
        parsed = parsed.drop("__kafka_offset")
    with_et = parsed.withColumn("et", F.timestamp_seconds("ts"))
    return with_et.withWatermark("et", "3 seconds") if with_et.isStreaming else with_et


def parse_debezium(df: DataFrame, value_col: str = "value") -> DataFrame:
    parsed = df.select(
        F.from_json(F.col(value_col).cast("string"), DEBEZIUM_SCHEMA).alias("r")
    ).select("r.*")
    return parsed.withColumn("et", F.timestamp_millis("ts_ms"))


def maxwell_etl_filter(df: DataFrame, database: str = "gmall2024") -> DataFrame:
    """The DimApp ETL gate (DimApp.java:149-185): right database, known CDC
    type, non-trivial data payload."""
    return df.where(
        (F.col("database") == database)
        & F.col("type").isin("insert", "update", "delete", "bootstrap-insert")
        & F.col("data").isNotNull()
        & (F.size("data") > 0)
    )


def synthetic_cdc_json(orders: DataFrame, database: str = "gmall2024") -> DataFrame:
    """Deterministic Maxwell-envelope stream synthesized from the `orders`
    fixture (tests/streaming drive the DIM/DWD pipelines with this):
    every order → an insert; orders with status 'F' additionally emit an
    update flipping order_status 'O'→'F' 60 s later. One `value` string
    column, exactly what a Kafka source would deliver."""
    base = orders.select(
        F.col("o_orderkey").cast("string").alias("id"),
        F.col("o_custkey").cast("string").alias("user_id"),
        F.col("o_orderstatus").alias("order_status"),
        F.col("o_totalprice").cast("string").alias("total_amount"),
        F.unix_timestamp("o_orderdate").alias("ts"),
    )
    data_map: Column = F.create_map(
        F.lit("id"), F.col("id"),
        F.lit("user_id"), F.col("user_id"),
        F.lit("order_status"), F.col("order_status"),
        F.lit("total_amount"), F.col("total_amount"),
    )
    inserts = base.select(
        F.to_json(
            F.struct(
                F.lit(database).alias("database"),
                F.lit("order_info").alias("table"),
                F.lit("insert").alias("type"),
                F.col("ts"),
                data_map.alias("data"),
            )
        ).alias("value")
    )
    updates = (
        base.where(F.col("order_status") == "F")
        .select(
            F.to_json(
                F.struct(
                    F.lit(database).alias("database"),
                    F.lit("order_info").alias("table"),
                    F.lit("update").alias("type"),
                    (F.col("ts") + 60).alias("ts"),
                    data_map.alias("data"),
                    F.create_map(
                        F.lit("order_status"), F.lit("O")
                    ).alias("old"),
                )
            ).alias("value")
        )
    )
    return inserts.unionAll(updates)
