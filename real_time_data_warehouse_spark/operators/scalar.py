"""Scalar functions / expressions — SURVEY.md §2.8 (F1-F15).

One query exercising the reference's full scalar surface in a single
projection (conditional, casts, date/time formatting + conversions,
epoch↔date math, day-difference, string helpers) plus a JSON
parse/serialize round-trip query (F11). All Catalyst built-ins inside
whole-stage codegen; no shuffle (pure projections).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_data_warehouse_spark.registry import register
from real_time_data_warehouse_spark.tables import Tables


@register(
    "f_scalar_suite",
    survey="F1,F2,F3,F4,F10,F13,F14",
    doc="Scalar expression suite over events: if/case (F1, "
        "DwdTradeCartAdd.java:32), casts (F2), date_format (F3, "
        "DateFormatUtil analogs), epoch conversions (F4/F10), datediff "
        "against a fixed anchor (F13, DwsUserUserLoginWindow.java:108), "
        "string emptiness/split helpers (F14).",
    oracle="""
        SELECT event_id,
               CASE WHEN value >= 0.5 THEN 'hi' ELSE 'lo' END AS value_band,
               CAST(CAST(value AS DECIMAL(16,2)) AS DOUBLE) AS value_dec,
               CAST(user_id AS VARCHAR) AS user_id_str,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS dt_str,
               strftime(ts, '%Y-%m-%d') AS date_str,
               CAST(strftime(ts, '%Y%m%d') AS INT) AS date_part_int,
               CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
               CAST(datediff('day', DATE '2024-01-01', ts) AS INT) AS days_since_anchor,
               CAST(CASE WHEN event_type = '' OR event_type IS NULL
                    THEN 1 ELSE 0 END AS INT) AS type_empty,
               array_to_string(string_split(event_type, 'i'), '|') AS split_join
        FROM events
    """,
)
def f_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.events.select(
        "event_id",
        F.when(F.col("value") >= 0.5, "hi").otherwise("lo").alias("value_band"),
        # surfaced as DOUBLE after the exact DECIMAL(16,2) rounding so both
        # engines expose the identical float64 bits (functions/money.py
        # discipline; Decimal('31.40') vs 31.4 diverges under exact hashing)
        F.col("value").cast("decimal(16,2)").cast("double").alias("value_dec"),
        F.col("user_id").cast("string").alias("user_id_str"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("dt_str"),
        F.date_format("ts", "yyyy-MM-dd").alias("date_str"),
        F.date_format("ts", "yyyyMMdd").cast("int").alias("date_part_int"),
        F.floor(F.col("ts").cast("double")).cast("bigint").alias("epoch_s"),
        F.datediff("ts", F.lit("2024-01-01")).cast("int").alias("days_since_anchor"),
        F.when(
            (F.col("event_type") == "") | F.col("event_type").isNull(), 1
        ).otherwise(0).cast("int").alias("type_empty"),
        F.array_join(F.split("event_type", "i"), "|").alias("split_join"),
    )


@register(
    "f_json_roundtrip",
    survey="F11,F6",
    doc="JSON parse + re-serialize (fastjson / BeanToJsonStrMapFunction "
        "analog): parse props, enrich, to_json back out with stable key "
        "order.",
    oracle="""
        SELECT event_id,
               TRY_CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS INT) AS k,
               concat('{"event_type":"', event_type, '","k":',
                      TRY_CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS INT), '}') AS enriched_json
        FROM events
        WHERE TRY_CAST(CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END AS INT) IS NOT NULL
    """,
)
def f_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    k = F.get_json_object("props", "$.k").try_cast("int")
    return (
        t.events.where(k.isNotNull())
        .select(
            "event_id",
            k.alias("k"),
            F.to_json(
                F.struct(F.col("event_type"), k.alias("k"))
            ).alias("enriched_json"),
        )
    )
