"""Multi-way split / fan-out / set ops — SURVEY.md §2.7 (X1-X3).

The reference's DwdBaseLog splits one log stream 5 ways via Flink side
outputs (err/start/display/action/page, DwdBaseLog.java:192-295), exploding
the displays[]/actions[] arrays into child records; DwdBaseDb demuxes CDC
records to N topics via config (X2). Spark-first: one parsed DataFrame →
N filtered/exploded DataFrames; in streaming, ``foreachBatch`` persists the
batch once and writes each side (streaming/pipelines.py). For the oracle the
sides are tagged and unioned into one DataFrame.

Scale notes: the split is N predicate scans over one cached/persisted
micro-batch — no shuffle; `explode` is a generator inside codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_data_warehouse_spark.registry import register
from real_time_data_warehouse_spark.tables import Tables


@register(
    "x1_log_split",
    survey="X1,P2",
    doc="5-way log split with side outputs (DwdBaseLog.java:192-295): "
        "err/start/display/action/page analog over event_type, tagged + "
        "unioned. Each side is an independent DataFrame in the pipeline.",
    oracle="""
        SELECT 'err' AS side, event_id, user_id FROM events WHERE event_type = 'error'
        UNION ALL
        SELECT 'start' AS side, event_id, user_id FROM events WHERE event_type = 'signup'
        UNION ALL
        SELECT 'display' AS side, event_id, user_id FROM events WHERE event_type = 'view'
        UNION ALL
        SELECT 'action' AS side, event_id, user_id FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT 'page' AS side, event_id, user_id FROM events WHERE event_type = 'purchase'
    """,
)
def x1_log_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events
    sides = {
        "err": "error",
        "start": "signup",
        "display": "view",
        "action": "click",
        "page": "purchase",
    }
    parts = [
        ev.where(F.col("event_type") == etype).select(
            F.lit(side).alias("side"), "event_id", "user_id"
        )
        for side, etype in sides.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@register(
    "x1b_explode_children",
    survey="X1",
    doc="Child-record explosion (displays[]/actions[] → one row each "
        "carrying the parent context, DwdBaseLog.java:230-250): a per-event "
        "synthetic array of size k (from props) exploded with posexplode.",
    oracle="""
        SELECT e.event_id, e.user_id,
               CAST(i.pos AS INT) AS display_pos
        FROM events e,
             LATERAL (SELECT unnest(range(TRY_CAST(CASE WHEN json_valid(e.props) THEN json_extract_string(e.props, '$.k') END
                                                   AS INT) % 3 + 1)) AS pos) i
        WHERE TRY_CAST(CASE WHEN json_valid(e.props) THEN json_extract_string(e.props, '$.k') END AS INT) IS NOT NULL
    """,
)
def x1b_explode_children(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    # try_cast: non-numeric k filters out instead of erroring (ANSI) —
    # mirrors the oracle's TRY_CAST
    k = F.get_json_object("props", "$.k").try_cast("int")
    with_arr = (
        t.events.where(k.isNotNull())
        .withColumn("displays", F.sequence(F.lit(0), k % 3))
    )
    return with_arr.select(
        "event_id", "user_id", F.explode("displays").alias("display_pos")
    )


@register(
    "x3_set_ops",
    survey="X3",
    doc="Set operations (absent in the reference, Spark-native): users who "
        "both clicked and purchased (intersect) vs clicked-only (except), "
        "tagged + unioned.",
    oracle="""
        SELECT user_id, 'both' AS cohort FROM (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
            INTERSECT
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        UNION ALL
        SELECT user_id, 'click_only' AS cohort FROM (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
            EXCEPT
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    """,
)
def x3_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    clickers = (
        t.events.where(F.col("event_type") == "click").select("user_id").distinct()
    )
    buyers = (
        t.events.where(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    both = clickers.intersect(buyers).select(
        "user_id", F.lit("both").alias("cohort")
    )
    click_only = clickers.exceptAll(buyers).select(
        "user_id", F.lit("click_only").alias("cohort")
    )
    return both.unionAll(click_only)
