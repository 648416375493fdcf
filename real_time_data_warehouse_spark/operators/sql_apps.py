"""SQL-string surface — the BaseSQLApp programming model (SURVEY.md §3.2).

7 of the reference's 16 apps are Flink SQL: DDL-registered sources +
``sqlQuery`` strings (BaseSQLApp.java:19-79). Spark's equivalent surface is
``createOrReplaceTempView`` + ``spark.sql`` — same Catalyst plans as the
DataFrame API, so these queries double as proof that a SQL-first user of
the reference can bring their queries over as strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from real_time_data_warehouse_spark.registry import register
from real_time_data_warehouse_spark.tables import Tables


def _views(spark: SparkSession, sf_dir: str) -> None:
    Tables(spark, sf_dir).register_views()


@register(
    "sql1_order_detail_app",
    survey="J1,P4,F3,§3.2",
    doc="DwdTradeOrderDetail as a pure SQL string (the reference's "
        "sqlQuery form, DwdTradeOrderDetail.java:30-108) over registered "
        "views — identical Catalyst plan to the DataFrame form (j1).",
    oracle="""
        SELECT l.l_orderkey AS order_id,
               l.l_linenumber AS line_id,
               o.o_custkey AS user_id,
               strftime(o.o_orderdate, '%Y-%m-%d') AS date_id,
               CAST(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
                    AS DOUBLE) AS split_total_amount
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus <> 'X'
    """,
)
def sql1_order_detail_app(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l.l_orderkey AS order_id,
               l.l_linenumber AS line_id,
               o.o_custkey AS user_id,
               date_format(o.o_orderdate, 'yyyy-MM-dd') AS date_id,
               CAST(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
                    AS DOUBLE) AS split_total_amount
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus <> 'X'
        """
    )


@register(
    "sql2_keyword_window_app",
    survey="A6,U1,W3,§3.2",
    doc="DwsTrafficSourceKeywordPageViewWindow as SQL: LATERAL VIEW "
        "explode(tokenizer) — the Spark spelling of `LATERAL "
        "TABLE(ik_analyze(...))` (DwsTrafficSourceKeywordPageViewWindow."
        "java:50-63).",
    oracle="""
        SELECT t.keyword, CAST(COUNT(*) AS BIGINT) AS keyword_ct
        FROM documents d,
             LATERAL (SELECT unnest(list_filter(
                 regexp_split_to_array(lower(d.text), '[^a-z0-9]+'),
                 x -> length(x) > 0)) AS keyword) t
        WHERE d.lang = 'en'
        GROUP BY t.keyword
    """,
)
def sql2_keyword_window_app(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT keyword, COUNT(*) AS keyword_ct
        FROM documents
        LATERAL VIEW explode(
            filter(split(lower(text), '[^a-z0-9]+'), t -> length(t) > 0)
        ) kw AS keyword
        WHERE lang = 'en'
        GROUP BY keyword
        """
    )


@register(
    "sql3_serving_gmv_app",
    survey="A7,A8,§3.3",
    doc="The publisher's GMV+province serving SQL verbatim-style "
        "(TradeStatsMapper.java:16-22), as one spark.sql statement.",
    oracle="""
        SELECT n.n_name AS province_name,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS order_amount,
               CAST(COUNT(*) AS BIGINT) AS order_ct
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= DATE '1997-01-01'
          AND o.o_orderdate < DATE '1998-01-01'
        GROUP BY n.n_name
    """,
)
def sql3_serving_gmv_app(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir)
    return spark.sql(
        """
        SELECT /*+ BROADCAST(c), BROADCAST(n) */
               n.n_name AS province_name,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS order_amount,
               COUNT(*) AS order_ct
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= DATE '1997-01-01'
          AND o.o_orderdate < DATE '1998-01-01'
        GROUP BY n.n_name
        """
    )
