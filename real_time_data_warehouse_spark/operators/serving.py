"""ADS serving-layer queries — SURVEY.md §2.4 A7-A9, §2.10, §3.3.

The reference serves daily stats from Doris via MyBatis SQL with explicit
day-partition selection (`partition par#{date}` — TradeStatsMapper.java:
16-22, TrafficStatsMapper.java:16-18). Spark-first: `spark.sql` over
day-partitioned lakehouse tables; the literal date predicate *is* the
partition pruning (verified in plans/audit.py). Here the DWS table is
derived on the fly from `orders` (same shape as the materialized pipeline
output in streaming/pipelines.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_data_warehouse_spark.functions.money import dec, dec4, oracle_dec_sum
from real_time_data_warehouse_spark.registry import register
from real_time_data_warehouse_spark.tables import Tables

# Fixed serving date: sf-independent, mid-range of o_orderdate (1995-2001).
SERVING_DATE = "1998-01-01"


@register(
    "q0_flagship_trade_summary",
    survey="J1,J6,A1,A2,A8,W7",
    doc="Flagship query (the spine of the reference's trade pipeline, "
        "DwdTradeOrderDetail → DwsTradeProvinceOrderWindow): fact⋈fact "
        "join, broadcast dim chain to region, daily rollup with decimal "
        "sums + exact distinct orders per (day-month, region). Used by "
        "__spark_entry__.entry().",
    oracle="""
        SELECT strftime(date_trunc('month', o.o_orderdate), '%Y-%m') AS cur_month,
               r.r_name AS region_name,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE) AS order_amount,
               CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT) AS order_ct,
               CAST(COUNT(*) AS BIGINT) AS item_ct
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY strftime(date_trunc('month', o.o_orderdate), '%Y-%m'), r.r_name
    """,
)
def q0_flagship_trade_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    # Pre-aggregate the fact per order BEFORE the join: every lineitem of
    # an order lands in the same (month, region) group, so the
    # COUNT(DISTINCT l_orderkey) collapses to a plain COUNT(*) over
    # order-grain rows. This (a) removes the expensive distinct-aggregate
    # phase, (b) shrinks the join input ~4× (items → orders), and (c) the
    # groupBy(l_orderkey) exchange is hash-partitioned on the join key, so
    # the join reuses it instead of re-shuffling the fact side — the
    # standard pre-aggregation-below-join rewrite, done by hand because
    # Catalyst won't push a partial distinct through a join. Decimal sums
    # re-associate exactly, so results are bit-identical.
    li_per_order = (
        t.lineitem.groupBy("l_orderkey")
        .agg(
            F.sum(dec4(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("order_amount_dec"),
            F.count("*").alias("item_ct"),
        )
    )
    return (
        li_per_order
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM")
            .alias("cur_month"),
            F.col("r_name").alias("region_name"),
        )
        .agg(
            F.sum("order_amount_dec").cast("double").alias("order_amount"),
            F.count("*").alias("order_ct"),
            F.sum("item_ct").cast("bigint").alias("item_ct"),
        )
    )


@register(
    "a7_daily_gmv",
    survey="A7,S12",
    doc="Daily GMV: sum over one day partition "
        "(TradeStatsMapper.java:16-17 `select sum(order_amount) ... "
        "partition par#{date}`). The date literal prunes to one partition "
        "of the day-partitioned serving table.",
    oracle=f"""
        SELECT strftime(o_orderdate, '%Y-%m-%d') AS cur_date,
               {oracle_dec_sum('o_totalprice', 'gmv')},
               CAST(COUNT(*) AS BIGINT) AS order_ct
        FROM orders
        WHERE o_orderdate >= DATE '{SERVING_DATE}'
          AND o_orderdate < DATE '{SERVING_DATE}' + INTERVAL 31 DAY
        GROUP BY strftime(o_orderdate, '%Y-%m-%d')
    """,
)
def a7_daily_gmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders.where(
            (F.col("o_orderdate") >= F.lit(SERVING_DATE))
            & (F.col("o_orderdate") < F.date_add(F.lit(SERVING_DATE).cast("date"), 31))
        )
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("cur_date"))
        .agg(
            F.sum(dec("o_totalprice")).cast("double").alias("gmv"),
            F.count("*").alias("order_ct"),
        )
    )


@register(
    "a8_province_amount",
    survey="A8,S12",
    doc="Per-province order amount (TradeStatsMapper.java:20-22): group-by "
        "dim name + sum, dim resolved via broadcast join.",
    oracle=f"""
        SELECT n.n_name AS province_name,
               {oracle_dec_sum('o.o_totalprice', 'order_amount')}
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
)
def a8_province_amount(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("province_name"))
        .agg(F.sum(dec("o_totalprice")).cast("double").alias("order_amount"))
    )


@register(
    "a11_percentiles",
    survey="A10,S12",
    doc="Exact interpolated percentiles per order priority (beyond the "
        "reference's sums/counts; serving-layer stat). Spark `percentile` "
        "and DuckDB `quantile_cont` share the interpolation definition.",
    oracle="""
        SELECT o_orderpriority,
               CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) AS p50,
               CAST(quantile_cont(o_totalprice, 0.95) AS DOUBLE) AS p95,
               CAST(COUNT(*) AS BIGINT) AS order_ct
        FROM orders
        GROUP BY o_orderpriority
    """,
)
def a11_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders.groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
            F.percentile("o_totalprice", F.lit(0.95)).alias("p95"),
            F.count("*").alias("order_ct"),
        )
    )


@register(
    "a9_topk_channel",
    survey="A9,§2.10",
    doc="Top-k serving query (TrafficStatsMapper.java:16-18 `order by "
        "uv_ct desc limit #{limit}`): group + sum + deterministic order + "
        "limit → Spark plans TakeOrderedAndProject (no global sort).",
    oracle="""
        SELECT event_type AS ch,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS uv_ct
        FROM events
        GROUP BY event_type
        ORDER BY uv_ct DESC, ch
        LIMIT 3
    """,
)
def a9_topk_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(F.col("event_type").alias("ch"))
        .agg(F.countDistinct("user_id").alias("uv_ct"))
        .orderBy(F.col("uv_ct").desc(), F.col("ch"))
        .limit(3)
    )


@register(
    "a11b_approx_percentiles",
    survey="A10,S12,ext-scale",
    doc="100 TB-scale variant of a11: t-digest-style approx_percentile "
        "(accuracy 10000) instead of the exact sort-based percentile — "
        "sketches merge associatively, so the plan is partial→final with "
        "no per-key value sort. Sketch values are engine-specific, so "
        "the driver contract is a BOUNDS oracle (a2b's pattern): exact "
        "quantiles plus within_bounds = relative error ≤ 5% on both "
        "p50 and p95, asserted as literal TRUE by the oracle.",
    oracle="""
        SELECT o_orderpriority,
               CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) AS p50_exact,
               CAST(quantile_cont(o_totalprice, 0.95) AS DOUBLE) AS p95_exact,
               TRUE AS within_bounds
        FROM orders
        GROUP BY o_orderpriority
    """,
)
def a11b_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    agg = t.orders.groupBy("o_orderpriority").agg(
        F.approx_percentile(
            "o_totalprice", F.array(F.lit(0.5), F.lit(0.95)), F.lit(10000)
        ).alias("ap"),
        F.percentile("o_totalprice", F.lit(0.5)).alias("p50_exact"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("p95_exact"),
    )
    rel = lambda a, e: F.abs(a - F.col(e)) / F.col(e)  # noqa: E731
    return agg.select(
        "o_orderpriority",
        "p50_exact",
        "p95_exact",
        (
            (rel(F.col("ap")[0], "p50_exact") <= 0.05)
            & (rel(F.col("ap")[1], "p95_exact") <= 0.05)
        ).alias("within_bounds"),
    )
