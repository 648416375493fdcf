"""AQE skew-join: the automatic half of the skew story.

j9/a12 pin the MANUAL salting pattern (for engines/joins where AQE can't
help). This test pins the automatic path SCALE.md leans on for fact-fact
joins: with adaptive execution on, a join whose shuffle has one hot key
gets its skewed partition SPLIT at runtime — the executed plan's
SortMergeJoin is marked ``skew=true`` — with results identical to the
non-adaptive join. If a Spark upgrade or a session-conf change silently
disabled skew handling, this fails loud.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_warehouse_spark.plans.audit import formatted_plan

_N = 200_000


def _skewed_sides(spark):
    # 90% of the left side lands on key 0 — one pathological reducer.
    # md5 payloads defeat shuffle compression: skew detection compares
    # partition BYTES, and a constant-key bigint column compresses so
    # well the hot partition can slip under any realistic threshold.
    left = spark.range(_N).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.col("id"))
        .alias("k"),
        F.md5(F.col("id").cast("string")).alias("v"),
    )
    right = spark.range(_N).select(
        F.col("id").alias("k"),
        F.md5((F.col("id") * 2).cast("string")).alias("w"),
    )
    return left, right


def test_aqe_splits_skewed_partition(spark):
    c = spark.conf
    saved = {
        k: c.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.shuffle.partitions",
        )
    }
    try:
        c.set("spark.sql.adaptive.enabled", "true")
        # force a shuffle join; thresholds scaled down so the test-sized
        # hot partition (a few MB) counts as skewed
        c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        c.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "256KB",
        )
        c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")
        c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        c.set("spark.sql.shuffle.partitions", "8")
        left, right = _skewed_sides(spark)
        joined = left.join(right, "k")
        # collect() executes joined's OWN queryExecution — wrapping it in
        # an agg/count/first builds a NEW limited plan and leaves this
        # one unfinalized (isFinalPlan=false, no skew markers)
        rows = joined.collect()
        # every left row matches exactly one right row
        assert len(rows) == _N
        plan = formatted_plan(joined)
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            c.set(k, v)
