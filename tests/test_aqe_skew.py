"""AQE runtime skew-join evidence: j9/a12 prove the MANUAL salting
pattern; this proves the engine's declarative plans also get Spark's
RUNTIME answer — AQE's OptimizeSkewedJoin observing actual map-output
sizes and splitting the hot partition — under the conf stack
session.tune() relies on (adaptive.enabled stays on everywhere).

At 100 TB the division of labor is: salting for skew you can predict
(hot keys known at design time, j9's shape), AQE for skew you cannot
(it re-plans from runtime statistics with zero code change). The test
pins that the second lever actually fires in this Spark build: the
executed SortMergeJoin must carry `skew=true` after one hot key
dominates the shuffle."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F


@contextmanager
def _scoped_conf(spark, confs: dict[str, str]):
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_the_skewed_partition(spark):
    confs = {
        # force the SMJ path (skew handling never applies to broadcast)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # thresholds scaled to a unit-test shuffle: a partition is skewed
        # when > factor × median AND > threshold bytes; the hot key's
        # partition clears both, the advisory size forces a real split
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        # isolate the lever under test: coalescing is the other AQE
        # shuffle rewrite and it muddies the read-node assertions
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.shuffle.partitions": "8",
    }
    with _scoped_conf(spark, confs):
        # one pathological key (0) carrying ~83% of the left side — the
        # exact shape that stalls a static plan on one straggler task
        left = spark.range(1_200_000).select(
            F.when(F.col("id") < 1_000_000, F.lit(0))
            .otherwise(F.col("id") % 37 + 1)
            .alias("k"),
            F.col("id").alias("lv"),
        )
        right = spark.range(38).select(
            F.col("id").alias("k"), F.col("id").alias("rv")
        )
        # collect() must run THIS frame's own execution (a .count() or
        # an agg on top plans a new execution, and the agg's required
        # distribution suppresses the skew split — observed in this
        # build). The crc32 predicate references both sides so it can't
        # push below the join, executes the full join, and keeps the
        # collected result empty.
        joined = left.join(right, "k").where(
            F.crc32(F.concat_ws(",", "lv", "rv")) < 0
        )
        assert joined.collect() == []
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        # the join node itself is marked, and the hot side's shuffle
        # read shows the runtime split
        assert "skew=true" in plan, plan
        assert "AQEShuffleRead skewed" in plan, plan
