"""Bucketed (co-located) tables — the zero-shuffle fact⋈fact join.

SCALE.md's J1-J4 posture says: at 100 TB, pre-bucket both fact tables by
the join key and the per-query shuffle disappears — every executor joins
its local buckets. This module is that claim made executable: write a
DataFrame as a bucketed+sorted parquet table (Spark's bucketing metadata
lives in the session/metastore catalog), and a subsequent equi-join of
two tables bucketed into the SAME bucket count on the join key plans a
SortMergeJoin with NO Exchange and NO per-query Sort
(tests/test_bucketing.py asserts exactly that shape, plus result parity
with the shuffled join).

The reference has no analog — Flink co-partitions streams implicitly by
keyBy on every hop (a network shuffle per job, every time the job runs).
Bucketing amortizes that shuffle ONCE at write time; the cost model flips
whenever a fact table is joined on the same key by many queries, which
is exactly the DWD→DWS fan-out shape of the reference warehouse (one
order_detail table feeding seven windowed aggregations by key).

Spark-side constraints this module encodes rather than documents:
- bucket counts on both sides must match (or be integer multiples);
- ``sortBy`` at write time is what removes the per-query Sort under
  SortMergeJoin — bucketing alone only removes the Exchange;
- bucketed tables must be read through the catalog (``spark.table``),
  not ``spark.read.parquet`` — the path loses the bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    buckets: int,
    path: str,
    overwrite: bool = True,
) -> None:
    """Persist *df* as an external bucketed+sorted parquet table at
    *path*, registered in the session catalog as *name*. The one-time
    shuffle this write performs is the shuffle every later same-key join
    skips."""
    spark = df.sparkSession
    if overwrite and spark.catalog.tableExists(name):
        spark.sql(f"DROP TABLE {name}")
    (
        # repartition on the key into exactly `buckets` tasks: Spark's
        # repartition hash == the bucketing hash, so every bucket lands
        # in ONE file — the precondition for the read side to trust the
        # write-time sort (multiple files per bucket silently degrade
        # the scan to unsorted and a per-query Sort reappears under
        # SortMergeJoin). At 100 TB "one file per bucket" is per
        # partition of a partitioned table, with the bucket count
        # sized to the target file size.
        df.repartition(buckets, df[key])
        .write.format("parquet")
        .mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(name)
    )


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read — REQUIRED for the bucket metadata to reach the
    planner (a plain parquet path read silently degrades to shuffling)."""
    return spark.table(name)
