"""z1 z-order layout: the two claims that make the rewrite worth it.

1. Rectangle bound — every z-file spans ≤ 1/16 of the domain (+ one
   quantization cell of slack) in BOTH dimensions simultaneously.
2. No 1-D sort can do that — the contrast layout (same file count,
   sorted by custkey alone) leaves most files spanning nearly the whole
   date domain, which is exactly the scan min/max stats can't prune.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_data_warehouse_spark.operators.layout import zorder_file_stats
from real_time_data_warehouse_spark.tables import Tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return Tables(spark, SF_DIR).orders.localCheckpoint(eager=True)


def _domain(orders):
    r = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")),
    ).collect()[0]
    return r[1] - r[0], r[2]  # custkey span, day span


def test_zorder_files_bounded_in_both_dims(spark, orders):
    ck_span, day_span = _domain(orders)
    stats = zorder_file_stats(orders, "o_custkey", "o_orderdate").collect()
    assert len(stats) > 64  # 256 z-files minus empties
    # top-4 bits of each 8-bit cell are fixed per file → ≤ 16 cells per
    # dim → span ≤ domain/16 + one cell (domain/256) of slack
    ck_bound = ck_span / 16 + ck_span / 256 + 1
    day_bound = day_span / 16 + day_span / 256 + 1
    for r in stats:
        assert r["max_custkey"] - r["min_custkey"] <= ck_bound, r
        assert r["max_day"] - r["min_day"] <= day_bound, r


def test_one_dim_sort_cannot_bound_the_other_dim(spark, orders):
    ck_span, day_span = _domain(orders)
    n_files = 256
    by_ck = orders.select(
        F.ntile(n_files)
        .over(__import__("pyspark").sql.Window.orderBy("o_custkey"))
        .alias("file_id"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("date")
        ).alias("day"),
    )
    spans = (
        by_ck.groupBy("file_id")
        .agg((F.max("day") - F.min("day")).alias("dspan"))
        .agg(F.avg("dspan"))
        .collect()[0][0]
    )
    # custkey-sorted files see nearly the whole date domain on average —
    # worse than half of it; z-order files are bounded at ~1/16 + slack
    assert spans > day_span * 0.5


def test_morton16_is_bijective_and_monotone_per_dim():
    """morton16 must be a bijection on 8-bit pairs (no two cells share a
    z-key) and restricting one coordinate must keep the other ordered —
    the properties the file-span bound rests on. Checked exhaustively
    JVM-side over all 65536 cells."""
    from pyspark.sql import functions as F

    from real_time_data_warehouse_spark.operators.layout import morton16

    import pytest

    spark = pytest.importorskip("pyspark.sql").SparkSession.getActiveSession()
    if spark is None:
        pytest.skip("needs active session from conftest")
    grid = spark.range(256).select(
        F.col("id").alias("x")
    ).crossJoin(spark.range(256).select(F.col("id").alias("y")))
    z = grid.select("x", "y", morton16(F.col("x"), F.col("y")).alias("z"))
    n_distinct = z.select("z").distinct().count()
    assert n_distinct == 256 * 256
    mm = z.agg(F.min("z"), F.max("z")).collect()[0]
    assert mm[0] == 0 and mm[1] == 65535


def test_z4_snapshot_diff_classification(spark):
    from real_time_data_warehouse_spark.operators.layout import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "c"), (4, None, "d")],
        "k long, v int, s string",
    )
    new = spark.createDataFrame(
        [(2, 20, "b"), (3, 31, "c"), (4, None, "d"), (5, 50, "e")],
        "k long, v int, s string",
    )
    rows = {
        r["k"]: r
        for r in snapshot_diff(old, new, "k", ["v", "s"]).collect()
    }
    assert set(rows) == {1, 3, 5}  # unchanged 2 and null-equal 4 dropped
    assert rows[1]["change_type"] == "delete"
    assert rows[1]["old_v"] == 10 and rows[1]["new_v"] is None
    assert rows[3]["change_type"] == "update"
    assert rows[3]["old_v"] == 30 and rows[3]["new_v"] == 31
    assert rows[5]["change_type"] == "insert"
    assert rows[5]["new_s"] == "e" and rows[5]["old_s"] is None
