"""Co-located bucketed join: the SCALE.md J1-J4 claim made executable.

Writes lineitem and orders bucketed by the join key, then asserts the
equi-join of the two bucketed tables plans with ZERO shuffle exchanges
and no per-query Sort (write-time sortBy carries the order), while
producing byte-identical results to the shuffled join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_data_warehouse_spark.bucketing import (
    read_bucketed,
    write_bucketed,
)
from real_time_data_warehouse_spark.plans.audit import (
    formatted_plan,
    shuffle_count,
    sort_merge_join_count,
)
from real_time_data_warehouse_spark.tables import Tables
from tests.conftest import SF_DIR

_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    t = Tables(spark, SF_DIR)
    write_bucketed(
        t.lineitem.select("l_orderkey", "l_quantity", "l_extendedprice"),
        "li_b", "l_orderkey", _BUCKETS, str(base / "li"),
    )
    write_bucketed(
        t.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "ord_b", "o_orderkey", _BUCKETS, str(base / "ord"),
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def _joined(spark):
    li = read_bucketed(spark, "li_b")
    od = read_bucketed(spark, "ord_b")
    return li.join(od, li.l_orderkey == od.o_orderkey).select(
        "l_orderkey", "l_quantity", "l_extendedprice", "o_custkey",
        "o_totalprice",
    )


def test_bucketed_join_has_zero_shuffles(bucketed):
    """Both sides bucketed into the same count on the join key → the
    SortMergeJoin consumes bucket-local data: no Exchange at all, and
    the write-time sortBy removes the per-query Sort too."""
    spark = bucketed
    # force the SMJ path: the point is the exchange-free shuffle join
    # (broadcast would trivially have no shuffle and prove nothing)
    with _no_broadcast(spark):
        df = _joined(spark)
        assert sort_merge_join_count(df) == 1, formatted_plan(df)
        assert shuffle_count(df) == 0, formatted_plan(df)
        plan = formatted_plan(df)
        tree = plan.split("\n\n")[0]
        # codegen renders sort nodes as "* Sort" — match the node name
        # with its id suffix so the assert can't pass vacuously (it did,
        # pre-round-6, when written as "+- Sort")
        assert " Sort (" not in tree, plan


def test_bucketed_join_matches_shuffled_join(bucketed):
    """Result parity: bucketing changes the plan, never the answer."""
    spark = bucketed
    t = Tables(spark, SF_DIR)
    plain = (
        t.lineitem.join(
            t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
        )
        .first()
    )
    with _no_broadcast(spark):
        b = (
            _joined(spark)
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
            )
            .first()
        )
    assert (plain.n, plain.q) == (b.n, b.q)


def test_j12_registry_row_keeps_colocated_smj_shape(spark):
    """The DRIVER-BENCHED j12 row itself — not just this module's
    fixture — must keep the co-located SortMergeJoin shape under the
    engine's normal conf stack (broadcast enabled, AQE on). Round-10
    drift adjudication found the planner had silently switched the row
    to BroadcastHashJoin once the orders side slipped under the
    broadcast threshold at bench scale — shuffle-free but proving
    nothing about bucketing, and the source of the j12 drift line. The
    hint('merge') in the operator pins the path; this test pins the
    hint."""
    from real_time_data_warehouse_spark.operators.joins import (
        j12_bucketed_join,
    )

    df = j12_bucketed_join(spark, SF_DIR)
    plan = formatted_plan(df)
    tree = plan.split("\n\n")[0]
    assert sort_merge_join_count(df) == 1, plan
    assert "BroadcastHashJoin" not in tree, plan
    # exactly ONE exchange: the partial→final aggregation on the
    # 5-value priority key. The JOIN contributes zero — both inputs
    # are bucket-local scans — and the write-time sortBy means no
    # per-query Sort below the join either.
    assert shuffle_count(df) == 1, plan
    join_subtree = tree[tree.index("SortMergeJoin"):]
    assert "Exchange" not in join_subtree, plan
    assert " Sort (" not in join_subtree, plan


def test_path_read_loses_bucketing(bucketed, tmp_path_factory):
    """The documented failure mode: reading the same files via
    spark.read.parquet drops the bucket metadata — the join shuffles
    again. Pinned so nobody 'simplifies' read_bucketed to a path read."""
    spark = bucketed
    loc = (
        spark.sql("DESCRIBE FORMATTED li_b")
        .where(F.col("col_name") == "Location")
        .first()[1]
    )
    li_path = spark.read.parquet(loc)
    od = read_bucketed(spark, "ord_b")
    with _no_broadcast(spark):
        df = li_path.join(od, li_path.l_orderkey == od.o_orderkey)
        assert shuffle_count(df) >= 1


class _no_broadcast:
    """Temporarily disable broadcast joins + AQE so the planner must show
    its shuffle strategy (AQE's local-shuffle-read rewrites would blur
    the exchange count the test is about)."""

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        c = self.spark.conf
        self.saved = (
            c.get("spark.sql.autoBroadcastJoinThreshold"),
            c.get("spark.sql.adaptive.enabled"),
        )
        c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        c.set("spark.sql.adaptive.enabled", "false")
        return self.spark

    def __exit__(self, *exc):
        c = self.spark.conf
        c.set("spark.sql.autoBroadcastJoinThreshold", self.saved[0])
        c.set("spark.sql.adaptive.enabled", self.saved[1])
        return False
