"""Incremental interval join (j4s) invariants: any time-range split
reproduces the one-pass j4 result, retried batches change nothing, and
state stays bounded to the lookback window (the watermark claim)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from real_time_data_warehouse_spark.registry import QUERY_REGISTRY, query_map
from real_time_data_warehouse_spark.streaming.joins import (
    _IJ_LOOKBACK_S,
    apply_interval_join_batch,
    read_interval_join_log,
)
from real_time_data_warehouse_spark.tables import Tables
from tests.conftest import SF_DIR

query_map()


def _expected(spark):
    return {
        r["pay_id"]: r["prior_events"]
        for r in QUERY_REGISTRY["j4_interval_join"].fn(spark, SF_DIR).collect()
    }


def _replay(spark, tmp_path, n_batches, key, retry_last=False):
    ev = (
        Tables(spark, SF_DIR)
        .events.select("event_id", "user_id", "ts", "event_type")
        .localCheckpoint(eager=True)
    )
    lo_ts, hi_ts = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (hi_ts - lo_ts).total_seconds() + 1
    state = str(tmp_path / f"state_{key}")
    out = str(tmp_path / f"out_{key}")
    for b in range(n_batches):
        lo = span * b / n_batches
        hi = span * (b + 1) / n_batches
        sec = F.col("ts").cast("double") - F.lit(lo_ts).cast("double")
        batch = ev.where((sec >= lo) & (sec < hi))
        apply_interval_join_batch(spark, batch, b, state, out)
        if retry_last and b == n_batches - 1:
            apply_interval_join_batch(spark, batch, b, state, out)
    got = {
        r["pay_id"]: r["prior_events"]
        for r in read_interval_join_log(spark, out).collect()
    }
    return got, state


def test_any_time_split_matches_one_pass(spark, tmp_path):
    exp = _expected(spark)
    got3, _ = _replay(spark, tmp_path, 3, "s3")
    got7, _ = _replay(spark, tmp_path, 7, "s7")
    assert got3 == exp
    assert got7 == exp


def test_retry_idempotent_and_state_bounded(spark, tmp_path):
    exp = _expected(spark)
    got, state_dir = _replay(spark, tmp_path, 4, "r4", retry_last=True)
    assert got == exp
    # eviction: every snapshot holds only the trailing lookback window
    for name in os.listdir(state_dir):
        snap = spark.read.parquet(os.path.join(state_dir, name))
        lo, hi = snap.agg(F.min("ts"), F.max("ts")).first()
        if lo is not None:
            assert (hi - lo).total_seconds() <= _IJ_LOOKBACK_S


# --- j2s left-outer replay invariants -------------------------------------


def _loj_expected(spark):
    from collections import Counter

    # the j2s batch semantics computed directly in Spark (one pass)
    ev = Tables(spark, SF_DIR).events.select(
        "event_id", "user_id", "ts", "event_type"
    )
    o = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("order_id"),
        F.col("user_id").alias("o_user"),
        F.col("ts").alias("o_ts"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pay_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    j = o.join(
        p,
        (F.col("o_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("o_ts"))
        & (F.col("p_ts") <= F.col("o_ts") + F.expr("INTERVAL 30 MINUTES")),
        "left",
    ).select("order_id", "pay_id")
    return Counter((r["order_id"], r["pay_id"]) for r in j.collect())


def _loj_replay(spark, tmp_path, n_batches, key, retry_last=False):
    from collections import Counter

    from real_time_data_warehouse_spark.streaming.joins import (
        apply_left_outer_batch,
        finalize_left_outer,
    )

    ev = (
        Tables(spark, SF_DIR)
        .events.select("event_id", "user_id", "ts", "event_type")
        .localCheckpoint(eager=True)
    )
    lo_ts = ev.agg(F.min("ts")).first()[0]
    span = (
        ev.agg(F.max("ts")).first()[0] - lo_ts
    ).total_seconds() + 1
    out = str(tmp_path / f"loj_{key}")
    for b in range(n_batches):
        sec = F.col("ts").cast("double") - F.lit(lo_ts).cast("double")
        batch = ev.where(
            (sec >= span * b / n_batches) & (sec < span * (b + 1) / n_batches)
        )
        apply_left_outer_batch(spark, batch, b, out)
        if retry_last and b == n_batches - 1:
            apply_left_outer_batch(spark, batch, b, out)
    return Counter(
        (r["order_id"], r["pay_id"])
        for r in finalize_left_outer(spark, out).collect()
    )


def test_left_outer_any_split_matches_one_pass(spark, tmp_path):
    """Null-padded rows must appear exactly once (neither dropped at
    expiry nor duplicated by the end-of-stream flush), matched pairs
    exactly once, at any batch granularity."""
    exp = _loj_expected(spark)
    assert _loj_replay(spark, tmp_path, 3, "s3") == exp
    assert _loj_replay(spark, tmp_path, 6, "s6") == exp


def test_left_outer_retry_idempotent(spark, tmp_path):
    assert _loj_replay(spark, tmp_path, 4, "r4", retry_last=True) == _loj_expected(spark)
