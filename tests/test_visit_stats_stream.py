"""Batch ≡ stream for the traffic-stats appliers
(streaming/visit_stats.py): ST4 daily UV (order-free membership set —
must match under hash splits too) and ST6 session counting
(carried-last_ts contract — time-ascending splits), plus retry
idempotence and planted gap cases."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from real_time_data_warehouse_spark.registry import QUERY_REGISTRY, query_map
from real_time_data_warehouse_spark.streaming.visit_stats import (
    apply_daily_uv_batch,
    apply_session_count_batch,
    compact_daily_uv_log,
    compact_session_log,
)
from real_time_data_warehouse_spark.tables import Tables
from tests.conftest import SF_DIR

query_map()


def _events(spark):
    return (
        Tables(spark, SF_DIR)
        .events.select("event_id", "user_id", "ts")
        .localCheckpoint(eager=True)
    )


def _id_batches(ev, n):
    span = ev.agg(F.max("event_id")).first()[0] + 1
    return [
        ev.where(
            (F.col("event_id") >= span * b // n)
            & (F.col("event_id") < span * (b + 1) // n)
        )
        for b in range(n)
    ]


def _time_batches(ev, n):
    lo = ev.agg(F.min("ts")).first()[0]
    span = (ev.agg(F.max("ts")).first()[0] - lo).total_seconds() + 1
    sec = F.col("ts").cast("double") - F.lit(lo).cast("timestamp").cast(
        "double"
    )
    return [
        ev.where((sec >= span * b / n) & (sec < span * (b + 1) / n))
        for b in range(n)
    ]


def _run(spark, tmp_path, batches, apply_fn, compact_fn, tag, retry=False):
    state = str(tmp_path / f"vs_state_{tag}")
    out = str(tmp_path / f"vs_out_{tag}")
    for b, batch in enumerate(batches):
        apply_fn(spark, batch, b, state, out)
        if retry and b == len(batches) - 1:
            apply_fn(spark, batch, b, state, out)
    return compact_fn(spark, out)


# --- ST4 daily UV ----------------------------------------------------------


def _st4_expected(spark):
    return {
        (r.cur_date, r.uv_ct)
        for r in QUERY_REGISTRY["st4_first_per_day_uv"]
        .fn(spark, SF_DIR)
        .collect()
    }


def test_daily_uv_replay_any_split(spark, tmp_path):
    ev = _events(spark)
    for tag, batches in (
        ("one", [ev]),
        ("id3", _id_batches(ev, 3)),
        ("hash", [ev.where(F.col("event_id") % 3 == b) for b in range(3)]),
    ):
        got = {
            (r.cur_date, r.uv_ct)
            for r in _run(
                spark, tmp_path, batches,
                apply_daily_uv_batch, compact_daily_uv_log, tag,
            ).collect()
        }
        assert got == _st4_expected(spark), tag


def test_daily_uv_retry_idempotent(spark, tmp_path):
    ev = _events(spark)
    got = {
        (r.cur_date, r.uv_ct)
        for r in _run(
            spark, tmp_path, _id_batches(ev, 2),
            apply_daily_uv_batch, compact_daily_uv_log, "retry", retry=True,
        ).collect()
    }
    assert got == _st4_expected(spark)


# --- ST6 session count -----------------------------------------------------


def _st6_expected(spark):
    return {
        (r.user_id, r.session_ct)
        for r in QUERY_REGISTRY["st6_session_count"].fn(spark, SF_DIR).collect()
    }


def test_session_count_replay_time_splits(spark, tmp_path):
    ev = _events(spark)
    for n in (1, 4):
        got = {
            (r.user_id, r.session_ct)
            for r in _run(
                spark, tmp_path, _time_batches(ev, n),
                apply_session_count_batch, compact_session_log, f"t{n}",
            ).collect()
        }
        assert got == _st6_expected(spark), n


def test_session_count_retry_idempotent(spark, tmp_path):
    ev = _events(spark)
    got = {
        (r.user_id, r.session_ct)
        for r in _run(
            spark, tmp_path, _time_batches(ev, 3),
            apply_session_count_batch, compact_session_log, "retry",
            retry=True,
        ).collect()
    }
    assert got == _st6_expected(spark)


def test_session_count_planted_gaps(spark, tmp_path):
    """A gap straddling the batch boundary must count exactly once:
    u1 has a >30-min gap ACROSS batches (2 sessions), u2 a <=30-min
    cross-batch gap (1 session), u3 two sessions inside one batch."""
    t0 = datetime.datetime(2024, 1, 1)
    m = datetime.timedelta(minutes=1)
    rows = [
        (1, 1, t0), (2, 1, t0 + 40 * m),          # u1: gap 40 min
        (3, 2, t0 + 5 * m), (4, 2, t0 + 30 * m),  # u2: gap 25 min
        (5, 3, t0), (6, 3, t0 + 2 * m), (7, 3, t0 + 50 * m),  # u3
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    batches = [
        ev.where(F.col("ts") < t0 + 20 * m),
        ev.where(F.col("ts") >= t0 + 20 * m),
    ]
    got = {
        (r.user_id, r.session_ct)
        for r in _run(
            spark, tmp_path, batches,
            apply_session_count_batch, compact_session_log, "planted",
        ).collect()
    }
    assert got == {(1, 2), (2, 1), (3, 2)}
