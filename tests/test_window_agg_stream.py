"""Streaming windowed-sum (a1s) invariants: merge is order-independent
and retry-idempotent, so the compacted log equals the one-pass a1 query
at ANY batch split — including splits that put the same window in every
batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_warehouse_spark.registry import QUERY_REGISTRY, query_map
from real_time_data_warehouse_spark.streaming.window_agg import (
    apply_window_batch,
    compact_window_log,
)
from real_time_data_warehouse_spark.tables import Tables
from tests.conftest import SF_DIR

query_map()


def _expected(spark):
    return {
        (r["stt"], r["sku_group"]): (r["order_amount"], r["order_ct"])
        for r in QUERY_REGISTRY["a1_windowed_sum"].fn(spark, SF_DIR).collect()
    }


def _got(spark, out):
    return {
        (r["stt"], r["sku_group"]): (r["order_amount"], r["order_ct"])
        for r in compact_window_log(spark, out).collect()
    }


def _replay(spark, tmp_path, n_batches, key, retry_last=False):
    ev = (
        Tables(spark, SF_DIR)
        .events.select("event_id", "ts", "event_type", "value", "user_id")
        .localCheckpoint(eager=True)
    )
    state = str(tmp_path / f"state_{key}")
    out = str(tmp_path / f"out_{key}")
    for b in range(n_batches):
        # modulo split: EVERY batch carries events from every window —
        # the adversarial case for cross-batch merging (the replay
        # query's range split is the easy case)
        batch = ev.where(F.col("event_id") % n_batches == b)
        apply_window_batch(spark, batch, b, state, out)
        if retry_last and b == n_batches - 1:
            apply_window_batch(spark, batch, b, state, out)
    return _got(spark, out)


def test_modulo_split_matches_one_pass(spark, tmp_path):
    exp = _expected(spark)
    assert _replay(spark, tmp_path, 3, "m3") == exp


def test_retry_is_idempotent(spark, tmp_path):
    assert _replay(spark, tmp_path, 4, "r4", retry_last=True) == _expected(spark)


def test_w11_last_step_equals_cycle_totals(spark):
    """CUMULATE invariant: window k=6 spans the whole 6 h cycle, so its
    totals must equal a plain 6 h tumble — and each earlier step is a
    prefix (monotone non-decreasing counts)."""
    rows = QUERY_REGISTRY["w11_cumulate_window"].fn(spark, SF_DIR).collect()
    by_cycle = {}
    for r in rows:
        by_cycle.setdefault(r["stt"], []).append(
            (r["edt"], r["event_ct"], round(r["value_sum"], 2))
        )
    ev = Tables(spark, SF_DIR).events
    from real_time_data_warehouse_spark.functions.money import dec

    tumble6 = (
        ev.groupBy(
            F.date_format(
                F.timestamp_seconds(
                    (F.floor(F.col("ts").cast("double") / 21600) * 21600)
                    .cast("bigint")
                ),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("stt")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value")).cast("double").alias("s"),
        )
        .collect()
    )
    exp = {r["stt"]: (r["n"], round(r["s"], 2)) for r in tumble6}
    for stt, steps in by_cycle.items():
        steps.sort()
        counts = [n for _, n, _ in steps]
        assert counts == sorted(counts), "cumulate counts must be monotone"
        last = steps[-1]
        assert (last[1], last[2]) == exp[stt]


# --- a5s distinct-count replay invariants ---------------------------------


def test_a5s_modulo_split_and_retry(spark, tmp_path):
    """DISTINCT partials: repeat users across batches must not
    double-count (the failure mode of naive count merging) — the
    adversarial modulo split puts every user in every batch; a retried
    batch must also change nothing."""
    from real_time_data_warehouse_spark.streaming.distinct_agg import (
        apply_distinct_batch,
        compact_distinct_log,
    )

    exp = {
        (r["cur_date"], r["event_type"]): r["uu_ct"]
        for r in QUERY_REGISTRY["a5_windowed_uu"].fn(spark, SF_DIR).collect()
    }
    ev = (
        Tables(spark, SF_DIR)
        .events.select("event_id", "user_id", "ts", "event_type")
        .localCheckpoint(eager=True)
    )
    state, out = str(tmp_path / "a5s_state"), str(tmp_path / "a5s_out")
    n = 4
    for b in range(n):
        batch = ev.where(F.col("event_id") % n == b)
        apply_distinct_batch(spark, batch, b, state, out)
        if b == n - 1:
            apply_distinct_batch(spark, batch, b, state, out)
    got = {
        (r["cur_date"], r["event_type"]): r["uu_ct"]
        for r in compact_distinct_log(spark, out).collect()
    }
    assert got == exp
