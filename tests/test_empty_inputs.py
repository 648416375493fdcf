"""Empty-input hardening: every exposed operator body must return an
EMPTY, correctly-schemaed frame on empty input — not raise. At 100 TB
empty partitions, empty micro-batches, and freshly-created tables are
daily events; a body that throws on zero rows kills the whole job."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def _empty_events(spark):
    return spark.createDataFrame(
        [], "user_id long, ts timestamp, value double, event_id long"
    )


def test_substring_ops_on_empty_corpus(spark):
    from real_time_data_warehouse_spark.operators.dedup import (
        substring_span_stats,
        substring_strip,
    )

    assert substring_span_stats(_empty_docs(spark)).count() == 0
    assert substring_strip(_empty_docs(spark)).count() == 0


def test_text_ops_on_empty_corpus(spark):
    from real_time_data_warehouse_spark.operators.textanalysis import pii_audit

    out = pii_audit(_empty_docs(spark))
    assert out.count() == 0
    assert "redacted" in out.columns


def test_sessionize_on_empty_stream(spark):
    from real_time_data_warehouse_spark.operators.stateful import (
        sessionize_events,
    )

    assert sessionize_events(_empty_events(spark)).count() == 0


def test_knn_ops_on_empty_collection(spark):
    from real_time_data_warehouse_spark.operators.retrieval import (
        hard_negative_pairs,
        knn_label_vote,
    )

    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )
    assert knn_label_vote(emb, sample_mod=10, k=3).count() == 0
    assert hard_negative_pairs(emb, sample_mod=10, k=3).count() == 0


def test_audio_stats_on_empty_batch(spark):
    from real_time_data_warehouse_spark.operators.multimodal import (
        audio_energy_stats,
    )

    audio = spark.createDataFrame([], "doc_id long, payload binary")
    assert audio_energy_stats(audio).count() == 0


def test_streaming_batches_accept_empty_micro_batch(spark, tmp_path):
    """An empty micro-batch mid-stream must be a no-op that still
    snapshots state (the availableNow trigger can deliver them)."""
    from real_time_data_warehouse_spark.streaming.sessionize import (
        apply_session_batch,
        compact_session_log,
    )
    from real_time_data_warehouse_spark.streaming.window_agg import (
        apply_window_batch,
        compact_window_log,
    )

    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0, 1, "click")],
        "user_id long, ts string, value double, event_id long, event_type string",
    ).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"),
        "value", "event_id", "event_type",
    )
    empty = ev.limit(0)

    s_state, s_out = str(tmp_path / "ss"), str(tmp_path / "so")
    apply_session_batch(spark, ev, 0, s_state, s_out)
    apply_session_batch(spark, empty, 1, s_state, s_out)
    assert compact_session_log(spark, s_out).count() == 1

    w_state, w_out = str(tmp_path / "ws"), str(tmp_path / "wo")
    apply_window_batch(spark, ev, 0, w_state, w_out)
    apply_window_batch(spark, empty, 1, w_state, w_out)
    assert compact_window_log(spark, w_out).count() == 1


def test_join_and_distinct_batches_accept_empty_micro_batch(spark, tmp_path):
    """Empty micro-batches through the join/distinct appliers: state
    must carry through unchanged and the compacted output must equal
    the run without the empty batch."""
    from real_time_data_warehouse_spark.streaming.distinct_agg import (
        apply_distinct_batch,
        compact_distinct_log,
    )
    from real_time_data_warehouse_spark.streaming.joins import (
        apply_interval_join_batch,
        apply_left_outer_batch,
        finalize_left_outer,
        read_interval_join_log,
    )

    ev = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 00:00:00", "click"),
            (2, 10, "2024-01-01 00:10:00", "purchase"),
            (3, 11, "2024-01-01 01:00:00", "click"),
        ],
        "event_id long, user_id long, ts string, event_type string",
    ).select(
        "event_id", "user_id",
        F.col("ts").cast("timestamp").alias("ts"), "event_type",
    )
    empty = ev.limit(0)

    # interval join: batch 1 is empty mid-stream
    st, out = str(tmp_path / "ij_s"), str(tmp_path / "ij_o")
    apply_interval_join_batch(spark, ev.where(F.col("event_id") <= 2), 0, st, out)
    apply_interval_join_batch(spark, empty, 1, st, out)
    apply_interval_join_batch(spark, ev.where(F.col("event_id") == 3), 2, st, out)
    got = {
        (r["pay_id"], r["prior_events"])
        for r in read_interval_join_log(spark, out).collect()
    }
    assert got == {(2, 1)}  # the purchase saw one prior click

    # left outer: empty batch then the far-future click expires nothing
    out2 = str(tmp_path / "loj_o")
    apply_left_outer_batch(spark, ev.where(F.col("event_id") <= 2), 0, out2)
    apply_left_outer_batch(spark, empty, 1, out2)
    apply_left_outer_batch(spark, ev.where(F.col("event_id") == 3), 2, out2)
    rows = {
        (r["order_id"], r["pay_id"])
        for r in finalize_left_outer(spark, out2).collect()
    }
    assert rows == {(1, 2), (3, None)}

    # distinct: empty batch leaves counts untouched
    st3, out3 = str(tmp_path / "uu_s"), str(tmp_path / "uu_o")
    apply_distinct_batch(spark, ev, 0, st3, out3)
    apply_distinct_batch(spark, empty, 1, st3, out3)
    got3 = {
        (r["cur_date"], r["event_type"]): r["uu_ct"]
        for r in compact_distinct_log(spark, out3).collect()
    }
    assert got3 == {
        ("2024-01-01", "click"): 2,
        ("2024-01-01", "purchase"): 1,
    }


def test_char_entropy_on_empty_corpus(spark):
    from real_time_data_warehouse_spark.operators.textanalysis import (
        char_entropy_frame,
    )

    out = char_entropy_frame(_empty_docs(spark))
    assert out.count() == 0
    assert out.columns == [
        "doc_id", "n_chars", "n_unique_chars", "char_entropy",
    ]


def test_last_wins_applier_on_empty_batch(spark, tmp_path):
    """An empty micro-batch mid-stream must fold as a no-op: state
    survives, the batch's output partition is empty, compaction still
    returns the pre-gap winners."""
    from real_time_data_warehouse_spark.streaming.last_wins import (
        apply_last_wins_batch,
        compact_last_wins_log,
    )

    ev = spark.createDataFrame(
        [(1, 1, "a", None, 2.0)],
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    ).withColumn("ts", F.lit("2024-01-01 00:00:00").cast("timestamp"))
    empty = ev.where(F.lit(False))
    state = str(tmp_path / "lw_state")
    out = str(tmp_path / "lw_out")
    apply_last_wins_batch(spark, ev, 0, state, out)
    apply_last_wins_batch(spark, empty, 1, state, out)
    rows = compact_last_wins_log(spark, out).collect()
    assert [(r.user_id, r.event_type, r.last_event_id) for r in rows] == [
        (1, "a", 1)
    ]


def test_prefix_sum_queries_on_empty_tables(spark, tmp_path):
    """a18/t14 derive bucket bounds from a driver fetch — on an empty
    table that fetch is NULL and must degrade to an empty result, not a
    TypeError."""
    import os

    from real_time_data_warehouse_spark.registry import (
        QUERY_REGISTRY,
        query_map,
    )

    query_map()
    sf = str(tmp_path / "sf_empty")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(sf, "events.parquet"))
    spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    a18 = QUERY_REGISTRY["a18_running_total"].fn(spark, sf)
    assert a18.count() == 0
    assert a18.columns == ["event_id", "cum_cnt", "cum_amount"]
    t14 = QUERY_REGISTRY["t14_vocab_growth"].fn(spark, sf)
    assert t14.count() == 0
    assert t14.columns == ["doc_id", "cum_tokens", "cum_vocab"]


def test_replay_harness_on_empty_stream(spark, tmp_path, monkeypatch):
    """The replay twins must degrade to empty results on an empty
    events table (max(id) is NULL there), like every other operator."""
    import os

    from real_time_data_warehouse_spark.registry import (
        QUERY_REGISTRY,
        query_map,
    )

    query_map()
    sf = str(tmp_path / "sf_empty_replay")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(sf, "events.parquet"))
    for name in (
        "st1s_dedup_last_wins_replay",
        "st4s_daily_uv_replay",
        "st6s_session_count_replay",
    ):
        out = QUERY_REGISTRY[name].fn(spark, sf)
        assert out.count() == 0, name
