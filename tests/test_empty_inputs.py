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
