"""Structured Streaming shells for the reference's pipeline topologies.

Design rule (SURVEY.md §7.1): every transformation is a pure
DataFrame→DataFrame function usable under both ``spark.read`` (oracle/batch
mode) and ``spark.readStream`` (real-time mode). The streaming tests assert
stream-vs-batch equivalence of the same transform — Structured Streaming
guarantees it for these operator classes.
"""

from real_time_data_warehouse_spark.streaming.pipelines import (  # noqa: F401
    dws_windowed_agg,
    log_split,
    stream_events,
)
