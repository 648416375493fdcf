"""Streaming observability: progress metrics to a JSONL audit log.

The reference has no monitoring beyond .print() smoke checks; production
streaming needs per-batch telemetry (rows, watermark, state size, lag).
Spark exposes all of it via StreamingQueryListener — this sink appends one
JSON line per completed micro-batch, the input to any metrics shipper.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressLogListener(StreamingQueryListener):
    """Append one JSONL record per micro-batch: batch id, input rows,
    processed-per-second, watermark, and state-store totals."""

    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        ops = p.stateOperators or []
        rec = {
            "query_id": str(p.id),
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "processed_rows_per_sec": p.processedRowsPerSecond,
            "watermark": (p.eventTime or {}).get("watermark"),
            # sum across ALL stateful operators (outer joins report two;
            # the second is usually the growth culprit)
            "state_rows": sum(o.numRowsTotal for o in ops) if ops else None,
            "state_rows_dropped_by_watermark": (
                sum(o.numRowsDroppedByWatermark for o in ops) if ops else None
            ),
            "n_state_operators": len(ops),
        }
        with self._lock, open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass


def attach_progress_log(spark: SparkSession, path: str) -> ProgressLogListener:
    listener = ProgressLogListener(path)
    spark.streams.addListener(listener)
    return listener


def detach(spark: SparkSession, listener: ProgressLogListener) -> None:
    spark.streams.removeListener(listener)
