"""Shared parquet snapshot-store reader for the incremental streaming
appliers (window_agg, distinct_agg, sessionize, joins, packing, scd2,
user_state).

Every applier keeps its keyed state as per-batch snapshot directories
``<state_dir>/batch_id=N`` and follows the same replay discipline: batch
N reads the LATEST snapshot with id < N and overwrites snapshot N and
output partition N, so a retried batch re-reads the pre-batch state and
is idempotent. The "latest id < batch_id" scan was copy-pasted per
module; this is the single shared implementation (only the empty-state
schema differs per caller).

NOTE for readers of the snapshot files: snapshots may carry extra
APPLIER-PRIVATE columns beyond the logical state (e.g. the ``tb``/``nb``
touched-key provenance flags the fold-touched appliers persist). Every
reader must project through its caller-declared schema — as
``read_snapshot`` does — never ``spark.read.parquet`` with inferred
schema over a state dir.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession


def read_snapshot(
    spark: SparkSession, state_dir: str, batch_id: int, schema: str
) -> DataFrame:
    """Latest ``batch_id=K`` snapshot under *state_dir* with
    K < *batch_id* (the replay bound), else an empty frame of
    *schema*. The caller-declared schema is handed to the reader so
    the driver skips the per-batch parquet footer probe (guide §6 —
    schema inference is driver-side work paid once per read)."""
    best = -1
    if os.path.isdir(state_dir):
        for name in os.listdir(state_dir):
            m = re.fullmatch(r"batch_id=(\d+)", name)
            if m and int(m.group(1)) < batch_id:
                best = max(best, int(m.group(1)))
    if best >= 0:
        return spark.read.schema(schema).parquet(
            os.path.join(state_dir, f"batch_id={best}")
        )
    return spark.createDataFrame([], schema)


def write_snapshot(df: DataFrame, state_dir: str, batch_id: int) -> None:
    """Overwrite snapshot *batch_id* (idempotent under replay)."""
    df.write.mode("overwrite").parquet(
        os.path.join(state_dir, f"batch_id={batch_id}")
    )


def write_then_read(
    df: DataFrame, state_dir: str, batch_id: int, schema: str
) -> DataFrame:
    """Overwrite snapshot *batch_id* and return a READ of the written
    files. For a frame that feeds both its own snapshot write and a
    downstream derivation, this replaces the localCheckpoint +
    write + derive pattern (3 jobs over the same rows) with write +
    derive (2): the snapshot write IS the materialization, and the
    read-back is the same bytes the checkpoint would have held."""
    write_snapshot(df, state_dir, batch_id)
    return df.sparkSession.read.schema(schema).parquet(
        os.path.join(state_dir, f"batch_id={batch_id}")
    )
