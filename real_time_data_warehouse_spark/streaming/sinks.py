"""Sink layer — SURVEY.md §2.1 S6-S9: keyed upserts, deletes, DDL-from-
config, day-partitioned serving tables.

Delta-first design: when ``delta-spark`` is importable the dim sink is a
real ``MERGE INTO`` (upsert + conditional delete — the HBase
put/delete+Redis-invalidate of HBaseSinkFunction.java:36-61 collapses into
one ACID statement, and invalidation disappears because readers always see
the latest snapshot). Without Delta (this test environment) the same
semantics run as a parquet read-modify-write: union old+new, keep the
latest record per key, drop deletes. Identical results, weaker isolation —
clearly marked as the fallback.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

try:  # pragma: no cover - environment-dependent
    from delta.tables import DeltaTable  # type: ignore

    HAS_DELTA = True
except Exception:  # ModuleNotFoundError in this environment
    DeltaTable = None
    HAS_DELTA = False


def upsert_dim(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    key_cols: list[str],
    order_col: str = "ts",
    type_col: str | None = "type",
    seq_col: str | None = None,
) -> None:
    """S8: apply a CDC micro-batch to a dim table — upsert rows, delete
    where the CDC type says so (``type=='delete'``).

    Within the batch, only the latest record per key applies (the same
    last-write-wins the HBase row store gives).

    Ordering contract: micro-batches must arrive in stream (commit) order —
    a record older than an already-applied delete would resurrect the row,
    because deletes leave no tombstone. The reference's HBase sink
    (HBaseSinkFunction.java:36-61) has the identical property; Maxwell/
    binlog CDC is commit-ordered, so the assumption holds by construction.
    The chunk-associativity property under this contract is pinned by
    tests/test_properties.py::test_upsert_dim_chunked_equals_whole."""
    # Tie-break equal order_col values (Maxwell ts is epoch-SECONDS, so an
    # insert+update in the same second tie). Rank by ``seq_col`` first — a
    # true commit-order column (Kafka offset / Maxwell xid·2^20+xoffset,
    # surfaced as ``__seq`` by parse_maxwell) — then by arrival order, so
    # a NULL or constant seq (sources that carry neither offset nor xid)
    # degrades to the arrival-order behavior instead of a nondeterministic
    # row_number over equal keys. The monotonically_increasing_id fallback
    # orders by partition index before row order, so when one key's records
    # span partitions of a micro-batch it can pick the older record —
    # correct only for single-partition (or per-key-partitioned) batches.
    arr = batch.withColumn("__arr", F.monotonically_increasing_id())
    ties = (
        [F.col(seq_col).desc_nulls_last(), F.col("__arr").desc()]
        if seq_col is not None and seq_col in batch.columns
        else [F.col("__arr").desc()]
    )
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc(), *ties)
    latest = (
        arr.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__arr")
    )
    if seq_col is not None and seq_col in latest.columns:
        # intra-batch tie-break only; keep the dim table schema clean
        latest = latest.drop(seq_col)

    if HAS_DELTA and DeltaTable is not None and DeltaTable.isDeltaTable(spark, path):
        cond = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
        merge = DeltaTable.forPath(spark, path).alias("t").merge(
            latest.alias("s"), cond
        )
        if type_col:
            merge = merge.whenMatchedDelete(f"s.{type_col} = 'delete'")
            # a delete for an absent key must NOT insert a phantom row
            # (the parquet fallback filters these; keep the paths identical)
            (
                merge.whenMatchedUpdateAll()
                .whenNotMatchedInsertAll(condition=f"s.{type_col} <> 'delete'")
                .execute()
            )
        else:
            merge.whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
        return

    # Parquet fallback: read-modify-write with the same net semantics.
    if os.path.exists(path):
        old = spark.read.parquet(path)
        # new rows outrank old rows on order_col ties (stream order):
        # tag provenance before the union
        merged = old.withColumn("__src", F.lit(0)).unionByName(
            latest.withColumn("__src", F.lit(1)), allowMissingColumns=True
        )
        w_merge = Window.partitionBy(*key_cols).orderBy(
            F.col(order_col).desc(), F.col("__src").desc()
        )
        merged = (
            merged.withColumn("__rn", F.row_number().over(w_merge))
            .where(F.col("__rn") == 1)
            .drop("__rn", "__src")
        )
    else:
        merged = latest
    if type_col and type_col in merged.columns:
        merged = merged.where(
            F.col(type_col).isNull() | (F.col(type_col) != "delete")
        )
    out = merged.localCheckpoint(eager=True)  # detach lineage from the file
    out.write.mode("overwrite").parquet(path)


def upsert_versioned(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    path: str,
    key_cols: list[str],
) -> None:
    """Update-mode foreachBatch sink: upsert the batch into a keyed serving
    table, versioned by the epoch id so later re-fires of the same key win
    (used by the DWS update-mode pipelines in pipelines.py and trade.py)."""
    upsert_dim(
        spark,
        batch.withColumn("__ver", F.lit(batch_id).cast("long")),
        path,
        key_cols=key_cols,
        order_col="__ver",
        type_col=None,
    )


def apply_config_ddl(
    spark: SparkSession,
    config: DataFrame,
    base_dir: str,
    order_col: str | None = None,
) -> None:
    """S9: HBase DDL-from-config analog (DimApp.java:237-280): op d →
    drop table dir; r/c → create IF ABSENT (an existing table is left
    untouched, like `create_namespace_table` checking existence); u →
    drop + create. Here tables are parquet/Delta directories.

    DDL is control-plane: the config stream is the CDC of the tiny
    table_process table (tens of rows), so applying it driver-side —
    exactly where the reference's RichSinkFunction.open() issues HBase
    admin calls — is the honest shape; the DATA plane never touches
    this loop. Each create drops a ``meta.json`` catalog record
    ({sink_table, created_ver}) into the table dir so the resulting
    catalog state is queryable/auditable (the k5 read-back row); pass
    ``order_col`` to apply ops in commit order within the batch."""
    import json
    import shutil

    rows = config.collect()
    if order_col is not None:
        rows = sorted(rows, key=lambda r: r[order_col])
    for row in rows:
        table_dir = os.path.join(base_dir, row["sink_table"])
        if row["op"] in ("d", "u") and os.path.exists(table_dir):
            shutil.rmtree(table_dir)
        if row["op"] in ("r", "c", "u") and not os.path.exists(table_dir):
            os.makedirs(table_dir)
            meta = {"sink_table": row["sink_table"]}
            if order_col is not None:
                meta["created_ver"] = int(row[order_col])
            with open(os.path.join(table_dir, "meta.json"), "w") as f:
                json.dump(meta, f)


def write_serving_partitioned(df: DataFrame, path: str) -> None:
    """S7: day-partitioned serving table (the Doris par{date} analog)."""
    df.write.mode("overwrite").partitionBy("cur_date").parquet(path)


def compact_table(
    spark: SparkSession,
    path: str,
    partition_col: str | None = None,
    target_files_per_partition: int = 1,
) -> dict[str, int]:
    """The OPTIMIZE analog for plain-parquet tables: streaming appends
    leave one small file per micro-batch per partition (the Doris sink's
    buffered stream-load hides the same problem behind its 1 MB buffers);
    scan cost then scales with file count, not data size. Rewrites the
    table and reports before/after file counts. With ``partition_col`` the
    result is always ONE file per partition (hash-by-key repartition);
    ``target_files_per_partition`` applies only to unpartitioned tables.

    Delta's OPTIMIZE does this transactionally; this is the gated-fallback
    form: write to a staging dir, then swap — readers between the two
    renames see the old or new listing, not a mix. Caveat of the swap:
    DataFrames created over *path* before compaction hold the old file
    listing and fail after it — re-read after compacting (Delta's
    transaction log is what removes this caveat in the gated path).
    """
    import glob
    import shutil

    def count_files(p: str) -> int:
        return len(glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True))

    # Crash recovery from a previous interrupted compaction. If the crash
    # hit between the two renames below, *path* is absent and ``.__old__``
    # holds the only copy of the data — restore it, never delete it.
    staging_leftover = path.rstrip("/") + ".__compact__"
    old_leftover = path.rstrip("/") + ".__old__"
    if not os.path.exists(path) and os.path.exists(old_leftover):
        os.rename(old_leftover, path)
    if os.path.exists(staging_leftover):
        shutil.rmtree(staging_leftover)
    if os.path.exists(path) and os.path.exists(old_leftover):
        shutil.rmtree(old_leftover)
    before = count_files(path)
    df = spark.read.parquet(path)
    staging = path.rstrip("/") + ".__compact__"
    if partition_col:
        # hash by the partition column: every key lands in exactly one
        # task → one file per partition dir, parallel across partitions
        out = df.repartition(F.col(partition_col))
        writer = out.write.mode("overwrite").partitionBy(partition_col)
    else:
        writer = df.repartition(target_files_per_partition).write.mode("overwrite")
    writer.parquet(staging)
    old = path.rstrip("/") + ".__old__"
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    return {"files_before": before, "files_after": count_files(path)}
