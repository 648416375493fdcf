"""Incremental IVF+SQ8 ingestion (streaming/ivf_index.py, the s15s
applier): append-only index maintenance must commute with batch build
under ANY split, and a retried batch must be idempotent."""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F

from real_time_data_warehouse_spark.operators.similarity import (
    _IVF_PROBES,
    _N_QUERIES,
    _as_double,
    _normalized,
    _sq8_codes,
    _topcells_udf,
    _trained_centroids,
)
from real_time_data_warehouse_spark.registry import QUERY_REGISTRY, query_map
from real_time_data_warehouse_spark.streaming.ivf_index import (
    make_ingest_applier,
    make_searcher,
)
from real_time_data_warehouse_spark.tables import Tables
from tests.conftest import SF_DIR

query_map()


def _setup(spark):
    t = Tables(spark, SF_DIR)
    emb = t.embeddings.select("vec_id", _as_double("embedding").alias("v"))
    cents = _trained_centroids(SF_DIR, emb)
    topcells = _topcells_udf(cents, _IVF_PROBES)
    probes = (
        emb.where(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(topcells(F.col("v"))).alias("cell"),
        )
        .join(
            _sq8_codes(_normalized(emb)).select(
                F.col("vec_id").alias("query_id"),
                F.col("qc").alias("qcode"),
            ),
            "query_id",
        )
    )
    return t, cents, probes


def _expected(spark):
    return {
        (r.query_id, r.rnk): (r.neighbor_id, r.score)
        for r in QUERY_REGISTRY["s15_ivf_sq8_topk"]
        .fn(spark, SF_DIR)
        .collect()
    }


def test_hash_split_ingest_equals_batch_build(spark, tmp_path_factory):
    """Appends are order-free: a HASH split (every batch hitting every
    cell) must serve the same search as the one-pass s15 build."""
    t, cents, probes = _setup(spark)
    rows = t.embeddings.select("vec_id", "embedding").withColumn(
        "hkey", F.pmod(F.xxhash64("vec_id"), F.lit(89)).cast("long")
    )
    apply_b = make_ingest_applier(cents)
    out = str(tmp_path_factory.mktemp(f"ivf_{uuid.uuid4().hex[:8]}"))
    mx = rows.agg(F.max("hkey")).first()[0]
    span = int(mx) + 1
    for b in range(3):
        lo, hi = span * b // 3, span * (b + 1) // 3
        apply_b(
            spark,
            rows.where((F.col("hkey") >= lo) & (F.col("hkey") < hi)),
            b,
            "",
            out,
        )
    got = {
        (r.query_id, r.rnk): (r.neighbor_id, r.score)
        for r in make_searcher(probes)(spark, out).collect()
    }
    assert got == _expected(spark)


def test_retried_batch_is_idempotent(spark, tmp_path_factory):
    """Re-applying a batch overwrites its own partition — the crash-
    retry contract: double-applied batch 1 must not duplicate rows or
    change the served search."""
    t, cents, probes = _setup(spark)
    rows = t.embeddings.select("vec_id", "embedding")
    apply_b = make_ingest_applier(cents)
    out = str(tmp_path_factory.mktemp(f"ivf_{uuid.uuid4().hex[:8]}"))
    mx = rows.agg(F.max("vec_id")).first()[0]
    span = int(mx) + 1
    for b in range(2):
        lo, hi = span * b // 2, span * (b + 1) // 2
        batch = rows.where(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        )
        apply_b(spark, batch, b, "", out)
        if b == 1:  # the retry
            apply_b(spark, batch, b, "", out)
    listed = spark.read.option("basePath", out).parquet(out)
    assert listed.count() == rows.count()  # no duplicated appends
    got = {
        (r.query_id, r.rnk): (r.neighbor_id, r.score)
        for r in make_searcher(probes)(spark, out).collect()
    }
    assert got == _expected(spark)
