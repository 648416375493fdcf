"""Dirty-data parity: the oracle comparison must hold on adversarial
inputs the synthetic fixtures never produce — non-numeric map values,
malformed JSON, empty strings. Guards the try_cast discipline (a cast that
errors on one engine while the other filters is a silent parity landmine)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from real_time_data_warehouse_spark.registry import QUERY_REGISTRY, query_map
from tests.conftest import SF_DIR, make_duck
from tests.parity import compare

query_map()

# queries that read/cast props.k and must agree on garbage
K_CAST_QUERIES = (
    "p1_cdc_etl_filter",
    "p4_map_access_projection",
    "p5_cdc_state_transition",
    "p6_cart_delta",
    "p10_search_filter",
    "x1b_explode_children",
    "f_json_roundtrip",
)


@pytest.fixture(scope="module")
def dirty_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("dirty")
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "documents", "embeddings"):
        shutil.copy(f"{SF_DIR}/{name}.parquet", str(d / f"{name}.parquet"))
    rows = [
        (1, 1_700_000_000_000_000_000, 7, "purchase", 1.0, '{"k": 30}'),
        (2, 1_700_000_001_000_000_000, 8, "purchase", 0.9, '{"k": "abc"}'),
        (3, 1_700_000_002_000_000_000, 9, "signup", 0.8, '{"k": "12xy"}'),
        (4, 1_700_000_003_000_000_000, 10, "view", 0.7, "not json at all"),
        (5, 1_700_000_004_000_000_000, 11, "click", 0.6, ""),
        (6, 1_700_000_005_000_000_000, 12, "view", 0.9, '{"other": 1}'),
        (7, 1_700_000_006_000_000_000, 13, "purchase", 0.5, '{"k": 55}'),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    ev.coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("name", K_CAST_QUERIES)
def test_dirty_props_parity(spark, dirty_dir, name):
    q = QUERY_REGISTRY[name]
    con = make_duck(dirty_dir)
    try:
        ok, msg = compare(q.fn(spark, dirty_dir), con, q.oracle)
    finally:
        con.close()
    assert ok, f"{name} on dirty data: {msg}"
