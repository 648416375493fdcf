"""Per-query parity against the DuckDB oracle at sf0.001 — the local mirror
of the driver's t2 gate (which runs at sf0.01)."""

from __future__ import annotations

import pytest

from real_time_data_warehouse_spark.registry import QUERY_REGISTRY, query_map
from tests.conftest import SF_DIR
from tests.parity import compare

query_map()  # force registration
ALL = sorted(QUERY_REGISTRY)


@pytest.mark.parametrize("name", ALL)
def test_query_parity(spark, duck, name):
    q = QUERY_REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only check, mirrors the driver
        return
    ok, msg = compare(df, duck, q.oracle)
    assert ok, f"{name}: {msg}"
