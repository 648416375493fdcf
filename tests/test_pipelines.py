"""App-topology registry: every reference app must map to existing registry
queries and build a runnable DataFrame."""

from __future__ import annotations

import pytest

from real_time_data_warehouse_spark.pipelines import APP_TOPOLOGIES, coverage_report
from tests.conftest import SF_DIR


def test_every_app_covered():
    rep = coverage_report()
    assert rep["apps"] == 17  # 1 DIM + 9 DWD + 7 DWS
    assert rep["missing_queries"] == []
    assert len(rep["by_layer"]["dwd"]) == 9
    assert len(rep["by_layer"]["dws"]) == 7


@pytest.mark.parametrize("topo", APP_TOPOLOGIES, ids=lambda t: t.name)
def test_app_builds(spark, topo):
    df = topo.build(spark, SF_DIR)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
