"""Registry-wide plan lint: no query may plan a true CartesianProduct.

Broadcast nested-loop joins against 1-row bounds/totals frames are fine
(and deliberate); a CartesianProduct node means two non-broadcast sides
are being paired row-by-row — the all-pairs shape every operator in this
repo is specifically designed to avoid. A blanket guard catches the
regression class where a join condition is accidentally dropped or an
equi-join degrades (e.g. a cast makes the keys incomparable).
"""

from __future__ import annotations

import os

import pytest

from real_time_data_warehouse_spark.plans.audit import formatted_plan
from real_time_data_warehouse_spark.registry import QUERY_REGISTRY, query_map
from tests.conftest import SF_DIR

query_map()
ALL = sorted(QUERY_REGISTRY)

# Sequential replay queries execute real work (store folds) at call
# time; their final frames are checkpoint reads with trivial plans, and
# their internals are the SAME code paths the batch twins lint here.
# Skipping them keeps the lint cheap without losing coverage — and the
# loophole is closed at the source: each excluded applier runs
# plans.audit.assert_no_cartesian on its per-batch frame at batch 0
# (dedup_gate/embedding_gate/curation/heavy_hitters/packing/scd2), so
# a degraded join inside a replay fails the replay itself.
REPLAYS = {
    "d7s_dedup_gate_replay",
    "d9s_semantic_gate_replay",
    "st8s_scd2_replay",
    "c3s_packing_replay",
    "c1s_curation_replay",
    "a13s_heavy_hitters_replay",
}


@pytest.mark.parametrize("name", [n for n in ALL if n not in REPLAYS])
def test_no_cartesian_product(spark, name):
    df = QUERY_REGISTRY[name].fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, f"{name} plans a CartesianProduct"


# Partition-less windows whose bound is real but not Limit-shaped:
# z3's offsets window runs over per-DAY compaction totals (bucket = the
# day column — no static bucket count to stamp as a limit); the frame
# is bounded by the table's retention horizon, documented in layout.py.
GLOBAL_WINDOW_BOUNDED_BY_DESIGN = {"z3_compaction_plan"}


@pytest.mark.parametrize("name", [n for n in ALL if n not in REPLAYS])
def test_global_windows_are_bounded(spark, name):
    """No partition-less Window may run over an un-limited input: that
    shape serializes the whole dataset through ONE task at 100 TB even
    when the small-SF answer is correct. Global windows over top-K /
    bucket-totals frames are fine — the Limit below them is the
    structural witness (bucketed_prefix stamps one via n_buckets)."""
    from real_time_data_warehouse_spark.plans.audit import (
        unbounded_global_windows,
    )

    if name in GLOBAL_WINDOW_BOUNDED_BY_DESIGN:
        pytest.skip("bounded by design; documented at the call site")
    df = QUERY_REGISTRY[name].fn(spark, SF_DIR)
    offenders = unbounded_global_windows(df)
    assert not offenders, f"{name}: unbounded global window(s): {offenders}"


@pytest.mark.parametrize("name", [n for n in ALL if n not in REPLAYS])
def test_output_columns_are_scalar(spark, name):
    """Driver hash-comparability: every output column must be a scalar
    type. Array/map/struct outputs hash engine-dependently (element
    order, struct field rendering) under the driver's sorted-column
    value comparator — flatten or aggregate before returning. Replays
    excluded for suite economy (each executes its store fold when
    called); their scalar schemas are pinned by the parity suite."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = QUERY_REGISTRY[name].fn(spark, SF_DIR)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, f"{name}: non-scalar output columns {bad}"


def test_unbounded_global_window_detector_edges(spark):
    """The detector's contract on synthetic plans: a global window over
    an unlimited scan is flagged; a Limit on the small side of a join
    does NOT exonerate a window over the unbounded side; a genuinely
    limited input passes; explode over a bounded input stays bounded
    only if Catalyst says so (maxRows), not by Limit-node spotting."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from real_time_data_warehouse_spark.plans.audit import (
        unbounded_global_windows,
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    dim = docs.select("lang").distinct().limit(5)
    w = Window.orderBy("doc_id")

    flagged = docs.join(F.broadcast(dim), "lang").withColumn(
        "r", F.row_number().over(w)
    )
    assert len(unbounded_global_windows(flagged)) == 1

    passes = docs.limit(10).join(F.broadcast(dim), "lang").withColumn(
        "r", F.row_number().over(w)
    )
    assert unbounded_global_windows(passes) == []

    plain_scan = docs.withColumn("r", F.row_number().over(w))
    assert len(unbounded_global_windows(plain_scan)) == 1

    # partitionBy(lit(1)) is still ONE partition — treated as global
    lit_part = docs.withColumn(
        "r",
        F.row_number().over(Window.partitionBy(F.lit(1)).orderBy("doc_id")),
    )
    assert len(unbounded_global_windows(lit_part)) == 1
