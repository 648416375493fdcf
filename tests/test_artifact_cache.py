"""The _artifact_dir session cache: hits must LRU-touch and capacity
must exceed one full bench rotation — round-9 session 2 found the
whole extended bench silently degrading to cold rebuilds (145 s →
271 s) when the artifact-kind count crossed a FIFO-evicted capacity
of 16. JVM-free: applicationId is the only Spark surface used.
"""

from __future__ import annotations

import os

import pytest

from real_time_data_warehouse_spark.operators import sink_readback as sr


@pytest.fixture(autouse=True)
def _isolated_cache():
    """Swap in a FRESH cache dict for the test's duration: mutating the
    live module-global here would rmtree any Spark-test artifact dirs
    built earlier in the suite (forcing slow rebuilds), and a mid-test
    assert failure would leak ~48 fake entries into later tests."""
    saved = sr._CACHE
    sr._CACHE = {}
    try:
        yield
    finally:
        # evict only what THIS test created (fake marker dirs), then
        # restore the live cache untouched
        for k in list(sr._CACHE):
            sr._evict(k)
        sr._CACHE = saved


class _Ctx:
    applicationId = "test-app"


class _Spark:
    sparkContext = _Ctx()


def _build_marker(calls):
    def build(base):
        calls.append(base)
        with open(os.path.join(base, "marker"), "w") as f:
            f.write("x")

    return build


def test_hit_returns_same_dir_without_rebuild():
    calls = []
    sp = _Spark()
    d1 = sr._artifact_dir(sp, "/sf/a", "kind_hit", _build_marker(calls))
    d2 = sr._artifact_dir(sp, "/sf/a", "kind_hit", _build_marker(calls))
    assert d1 == d2 and len(calls) == 1


def test_capacity_covers_a_full_bench_rotation():
    """Artifact kinds a bench run keeps alive concurrently must fit:
    the constant is load-bearing, not a tuning knob."""
    assert sr._CACHE_MAX >= 40


def test_hits_lru_touch_so_rotation_does_not_evict_hot_entries():
    """Insert-order (FIFO) eviction evicts the hottest artifact after a
    full rotation of other builds; a hit must move the entry to the
    back of the eviction order."""
    sp = _Spark()
    calls = []
    hot = sr._artifact_dir(sp, "/sf/b", "hot", _build_marker(calls))
    # fill to one below capacity, touching `hot` after each insert
    for i in range(sr._CACHE_MAX - 1):
        sr._artifact_dir(sp, "/sf/b", f"cold{i}", _build_marker(calls))
        assert sr._artifact_dir(
            sp, "/sf/b", "hot", _build_marker(calls)
        ) == hot
    # one more insert must evict the stalest COLD entry, not `hot`
    sr._artifact_dir(sp, "/sf/b", "overflow", _build_marker(calls))
    assert (sp.sparkContext.applicationId, "/sf/b", "hot") in sr._CACHE
    assert sr._artifact_dir(sp, "/sf/b", "hot", _build_marker(calls)) == hot
    assert calls.count(hot) == 1  # never rebuilt
