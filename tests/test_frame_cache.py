"""operators/frame_cache: the shared session artifact cache (d5's pair
table; the d6/d23 discipline generalized) — hit/miss, per-kind keys,
bounded eviction, and stale-owner invalidation."""

from __future__ import annotations

from real_time_data_warehouse_spark.operators import frame_cache as fc


def test_cached_frame_builds_once_per_key(spark):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(5)

    a = fc.cached_frame(spark, "/sf/a", "t", build)
    b = fc.cached_frame(spark, "/sf/a", "t", build)
    assert calls["n"] == 1
    assert a is b
    assert a.count() == 5
    # different sf_dir or kind → separate entries
    fc.cached_frame(spark, "/sf/b", "t", build)
    fc.cached_frame(spark, "/sf/a", "u", build)
    assert calls["n"] == 3


def test_cache_is_bounded_and_evicts_oldest(spark):
    fc._CACHE.clear()
    for i in range(fc._CACHE_MAX + 2):
        fc.cached_frame(spark, f"/sf/{i}", "k", lambda: spark.range(1))
    assert len(fc._CACHE) <= fc._CACHE_MAX
    # the oldest keys were evicted, the newest survive
    kept = {k[1] for k in fc._CACHE}
    assert f"/sf/{fc._CACHE_MAX + 1}" in kept
    assert "/sf/0" not in kept


def test_stale_owner_entry_is_rebuilt(spark):
    """A cache entry whose owning session is gone (weakref dead or a
    different live object under the same applicationId) must rebuild,
    never serve another session's checkpointed frame."""
    fc._CACHE.clear()
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(3)

    fc.cached_frame(spark, "/sf/x", "k", build)
    key = (spark.sparkContext.applicationId, "/sf/x", "k")

    class _DeadRef:
        def __call__(self):
            return None  # owner collected

    ref, df = fc._CACHE[key]
    fc._CACHE[key] = (_DeadRef(), df)
    out = fc.cached_frame(spark, "/sf/x", "k", build)
    assert calls["n"] == 2
    assert out.count() == 3
