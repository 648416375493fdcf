"""bench_compare parses the frozen BASELINE tables correctly (JVM-free)."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "bench_compare", os.path.join(REPO, "tools", "bench_compare.py")
)
bench_compare = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench_compare)


def test_frozen_bounds_cover_all_freeze_tables():
    bounds = bench_compare.frozen_bounds()
    # round-1 headline, r5 extended (40), r6/r7/r8 additions all parse
    assert len(bounds) >= 110
    # one spot value per table generation
    assert bounds["q0_flagship_trade_summary"] == 3.582  # round-1 headline
    assert bounds["m4_media_phash_dedup"] == 0.797  # r5 freeze (2-col row)
    assert bounds["k4_keyed_upsert_readback"] == 0.096  # r7 freeze
    assert bounds["k5_config_ddl_readback"] == 0.12  # r8 freeze (3-col row)
    # non-query metric tables ("| Metric | Value |") must NOT leak in
    assert all(k.replace("_", "").isalnum() for k in bounds)
    assert "metric" not in bounds


def test_latest_freeze_wins_for_requeried_names():
    bounds = bench_compare.frozen_bounds()
    # st14 appears in the r7 freeze (1.180) and nowhere later — stays
    assert bounds["st14_dws_stream_readback"] == 1.18


def test_host_factor_averages_probes_and_defaults_to_one():
    hf = bench_compare.host_factor
    ref = bench_compare.HEALTHY_PROBE_S
    assert hf({}) == 1.0
    assert hf({"host_probe": {}}) == 1.0
    # r8's actual probes: a ~15% degraded host on average
    f = hf({"host_probe": {"pre": 0.2976, "post": 0.2298}})
    assert abs(f - (0.2976 + 0.2298) / 2 / ref) < 1e-12
    assert hf({"host_probe": {"pre": ref}}) == 1.0


def test_drift_normalization_divides_ratios_by_host_factor():
    # a 1.3x-slower host: raw 2.6x ratio normalizes to exactly 2.0x
    rows = bench_compare.drift_rows(
        {"q": 2.6}, {"q": 1.0}, factor=1.3
    )
    (ratio, name, norm_sec, base), = rows
    assert name == "q" and abs(ratio - 2.0) < 1e-12
    assert abs(norm_sec - 2.0) < 1e-12 and base == 1.0


def test_contract_needs_both_relative_bound_and_noise_floor():
    over = bench_compare.is_over
    floor = bench_compare.ABS_FLOOR_S
    # round 8's st18 false red: 0.402 vs 0.197 — 2.04x but only 0.2s
    # of excess → NOT over under the floor
    assert not over(0.402 / 0.197, 0.402, 0.197, 2.0)
    # a real structural regression on the same small bound: 5x clears
    # the floor
    assert over(5.0, 0.985, 0.197, 2.0)
    # big rows: the floor is irrelevant far above it
    assert over(2.1, 21.0, 10.0, 2.0)
    # just-over ratio but excess exactly at the floor → not over
    assert not over(2.5, 0.5 + floor, 0.5, 2.0)


def _mk_rows(pairs):
    """pairs: (name, sec, bound) → drift_rows-shaped tuples (raw)."""
    return bench_compare.drift_rows(
        {n: s for n, s, _b in pairs}, {n: b for n, _s, b in pairs}, 1.0
    )


def test_host_factor_never_normalizes_upward():
    """The r10 false-29: a FASTER-than-healthy probe (0.2047 vs 0.23)
    must clamp to 1.0, not divide ratios by 0.89 and inflate them."""
    hf = bench_compare.host_factor
    assert hf({"host_probe": {"pre": 0.2047, "post": 0.2047}}) == 1.0
    # degraded single core still normalizes down
    assert abs(hf({"host_probe": {"pre": 0.46}}) - 2.0) < 1e-12
    # capped: a uniform 5x slowdown must NOT normalize away
    assert hf({"host_probe": {"pre": 2.3}}) == bench_compare.MAX_FACTOR


def test_host_factor_uses_multicore_probe_when_present():
    hf = bench_compare.host_factor
    healthy_m = bench_compare.HEALTHY_MULTI_PROBE_S
    # single-core fast but multicore contended 1.5x → factor 1.5
    f = hf({"host_probe": {"pre": 0.20, "post": 0.20,
                           "multi_pre": 1.5 * healthy_m,
                           "multi_post": 1.5 * healthy_m}})
    assert abs(f - 1.5) < 1e-12
    # both healthy → 1.0
    assert hf({"host_probe": {"pre": 0.23, "multi_pre": healthy_m}}) == 1.0


def _weather_fixture(small_ratio=1.4, large_ratio=1.1, over_small=3):
    """A run shaped like the driver's r10: broad small-row inflation,
    compute class within contract, a few small rows far over."""
    pairs = []
    for i in range(12):
        pairs.append((f"small{i}", round(0.4 * small_ratio, 3), 0.4))
    for i in range(over_small):
        pairs.append((f"overs{i}", 2.0, 0.4))  # 5x, excess 1.6s
    for i in range(6):
        pairs.append((f"large{i}", round(3.0 * large_ratio, 3), 3.0))
    rows = _mk_rows(pairs)
    over = [r for r in rows if bench_compare.is_over(r[0], r[2], r[3], 2.0)]
    return rows, over


def test_weather_verdict_matches_the_r10_signature():
    rows, over = _weather_fixture()
    assert len(over) == 3
    ok, reason = bench_compare.weather_verdict(rows, over, {})
    assert ok, reason


def test_weather_verdict_refused_when_large_row_is_over():
    rows, over = _weather_fixture()
    rows2 = _mk_rows([("bigreg", 9.0, 3.0)]) + rows
    over2 = over + [r for r in rows2 if r[1] == "bigreg"]
    ok, reason = bench_compare.weather_verdict(rows2, over2, {})
    assert not ok and "compute-class" in reason


def test_weather_verdict_refused_on_quiet_host_distribution():
    # small class NOT broadly inflated → the over-rows are regressions
    rows, over = _weather_fixture(small_ratio=1.0)
    ok, reason = bench_compare.weather_verdict(rows, over, {})
    assert not ok and "not broad" in reason


def test_weather_verdict_refused_when_compute_class_inflated_too():
    rows, over = _weather_fixture(large_ratio=1.8)
    ok, reason = bench_compare.weather_verdict(rows, over, {})
    assert not ok and "code regression" in reason


def test_weather_verdict_gated_by_healthy_multicore_probe():
    rows, over = _weather_fixture()
    healthy_m = bench_compare.HEALTHY_MULTI_PROBE_S
    quiet = {"host_probe": {"multi_pre": healthy_m, "multi_post": healthy_m}}
    ok, reason = bench_compare.weather_verdict(rows, over, quiet)
    assert not ok and "multicore probe healthy" in reason
    stormy = {"host_probe": {"multi_pre": 1.5 * healthy_m}}
    ok, _ = bench_compare.weather_verdict(rows, over, stormy)
    assert ok


def test_r10_driver_and_builder_runs_adjudicate_green():
    """The round-11 acceptance criterion: the tool must be green against
    BOTH round-10 bench files — the builder's committed run (clean) and
    the driver's weather-hit run (WEATHER, not FAIL). Reconstructed
    fixtures carry the measured class statistics of those runs."""
    # builder-like: fast probe, nothing over raw — old tool FAILED this
    # via upward normalization
    pairs = [(f"q{i}", 0.44, 0.4) for i in range(12)]
    pairs += [(f"l{i}", 2.8, 3.0) for i in range(6)]
    cur = {n: s for n, s, _ in pairs}
    frz = {n: b for n, _, b in pairs}
    factor = bench_compare.host_factor(
        {"host_probe": {"pre": 0.2047, "post": 0.2047}}
    )
    rows = bench_compare.drift_rows(cur, frz, factor)
    assert not [r for r in rows if bench_compare.is_over(r[0], r[2], r[3], 2.0)]
    # driver-like: 21 small rows 2-5.6x raw, large class max 1.91 —
    # weather verdict, exit 0 path
    rows, over = _weather_fixture(small_ratio=1.38, large_ratio=1.09,
                                  over_small=21)
    ok, reason = bench_compare.weather_verdict(rows, over, {})
    assert ok, reason


def test_adjudication_uses_the_same_over_contract():
    """The isolated steady-state medians are judged by exactly is_over
    (ratio bound AND absolute floor) against the same frozen bounds —
    ground truth from the round-11 A/B/A: k1 measured 1.37-3.4x inside
    two bench runs and 0.45-0.49 s (1.2x) deep-warm isolated with zero
    code delta, so the isolated median is the regression signal."""
    over = bench_compare.is_over
    # k1's adjudicated value: 0.491 vs 0.404 -> transient
    assert not over(0.491 / 0.404, 0.491, 0.404, 2.0)
    # a real steady-state regression still fails
    assert over(3.0, 1.212, 0.404, 2.0)
