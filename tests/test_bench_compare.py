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
