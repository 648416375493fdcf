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
