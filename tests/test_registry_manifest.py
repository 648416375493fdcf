"""Driver visit-order contract: the explicit MANIFEST in registry.py.

The external correctness driver truncates at 50 queries per round
(observed rounds 1-5 — documented in BASELINE.md), so the first 50
manifest slots are the only hard-signal slots. Round-11 rotation
(tools/rotation.py freshness order): tier 1 = the round-11 additions
(never driver-verified — app5s: DwdBaseLog end-to-end with dirty
side-output + keyed ST3 repair + 5-way split + crash/restart; app6s:
DwsTrafficVcChArIsNewPageViewWindow with two keyed dedup states
unioned into the 4-dim tumbling reduce); tier 2 = the stalest greens —
the 17-query r6 cohort, then the oldest r7 rows up to the cap. Slots
below the cap all carry r7-r10 green signal and rotate back by
freshness later.

Tier tuples are spelled out literally (not derived from MANIFEST) ON
PURPOSE: the test exists to catch an accidental manifest edit, so the
expected order must be stated independently.

JVM-free: the registry and every operator module import without a
SparkSession.
"""

from __future__ import annotations

from real_time_data_warehouse_spark.registry import (
    MANIFEST,
    QUERY_REGISTRY,
    ordered_registry,
    oracle_map,
    query_map,
)

DRIVER_CAP = 50

# Never driver-verified (the round-11 additions): lead the manifest
# unconditionally.
TIER1 = (
    "app5s_base_log_stream_chain",
    "app6s_traffic_page_view_stream_chain",
    "app7s_user_login_stream_chain",
    "app8s_keyword_window_stream_chain",
    "app9s_pay_detail_stream_chain",
    "app9x_pay_detail_crash_restart",
    "app10s_cart_add_uu_stream_chain",
    "app11s_order_cancel_stream_chain",
    "app12s_cart_add_stream_chain",
    "app13s_comment_info_stream_chain",
    "app14s_base_db_stream_chain",
    "app15s_order_refund_stream_chain",
    "app16s_home_detail_stream_chain",
    "app17s_refund_pay_suc_stream_chain",
)
# Stalest hard signal: must sit inside the cap so their signal
# refreshes this round.
TIER2 = (
    "d5_embedding_neardup",
    "d9_semantic_gate",
    "d9s_semantic_gate_replay",
    "f_scalar_suite",
    "a2b_approx_distinct",
    "j9_salted_skew_join",
    "a12_salted_skew_agg",
    "a11b_approx_percentiles",
    "d7s_dedup_gate_replay",
    "q0_flagship_trade_summary",
    "f_json_roundtrip",
    "j6_dim_chain_join",
    "j7_broadcast_config_join",
    "j8_semi_anti_join",
    "j8b_full_outer_join",
    "a1_windowed_sum",
    "a2_distinct_count",
)


def test_manifest_matches_registrations():
    ordered = ordered_registry()  # raises on drift
    assert list(ordered) == list(MANIFEST)
    assert set(ordered) == set(QUERY_REGISTRY)


def test_manifest_has_no_duplicates():
    assert len(MANIFEST) == len(set(MANIFEST))


def test_changed_queries_lead():
    assert MANIFEST[: len(TIER1)] == TIER1


def test_stale_signal_queries_inside_driver_cap():
    first = set(MANIFEST[:DRIVER_CAP])
    for name in TIER1 + TIER2:
        assert name in first, f"{name}'s hard signal is 2+ rounds old"


def test_query_and_oracle_maps_follow_manifest():
    assert list(query_map()) == list(MANIFEST)
    oracles = oracle_map()
    assert list(oracles) == [n for n in MANIFEST if n in oracles]
