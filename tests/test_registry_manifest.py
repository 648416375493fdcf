"""Driver visit-order contract: the explicit MANIFEST in registry.py.

The external correctness driver truncates at 50 queries per round
(observed rounds 1-5 — documented in BASELINE.md), so the first 50
manifest slots are the only hard-signal slots. Round-9 rotation
(tools/rotation.py freshness order): tier 1 = the round-9 additions
(never driver-verified — j15 stream-static dim join and w13 sliding
window under the real streaming runtime, x1s/x2s/d7x with crash +
restart, a6c, a19 CMS, t18 JS-drift, z5 bloom index); tier 2 = the
stalest greens — a14 (last green r4) and the r5 cohort up to the cap
(m3/t1b/t2/t1/t4/p1 + m1/m2/c2/c3 slide just below; they lead r10).
Slots below the cap all carry r5-r8 green signal and rotate back by
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

# Never driver-verified (the round-9 additions): lead the manifest
# unconditionally.
TIER1 = (
    "j15_dim_join_stream_readback",
    "w13_sliding_window_stream_readback",
    "u4_python_udtf_keywords",
    "x1s_log_split_stream_readback",
    "x2s_dynamic_routing_stream_readback",
    "a6c_cjk_dict_segment",
    "d7x_dedup_gate_stream_readback",
    "d9x_semantic_gate_stream_readback",
    "w12_session_window_stream_readback",
    "a19_cms_point_estimates",
    "t18_js_source_drift",
    "z5_bloom_file_skip",
)
# Stalest hard signal: must sit inside the cap so their signal
# refreshes this round.
TIER2 = (
    "a14_window_topn",
    "w11_cumulate_window",
    "c12_quality_weighted_sample",
    "a5s_windowed_uu_replay",
    "st3s_visitor_fix_replay",
    "st5s_returning_user_replay",
    "a6b_cjk_keyword_count",
    "s12_label_partitioned_ann",
    "u3_weighted_mean_udaf",
    "c10s_profile_replay",
    "d17_semantic_dedup",
    "st1s_dedup_last_wins_replay",
    "t12_char_entropy",
    "t13_zipf_slope",
    "c13_cluster_weighted_sample",
    "d17b_semdedup_recall_audit",
    "d17c_semantic_dedup_multiprobe",
    "a18_running_total",
    "t14_vocab_growth",
    "s13_rrf_fusion",
    "d19_chunk_dedup",
    "t15_lang_confusion",
    "st4s_daily_uv_replay",
    "st6s_session_count_replay",
    "p2_dirty_side_output",
    "j1_inner_equi_join",
    "j2_left_outer_join",
    "j3_filtered_inner_join",
    "j4_interval_join",
    "j5_lookup_dim_join",
    "p3_bootstrap_exclusion",
    "p4_map_access_projection",
    "p11_null_tombstone_filter",
    "t5_normalize",
    "t6_repetition",
    "c4_corpus_shuffle",
    "c5_pseudonymize",
    "c6_mixture_weights",
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
