"""Driver visit-order contract: the explicit MANIFEST in registry.py.

The external correctness driver truncates at 50 queries per round
(observed rounds 1-5 — documented in BASELINE.md), so the first 50
manifest slots are the only hard-signal slots. Round-7 rotation
(tools/rotation.py freshness order): tier 1 = the round-7 additions
(never driver-verified); tier 2 = the stalest greens — the full r3
cohort plus the oldest r4 block up to the cap. Slots below the cap all
carry r4-r6 green signal and rotate back by freshness later.

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

# Never driver-verified (the round-7 additions): lead the manifest
# unconditionally.
TIER1 = (
    "s10b_knn_noise_ivf",
    "s10c_knn_shortlist_recall",
    "g1s_pagerank_replay",
    "k1_dynamic_topic_readback",
    "k2_serving_partition_readback",
    "k3_fixed_topic_readback",
    "k4_keyed_upsert_readback",
    "p12_maxwell_envelope_parse",
    "z4_snapshot_diff",
    "st14_dws_stream_readback",
)
# Stalest hard signal: must sit inside the cap so their signal
# refreshes this round.
TIER2 = (
    "a3_multikey_window",
    "a4_global_window",
    "a5_windowed_uu",
    "a6_keyword_count",
    "a7_daily_gmv",
    "a8_province_amount",
    "a9_topk_channel",
    "a10_rollup",
    "a10b_cube",
    "a11_percentiles",
    "w8_sliding_window",
    "w8b_session_window",
    "w9_over_analytics",
    "st1_dedup_last_wins",
    "st3_visitor_state_fix",
    "st4_first_per_day_uv",
    "st5_returning_user",
    "st6_session_count",
    "x1_log_split",
    "x1b_explode_children",
    "x3_set_ops",
    "s4_cluster_stats",
    "s2b_lsh_multiband_topk",
    "d7_dedup_gate",
    "s3_ivf_ann_topk",
    "d1_exact_dedup",
    "d2_ngram_jaccard_pairs",
    "d2b_jaccard_capped",
    "d3_minhash_lsh_pairs",
    "d4_simhash",
    "d6_dedup_clusters",
    "d8_decontamination",
    "s1_cosine_topk",
    "j10_asof_join",
    "st8_scd2_intervals",
    "c7_quota_sample",
    "s5_pq_adc_topk",
    "st8s_scd2_replay",
    "st9_retract_changelog",
    "c8_leakage_safe_split",
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
