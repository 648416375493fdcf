"""Driver visit-order contract: the explicit MANIFEST in registry.py.

The external correctness driver truncates at 50 queries per round
(observed rounds 1-5 — documented in BASELINE.md), so the first 50
manifest slots are the only hard-signal slots. Round-8 rotation
(tools/rotation.py freshness order): tier 1 = the round-8 additions
(never driver-verified); tier 2 = the stalest greens — the full r4
cohort up to the cap (a14/w11/c12/a5s slide just below; r9 leads). Slots below the cap all
carry r5-r7 green signal and rotate back by freshness later.

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

# Never driver-verified (the round-8 additions): lead the manifest
# unconditionally.
TIER1 = (
    "st15_returning_user_stream_readback",
    "st16_daily_uv_stream_readback",
    "st17_visitor_fix_stream_readback",
    "j13_interval_join_stream_readback",
    "j14_left_outer_stream_readback",
    "k5_config_ddl_readback",
    "k6_jdbc_dim_roundtrip",
    "st18_dws_update_upsert_readback",
)
# Stalest hard signal: must sit inside the cap so their signal
# refreshes this round.
TIER2 = (
    "d12_shingle_containment",
    "s6_bm25_topk",
    "s7_hybrid_rerank",
    "t7_ngram_stats",
    "t8_pmi_bigrams",
    "c9_doc_chunks",
    "c3s_packing_replay",
    "c1s_curation_replay",
    "c10_corpus_profile",
    "d6b_cluster_histogram",
    "t9_unigram_surprisal",
    "j11_range_join",
    "w10_late_event_audit",
    "t10_gopher_rules",
    "a13_heavy_hitters",
    "m4_media_phash_dedup",
    "z1_zorder_layout",
    "s8_mmr_rerank",
    "a2c_hll_partial_union",
    "c11_token_budget_plan",
    "st10_changelog_fold",
    "a13s_heavy_hitters_replay",
    "d13_source_overlap",
    "d2c_prefix_jaccard",
    "a15_retention_cohorts",
    "st11_funnel",
    "a16_gapfill_locf",
    "s9_ann_recall_audit",
    "d14_minhash_recall_audit",
    "a17_spike_detection",
    "st12_transition_matrix",
    "d15_substring_spans",
    "d16_substring_strip",
    "st13_sessionization",
    "st13s_session_replay",
    "s10_knn_label_noise",
    "s11_hard_negatives",
    "t11_pii_audit",
    "m5_audio_energy",
    "a1s_windowed_sum_replay",
    "j4s_interval_join_replay",
    "j2s_left_outer_join_replay",
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
