"""Driver visit-order contract: the explicit MANIFEST in registry.py.

The external correctness driver truncates at 50 queries per round
(observed rounds 1-5 — documented in BASELINE.md), so the first 50
manifest slots are the only hard-signal slots. Round-6 rotation
(tools/rotation.py freshness order): tier 1 = the never-driver-verified
queries (z2/c15/d20, added after round 5's mid-round rotation) plus any
new round-6 queries promoted as they land; tier 2 = the stalest greens
(9 r2-era rows, then the r3 cohort up to the cap). Slots below the cap
all carry r3-r5 green signal and rotate back by freshness later.

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

# Never driver-verified (plus new round-6 queries as they land): lead
# the manifest unconditionally.
TIER1 = (
    "z2_column_stats",
    "c15_curriculum_phases",
    "d20_semantic_decontamination",
    "t16_bigram_perplexity",
    "s14_sq8_ann_topk",
    "s14b_sq8_recall_audit",
    "z3_compaction_plan",
    "c16_dedup_adjusted_mixture",
    "z3s_compaction_replay",
    "s15_ivf_sq8_topk",
    "j12_bucketed_join",
    "s15s_ivf_ingest_replay",
    "m6_keyframe_dedup",
    "g1_pagerank",
    "d22_fuzzy_entity_match",
    "t17_bpe_merges",
    "t17b_bpe_encode",
    "c17_perceptron_quality",
    "c19_dsir_importance",
    "c18_k_anonymity_audit",
    "d23_entity_clusters",
    "d22b_er_recall_audit",
    "g1b_personalized_pagerank",
    "g2_triangle_count",
)
# Stalest hard signal: must sit inside the cap so their signal
# refreshes this round.
TIER2 = (
    "p5_cdc_state_transition",
    "p6_cart_delta",
    "p7_dynamic_column_pruning",
    "p8_page_filter",
    "p9_login_filter",
    "p10_search_filter",
    "sql1_order_detail_app",
    "sql2_keyword_window_app",
    "sql3_serving_gmv_app",
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
