"""Driver visit-order contract: the explicit MANIFEST in registry.py.

The external correctness driver truncates at 50 queries per round
(observed rounds 1-5 — documented in BASELINE.md), so the first 50
manifest slots are the only hard-signal slots. Round-10 rotation
(tools/rotation.py freshness order): tier 1 = the round-10 additions
(never driver-verified — app1s/app2s/app3s: the DwdTradeOrderDetail,
DwsTradeProvinceOrderWindow and DwsTradeSkuOrderWindow apps
end-to-end as single multi-stateful-operator streaming queries); tier 2 = the stalest
greens — the 13-query r5 cohort (c1/m3/t1b/s2/t3/t2/t1/t4/p1/m1/m2/
c2/c3) and the oldest r6 rows up to the cap. Slots below the cap all
carry r6-r9 green signal and rotate back by freshness later.

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

# Never driver-verified (the round-10 additions): lead the manifest
# unconditionally.
TIER1 = (
    "app1s_order_detail_stream_chain",
    "app2s_province_order_stream_chain",
    "app3s_sku_order_stream_chain",
    "app4s_dim_app_stream_chain",
)
# Stalest hard signal: must sit inside the cap so their signal
# refreshes this round.
TIER2 = (
    "c1_corpus_curation",
    "m3_corrupt_quarantine",
    "t1b_trigram_langid",
    "s2_lsh_ann_topk",
    "t3_token_count",
    "t2_quality_score",
    "t1_lang_id",
    "t4_fingerprint",
    "p1_cdc_etl_filter",
    "m1_media_features",
    "m2_frame_sampling",
    "c2_stratified_sample",
    "c3_sequence_packing",
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
    "p5_cdc_state_transition",
    "p6_cart_delta",
    "p7_dynamic_column_pruning",
    "p8_page_filter",
    "p9_login_filter",
    "p10_search_filter",
    "sql1_order_detail_app",
    "sql2_keyword_window_app",
    "sql3_serving_gmv_app",
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
