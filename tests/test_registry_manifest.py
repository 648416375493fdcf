"""Driver visit-order contract: the explicit MANIFEST in registry.py.

The external correctness driver truncates at 50 queries per round
(observed rounds 1-3 — documented in BASELINE.md), so the first 50
manifest slots are the only hard-signal slots. These tests pin:
- manifest ↔ registration consistency (fails loud on drift, both ways);
- the tier-1 slots: queries with NO driver signal ever lead (the
  banded-LSH rebase of d5/d9/d9s got its signal in CORRECTNESS_r03 and
  rotated below the cap);
- every query whose most recent hard signal is round 2 lands inside the
  first 50 where slots allow (the three sql* composition apps are the
  deliberate exception — their underlying operators are round-3 green).

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

# Never driver-verified. The banded-LSH rebase of d5/d9/d9s got its
# hard signal in CORRECTNESS_r03.json (recorded after the rebase
# commit, all three green), so those rotated below the cap; the
# remaining tier-1 rows have never appeared in any CORRECTNESS file.
TIER1 = (
    "j10_asof_join",
    "st8_scd2_intervals",
    "c7_quota_sample",
    "s5_pq_adc_topk",
    "st8s_scd2_replay",
    "st9_retract_changelog",
    "c8_leakage_safe_split",
    "d12_shingle_containment",
    # new in round 5
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
    # new in round 6
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
    # new in the round-4 driver session
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
    "a14_window_topn",
)
# Last driver-verified in round 2 and still inside the cap after this
# session's additions: the narrow p-filters the in-cap apps compose
# and j1 as the join-family representative. j2-j5 (driver-green in
# round 3, unchanged) stay displaced below the cap: first-time signal
# outranks a re-check, and their join machinery rides on the in-cap
# j1/j10/j11 kin. The other r2-green map-side ops (t2/t3/t5/t6/t1b,
# m2/m3, c1-c6, s2) sit just below the cap: each shares its
# tokenize/array/hash machinery with an in-cap sibling, is green in
# the sf0.1 full-registry sweep, and rotates back in next round once
# the no-signal tier drains.
# (empty this round: every in-cap slot carries a never-checked query)
TIER2 = ()


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
