"""sf0.1 parity smoke: a representative slice of the registry re-checked
at 10× the oracle scale. Catches scale-dependent behavior the sf0.001
suite can't see (e.g. outer-join null paths appearing/disappearing,
frequency caps activating, LSH bucket occupancy changing)."""

from __future__ import annotations

import pytest

from real_time_data_warehouse_spark.registry import QUERY_REGISTRY, query_map
from tests.conftest import make_duck
from tests.parity import compare

query_map()

SF01 = "/root/testdata/sf0.1"

# One per family, biased to queries whose shape changes with scale.
SMOKE = (
    "q0_flagship_trade_summary",
    "j8b_full_outer_join",      # null-padding flips with supplier coverage
    "a2_distinct_count",
    "st5_returning_user",
    "d2b_jaccard_capped",       # cap only active at this scale
    "d3_minhash_lsh_pairs",
    "s2_lsh_ann_topk",          # bucket occupancy grows 4×
    "t2_quality_score",         # hit a ROUND boundary only at this scale
    "t4_fingerprint",
    "d5_embedding_neardup",     # banded candidate volume grows ~10×
    "j10_asof_join",            # orders-per-customer history deepens
    "s5_pq_adc_topk",           # codebooks train on 10× vectors
    # round-5 second-session additions whose shape scales
    "d17c_semantic_dedup_multiprobe",  # probe-cell occupancy grows 10×
    "t13_zipf_slope",           # frequency lattice exercises larger ln domain
    "a18_running_total",        # all 32 prefix buckets populated
    "st1s_dedup_last_wins_replay",  # state/batch winner overlap deepens
    # round-6 additions whose shape scales
    "t16_bigram_perplexity",    # bigram model 10×; ln domain widens
    "s14_sq8_ann_topk",         # code-dot ties deepen with 4× corpus
    "z3_compaction_plan",       # multiple bins per day appear
    "c16_dedup_adjusted_mixture",  # cluster mass per source shifts
    "s15_ivf_sq8_topk",         # probe-cell occupancy grows 4×
    "j12_bucketed_join",        # multi-row-group bucketed scans
    "g1_pagerank",              # 10× edge weights; dangling set may appear
    "d22_fuzzy_entity_match",   # gram df cap binds against 10× masters
    "t17_bpe_merges",           # merge ranks can reorder on 10× counts
    "t17b_bpe_encode",          # encode under the 10×-trained merges
    "c17_perceptron_quality",   # margins/updates on 10× feature mass
    "c19_dsir_importance",      # target-OOV mass shifts with 10× vocab
    "d23_entity_clusters",      # cluster sizes grow with duplicate names
    "d22b_er_recall_audit",     # matched-rate floor must hold at 10×
    "g1b_personalized_pagerank",  # seed set and dangling mass at 10×
)


@pytest.fixture(scope="module")
def duck01():
    con = make_duck(SF01)
    yield con
    con.close()


@pytest.mark.parametrize("name", SMOKE)
def test_sf01_parity(spark, duck01, name):
    q = QUERY_REGISTRY[name]
    ok, msg = compare(q.fn(spark, SF01), duck01, q.oracle)
    assert ok, f"{name} at sf0.1: {msg}"
