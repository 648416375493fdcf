"""Plan-shape assertions: the scale-design contract from SURVEY.md §4.
These fail if a code change silently degrades a broadcast to a shuffle
join, loses filter pushdown, or breaks top-k into a global sort."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_data_warehouse_spark.plans.audit import (
    broadcast_join_count,
    formatted_plan,
    has_take_ordered,
    pushed_filters,
    read_schema,
    shuffle_count,
    sort_merge_join_count,
)
from real_time_data_warehouse_spark.registry import QUERY_REGISTRY, query_map
from tests.conftest import SF_DIR

query_map()


def q(name, spark):
    return QUERY_REGISTRY[name].fn(spark, SF_DIR)


def test_dim_chain_all_broadcast(spark):
    """J6: the 4-stage dim chain must be pure broadcast hash joins — no
    shuffle on the fact side (the Redis/async-IO replacement argument)."""
    df = q("j6_dim_chain_join", spark)
    assert broadcast_join_count(df) == 4
    assert sort_merge_join_count(df) == 0


def test_flagship_broadcasts_dims(spark):
    """q0: customer/nation/region broadcast; the only shuffles are the
    fact join and the final aggregation."""
    df = q("q0_flagship_trade_summary", spark)
    assert broadcast_join_count(df) >= 3  # 3 dims; 4 when AQE also broadcasts the fact join at tiny sf


def test_filter_pushdown_reaches_scan(spark):
    """P8: the IN-list predicate must appear in PushedFilters, and the scan
    must read only the projected columns."""
    df = q("p8_page_filter", spark)
    filters = " ".join(pushed_filters(df))
    assert "event_type" in filters and "In" in filters
    schemas = " ".join(read_schema(df))
    assert "props" not in schemas and "value" not in schemas


def test_serving_date_pushdown(spark):
    """A7: the day predicate pushes to the scan (partition-pruning analog
    for the Doris `partition par#{date}` query)."""
    df = q("a7_daily_gmv", spark)
    filters = " ".join(pushed_filters(df))
    assert "o_orderdate" in filters and "GreaterThanOrEqual" in filters


def test_topk_is_take_ordered(spark):
    """A9: group+sum+orderBy+limit plans TakeOrderedAndProject, not a
    global sort."""
    df = q("a9_topk_channel", spark)
    assert has_take_ordered(df)


def test_config_join_broadcast(spark):
    """J7: the config table joins as a broadcast (the broadcast-state
    pattern analog)."""
    df = q("j7_broadcast_config_join", spark)
    assert broadcast_join_count(df) == 1
    assert sort_merge_join_count(df) == 0


def test_interval_join_no_cartesian(spark):
    """J4: the time-range join must use the user_id equi-key (hash join),
    never BroadcastNestedLoopJoin over the cross product."""
    df = q("j4_interval_join", spark)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize(
    ("name", "budget"),
    [
        ("j6_dim_chain_join", 0),   # all-broadcast chain: zero shuffles
        ("a1_windowed_sum", 1),     # one partial→final agg exchange
        ("q0_flagship_trade_summary", 2),  # fact join + final agg
        ("st5_returning_user", 2),  # one user_id exchange serves both windows
        # band self-join + candidate dedup + the deliberate round-robin
        # repartition that spreads shingle hashing past a single-row-group
        # input split (dedup.py::_doc_shingle_sets)
        ("d3_minhash_lsh_pairs", 3),
        ("a12_salted_skew_agg", 2),  # exactly phase-1 (key,salt) + phase-2 (key)
        ("st4_first_per_day_uv", 2),
        # t6 is pure map-side array arithmetic — any exchange is a regression
        ("t6_repetition", 0),
        ("t5_normalize", 0),
        ("m3_corrupt_quarantine", 0),
        ("c4_corpus_shuffle", 1),   # the per-shard rank window only
        ("c5_pseudonymize", 1),     # the per-user count window only
        # as-of join: ONE key exchange for the union+window carry — a
        # range-join rewrite would show as extra exchanges/joins
        ("j10_asof_join", 1),
        ("st8_scd2_intervals", 1),  # both windows share one user_id sort
        ("c7_quota_sample", 1),     # the per-stratum rank window only
        ("st9_retract_changelog", 1),  # lag window; explode is map-side
        # t12: (doc,char) count + per-doc fold; the doc_id agg reuses
        # the partial's partitioning and the join back broadcasts
        ("t12_char_entropy", 2),
    ],
)
def test_shuffle_budget(spark, name, budget):
    """Shuffle budgets: a regression here means a rewrite quietly added an
    exchange that becomes the bottleneck at 100 TB."""
    df = q(name, spark)
    assert shuffle_count(df) <= budget, formatted_plan(df)


def test_j9_salted_join_plan(spark):
    """j9: the salt must survive into the join's partitioning — a
    (key, __salt) hash-partitioned exchange on the fact side and NO
    broadcast (a broadcast would make the salting vacuous)."""
    df = q("j9_salted_skew_join", spark)
    plan = formatted_plan(df)
    assert broadcast_join_count(df) == 0, plan
    exchanges = [
        line for line in plan.splitlines() if "hashpartitioning" in line
    ]
    assert any(
        "__salt" in e and "event_type" in e for e in exchanges
    ), exchanges


def test_d8_broadcasts_eval_index(spark):
    """d8: the tiny eval shingle index must join as a broadcast — the
    100 TB training side streams map-side; a sort-merge here would
    shuffle the whole corpus's shingles."""
    df = q("d8_decontamination", spark)
    assert broadcast_join_count(df) >= 1
    assert sort_merge_join_count(df) == 0


def test_salted_agg_two_phase_plan(spark):
    """a12: the salted aggregation must really expand the hot key — an
    exchange hash-partitioned on (event_type, __salt) feeding the phase-1
    aggregate, then a second exchange on event_type alone for the combine.
    Collapsing to one exchange means the salt was optimized away and the
    hot key funnels through one reducer again."""
    df = q("a12_salted_skew_agg", spark)
    plan = formatted_plan(df)
    assert "__salt" in plan, plan
    assert shuffle_count(df) == 2, plan
    # the salt column must be a partitioning key of the first exchange
    import re

    exchanges = [
        line for line in plan.splitlines() if "hashpartitioning" in line
    ]
    assert any("__salt" in e for e in exchanges), exchanges


def test_column_pruning_fact_scan(spark):
    """q0: the lineitem scan must not read unused columns (l_comment-class
    waste at 100 TB)."""
    df = q("q0_flagship_trade_summary", spark)
    schemas = read_schema(df)
    li = [s for s in schemas if "l_orderkey" in s]
    assert li and all("l_tax" not in s and "l_shipdate" not in s for s in li)


def test_j11_is_hash_join_not_nested_loop(spark):
    """j11: the bin-cover rewrite must plan a broadcast HASH join on the
    bin key (range check as residual) — a BroadcastNestedLoopJoin means
    the rewrite regressed to the naive theta-join."""
    df = q("j11_range_join", spark)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert broadcast_join_count(df) == 1


def test_s6_broadcasts_df_and_stats(spark):
    """s6: the df table and the 1-row corpus stats broadcast back onto
    the tf rows; the corpus itself must never be on the build side."""
    df = q("s6_bm25_topk", spark)
    plan = formatted_plan(df)
    # df join is a broadcast hash join; stats is a 1-row broadcast cross
    assert broadcast_join_count(df) >= 1
    assert "SortMergeJoin" not in plan
    assert has_take_ordered(df)


def test_t7_topk_is_take_ordered(spark):
    """t7: corpus bigram top-k must be TakeOrderedAndProject (per-
    partition heaps), never a global Sort over all bigrams."""
    df = q("t7_ngram_stats", spark)
    assert has_take_ordered(df)


def test_c9_chunking_zero_shuffle(spark):
    """c9: chunk explosion is sequence+slice inside codegen — any
    exchange means the map-side claim in SCALE.md is no longer true."""
    df = q("c9_doc_chunks", spark)
    assert shuffle_count(df) == 0


def test_w10_window_partitions_by_user(spark):
    """w10: the running high-water mark must partition by user_id (one
    exchange) plus the final event_type agg — a global running max
    would show as a SinglePartition exchange."""
    df = q("w10_late_event_audit", spark)
    assert shuffle_count(df) <= 2
    assert "SinglePartition" not in formatted_plan(df)


def test_s7_rerank_is_shortlist_bounded(spark):
    """s7: the exact-cosine stage must join the SHORTLIST to embeddings
    (hash join on doc_id) plus the 1-row query-vector broadcast — a
    corpus-wide crossJoin would show as a non-broadcast nested loop."""
    df = q("s7_hybrid_rerank", spark)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    # the only nested-loop joins are the two 1-row broadcasts (s6's
    # corpus stats + the query vector), never a corpus-sized side
    tree = plan.split("\n\n")[0]
    assert tree.count("BroadcastNestedLoopJoin") <= 2


def test_t8_vocab_joins_not_broadcast_corpus(spark):
    """t8: the bigram/unigram tables join with no corpus-sized build
    side; the only broadcasts are the two 1-row totals."""
    df = q("t8_pmi_bigrams", spark)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert has_take_ordered(df)


@pytest.mark.parametrize(
    ("name", "max_stages"),
    [
        # regex/string expressions: fully codegen'd, scan→project fused
        ("t2_quality_score", 1),
        ("t5_normalize", 1),
        # array-HOF lambdas (transform/filter) are interpreted in Spark —
        # one interpreted Project legitimately splits the span in two;
        # a THIRD stage means something else fell out of codegen (the
        # 5× d4 regression class documented in operators/dedup.py)
        ("t6_repetition", 2),
        ("c9_doc_chunks", 2),
        # t10: one array-HOF project over the scan, zero shuffles
        ("t10_gopher_rules", 2),
        # t11: pure regex expressions — scan→project fused, zero shuffles
        ("t11_pii_audit", 1),
        # a6b: regexp_extract_all tokenize + explode codegen'd; the
        # count agg adds its partial/final stages around one exchange
        ("a6b_cjk_keyword_count", 3),
    ],
)
def test_mapside_queries_codegen_span(spark, name, max_stages):
    """Map-side operators must stay inside the expected WholeStageCodegen
    span count — extra stages mean expressions fell out of codegen."""
    from real_time_data_warehouse_spark.plans.audit import (
        codegen_stage_count,
    )

    df = q(name, spark)
    assert codegen_stage_count(df) <= max_stages, formatted_plan(df)


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """Runtime row-level filtering — the semi-join reduction that matters
    at 100 TB: with a selective predicate on the dimension side of a
    shuffle join, Catalyst injects a bloom filter built from the dim keys
    and applies might_contain on the FACT side before its shuffle, so
    non-joining fact rows never cross the wire. Pin that the injection
    actually fires on this build (thresholds lowered to fixture scale;
    broadcast disabled to force the shuffle join the feature targets)."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        od = spark.read.parquet(f"{SF_DIR}/orders.parquet").where(
            F.col("o_orderstatus") == "F"
        )
        j = (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderstatus")
            .count()
        )
        optimized = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in optimized.lower()
        physical = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in physical.lower()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_a13_shuffles_candidates_not_vocabulary(spark):
    """a13: the exact phase must broadcast the candidate set and total
    (two broadcasts), and the only shuffles are the tiny candidate
    distinct + the pruned final aggregate — the vocabulary-wide shuffle
    a plain GROUP BY HAVING would take must not appear as extra
    exchanges."""
    df = q("a13_heavy_hitters", spark)
    plan = formatted_plan(df)
    # candidate prune = BroadcastHashJoin; 1-row total = broadcast NLJ
    assert broadcast_join_count(df) == 1, plan
    assert "BroadcastNestedLoopJoin" in plan
    assert shuffle_count(df) <= 3, plan


def test_a19_cms_grid_is_broadcast_and_bounded(spark):
    """a19: the probe side joins the ≤ d·w-row sketch grid as a
    BROADCAST hash join (a shuffle join here would repartition the fact
    by (r, bucket) — pointless for a 2048-row grid), and the whole plan
    stays within the grid agg + top-k + probe-group shuffles."""
    df = q("a19_cms_point_estimates", spark)
    plan = formatted_plan(df)
    assert broadcast_join_count(df) >= 1, plan
    assert "CartesianProduct" not in plan
    assert shuffle_count(df) <= 4, plan


def test_t18_drift_joins_are_broadcast_and_vocab_capped(spark):
    """t18: the vocab cut and the sources×vocab pair grid must come back
    as broadcasts (the per-source relation is O(sources·V), never
    O(vocab)); the corpus-scale work is the one token-count shuffle
    plus the small regroup/final aggregates."""
    df = q("t18_js_source_drift", spark)
    plan = formatted_plan(df)
    assert broadcast_join_count(df) >= 1, plan
    assert "CartesianProduct" not in plan
    assert shuffle_count(df) <= 5, plan


def test_z5_bloom_grid_is_broadcast(spark):
    """z5: the bloom grid, geometry scalar, file dim and probe set all
    join as broadcasts — no shuffle join anywhere. The only DATA-SCALE
    shuffle is the distinct-pairs dedup (behind the checkpoint); the
    rest of the exchange count is grid/probe/scalar-sized relations
    (≤ files·m_words rows), so the budget is loose on count but every
    exchange moves kilobytes."""
    df = q("z5_bloom_file_skip", spark)
    plan = formatted_plan(df)
    assert broadcast_join_count(df) >= 3, plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan, plan
    assert shuffle_count(df) <= 12, plan


def test_z1_single_wide_shuffle_and_broadcast_bounds(spark):
    """z1: range bounds come back as ONE broadcast row; the only wide
    shuffle is the final per-file stats aggregate."""
    df = q("z1_zorder_layout", spark)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row bounds broadcast
    assert shuffle_count(df) <= 2, plan


def test_m4_band_join_is_equi_not_nested_loop(spark):
    """m4: the banded Hamming candidate join must plan as an equi-join on
    (band, bucket) — a nested-loop/cartesian here is the all-pairs
    compare the OR-construction exists to avoid."""
    plan = formatted_plan(q("m4_media_phash_dedup", spark))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_s8_greedy_is_grouped_pandas_over_broadcast_shortlist(spark):
    """s8: the query side broadcasts into the shortlist scoring, and the
    sequential MMR greedy appears as exactly one grouped-pandas node —
    shortlist state never leaves its executor group."""
    df = q("s8_mmr_rerank", spark)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan  # query side broadcast
    assert "FlatMapGroupsInPandas (" in plan, plan
    assert shuffle_count(df) <= 2, plan


def test_st11_funnel_single_shuffle(spark):
    """st11: the sequential stage logic must run as an array fold after
    ONE per-user shuffle — per-stage self-joins would re-shuffle the
    event stream once per funnel stage."""
    df = q("st11_funnel", spark)
    assert shuffle_count(df) <= 2, formatted_plan(df)  # user agg + final 1-row agg


def test_a16_gapfill_no_wide_joins(spark):
    """a16: the spine join is daily-table sized and the bounds come back
    as a 1-row broadcast — the event stream itself reduces before any
    join."""
    df = q("a16_gapfill_locf", spark)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan  # 1-row bounds
    assert "CartesianProduct" not in plan


def test_a17_trailing_window_one_reduce(spark):
    """a17: one reduce to user-days, one window — no self-join for the
    trailing frame."""
    df = q("a17_spike_detection", spark)
    assert shuffle_count(df) <= 2, formatted_plan(df)


def test_st12_transitions_lead_plus_agg(spark):
    """st12: lead() window + aggregate + broadcast row-total join — the
    transition matrix never self-joins the stream."""
    df = q("st12_transition_matrix", spark)
    assert broadcast_join_count(df) >= 1, formatted_plan(df)
    assert shuffle_count(df) <= 3, formatted_plan(df)


def test_d13_one_shingle_shuffle_plus_broadcast_sizes(spark):
    """d13: distinct (source, shingle) reduces map-side, ONE shuffle
    groups by shingle, pairs generate map-side, and both size tables
    broadcast — the |sources|² matrix never shuffles pairwise."""
    df = q("d13_source_overlap", spark)
    assert broadcast_join_count(df) == 2, formatted_plan(df)
    assert "CartesianProduct" not in formatted_plan(df)


def test_d2c_no_cartesian_and_bounded_shuffles(spark):
    """d2c: prefix index + verify joins are all equi-joins; the extra
    passes over d2 are linear (frequency agg, per-doc rank, verify),
    never a pairwise product."""
    df = q("d2c_prefix_jaccard", spark)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_d15_linear_not_pairwise(spark):
    """d15: gram counts reduce in one shuffle, spans join back on the
    gram equi-key, and the interval merge + rollup share the doc_id
    partitioning — never a pairwise doc×doc product and no more
    exchanges than {repartition, gram-agg, gram-join-back, doc window}."""
    df = q("d15_substring_spans", spark)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert shuffle_count(df) <= 4, plan


def test_st13_single_user_exchange(spark):
    """st13: lag, running sum, and the session rollup must all ride ONE
    hash exchange on user_id (the groupBy keys extend the window
    partition key, so Catalyst reuses the distribution)."""
    df = q("st13_sessionization", spark)
    assert shuffle_count(df) == 1, formatted_plan(df)


def test_s10_vectorized_combiner_no_join(spark):
    """s10: the exact-kNN kernel is a vectorized numpy matmul inside
    mapInPandas with a per-batch top-k combiner — NO join of any kind
    (the collection never shuffles pairwise), one exchange for the
    global per-anchor top-k, group-limit pruning below it."""
    df = q("s10_knn_label_noise", spark)
    plan = formatted_plan(df)
    assert "MapInPandas" in plan
    assert "Join" not in plan, plan
    assert shuffle_count(df) == 1, plan
    assert "WindowGroupLimit" in plan


def test_d16_linear_not_pairwise(spark):
    """d16: occurrence ranking is one gram-key window, the island merge
    + interval collect share the doc_id partitioning, and the rebuild
    joins intervals back on the doc equi-key — never doc×doc."""
    df = q("d16_substring_strip", spark)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert shuffle_count(df) <= 4, plan


def test_s11_vectorized_combiner_no_join(spark):
    """s11: same contract as s10 — matmul + per-batch combiner in
    mapInPandas, no join, one exchange, map-side group-limit."""
    df = q("s11_hard_negatives", spark)
    plan = formatted_plan(df)
    assert "MapInPandas" in plan
    assert "Join" not in plan, plan
    assert shuffle_count(df) == 1, plan
    assert "WindowGroupLimit" in plan


def test_a14_window_topn_pruned_rank(spark):
    """a14: the rank input is the pre-aggregated (window, type) table —
    two exchanges total (partial agg + window rank), WindowGroupLimit
    pruning before the second."""
    df = q("a14_window_topn", spark)
    plan = formatted_plan(df)
    assert shuffle_count(df) <= 2, plan
    assert "WindowGroupLimit" in plan


def test_w11_cumulate_one_exchange(spark):
    """w11: the cumulate fan-out is a map-side sequence+explode; the
    only exchange is the (cycle, k) partial->final aggregate."""
    df = q("w11_cumulate_window", spark)
    assert shuffle_count(df) == 1, formatted_plan(df)


def test_s12_is_equi_join_on_label(spark):
    """s12: the metadata constraint must plan as a HASH join on label
    (the pre-filter shape that shards the search per label) — a
    BroadcastNestedLoopJoin/CartesianProduct means the constraint
    degraded to a residual filter over the cross product."""
    df = q("s12_label_partitioned_ann", spark)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert (
        broadcast_join_count(df) + sort_merge_join_count(df) >= 1
    ), plan


def test_d17_cell_join_is_equi_not_nested_loop(spark):
    """d17: the within-cluster pair generation must plan as an equi-join
    on the cell key — a nested-loop here is the corpus² all-pairs
    compare that cluster-scoping exists to avoid — and the checkpointed
    assignment bounds the whole query to a few exchanges."""
    df = q("d17_semantic_dedup", spark)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert shuffle_count(df) <= 5, plan


def test_t13_head_is_take_ordered(spark):
    """t13: the vocabulary head must arrive via TakeOrdered (top-K per
    partition, K-row merge) — a global sort of the vocabulary would be
    the scale bug. Two exchanges exactly: the deliberate round-robin
    spread of the skinny text projection (the d2 single-input-split
    guard — without it the whole tokenize stage runs on ONE task and
    the round-12 decade probe measured 17.3x on 10x data) and the
    token-count shuffle; the K-row window/fit adds none."""
    df = q("t13_zipf_slope", spark)
    plan = formatted_plan(df)
    assert "TakeOrdered" in plan, plan
    assert "roundrobin" in plan.lower(), plan  # the spread is pinned too
    assert shuffle_count(df) <= 2, plan


def test_a18_prefix_sum_is_two_phase(spark):
    """a18: the event stream's running totals must compute under a
    bucket-PARTITIONED window (parallel local prefixes) with the only
    unpartitioned window over the 32-row bucket-totals frame, and the
    offsets must broadcast back — a global ORDER BY window over the
    events table is the single-reducer bug this operator exists to
    avoid."""
    import re

    df = q("a18_running_total", spark)
    plan = formatted_plan(df)
    specs = [
        line
        for line in plan.splitlines()
        if "windowspecdefinition(" in line
    ]
    assert specs, plan
    # PARTITIONED = __bucket is a partition key: it appears as a bare
    # first argument ("__bucket#N,"), not a sort column ("__bucket#N ASC").
    # Substring presence is not enough — a regression to
    # Window.orderBy("__bucket", ...) (global sort, one reducer) still
    # mentions the column but renders it with a sort direction.
    part_re = re.compile(r"windowspecdefinition\(__bucket#\d+,")
    partitioned = [x for x in specs if part_re.search(x)]
    unpartitioned = [x for x in specs if not part_re.search(x)]
    assert partitioned, plan  # local prefixes keyed by bucket
    # any unpartitioned window may touch only the bucket-totals columns
    assert all("__t_" in x for x in unpartitioned), specs
    assert broadcast_join_count(df) >= 1, plan


def test_d19_single_hash_shuffle(spark):
    """d19: c9's explode is map-side and both windows share ONE
    chunk_hash exchange — chunk dedup must stay the cheapest rung of
    the ladder."""
    df = q("d19_chunk_dedup", spark)
    assert shuffle_count(df) <= 1, formatted_plan(df)


def test_t15_single_scan_totals_broadcast(spark):
    """t15: the documents scan runs ONCE (the checkpointed cell table
    serves both the output and the row totals) and the per-label totals
    come back as a broadcast onto the |langs|² cells."""
    import re

    df = q("t15_lang_confusion", spark)
    plan = formatted_plan(df)
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M)
    assert len(scans) <= 1, plan  # 0 once the checkpoint hides the scan
    assert broadcast_join_count(df) >= 1, plan
    assert shuffle_count(df) <= 2, plan


def test_s13_dense_list_is_take_ordered(spark):
    """s13: the dense candidate list must arrive via TakeOrdered (a
    global cosine sort of the corpus is the scale bug); the query
    vector is a 1-row broadcast. Budget 4: the r9 warning-free
    bounded-window idiom (functions/windows.py) hash-partitions the
    ≤2K-row fusion frame on its constant column where the old
    partition-less spec rode TakeOrdered's single partition for free —
    one extra exchange of ≤2K rows, not a data-scale shuffle."""
    df = q("s13_rrf_fusion", spark)
    plan = formatted_plan(df)
    assert "TakeOrdered" in plan, plan
    assert shuffle_count(df) <= 4, plan


def test_c13_single_cluster_shuffle(spark):
    """c13: both windows (size count, hash rank) share ONE cluster_id
    exchange on top of d6's cached artifact."""
    df = q("c13_cluster_weighted_sample", spark)
    assert shuffle_count(df) <= 1, formatted_plan(df)


def test_z2_single_scan_expand_aggregate(spark):
    """z2: all per-column statistics come from ONE lineitem scan — the
    multi-distinct runs as Expand + partial aggregation, not one scan
    per column."""
    import re

    df = q("z2_column_stats", spark)
    plan = formatted_plan(df)
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M)
    assert len(scans) == 1, plan
    assert "Expand" in plan, plan


def test_c15_rank_is_two_phase_prefix(spark):
    """c15: the corpus-wide quality rank must come from the bucketed
    prefix (partitioned local windows + broadcast offsets), never an
    unpartitioned ROW_NUMBER over the corpus."""
    import re

    df = q("c15_curriculum_phases", spark)
    plan = formatted_plan(df)
    specs = [
        line for line in plan.splitlines() if "windowspecdefinition(" in line
    ]
    part_re = re.compile(r"windowspecdefinition\(__bucket#\d+,")
    partitioned = [x for x in specs if part_re.search(x)]
    unpartitioned = [x for x in specs if not part_re.search(x)]
    assert partitioned, plan
    assert all("__t_" in x for x in unpartitioned), specs
    assert broadcast_join_count(df) >= 1, plan


def test_t16_model_joins_and_vocab_broadcast(spark):
    """t16: the 1-row vocab aggregate must broadcast onto the bigram
    model (V is a scalar artifact, never a shuffle key), the bigram
    stream must collapse to per-(doc,gram) tf before the scoring join,
    and no plan node may be a cartesian product."""
    df = q("t16_bigram_perplexity", spark)
    plan = formatted_plan(df)
    assert broadcast_join_count(df) >= 1, plan  # vocab scalar
    assert "CartesianProduct" not in plan, plan
    # the gram-keyed model/scoring exchanges plus the doc aggregates:
    # anything past 8 means a rewrite duplicated a corpus pass
    assert shuffle_count(df) <= 8, plan


def test_s14_broadcast_queries_and_topk(spark):
    """s14: the 10-row quantized query side must broadcast (the s1
    shape) — a sort-merge join over the code scan would shuffle the
    whole corpus; ranking must stay a windowed TopN, not a global
    sort-limit."""
    df = q("s14_sq8_ann_topk", spark)
    plan = formatted_plan(df)
    # 10 quantized queries × corpus: broadcast nested loop is the
    # intended flat-scan shape (the s1 brute-force contract)
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert sort_merge_join_count(df) == 0, plan
    # per-partition TopN pushdown before the final window (rank never
    # becomes a global sort of all scored pairs)
    assert "WindowGroupLimit" in plan, plan
    assert "row_number" in plan, plan


def test_z3_prefix_is_two_phase(spark):
    """z3: the compaction plan's running-bytes prefix must be the
    two-phase form — day-partitioned local prefixes, with the only
    unpartitioned window over the bucket-totals frame, offsets
    broadcast back (a18's contract applied to the file catalog)."""
    import re

    df = q("z3_compaction_plan", spark)
    plan = formatted_plan(df)
    specs = [
        line for line in plan.splitlines() if "windowspecdefinition(" in line
    ]
    assert specs, plan
    part_re = re.compile(r"windowspecdefinition\(__bucket#\d+,")
    assert [x for x in specs if part_re.search(x)], plan
    assert all(
        "__t_" in x for x in specs if not part_re.search(x)
    ), specs
    assert broadcast_join_count(df) >= 1, plan


def test_c16_totals_broadcast_single_cluster_pass(spark):
    """c16: the 2-value totals frame must broadcast back onto the
    per-source aggregate, and composing d6 must not re-run label
    propagation (the cluster table arrives via the checkpointed
    artifact, so the plan contains no iterative-join tower)."""
    df = q("c16_dedup_adjusted_mixture", spark)
    plan = formatted_plan(df)
    assert broadcast_join_count(df) >= 1, plan
    assert "CartesianProduct" not in plan, plan
    # doc join + source agg + totals: the d6 side is a scan of the
    # checkpointed cluster table, not a recomputation
    assert plan.count("Scan ExistingRDD") >= 1, plan


def test_s15_broadcast_probes_over_cell_join(spark):
    """s15: the ~20-row (query, cell, code) probe frame must broadcast
    onto the cell-keyed inverted list (the IVF prune as an equi-join),
    with per-partition TopN before the final window — a shuffle of the
    corpus side on anything but nothing (map-side broadcast probe)
    would defeat the two-stage design."""
    df = q("s15_ivf_sq8_topk", spark)
    plan = formatted_plan(df)
    assert broadcast_join_count(df) >= 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_j12_bucketed_join_no_exchange_no_sort(spark):
    """j12: the co-located join must plan a SortMergeJoin with ZERO
    shuffle exchanges on the join path and no per-query sort of either
    bucketed side (sortBy at write time) — the only exchange allowed
    is the final priority aggregation. A regression here means the
    bucket metadata stopped reaching the planner (e.g. someone swapped
    the catalog read for a path read)."""
    df = q("j12_bucketed_join", spark)
    plan = formatted_plan(df)
    # both scans must carry bucket metadata (a path read loses it)
    assert plan.count("Bucketed: true") == 2, plan
    assert shuffle_count(df) <= 1, plan  # the final agg only
    # at fixture scale Catalyst may pick a broadcast over the co-located
    # SMJ (both are exchange-free); disabling autoBroadcast exposes the
    # claim this operator exists for — SortMergeJoin with NO exchange
    # and NO per-query sort on either bucketed+sorted side
    # NB: build the frame FIRST — the query fn's Tables() re-applies
    # session.tune(), resetting these confs; physical planning is lazy,
    # so the conf override lands if set before the first explain
    df2 = q("j12_bucketed_join", spark)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plan2 = formatted_plan(df2)
        assert sort_merge_join_count(df2) == 1, plan2
        assert shuffle_count(df2) <= 1, plan2
        import re

        join_input_sorts = [
            line
            for line in plan2.splitlines()
            if re.match(r"\(\d+\) Sort(\s|$)", line.strip())
        ]
        assert len(join_input_sorts) == 0, plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.conf.set("spark.sql.adaptive.enabled", aqe)


def test_j15_stream_side_is_broadcast_join_no_shuffle(spark):
    """j15: the stream-static enrichment must plan as a broadcast hash
    join with NO stream-side shuffle — the 100 TB posture the row's
    docstring claims. Asserted on the streaming frame itself (explain
    works pre-start), not on a batch stand-in."""
    from real_time_data_warehouse_spark.operators.streaming_exec import (
        _SRC_FILES,
        _sliced_source,
    )
    from real_time_data_warehouse_spark.streaming.pipelines import (
        stream_events,
    )
    from real_time_data_warehouse_spark.tables import Tables

    src = _sliced_source(spark, SF_DIR, _SRC_FILES)
    t = Tables(spark, SF_DIR)
    dim = t.customer.join(
        F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select(
        F.col("c_custkey").alias("user_id"),
        F.col("n_name").alias("nation_name"),
    )
    enriched = (
        stream_events(spark, src)
        .select("event_id", "user_id", "event_type", "value")
        .join(F.broadcast(dim), "user_id", "left")
    )
    # a streaming frame only plans once started: run one availableNow
    # pass into a throwaway memory sink and read the EXECUTED plan back
    q_ = (
        enriched.writeStream.format("memory")
        .queryName("j15_plan_probe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q_.awaitTermination(180)
        physical = q_._jsq.explainInternal(False)
    finally:
        q_.stop()
    assert "BroadcastHashJoin" in physical
    assert "SortMergeJoin" not in physical
    # no Exchange on the streaming side: the only exchange allowed is
    # the broadcast one
    import re

    shuffles = re.findall(r"Exchange hashpartitioning", physical)
    assert not shuffles, physical
