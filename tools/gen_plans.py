#!/usr/bin/env python
"""Generate PLANS.md — formatted physical plans for the scale-critical
queries, as standing evidence for the plan-shape claims SCALE.md makes
(broadcasts, shuffle counts, TakeOrdered, two-phase prefix, salting).

Regenerate after any operator rewrite:  python tools/gen_plans.py
(The plan-assertion suite in tests/test_plans.py is the enforcement;
this file is the human-readable snapshot of what it enforces.)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# One per plan claim family; keep short — this is evidence, not a dump.
SHOWCASE = (
    ("q0_flagship_trade_summary",
     "3 dim broadcasts; shuffles = fact join + final agg only"),
    ("j6_dim_chain_join",
     "4-stage dim chain: ALL broadcast hash joins, zero shuffles"),
    ("j9_salted_skew_join",
     "salt survives into the (key, __salt) exchange; no broadcast"),
    ("a12_salted_skew_agg",
     "two-phase salted agg: (key,salt) exchange then key exchange"),
    ("a18_running_total",
     "two-phase prefix sum: bucket-partitioned local windows; the only "
     "unpartitioned window is over the 32-row totals frame"),
    ("d2c_prefix_jaccard",
     "prefix-filtered candidates + exact verify; equi-joins only"),
    ("d17_semantic_dedup",
     "cluster-scoped self-join on the cell key; checkpointed single "
     "assignment pass"),
    ("t13_zipf_slope",
     "vocabulary head via TakeOrdered; round-robin spread past the "
     "single-input-split trap + ONE token-count shuffle"),
    ("z2_column_stats",
     "one parquet scan; multi-distinct as Expand + partial aggregation"),
    ("a7_daily_gmv",
     "day predicate pushed to the scan (partition-pruning analog)"),
    # round-6 additions
    ("t16_bigram_perplexity",
     "gram-keyed model passes; 1-row vocab broadcast; tf collapsed "
     "map-side before the scoring join"),
    ("s15_ivf_sq8_topk",
     "IVF prune as a ~20-row probe broadcast onto the cell-keyed "
     "inverted list; integer SQ8 scoring; WindowGroupLimit TopN"),
    ("z3_compaction_plan",
     "two-phase prefix over the file catalog: day-partitioned local "
     "windows; only the bucket-totals window is unpartitioned"),
    ("j12_bucketed_join",
     "co-located bucketed scan: hint('merge')-pinned SortMergeJoin with "
     "no join-path exchange and no per-query sort; the only exchange is "
     "the final 5-key agg (round-10 adjudication: without the hint the "
     "planner broadcast the orders side at bench scale)"),
    ("g1_pagerank",
     "one edge aggregation off the raw scan; final-round shape = edge "
     "join + dst re-aggregate + 1-row dangling-mass broadcast; prior "
     "rounds flat behind localCheckpoint scans"),
    ("d22_fuzzy_entity_match",
     "posting-list join keyed (gram, brand) after the relative df cap; "
     "Levenshtein verify on candidates only; per-probe TopN window"),
    ("t17b_bpe_encode",
     "merges applied as map-side folds over the |vocab| dictionary; "
     "corpus joins words against per-word symbol counts — the corpus "
     "is never re-segmented"),
    ("c17_perceptron_quality",
     "margin evaluation fused into one partial→final integer "
     "aggregate; no data-row shuffle in any round"),
    # round-7 additions
    ("s10b_knn_noise_ivf",
     "anchor probes join the cell-keyed inverted list as a plain "
     "shuffle equi-join (anchors scale with the corpus, NO driver "
     "collect); integer SQ8 scoring; per-anchor TopN window"),
    ("k2_serving_partition_readback",
     "read-back scan shows PartitionFilters on the cur_date range — "
     "the serving query touches one partition dir per requested day"),
    ("z4_snapshot_diff",
     "ONE co-partitioned full-outer SortMergeJoin on the key (broadcast "
     "at tiny sf); change classification and the unchanged-key drop are "
     "map-side projections; no cartesian anywhere"),
    # round-8 additions
    ("j13_interval_join_stream_readback",
     "read-back over the REAL streaming sink: horizon as a 1-row "
     "broadcast; per-purchase count is one hash aggregate over the "
     "already-joined pair log"),
    ("j14_left_outer_stream_readback",
     "outer-join sink read-back: min-of-branches watermark horizon as "
     "a 1-row broadcast; null-padded rows pass the same filter"),
    ("k6_jdbc_dim_roundtrip",
     "JDBCRelation scan with 4 partition predicates on n_nationkey (a "
     "REAL parallel database read), broadcast onto customer; one agg "
     "exchange"),
    # round-9 session-2 additions
    ("a19_cms_point_estimates",
     "d×w sketch grid as ONE partial→final aggregate off a map-side "
     "explode; top-k probes join the grid as a broadcast hash join"),
    ("t18_js_source_drift",
     "one (source, token) count shuffle; vocab cut via TakeOrdered; "
     "the sources×vocab pair grid and totals all broadcast"),
    ("z5_bloom_file_skip",
     "bloom grid built by bit_or partial→final off the distinct-pairs "
     "dedup; probe/grid/geometry joins all broadcast — no shuffle join "
     "anywhere"),
    # round-12 additions
    ("k2b_serving_rollover_readback",
     "the yesterday+today rollover range reaches the partition listing "
     "as a TWO-day filter (PartitionFilters carries both bounds) — the "
     "scan touches exactly two day dirs of the year-sized store"),
    ("j16_dim_refresh_stream_readback",
     "mid-stream dim refresh (S11 invalidation): every micro-batch "
     "re-reads the dim dir FRESH inside foreachBatch — a new file "
     "index per batch, never a cached InMemoryFileIndex serving the "
     "pre-update listing — then broadcast-joins the 25-row dim; the "
     "read-back below is one hash aggregate over the enriched sink"),
)


def main() -> int:
    from pyspark.sql import SparkSession

    from real_time_data_warehouse_spark.plans.audit import formatted_plan
    from real_time_data_warehouse_spark.registry import (
        QUERY_REGISTRY,
        query_map,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("gen-plans")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    query_map()
    out = [
        "# PLANS — physical-plan snapshots for the scale-critical queries",
        "",
        f"Generated by `python tools/gen_plans.py` at `{sf_dir}`. These are",
        "the plans the assertions in `tests/test_plans.py` enforce; regenerate",
        "after operator rewrites. SCALE.md explains WHY each shape is the",
        "100 TB-correct one.",
        "",
    ]
    for name, claim in SHOWCASE:
        df = QUERY_REGISTRY[name].fn(spark, sf_dir)
        out += [
            f"## {name}",
            "",
            f"**Claim:** {claim}",
            "",
            "```",
            formatted_plan(df).strip(),
            "```",
            "",
        ]
    path = os.path.join(REPO, "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written: {len(SHOWCASE)} plans")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
