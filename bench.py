#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is forced to execute fully (write to a noop-style sink via
count over the final plan) — results are not collected to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_time_data_warehouse_spark.registry import QUERY_REGISTRY, query_map
from real_time_data_warehouse_spark.session import get_spark

# Extended set: the heavier post-round-1 operators. NOT in the headline
# total (that set is frozen for cross-round comparability — BASELINE.md);
# measured median-of-3 the same way and reported under "extended" so
# per-query truth exists at sf0.1 for the newer scale-sensitive ops too.
# A frozen per-query baseline for THIS set (recorded driver round 5)
# lives in BASELINE.md "Frozen extended-set baseline" — compare a
# round's extended medians against it; >2x is a regression, not noise.
EXTENDED = (
    "s2b_lsh_multiband_topk",
    "s3_ivf_ann_topk",
    "s5_pq_adc_topk",
    "s6_bm25_topk",
    "s7_hybrid_rerank",
    "t7_ngram_stats",
    "t8_pmi_bigrams",
    "c9_doc_chunks",
    "d6_dedup_clusters",
    "d8_decontamination",
    "d12_shingle_containment",
    "j10_asof_join",
    "j11_range_join",
    "st8_scd2_intervals",
    "w10_late_event_audit",
    "c7_quota_sample",
    "c8_leakage_safe_split",
    # round-6 additions
    "t10_gopher_rules",
    "a13_heavy_hitters",
    "m4_media_phash_dedup",
    "z1_zorder_layout",
    "s8_mmr_rerank",
    "a2c_hll_partial_union",
    "c11_token_budget_plan",
    "st10_changelog_fold",
    "d13_source_overlap",
    "d2c_prefix_jaccard",
    "a15_retention_cohorts",
    "st11_funnel",
    "a16_gapfill_locf",
    "a17_spike_detection",
    "st12_transition_matrix",
    # driver-round-4 additions
    "d15_substring_spans",
    "d16_substring_strip",
    "st13_sessionization",
    "s10_knn_label_noise",
    "s11_hard_negatives",
    "a14_window_topn",
    "w11_cumulate_window",
    "c12_quality_weighted_sample",
    # driver-round-5 additions (not in the frozen extended baseline —
    # first recorded medians land in BENCH_r05)
    "a6b_cjk_keyword_count",
    "s12_label_partitioned_ann",
    "d17_semantic_dedup",
    "d17b_semdedup_recall_audit",
    "t12_char_entropy",
    "t13_zipf_slope",
    "c13_cluster_weighted_sample",
    "st1s_dedup_last_wins_replay",
    "d17c_semantic_dedup_multiprobe",
    "a18_running_total",
    "t14_vocab_growth",
    "s13_rrf_fusion",
    "d19_chunk_dedup",
    "t15_lang_confusion",
    "st4s_daily_uv_replay",
    "st6s_session_count_replay",
    "z2_column_stats",
    "c15_curriculum_phases",
    "d20_semantic_decontamination",
    # driver-round-6 additions (first recorded medians land in BENCH_r06)
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
    # driver-round-7 additions (first recorded medians land in BENCH_r07)
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
    # driver-round-8 additions (first recorded medians land in BENCH_r08)
    "st15_returning_user_stream_readback",
    "st16_daily_uv_stream_readback",
    "st17_visitor_fix_stream_readback",
    "j13_interval_join_stream_readback",
    "j14_left_outer_stream_readback",
    "k5_config_ddl_readback",
    "k6_jdbc_dim_roundtrip",
    "st18_dws_update_upsert_readback",
    # driver-round-9 additions (first recorded medians land in BENCH_r09;
    # artifact rows — cold = crash+restart streaming build, median =
    # cache read)
    "x1s_log_split_stream_readback",
    "x2s_dynamic_routing_stream_readback",
    "a6c_cjk_dict_segment",
    "d7x_dedup_gate_stream_readback",
    "d9x_semantic_gate_stream_readback",
    "w12_session_window_stream_readback",
    "a19_cms_point_estimates",
    "t18_js_source_drift",
    "z5_bloom_file_skip",
    "j15_dim_join_stream_readback",
    "w13_sliding_window_stream_readback",
    "u4_python_udtf_keywords",
    # driver-round-10 additions (first recorded medians land in
    # BENCH_r10; whole-app chain rows — cold = the 5-stateful-op /
    # dedup+window+dim-join streaming builds, median = cache read)
    "app1s_order_detail_stream_chain",
    "app2s_province_order_stream_chain",
    "app3s_sku_order_stream_chain",
    "app4s_dim_app_stream_chain",
    # driver-round-11 additions (first recorded medians land in
    # BENCH_r11; app5s cold = the 6-sink crash+restart DwdBaseLog
    # build, app6s cold = the two-dedup + 4-dim-window build)
    "app5s_base_log_stream_chain",
    "app6s_traffic_page_view_stream_chain",
    "app7s_user_login_stream_chain",
    "app8s_keyword_window_stream_chain",
    "app9s_pay_detail_stream_chain",
    "app9x_pay_detail_crash_restart",
    "app10s_cart_add_uu_stream_chain",
    "app11s_order_cancel_stream_chain",
    "app12s_cart_add_stream_chain",
    "app13s_comment_info_stream_chain",
    "app14s_base_db_stream_chain",
    "app15s_order_refund_stream_chain",
    "app16s_home_detail_stream_chain",
    "app17s_refund_pay_suc_stream_chain",
)

# Headline set: the flagship + one representative per operator family.
HEADLINE = (
    "q0_flagship_trade_summary",
    "j1_inner_equi_join",
    "j4_interval_join",
    "j6_dim_chain_join",
    "a1_windowed_sum",
    "a2_distinct_count",
    "a6_keyword_count",
    "st4_first_per_day_uv",
    "st5_returning_user",
    "x1_log_split",
    "d1_exact_dedup",
    "d2_ngram_jaccard_pairs",
    "d3_minhash_lsh_pairs",
    "d4_simhash",
    "s1_cosine_topk",
    "s2_lsh_ann_topk",
    "m1_media_features",
    "t2_quality_score",
    "t4_fingerprint",
)


def host_probe() -> float:
    """Single-core CPU yardstick: seconds for a fixed pure-Python
    integer-hash loop. Identical code benched 17.3 s → 41.7 s across one
    round-7 session purely from host degradation (BASELINE.md round-7
    freeze note); this probe rides along in the bench JSON so a future
    reader can separate code regressions from host noise WITHOUT session
    archaeology: query medians scale ≈ linearly with the probe on a
    degraded core. Reference on this class of host when healthy: ~0.22-0.24 s
    (calibrated round 8, headline 15.5 s); a 2x probe means a degraded
    core, scale expectations accordingly."""
    t0 = time.perf_counter()
    acc = 0
    for i in range(2_000_000):
        acc = (acc * 1315423911 + i) & 0xFFFFFFFFFFFF
    assert acc >= 0
    return round(time.perf_counter() - t0, 4)


def _probe_worker(_i: int) -> float:
    """One all-cores probe worker: the host_probe loop twice, timing
    only the second pass — the first pass absorbs pool-start stagger so
    every timed pass overlaps every other worker's (otherwise early
    workers finish before late ones start and contention is
    undercounted)."""
    acc = 0
    for i in range(2_000_000):
        acc = (acc * 1315423911 + i) & 0xFFFFFFFFFFFF
    t0 = time.perf_counter()
    for i in range(2_000_000):
        acc = (acc * 1315423911 + i) & 0xFFFFFFFFFFFF
    assert acc >= 0
    return time.perf_counter() - t0


def host_probe_multi() -> float:
    """All-cores CPU yardstick: the single-core probe loop run on every
    CPU concurrently (median per-process seconds of the synchronized
    second pass). On an idle host this ≈ the single-core probe; under
    MULTICORE contention — the round-10 weather that slowed every query
    ~1.37x while the single-core probe got FASTER — it inflates with
    the query medians. tools/bench_compare.py reads it to normalize
    drift ratios and to gate the weather verdict (healthy calibration
    in BASELINE.md round-11)."""
    import multiprocessing as mp

    n = min(32, os.cpu_count() or 1)
    ctx = mp.get_context("fork")
    with ctx.Pool(n) as pool:
        times = sorted(pool.map(_probe_worker, range(n)))
    return round(times[len(times) // 2], 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("rtdw-bench", cpus=cpus)
    qmap = query_map()
    names = [n for n in HEADLINE if n in QUERY_REGISTRY]

    # Warm the JVM/reader paths AND the Arrow/pandas-UDF worker pool once
    # so per-query numbers measure the queries, not session or Python
    # worker startup (the first pandas-UDF query otherwise pays ~2 s of
    # interpreter fork that has nothing to do with its plan).
    qmap["q0_flagship_trade_summary"](spark, sf_dir).count()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _noop(s):
        return s

    spark.range(32).select(_noop(F.col("id"))).count()

    # Median-of-3 per query, rounds INTERLEAVED across queries: single-
    # shot numbers proved untrustworthy on a shared machine (round-3
    # driver run was ~40% slower than round 2 with identical code), and
    # CONSECUTIVE reps proved untrustworthy inside a long suite (the r9
    # bench caught a ~60 s transient window — cleaner/GC class — that
    # inflated every rep of a contiguous ~15-query cohort 2-8x while
    # their isolated steady-state stayed ~1.3x; BASELINE.md "Round-9
    # drift audit"). Running round-robin (all queries once, then again,
    # then again) puts each query's reps in three different time
    # regions, so one transient window can contaminate at most one rep
    # and the median stays clean. Round-0 times ride along as "cold":
    # artifact rows (d6, d23, k*, st14-18, j13, x1s...) BUILD there and
    # read the cache on later rounds, so cold is the honest build+query
    # number and the median prices the warm read.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    probe_pre = host_probe()  # after warmup, before timed queries
    probe_multi_pre = host_probe_multi()

    def measure_interleaved(
        qnames: list[str],
    ) -> tuple[dict[str, float], dict[str, float]]:
        samples: dict[str, list[float]] = {n: [] for n in qnames}
        for _ in range(runs):
            for name in qnames:
                t0 = time.perf_counter()
                df = qmap[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                samples[name].append(time.perf_counter() - t0)
        med = {
            n: round(sorted(s)[len(s) // 2], 3) for n, s in samples.items()
        }
        first = {n: round(s[0], 3) for n, s in samples.items()}
        return med, first

    times, cold = measure_interleaved(names)

    run_ext = os.environ.get("SPARK_GRAFT_BENCH_EXTENDED", "1") != "0"
    ext_names = [n for n in EXTENDED if n in QUERY_REGISTRY] if run_ext else []
    ext, ext_cold = measure_interleaved(ext_names)

    probe_post = host_probe()  # detects mid-run host degradation
    probe_multi_post = host_probe_multi()
    total = round(sum(times.values()), 3)
    # The driver records only the LAST 2000 chars of stdout (observed:
    # BENCH_r04.json holds a mid-JSON tail and "parsed": null — the
    # extended dict pushed the headline value off the front). So the
    # printed line carries the headline set + totals ONLY (~900 chars,
    # always inside the window) and the full per-query detail — cold
    # times, extended medians — lands in bench_detail.json next to the
    # repo's other artifacts, rewritten every run.
    detail = {
        "metric": "headline_query_wall_clock_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "cold": cold,
        "extended": ext,
        "extended_cold": ext_cold,
        "host_probe": {"pre": probe_pre, "post": probe_post,
                       "multi_pre": probe_multi_pre,
                       "multi_post": probe_multi_post},
        "runs": runs,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_detail.json"),
        "w",
    ) as f:
        json.dump(detail, f, indent=1)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "cold_total": round(sum(cold.values()), 3),
                "extended_total": round(sum(ext.values()), 3),
                "extended_cold_total": round(sum(ext_cold.values()), 3),
                "extended_n": len(ext),
                # single-core CPU yardstick before/after the timed runs
                # (~0.22-0.24 s healthy, see host_probe docstring): separates code
                # regressions from host degradation without session notes
                "host_probe": {"pre": probe_pre, "post": probe_post,
                               "multi_pre": probe_multi_pre,
                               "multi_post": probe_multi_post},
                "runs": runs,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
