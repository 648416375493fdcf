#!/usr/bin/env python
"""One-decade scale probe of the quadratic-risk registry rows.

Runs the ~15 most scale-sensitive queries (candidate-generating dedup,
semantic-dedup verify joins, blocked entity resolution, two-stage ANN,
graph) at sf0.1 (the bench scale) AND at the 10x sf1 probe dataset
(tools/gen_sf1_probe.py), and prints per-query wall time + output rows
at both scales with the time ratio. A bounded-by-construction operator
should scale ≈ linearly (ratio ≈ 10 on 10x data, usually less because
fixed job overhead amortizes); a ratio ≫ 10 is a super-linear blowup
and becomes a named task.

    python tools/scale_probe.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"

PROBE_ROWS = [
    "d2_ngram_jaccard_pairs",
    "d2b_jaccard_capped",
    "d2c_prefix_jaccard",
    "d3_minhash_lsh_pairs",
    "d5_embedding_neardup",
    "d8_decontamination",
    "d17_semantic_dedup",
    "d17b_semdedup_recall_audit",
    "d17c_semantic_dedup_multiprobe",
    "d22_fuzzy_entity_match",
    "d22b_er_recall_audit",
    "d23_entity_clusters",
    "s15_ivf_sq8_topk",
    "g1_pagerank",
    "g2_triangle_count",
]


def main() -> int:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rtdw_sf1_probe"
    if not os.path.isdir(sf1):
        print(f"sf1 probe dir {sf1} missing — run tools/gen_sf1_probe.py")
        return 2

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from real_time_data_warehouse_spark.registry import (
        QUERY_REGISTRY,
        query_map,
    )

    query_map()
    results: dict[str, dict] = {}
    for name in PROBE_ROWS:
        fn = QUERY_REGISTRY[name].fn
        row: dict = {}
        for tag, sf_dir in (("sf0.1", SF01), ("sf1", sf1)):
            t0 = time.monotonic()
            try:
                n = fn(spark, sf_dir).count()
                row[tag] = {
                    "sec": round(time.monotonic() - t0, 3),
                    "rows": n,
                }
            except Exception as exc:  # keep probing the rest
                row[tag] = {
                    "sec": round(time.monotonic() - t0, 3),
                    "err": str(exc).splitlines()[0][:200],
                }
        if "err" not in row["sf0.1"] and "err" not in row["sf1"]:
            row["ratio"] = round(
                row["sf1"]["sec"] / max(row["sf0.1"]["sec"], 1e-9), 2
            )
        results[name] = row
        print(json.dumps({name: row}), flush=True)

    print("\n| query | sf0.1 s | rows | sf1 s | rows | time ratio |")
    print("|---|---|---|---|---|---|")
    for name, row in results.items():
        a, b = row["sf0.1"], row["sf1"]
        print(
            f"| {name} | {a.get('sec')} | {a.get('rows', a.get('err'))} "
            f"| {b.get('sec')} | {b.get('rows', b.get('err'))} "
            f"| {row.get('ratio', 'ERR')} |"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
