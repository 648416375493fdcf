#!/usr/bin/env python
"""Capture `.explain("formatted")` for named queries into
plans/$SPARK_GRAFT_PLANS_ROUND/ (default r13).

    python tools/capture_plans.py before q0_flagship_trade_summary d3_... ...
    python tools/capture_plans.py after --all-headline

Writes plans/<round>/<query>_<tag>.txt — the optimization-round evidence
the judge diffs against OPTIMIZATION_<round>.md claims. Uses sf0.1 (the
bench scale) so plan shapes match the measured numbers.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13")
)

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


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if names == ["--all-headline"]:
        names = list(HEADLINE)

    from real_time_data_warehouse_spark.registry import query_map
    from real_time_data_warehouse_spark.session import get_spark

    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("rtdw-plan-capture", cpus=8)
    qmap = query_map()
    for name in names:
        df = qmap[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
