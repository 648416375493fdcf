"""Planted-fixture tests for g1 (integer-lattice PageRank) and d22
(blocked fuzzy entity matching)."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from real_time_data_warehouse_spark.operators.entity import fuzzy_match_frame
from real_time_data_warehouse_spark.operators.graph import (
    DAMP_DEN,
    DAMP_NUM,
    SCALE,
    pagerank_frame,
    transition_page_edges,
)
from real_time_data_warehouse_spark.plans.audit import formatted_plan


def _py_pagerank(
    edges: list[tuple[int, int, int]],
    iters: int,
    seeds: set[int] | None = None,
) -> dict[int, int]:
    """Pure-Python mirror of the exact lattice recurrence — same
    int/IEEE-double ops as both engines. ``seeds=None`` → global
    PageRank; otherwise restart mass is confined to seeds∩nodes."""
    out: dict[int, int] = defaultdict(int)
    for s, _, w in edges:
        out[s] += w
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    S = set(nodes) if seeds is None else (set(seeds) & set(nodes))
    ns = len(S)
    r = {v: (math.floor(SCALE / ns) if v in S else 0) for v in nodes}
    base = math.floor((3 * SCALE) / (20 * ns))
    for _ in range(iters):
        contrib: dict[int, int] = defaultdict(int)
        for s, d, w in edges:
            contrib[d] += math.floor(r[s] * w / out[s])
        dang = sum(r[v] for v in nodes if v not in out)
        share = math.floor(dang / ns)
        r = {
            v: (base if v in S else 0)
            + math.floor(
                DAMP_NUM
                * (contrib.get(v, 0) + (share if v in S else 0))
                / DAMP_DEN
            )
            for v in nodes
        }
    return r


# hub-and-spoke with a dangling sink: 1..3 all point at 4 (the hub),
# 4 points at 5, and 5 has NO outlinks — exercises the dangling-mass
# redistribution path, which the synthetic events graph never does
_PLANTED_EDGES = [(1, 4, 3), (2, 4, 1), (3, 4, 2), (4, 5, 4), (5, None, 0)]
_EDGE_ROWS = [(s, d, w) for s, d, w in _PLANTED_EDGES if d is not None]


def test_g1_planted_lattice_parity(spark):
    edges = spark.createDataFrame(_EDGE_ROWS, "src long, dst long, w long")
    got = {
        r["node"]: r["rank_unit"]
        for r in pagerank_frame(edges, n_iters=10).collect()
    }
    want = _py_pagerank(_EDGE_ROWS, 10)
    assert got == want
    # node 5 exists only as a dst (dangling) and must still be ranked
    assert 5 in got
    # the spokes' mass flows 1/2/3 -> 4 -> 5, so the hub outranks every
    # spoke and the sink (fed the hub's entire mass) outranks the hub
    assert got[4] > got[1]
    assert got[5] == max(got.values())


def test_g1_mass_conservation_bound(spark):
    edges = spark.createDataFrame(_EDGE_ROWS, "src long, dst long, w long")
    ranks = pagerank_frame(edges, n_iters=10).collect()
    total = sum(r["rank_unit"] for r in ranks)
    # floor() leaks sub-unit crumbs each round (per edge, per node, and
    # the two global shares) but never creates mass
    assert total <= SCALE
    assert total >= int(0.95 * SCALE)
    # rank column is exactly rank_unit / SCALE
    for r in ranks:
        assert r["rank"] == r["rank_unit"] / float(SCALE)


def test_g1_transition_edges_derivation(spark):
    events = spark.createDataFrame(
        [
            # user 7 visits pages 1 -> 2 -> 2 -> 3
            (1, "2024-01-01 00:00:01", 7, '{"k": 1}'),
            (2, "2024-01-01 00:00:02", 7, '{"k": 2}'),
            (3, "2024-01-01 00:00:03", 7, '{"k": 2}'),
            (4, "2024-01-01 00:00:04", 7, '{"k": 3}'),
            # unparseable props: dropped BEFORE ordering, so user 8's
            # transition 5 -> 6 survives the bad row between them
            (5, "2024-01-01 00:00:01", 8, '{"k": 5}'),
            (6, "2024-01-01 00:00:02", 8, "not json"),
            (7, "2024-01-01 00:00:03", 8, '{"k": 6}'),
        ],
        "event_id long, ts string, user_id long, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (r["src"], r["dst"]): r["w"]
        for r in transition_page_edges(events).collect()
    }
    assert got == {(1, 2): 1, (2, 2): 1, (2, 3): 1, (5, 6): 1}


def test_g1b_seeded_lattice_parity(spark):
    edges = spark.createDataFrame(_EDGE_ROWS, "src long, dst long, w long")
    # seed at spoke 1; 99 is off-graph and must be ignored
    seeds = spark.createDataFrame([(1,), (99,)], "node long")
    got = {
        r["node"]: r["rank_unit"]
        for r in pagerank_frame(edges, n_iters=10, seeds=seeds).collect()
    }
    assert got == _py_pagerank(_EDGE_ROWS, 10, seeds={1, 99})
    # restart is confined to the seed: walk mass flows 1 -> 4 -> 5,
    # spokes 2/3 receive nothing
    assert got[1] > 0 and got[4] > 0 and got[5] > 0
    assert got[2] == 0 and got[3] == 0


def test_g1b_empty_seed_set_is_empty(spark):
    edges = spark.createDataFrame(_EDGE_ROWS, "src long, dst long, w long")
    seeds = spark.createDataFrame([(99,)], "node long")  # off-graph only
    assert pagerank_frame(edges, n_iters=3, seeds=seeds).count() == 0


def test_g1_iteration_plan_shape(spark):
    edges = spark.createDataFrame(_EDGE_ROWS, "src long, dst long, w long")
    plan = formatted_plan(pagerank_frame(edges, n_iters=2))
    # the dangling-mass scalar joins as a broadcast of a 1-row frame,
    # never a true cartesian
    assert "CartesianProduct" not in plan


# --- d22 ---------------------------------------------------------------

_MASTERS = [
    (1, "alpha widget", "B1"),
    (2, "omega gadget", "B1"),
    (3, "brick house", "B1"),
    (4, "crane tower", "B1"),
    (5, "delta rocket", "B1"),
    (6, "ember stove", "B2"),
    (7, "flint knife", "B2"),
    (8, "grove basket", "B2"),
    (9, "haven lamp", "B2"),
    (10, "alpha widget", "B2"),  # same name, other brand
]


def _masters_df(spark):
    return spark.createDataFrame(
        _MASTERS, "master_id long, name string, brand string"
    )


def test_d22_matches_corrupted_probe_within_brand(spark):
    probes = spark.createDataFrame(
        [
            (101, "alpha widgt", "B1"),  # 1 deletion of master 1
            (102, "alpha widgt", "B2"),  # same qname, brand routes to 10
            (103, "zzzzzzzz", "B1"),  # nothing shared: NULL
        ],
        "probe_id long, qname string, brand string",
    )
    got = {
        r["probe_id"]: (r["matched_id"], r["dist"])
        for r in fuzzy_match_frame(_masters_df(spark), probes).collect()
    }
    assert got[101] == (1, 1)
    assert got[102] == (10, 1)
    assert got[103] == (None, None)


def test_d22_stop_gram_cap_blocks_common_only_probes(spark):
    # every master shares the "prefix0x" shape; all grams except the
    # final-digit ones hit df = 10 > 20% of 10 masters, so a probe
    # sharing ONLY the common grams gets no candidates — even though
    # its edit distance to several masters is 1. The cap (blocking
    # recall), not the verifier, must be what excludes it.
    masters = spark.createDataFrame(
        [(i, f"prefix0{i}", "B") for i in range(10)],
        "master_id long, name string, brand string",
    )
    probes = spark.createDataFrame(
        [(201, "prefix0", "B"), (202, "prefix03x", "B")],
        "probe_id long, qname string, brand string",
    )
    got = {
        r["probe_id"]: (r["matched_id"], r["dist"])
        for r in fuzzy_match_frame(masters, probes).collect()
    }
    # 201 shares only capped grams -> unmatched despite dist 1
    assert got[201] == (None, None)
    # 202 carries the discriminative gram "03x"? no — "x03"/"03x" never
    # occur in masters; but "x03" is not a master gram either. It DOES
    # share master 3's kept gram "x03"? master 3 is "prefix03": grams
    # include "x03" (df=1, kept) -> candidate -> dist("prefix03x",
    # "prefix03") = 1 -> matched to 3.
    assert got[202] == (3, 1)


def test_d22_brand_block_is_hard(spark):
    # identical rare name, wrong brand: never a candidate
    probes = spark.createDataFrame(
        [(301, "brick house", "B2")],
        "probe_id long, qname string, brand string",
    )
    got = fuzzy_match_frame(_masters_df(spark), probes).collect()
    assert got[0]["matched_id"] is None


def test_d22_plan_no_cartesian(spark):
    probes = spark.createDataFrame(
        [(101, "alpha widgt", "B1")],
        "probe_id long, qname string, brand string",
    )
    plan = formatted_plan(fuzzy_match_frame(_masters_df(spark), probes))
    assert "CartesianProduct" not in plan


def test_d23_clusters_transitively_within_brand(spark):
    from real_time_data_warehouse_spark.operators.entity import (
        entity_cluster_frame,
    )

    pads = [
        (i, n, "B1" if i % 2 else "B2")
        for i, n in enumerate(
            [
                "aardvark kit", "bramble pot", "crumpet tin", "dingo bell",
                "emerald fork", "fennel jar", "garnet hook", "hazel mug",
                "iris plate", "jasper bowl", "kelp tray", "lotus pan",
                "maple rack", "nutmeg bin", "onyx ladle",
            ],
            start=6,
        )
    ]
    masters = spark.createDataFrame(
        [
            # chain: 1-2 dist 1, 2-3 dist 1, 1-3 dist 2 — transitive
            # closure must still cluster all three. The shared "zebra"
            # grams have df = 4 <= 20% of the 20-row table, so they
            # survive the stop-gram cap and generate the candidates.
            (1, "zebra pq", "B1"),
            (2, "zebra pr", "B1"),
            (3, "zebra xr", "B1"),
            # identical name, other brand: hard-blocked apart
            (4, "zebra pq", "B2"),
            # unrelated singleton
            (5, "lonely gadget", "B1"),
        ]
        + pads,
        "master_id long, name string, brand string",
    )
    got = {
        r["master_id"]: (r["cluster_id"], r["is_canonical"])
        for r in entity_cluster_frame(masters).collect()
    }
    assert got[1] == (1, 1)
    assert got[2] == (1, 0)
    assert got[3] == (1, 0)  # linked only through 2 — transitivity
    # brand boundary holds even for an identical name
    assert got[4] == (4, 1)
    # singletons are their own canonical cluster
    assert got[5] == (5, 1)
    assert all(got[i] == (i, 1) for i in range(6, 21))


def test_g2_planted_triangles(spark):
    from real_time_data_warehouse_spark.operators.graph import (
        triangle_counts_frame,
    )

    # two triangles sharing the 2-3 edge, plus a pendant node 4
    und = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (2, 5), (3, 5)],
        "a long, b long",
    )
    got = {
        r["node"]: (r["degree"], r["triangles"], r["clustering"])
        for r in triangle_counts_frame(und).collect()
    }
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (3, 2, 2 / 3)
    assert got[3] == (4, 2, 1 / 3)
    assert got[4] == (1, 0, 0.0)  # pendant: no wedge, clustering 0
    assert got[5] == (2, 1, 1.0)


def test_g1s_boundary_chaining_matches_batch(spark, tmp_path):
    """The streaming-hard claim of g1s in isolation: a user's sequence
    split across micro-batches still yields the batch-derived edge set
    (the boundary transition comes from carried last-event state), and
    a user with a null-page event in between chains across it."""
    import os

    import pyspark.sql.functions as F

    from real_time_data_warehouse_spark.operators.graph import (
        transition_page_edges,
    )
    from real_time_data_warehouse_spark.streaming.pagerank_stream import (
        apply_pagerank_batch,
    )

    rows = [
        # user 1: pages 10 -> 20 -> 30, one event per batch
        (1, "2024-01-01 00:00:00", 1, '{"k": 10}'),
        (1, "2024-01-01 00:10:00", 2, '{"k": 20}'),
        (1, "2024-01-01 00:20:00", 3, '{"k": 30}'),
        # user 2: 10 -> (unparseable) -> 10 — chains across the junk
        (2, "2024-01-01 00:01:00", 4, '{"k": 10}'),
        (2, "2024-01-01 00:11:00", 5, "not json"),
        (2, "2024-01-01 00:21:00", 6, '{"k": 10}'),
        # user 3: single event, no transition
        (3, "2024-01-01 00:02:00", 7, '{"k": 40}'),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts_s string, event_id long, props string"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "event_id", "props")
    # 3 time-range batches, one 10-minute band each
    store = os.path.join(str(tmp_path), "store")
    out = os.path.join(str(tmp_path), "out")
    for b, (lo, hi) in enumerate(
        [("00:00", "00:10"), ("00:10", "00:20"), ("00:20", "00:30")]
    ):
        batch = ev.where(
            (F.date_format("ts", "HH:mm") >= lo)
            & (F.date_format("ts", "HH:mm") < hi)
        )
        apply_pagerank_batch(spark, batch, b, store, out)
    log = spark.read.option("basePath", out).parquet(out)
    from pyspark.sql.window import Window

    w = Window.partitionBy("src", "dst").orderBy(F.col("batch_id").desc())
    stream_edges = {
        (r["src"], r["dst"]): r["w"]
        for r in log.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .collect()
    }
    batch_edges = {
        (r["src"], r["dst"]): r["w"]
        for r in transition_page_edges(ev).collect()
    }
    assert stream_edges == batch_edges
    assert stream_edges == {(10, 20): 1, (20, 30): 1, (10, 10): 1}

    # The r13 finalize shortcut: every batch re-emits the FULL merged
    # catalog, so the LATEST generation alone (what pagerank_from_log
    # now reads via read_snapshot) must equal the window-compacted
    # last-wins view over all generations that it replaced.
    from real_time_data_warehouse_spark.streaming.pagerank_stream import (
        _EDGE_SCHEMA,
    )
    from real_time_data_warehouse_spark.streaming.state_store import (
        read_snapshot,
    )

    latest_edges = {
        (r["src"], r["dst"]): r["w"]
        for r in read_snapshot(spark, out, 1 << 62, _EDGE_SCHEMA).collect()
    }
    assert latest_edges == stream_edges


def test_entity_cluster_collapses_exact_duplicates_first(spark):
    """The r9 scale fix: identical (name, brand) rows must cluster via
    the EXACT-collapse path (one value representative), not via fuzzy
    candidate pairs — 1000 copies of one name is one value-cluster with
    the min master_id canonical, and the blocking self-join sees ONE
    row for it (posting lists bounded by the entity domain)."""
    from real_time_data_warehouse_spark.operators.entity import (
        entity_cluster_frame,
    )

    pads = [
        (i, n, "B2")
        for i, n in enumerate(
            ["aardvark kit", "bramble pot", "crumpet tin", "dingo bell",
             "emerald fork", "fennel jar", "garnet hook", "hazel mug",
             "iris plate", "jasper bowl", "kelp tray", "lotus pan",
             "maple rack", "nutmeg bin", "onyx ladle", "poppy dish",
             "quartz cup", "rowan lid"],
            start=2000,
        )
    ]
    rows = [(i, "acme widget", "B1") for i in range(100, 1100)]
    rows += [(7, "acme widgit", "B1")]  # 1 edit away: fuzzy-links in
    rows += [(5, "unrelated thing", "B1")]
    # pads keep the shared acme-grams under the relative stop-gram cap
    # (2 of 21 VALUES ≤ 20%): the cap is value-weighted post-collapse
    masters = spark.createDataFrame(
        rows + pads, "master_id long, name string, brand string"
    )
    got = {
        r["master_id"]: (r["cluster_id"], r["is_canonical"])
        for r in entity_cluster_frame(masters).collect()
    }
    # the fuzzy edge links the typo row; 7 < 100 so 7 is the canonical
    assert got[7] == (7, 1)
    assert got[100] == (7, 0)
    assert got[1099] == (7, 0)
    assert got[5] == (5, 1)
    assert all(got[i] == (i, 1) for i in range(2000, 2018))
    assert len(got) == 1020


def test_fuzzy_match_duplicate_masters_resolve_to_min_id(spark):
    """fuzzy_match_frame's master collapse is lossless: with identical
    master names the matched_id must be the MIN master_id (the same row
    the uncollapsed (dist, master_id) ordering would pick)."""
    from real_time_data_warehouse_spark.operators.entity import (
        fuzzy_match_frame,
    )

    pads = [
        (i, n, "B1")
        for i, n in enumerate(
            ["aardvark kit", "bramble pot", "crumpet tin", "dingo bell",
             "emerald fork", "fennel jar", "garnet hook", "hazel mug",
             "iris plate", "jasper bowl", "kelp tray", "lotus pan"],
            start=3000,
        )
    ]
    masters = spark.createDataFrame(
        [(42, "zebra crossing", "B1"), (13, "zebra crossing", "B1"),
         (99, "zebra crossing", "B1")] + pads,
        "master_id long, name string, brand string",
    )
    probes = spark.createDataFrame(
        [(1, "zebra crossng", "B1")],  # 1 deletion
        "probe_id long, qname string, brand string",
    )
    (row,) = fuzzy_match_frame(masters, probes).collect()
    assert row["matched_id"] == 13 and row["dist"] == 1
