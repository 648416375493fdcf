"""Round-4 additions: gap sessionization (batch + streaming twin),
exact-substring span audit, and the kNN label-noise vote.

- st13s streaming sessionization must equal the one-pass st13 query at
  ANY batch split (session numbering, boundaries, and exact DECIMAL
  sums are chunking-independent), and crash-retried batches must change
  nothing;
- d15's interval merge is pinned on a planted corpus where the expected
  maximal spans are computable by hand;
- s10's majority vote is pinned on a planted fixture with one
  mislabeled vector.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_warehouse_spark.operators.dedup import (
    _SPAN_K,
    substring_span_stats,
)
from real_time_data_warehouse_spark.operators.retrieval import knn_label_vote
from real_time_data_warehouse_spark.registry import QUERY_REGISTRY, query_map
from real_time_data_warehouse_spark.streaming.sessionize import (
    apply_session_batch,
    compact_session_log,
)
from real_time_data_warehouse_spark.tables import Tables
from tests.conftest import SF_DIR

query_map()

_KEY = ("user_id", "session_seq")


def _expected(spark):
    return {
        (r["user_id"], r["session_seq"]): (
            r["session_start"],
            r["session_end"],
            r["n_events"],
            round(r["value_sum"], 2),
        )
        for r in QUERY_REGISTRY["st13_sessionization"].fn(spark, SF_DIR).collect()
    }


def _got(spark, out_dir):
    return {
        (r["user_id"], r["session_seq"]): (
            r["session_start"],
            r["session_end"],
            r["n_events"],
            round(r["value_sum"], 2),
        )
        for r in compact_session_log(spark, out_dir).collect()
    }


def _replay(spark, tmp_path, n_batches: int, retry_last: bool = False):
    events = (
        Tables(spark, SF_DIR)
        .events.select("user_id", "ts", "value", "event_id")
        .localCheckpoint(eager=True)
    )
    ids = sorted(r["event_id"] for r in events.select("event_id").collect())
    cuts = [ids[len(ids) * (i + 1) // n_batches - 1] for i in range(n_batches)]
    state = str(tmp_path / f"state{n_batches}")
    out = str(tmp_path / f"out{n_batches}")
    lo = None
    for i, hi in enumerate(cuts):
        batch = events.where(
            (F.col("event_id") <= hi)
            & (F.col("event_id") > (lo if lo is not None else -1))
        )
        apply_session_batch(spark, batch, i, state, out)
        if retry_last and i == len(cuts) - 1:
            apply_session_batch(spark, batch, i, state, out)
        lo = hi
    return _got(spark, out)


def test_session_replay_matches_one_pass_any_split(spark, tmp_path):
    exp = _expected(spark)
    assert _replay(spark, tmp_path, 3) == exp
    assert _replay(spark, tmp_path, 7) == exp


def test_session_batch_retry_idempotent(spark, tmp_path):
    assert _replay(spark, tmp_path, 4, retry_last=True) == _expected(spark)


def test_substring_spans_planted_corpus(spark):
    # doc 1 and doc 2 share the verbatim 8-token run c1..c8 (positions
    # 3..10 in doc 1, 1..8 in doc 2); doc 3 shares nothing long enough.
    run = " ".join(f"c{i}" for i in range(1, 9))
    docs = spark.createDataFrame(
        [
            (1, "a1 a2 " + run + " a3 a4"),
            (2, run + " b1 b2 b3"),
            (3, "c1 c2 c3 d1 d2 d3 d4 d5 d6 d7"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (
            r["n_tokens"],
            r["dup_grams"],
            r["dup_tokens"],
            r["dup_fraction"],
        )
        for r in substring_span_stats(docs).collect()
    }
    # an 8-token shared run yields 8-K+1 = 3 duplicated positional
    # 6-grams per doc, merging into ONE 8-token island
    n_grams = 8 - _SPAN_K + 1
    assert rows[1] == (12, n_grams, 8, round(8 / 12, 4))
    assert rows[2] == (11, n_grams, 8, round(8 / 11, 4))
    assert rows[3] == (10, 0, 0, 0.0)


def test_substring_spans_merges_overlapping_islands(spark):
    # two shared runs inside ONE doc separated by a unique token:
    # islands must NOT merge across the gap
    r1 = " ".join(f"x{i}" for i in range(1, 7))  # 6 tokens = 1 gram
    r2 = " ".join(f"y{i}" for i in range(1, 7))
    docs = spark.createDataFrame(
        [
            (1, r1 + " gapword " + r2),
            (2, r1 + " other tokens here entirely"),
            (3, r2 + " more unrelated filler text"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["dup_grams"], r["dup_tokens"])
        for r in substring_span_stats(docs).collect()
    }
    assert rows[1] == (2, 12)  # two disjoint 6-token islands
    assert rows[2] == (1, 6)
    assert rows[3] == (1, 6)


def test_knn_label_vote_flags_planted_noise(spark):
    # 6 vectors in two tight clusters; vec 0 sits in cluster A but is
    # labeled B -> the 3-NN majority says A, agree = 0. vec 10 (sampled,
    # mod 10) is correctly labeled.
    rows = [
        (0, [1.0, 0.0], 2),  # mislabeled: neighbors are label 1
        (1, [0.9, 0.1], 1),
        (2, [0.95, 0.05], 1),
        (3, [0.85, 0.15], 1),
        (10, [0.0, 1.0], 2),  # correctly labeled
        (11, [0.1, 0.9], 2),
        (12, [0.05, 0.95], 2),
        (13, [0.15, 0.85], 2),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        r["vec_id"]: (r["knn_label"], r["agree"])
        for r in knn_label_vote(emb, sample_mod=10, k=3).collect()
    }
    assert set(got) == {0, 10}
    assert got[0] == (1, 0)
    assert got[10] == (2, 1)


def test_substring_strip_keeps_first_occurrence(spark):
    # same corpus as the d15 planted test: the 8-token run c1..c8 first
    # occurs in doc 1 (positions 3..10), so doc 1 keeps ALL its text and
    # doc 2 loses exactly the copied run
    run = " ".join(f"c{i}" for i in range(1, 9))
    docs = spark.createDataFrame(
        [
            (1, "a1 a2 " + run + " a3 a4"),
            (2, run + " b1 b2 b3"),
            (3, "c1 c2 c3 d1 d2 d3 d4 d5 d6 d7"),
        ],
        "doc_id long, text string",
    )
    from real_time_data_warehouse_spark.operators.dedup import substring_strip

    rows = {
        r["doc_id"]: (r["n_tokens"], r["removed_tokens"], r["clean_text"])
        for r in substring_strip(docs).collect()
    }
    assert rows[1] == (12, 0, "a1 a2 " + run + " a3 a4")
    assert rows[2] == (11, 8, "b1 b2 b3")
    assert rows[3] == (10, 0, "c1 c2 c3 d1 d2 d3 d4 d5 d6 d7")


def test_substring_strip_within_doc_repeat(spark):
    # unlike d15 (cross-doc only), the keep-first policy also strips a
    # verbatim self-repeat: the second x1..x6 run goes
    run = " ".join(f"x{i}" for i in range(1, 7))
    docs = spark.createDataFrame(
        [(1, run + " gap " + run)], "doc_id long, text string"
    )
    from real_time_data_warehouse_spark.operators.dedup import substring_strip

    (row,) = substring_strip(docs).collect()
    assert row["n_tokens"] == 13
    assert row["removed_tokens"] == 6
    assert row["clean_text"] == run + " gap"


def test_hard_negatives_ranking(spark):
    # two tight clusters (see the s10 test); each sampled anchor's hard
    # negatives are the OTHER cluster's members, nearest first
    rows = [
        (0, [1.0, 0.0], 2),
        (1, [0.9, 0.1], 1),
        (2, [0.95, 0.05], 1),
        (3, [0.85, 0.15], 1),
        (10, [0.0, 1.0], 2),
        (11, [0.1, 0.9], 2),
        (12, [0.05, 0.95], 2),
        (13, [0.15, 0.85], 2),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    from real_time_data_warehouse_spark.operators.retrieval import (
        hard_negative_pairs,
    )

    got = {
        (r["vec_id"], r["rnk"]): r["neighbor_id"]
        for r in hard_negative_pairs(emb, sample_mod=10, k=2).collect()
    }
    # anchor 0 (label 2) ~ [1, 0]: nearest label-1 vectors are 2 then 1
    assert got[(0, 1)] == 2 and got[(0, 2)] == 1
    # anchor 10 (label 2) ~ [0, 1]: nearest label-1 vectors are 3 then 1
    assert got[(10, 1)] == 3 and got[(10, 2)] == 1


def test_strip_never_removes_more_than_audit_flags(spark):
    # d15 flags EVERY occurrence of a cross-doc duplicated gram; d16
    # spares the globally-first occurrence (but also strips within-doc
    # repeats d15 ignores). On the real fixture the per-corpus totals
    # must satisfy: d16 removed ≤ d15 flagged + within-doc repeats, and
    # every doc with removed > 0 has some duplication signal. Cheap
    # cross-operator sanity at sf0.001.
    d15 = {
        r["doc_id"]: r["dup_tokens"]
        for r in QUERY_REGISTRY["d15_substring_spans"]
        .fn(spark, SF_DIR)
        .collect()
    }
    d16 = {
        r["doc_id"]: r["removed_tokens"]
        for r in QUERY_REGISTRY["d16_substring_strip"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert set(d15) == set(d16)
    flagged = {d for d, v in d15.items() if v > 0}
    removed = {d for d, v in d16.items() if v > 0}
    # cross-doc duplication is the dominant signal: every doc d15 flags
    # either keeps the first copy (removed may be 0 for exactly one doc
    # per cluster) or gets stripped; a doc d16 strips without any d15
    # flag can only be a pure within-doc repeat
    assert removed - flagged == set(), "d16 stripped docs d15 never flagged"


def test_pii_audit_planted_positive_path(spark):
    # the synthetic corpus is PII-free (the driver row pins the no-op
    # path); this pins the positive path on planted PII of every class
    from real_time_data_warehouse_spark.operators.textanalysis import pii_audit

    docs = spark.createDataFrame(
        [
            (1, "contact bob@example.com or admin@sub.example.org today"),
            (2, "server 192.168.0.1 logged 555-123-4567 twice"),
            (3, "card 4111111111111111 exp soon"),
            (4, "clean text with digits 42 and 1234 only"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (
            r["n_email"], r["n_ipv4"], r["n_phone"], r["n_idnum"],
            r["redacted"],
        )
        for r in pii_audit(docs).collect()
    }
    assert rows[1] == (2, 0, 0, 0, "contact <email> or <email> today")
    assert rows[2] == (0, 1, 1, 0, "server <ip> logged <phone> twice")
    assert rows[3] == (0, 0, 0, 1, "card <idnum> exp soon")
    assert rows[4] == (0, 0, 0, 0, "clean text with digits 42 and 1234 only")


def test_pii_audit_planted_matches_duckdb(spark, tmp_path):
    # the parity sweep only sees the PII-free fixture; run the SAME
    # oracle SQL over a planted parquet so the positive path is also
    # engine-checked
    import duckdb

    from real_time_data_warehouse_spark.operators.textanalysis import pii_audit
    from real_time_data_warehouse_spark.registry import QUERY_REGISTRY
    from tests.parity import compare

    docs = spark.createDataFrame(
        [
            (1, "bob@example.com met 10.0.0.1"),
            (2, "call 555-123-4567 re card 4111111111111111"),
            (3, "no pii at all"),
        ],
        "doc_id long, text string",
    )
    pq = str(tmp_path / "docs.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(pq)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    ok, msg = compare(pii_audit(docs), con, QUERY_REGISTRY["t11_pii_audit"].oracle)
    assert ok, msg


def test_audio_energy_planted_silence(spark):
    # doc 1: 16 loud letters then 16 spaces -> window 0 loud, window 1
    # silent, lead_trim 0; doc 2: spaces first -> lead_trim 1; doc 3:
    # shorter than one window -> zero windows; doc 4: all spaces ->
    # lead_trim == n_windows (fully trimmed)
    from real_time_data_warehouse_spark.operators.multimodal import (
        audio_energy_stats,
        synthesize_audio,
    )
    from real_time_data_warehouse_spark.tables import Tables

    loud = "x" * 16
    quiet = " " * 16
    docs = spark.createDataFrame(
        [
            (1, loud + quiet),
            (2, quiet + loud),
            (3, "short"),
            (4, quiet + quiet),
        ],
        "doc_id long, text string",
    )

    class _T:
        documents = docs

    rows = {
        r["doc_id"]: (
            r["n_samples"], r["n_windows"], r["total_energy"],
            r["n_silent"], r["lead_trim"],
        )
        for r in audio_energy_stats(synthesize_audio(_T())).collect()
    }
    e_loud = 16 * ord("x") ** 2
    e_quiet = 16 * 32**2
    assert rows[1] == (32, 2, e_loud + e_quiet, 1, 0)
    assert rows[2] == (32, 2, e_loud + e_quiet, 1, 1)
    assert rows[3] == (5, 0, 0, 0, 0)
    assert rows[4] == (32, 2, 2 * e_quiet, 2, 2)


def test_substring_family_on_degenerate_identical_corpus(spark):
    """200 identical docs: the worst case for anything pairwise (19.9k
    pairs) but linear for the gram formulation — every positional gram
    occurs 200×, spans join back 200 rows per gram (never 200²), doc 1
    keeps its text (keep-first) and every other doc strips fully."""
    text = " ".join(f"w{i}" for i in range(1, 13))  # 12 tokens
    docs = spark.createDataFrame(
        [(i, text) for i in range(1, 201)], "doc_id long, text string"
    )
    from real_time_data_warehouse_spark.operators.dedup import (
        substring_span_stats,
        substring_strip,
    )

    spans = {
        r["doc_id"]: (r["dup_tokens"], r["dup_fraction"])
        for r in substring_span_stats(docs).collect()
    }
    assert len(spans) == 200
    assert all(v == (12, 1.0) for v in spans.values())

    strip = {
        r["doc_id"]: (r["removed_tokens"], r["clean_text"])
        for r in substring_strip(docs).collect()
    }
    assert strip[1] == (0, text)
    assert all(
        strip[d] == (12, "") for d in range(2, 201)
    ), "every copy after the first must strip fully"
