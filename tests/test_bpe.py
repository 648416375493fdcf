"""t17 BPE training: planted corpora vs a pure-Python reference
implementation of the textbook algorithm (Sennrich 2016)."""

from __future__ import annotations

from collections import Counter

from real_time_data_warehouse_spark.operators.bpe import bpe_train_frame


def _py_bpe(words_freq: dict[str, int], k: int) -> list[tuple]:
    """Reference BPE: pair counts over the word dictionary, argmax with
    (count DESC, left, right) tie-break, explicit left-to-right
    non-overlapping merge application."""
    dic = {w: list(w) for w in words_freq}
    merges: list[tuple] = []
    for rank in range(1, k + 1):
        counts: Counter = Counter()
        for w, f in words_freq.items():
            s = dic[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (left, right), cnt = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        merges.append((rank, left, right, left + right, cnt))
        for w, s in dic.items():
            out: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            dic[w] = out
    return merges


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _train(spark, texts, k):
    rows = bpe_train_frame(spark, _docs(spark, texts), k).collect()
    return [
        (r["merge_rank"], r["merge_left"], r["merge_right"], r["merged"],
         r["pair_count"])
        for r in sorted(rows, key=lambda r: r["merge_rank"])
    ]


def _freqs(texts) -> dict[str, int]:
    c: Counter = Counter()
    for t in texts:
        c.update(t.split())
    return dict(c)


def test_bpe_overlapping_runs_left_greedy(spark):
    # "aaaa" must count (a,a) three times but merge as [aa][aa]; the
    # second round then sees (aa,aa)
    texts = ["aaaa aaaa aaaa", "aaa b"]
    assert _train(spark, texts, 3) == _py_bpe(_freqs(texts), 3)


def test_bpe_tiebreak_lexicographic(spark):
    # "ab" and "cd" both occur 3 times; (a,b) < (c,d) must win round 1
    texts = ["ab cd", "ab cd", "ab cd"]
    got = _train(spark, texts, 2)
    assert got == _py_bpe(_freqs(texts), 2)
    assert got[0][1:4] == ("a", "b", "ab")
    assert got[1][1:4] == ("c", "d", "cd")


def test_bpe_merged_symbols_merge_further(spark):
    # rounds chain: (l,o)->lo, then (lo,w)->low appears, etc.
    texts = ["lower lower lowest low", "newer newest new"]
    assert _train(spark, texts, 8) == _py_bpe(_freqs(texts), 8)


def test_bpe_exhaustion_stops_early(spark):
    # single repeated 2-char word: round 1 merges it fully; later
    # rounds have no pairs and must emit nothing
    texts = ["ab ab ab"]
    got = _train(spark, texts, 5)
    assert got == _py_bpe(_freqs(texts), 5)
    assert len(got) == 1


def test_bpe_empty_corpus(spark):
    assert _train(spark, [""], 3) == []


def _py_encode(words_freq, texts, k):
    """Reference encode: per-doc (n_words, n_bpe_tokens) under _py_bpe
    merges applied left-greedily."""
    merges = _py_bpe(words_freq, k)
    seg = {w: list(w) for w in words_freq}
    for _, left, right, _, _ in merges:
        for w, s in seg.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seg[w] = out
    res = {}
    for doc_id, t in enumerate(texts):
        ws = t.split()
        res[doc_id] = (len(ws), sum(len(seg[w]) for w in ws))
    return res


def test_bpe_encode_counts_match_reference(spark):
    from real_time_data_warehouse_spark.operators.bpe import (
        bpe_encode_frame,
        train_merges,
    )

    texts = ["lower lower lowest low", "newer newest new", ""]
    docs = _docs(spark, texts)
    merges = train_merges(docs, 8)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode_frame(docs, merges).collect()
    }
    assert got == _py_encode(_freqs(texts), texts, 8)
    # the empty doc survives with zero counts
    assert got[2] == (0, 0)
    # merges strictly compress: fewer BPE tokens than characters
    n_chars = sum(len(w) for t in texts for w in t.split())
    assert sum(v[1] for v in got.values()) < n_chars
