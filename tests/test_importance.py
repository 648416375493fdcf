"""c19 DSIR importance: planted two-domain corpus vs a pure-Python
float mirror of the double-LM lattice, plus separation invariants."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from real_time_data_warehouse_spark.operators.importance import (
    dsir_logratio_frame,
)

_Q = 1_000_000


def _toks(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _py_dsir(docs: dict[int, str], target_ids: set[int]):
    tf: dict = {}
    for d, t in docs.items():
        ws = _toks(t)
        for a, b in zip(ws, ws[1:]):
            tf[(d, a, b)] = tf.get((d, a, b), 0) + 1
    bg_c: dict = {}
    bg_t: dict = {}
    for (d, a, b), n in tf.items():
        bg_c[(a, b)] = bg_c.get((a, b), 0) + n
        if d in target_ids:
            bg_t[(a, b)] = bg_t.get((a, b), 0) + n
    cu_c: dict = {}
    for (a, b), n in bg_c.items():
        cu_c[a] = cu_c.get(a, 0) + n
    cu_t: dict = {}
    for (a, b), n in bg_t.items():
        cu_t[a] = cu_t.get(a, 0) + n
    v_c = len({w for t in docs.values() for w in _toks(t)})
    v_t = len({w for d in target_ids for w in _toks(docs[d])})

    def nll(cu, cb, v):
        return math.floor(math.log((cu + v) / (cb + 1)) * _Q + 0.5)

    out = {}
    for d, t in docs.items():
        num = 0
        n = 0
        dead = False
        for (dd, a, b), c in tf.items():
            if dd != d:
                continue
            n += c
            if v_t == 0:
                dead = True
                continue
            num += c * (
                nll(cu_c[a], bg_c[(a, b)], v_c)
                - nll(cu_t.get(a, 0), bg_t.get((a, b), 0), v_t)
            )
        if n == 0:
            out[d] = (0, None)
        elif dead:
            out[d] = (n, None)
        else:
            out[d] = (n, num / n / _Q)
    return out


_DOCS = {
    0: "red cat red cat red dog",
    1: "red dog red cat blue cat",
    2: "sol luna sol luna sol mar",
    3: "mar luna sol mar luna sol",
    4: "red cat sol luna",  # straddles both domains
    5: "x",  # bigram-free
}
_TARGET = {0, 1}  # the "red cat" domain


def _frame(spark):
    return spark.createDataFrame(
        [(d, t, "en" if d in _TARGET else "xx") for d, t in _DOCS.items()],
        "doc_id long, text string, lang string",
    )


def test_dsir_matches_python_mirror(spark):
    got = {
        r["doc_id"]: (r["n_bigrams"], r["logratio"])
        for r in dsir_logratio_frame(
            _frame(spark), F.col("lang") == "en"
        ).collect()
    }
    assert got == _py_dsir(_DOCS, _TARGET)


def test_dsir_separates_domains(spark):
    got = {
        r["doc_id"]: r["logratio"]
        for r in dsir_logratio_frame(
            _frame(spark), F.col("lang") == "en"
        ).collect()
    }
    # target-domain docs look MORE like the target than off-domain docs
    assert min(got[0], got[1]) > max(got[2], got[3])
    # the straddler sits between the two clusters
    assert max(got[2], got[3]) < got[4] < min(got[0], got[1])
    # bigram-free doc is unratable
    assert got[5] is None


def test_dsir_empty_target_yields_null(spark):
    got = {
        r["doc_id"]: (r["n_bigrams"], r["logratio"])
        for r in dsir_logratio_frame(
            _frame(spark), F.lit(False)
        ).collect()
    }
    # n_bigrams still counted; scores all NULL (target model undefined)
    assert got[0][0] > 0
    assert all(v[1] is None for v in got.values())
