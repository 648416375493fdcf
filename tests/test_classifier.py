"""c17 perceptron training: planted fixtures vs a pure-Python mirror,
plus the Novikoff convergence guarantee on separable data."""

from __future__ import annotations

from real_time_data_warehouse_spark.operators.classifier import (
    perceptron_train,
)


def _py_perceptron(rows, n_iters):
    """rows: (y, x0..x3). Mirrors the exact batch-update recurrence."""
    d = 4
    w = [0] * d
    for _ in range(n_iters):
        upd = [0] * d
        for y, *x in rows:
            if y * sum(w[j] * x[j] for j in range(d)) <= 0:
                for j in range(d):
                    upd[j] += y * x[j]
        w = [w[j] + upd[j] for j in range(d)]
    errors = sum(
        1
        for y, *x in rows
        if y * sum(w[j] * x[j] for j in range(4)) <= 0
    )
    return w, errors


def _feats_df(spark, rows):
    return spark.createDataFrame(
        [(i, y, x0, x1, x2, x3) for i, (y, x0, x1, x2, x3) in enumerate(rows)],
        "doc_id long, y long, x0 long, x1 long, x2 long, x3 long",
    )


def test_perceptron_matches_python_mirror(spark):
    # non-separable scatter: fixed-K loop must still agree exactly
    rows = [
        (1, 1, 12, 250, 9),
        (-1, 1, 40, 180, 30),
        (1, 1, 8, 300, 8),
        (-1, 1, 9, 290, 9),  # conflicts with the row above
        (-1, 1, 50, 100, 42),
        (1, 1, 30, 260, 22),
    ]
    got_w, got_e = perceptron_train(_feats_df(spark, rows), n_iters=7)
    want_w, want_e = _py_perceptron(rows, 7)
    assert (got_w, got_e) == (want_w, want_e)


def test_perceptron_converges_on_separable_data(spark):
    # centered, class-symmetric fixture: y = sign(x2) with a margin,
    # the other features identical across classes. Round 1 updates
    # cancel on x0/x1/x3 and accumulate on x2, so the batch variant
    # reaches zero training errors (the online-Novikoff behavior the
    # centered feature design is meant to recover)
    rows = [(1, 1, 10, 50 + 5 * i, 10) for i in range(8)] + [
        (-1, 1, 10, -50 - 5 * i, 10) for i in range(8)
    ]
    w, errors = perceptron_train(_feats_df(spark, rows), n_iters=10)
    assert errors == 0
    assert (w, errors) == _py_perceptron(rows, 10)


def test_perceptron_empty_input(spark):
    w, errors = perceptron_train(_feats_df(spark, []), n_iters=3)
    assert w == [0, 0, 0, 0]
    assert errors == 0
