"""Logistic regression trainer (operators/logreg.py): single-node replay
parity, learning a planted separable rule (accuracy + weight sign),
L2 shrinkage, loss monotonicity, scoring column, validation."""

from __future__ import annotations

import math

import pytest

from connected_components_3d_spark.operators.logreg import (
    logistic_regression,
    logistic_regression_single_node,
    predict_proba,
)


def planted_rows(n=400):
    """Deterministic pseudo-random features; label = x0 + x1 > 1."""
    M, A = 2147483647, 1103515245
    rows = []
    for i in range(n):
        # chained mixes (coefficient A on i, so values wrap) on two lanes,
        # then a cross-product for the second feature — a single affine
        # chain leaves x0 near-constant / x1 dependent (zero-signal)
        h1 = ((7 * A + i) % M * A) % M
        h2 = (h1 * ((11 * A + i) % M * A % M)) % M
        x0, x1 = h1 / M, h2 / M
        rows.append((x0, x1, 1.0 if x0 + x1 > 1.0 else 0.0))
    return rows


def rows_df(spark, rows):
    return spark.createDataFrame(rows, "x0 double, x1 double, y double")


def test_single_node_parity(spark):
    rows = planted_rows(300)
    exp_w, exp_b = logistic_regression_single_node(rows, 2, iters=8)
    res = logistic_regression(
        rows_df(spark, rows), ["x0", "x1"], "y", iters=8
    )
    for a, e in zip(res.weights + [res.bias], exp_w + [exp_b]):
        assert math.isclose(a, e, rel_tol=0, abs_tol=1e-9), (a, e)


def test_learns_planted_rule(spark):
    rows = planted_rows(400)
    res = logistic_regression(
        rows_df(spark, rows), ["x0", "x1"], "y", lr=2.0, iters=60
    )
    assert res.weights[0] > 0 and res.weights[1] > 0  # both features help
    scored = predict_proba(
        rows_df(spark, rows), ["x0", "x1"], res.weights, res.bias
    )
    acc = scored.selectExpr(
        "avg(CASE WHEN (proba > 0.5) = (y = 1.0) THEN 1.0 ELSE 0.0 END) a"
    ).collect()[0]["a"]
    assert acc > 0.9
    # loss decreases over training
    losses = [m["loss"] for m in res.metrics]
    assert losses[-1] < losses[0]


def test_l2_shrinks_weights(spark):
    rows = planted_rows(200)
    free = logistic_regression(
        rows_df(spark, rows), ["x0", "x1"], "y", iters=30
    )
    reg = logistic_regression(
        rows_df(spark, rows), ["x0", "x1"], "y", iters=30, l2=1.0
    )
    assert sum(w * w for w in reg.weights) < sum(
        w * w for w in free.weights
    )


def test_validation(spark):
    with pytest.raises(AssertionError):
        logistic_regression(rows_df(spark, []), ["x0"], "y")
    with pytest.raises(AssertionError):
        logistic_regression(
            rows_df(spark, planted_rows(10)), [], "y"
        )
