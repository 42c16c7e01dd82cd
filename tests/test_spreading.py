"""Label-spreading parity and contraction properties
(operators/spreading.py contract)."""

from __future__ import annotations

import random

import pytest

from connected_components_3d_spark.operators.spreading import (
    label_spreading,
    label_spreading_single_node,
)


def run(spark, pairs, seeds, **kw):
    e = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )
    s = spark.createDataFrame(
        [(int(v), int(c)) for v, c in seeds], "vertex long, label long"
    )
    return label_spreading(spark, e, s, **kw)


def assert_parity(spark, pairs, seeds, **kw):
    res = run(spark, pairs, seeds, **kw)
    got = {
        (r["vertex"], r["label"]): r["score"]
        for r in res.scores.collect()
    }
    want = label_spreading_single_node(pairs, seeds, **kw)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), k
    return res, got


def test_fixed_iters_parity_random(spark):
    rng = random.Random(17)
    pairs = [(rng.randrange(0, 40), rng.randrange(0, 40)) for _ in range(120)]
    seeds = [(0, 10), (1, 10), (5, 20), (6, 20)]
    res, got = assert_parity(spark, pairs, seeds, fixed_iters=4)
    assert res.num_iters == 4
    # scores are bounded by 1 (S is a substochastic smoothing: row sums of
    # the normalized adjacency are <= 1 only in aggregate; the (1-a)Y term
    # keeps everything in [0, 1] on these fixtures)
    assert all(0.0 <= s <= 1.0 + 1e-9 for s in got.values())


def test_convergence_mode_parity(spark):
    pairs = [(i, i + 1) for i in range(12)]
    seeds = [(0, 1), (12, 2)]
    res, got = assert_parity(spark, pairs, seeds, alpha=0.5, tol=1e-10)
    assert res.converged
    # midpoint symmetry: the path is symmetric under reflection, so the
    # two classes' scores mirror each other
    for v in range(13):
        assert got[(v, 1)] == pytest.approx(got[(12 - v, 2)], abs=1e-6)


def test_two_cliques_separate_labels(spark):
    a = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    b = [(10 + i, 10 + j) for i in range(4) for j in range(i + 1, 4)]
    res, got = assert_parity(
        spark, a + b, [(0, 7), (10, 9)], fixed_iters=5
    )
    # no cross-component leakage: class 7 never reaches the 10.. clique
    assert not any(v >= 10 and c == 7 for (v, c) in got)
    assert not any(v < 10 and c == 9 for (v, c) in got)


def test_alpha_validation_and_isolated_seed(spark):
    with pytest.raises(ValueError):
        run(spark, [], [], alpha=1.0)
    # a seed with no edges keeps (1-alpha) of itself, scaled each round
    res, got = assert_parity(
        spark, [(5, 6)], [(99, 3)], alpha=0.8, fixed_iters=3
    )
    assert got[(99, 3)] == pytest.approx(0.2, abs=1e-12)
