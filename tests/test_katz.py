"""Katz centrality parity: single-node reference, networkx, closed forms
(operators/katz.py contract)."""

from __future__ import annotations

import networkx as nx
import pytest

from connected_components_3d_spark.operators.katz import (
    katz_centrality,
    katz_single_node,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def scores_of(res):
    return {r["vertex"]: r["score"] for r in res.scores.collect()}


def assert_parity(spark, pairs, **kw):
    res = katz_centrality(spark, edges_df(spark, pairs), **kw)
    got = scores_of(res)
    want = katz_single_node(pairs, **kw)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12), v
    return res, got


def test_fixed_iters_parity_random_dag(spark):
    g = nx.gnp_random_graph(60, 0.08, seed=9, directed=True)
    res, got = assert_parity(spark, list(g.edges()), fixed_iters=6)
    assert res.num_iters == 6 and res.converged


def test_converged_matches_networkx(spark):
    g = nx.gnp_random_graph(40, 0.1, seed=4, directed=True)
    res, got = assert_parity(spark, list(g.edges()), alpha=0.05)
    assert res.converged
    want = nx.katz_centrality(
        g, alpha=0.05, beta=1.0, normalized=False, tol=1e-10, max_iter=2000
    )
    for v, s in want.items():
        assert got[v] == pytest.approx(s, abs=1e-4), v


def test_one_iteration_is_indegree_affine(spark):
    pairs = [(1, 9), (2, 9), (3, 9), (1, 5)]
    res, got = assert_parity(spark, pairs, alpha=0.1, fixed_iters=1)
    # x_1[v] = beta + alpha*beta*indeg(v)
    assert got[9] == pytest.approx(1.3) and got[5] == pytest.approx(1.1)
    assert got[1] == pytest.approx(1.0)


def test_alpha_validation_and_empty(spark):
    with pytest.raises(ValueError):
        katz_centrality(spark, edges_df(spark, []), alpha=1.5)
    res = katz_centrality(spark, edges_df(spark, []), alpha=0.1)
    assert res.scores.count() == 0 and res.converged
