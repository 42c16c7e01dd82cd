"""Eigenvector centrality parity: vs networkx ``eigenvector_centrality``
(the published recurrence the operator's fixed contract replays — see
operators/eigenvector.py docstring), vs the single-node oracle at fixed
iteration counts (dups/self-loops hygiene), L2 normalization, empty input,
and tol-mode convergence."""

from __future__ import annotations

import math

import networkx as nx
import numpy as np
import pytest

from connected_components_3d_spark.operators.eigenvector import (
    eigenvector_centrality,
    eigenvector_single_node,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def assert_matches_single_node(spark, pairs, fixed_iters=5):
    expected = eigenvector_single_node(pairs, fixed_iters=fixed_iters)
    res = eigenvector_centrality(
        spark, edges_df(spark, pairs), fixed_iters=fixed_iters
    )
    got = {r["vertex"]: r["score"] for r in res.scores.collect()}
    assert set(got) == set(expected)
    gv = np.array([got[v] for v in sorted(got)])
    ev = np.array([expected[v] for v in sorted(got)])
    assert np.allclose(gv, ev, rtol=1e-6, atol=1e-9), np.abs(gv - ev).max()
    # L2-normalized output
    assert abs(float((gv * gv).sum()) - 1.0) < 1e-9
    return res


def test_random_er_directed_fixed_iters(spark):
    g = nx.gnp_random_graph(200, 0.02, seed=11, directed=True)
    assert_matches_single_node(spark, list(g.edges()), fixed_iters=5)


def test_duplicate_self_loop_reversed_hygiene(spark):
    g = nx.gnp_random_graph(80, 0.05, seed=3, directed=True)
    pairs = list(g.edges())
    pairs += pairs[:10] + [(b, a) for a, b in pairs[:5]] + [(0, 0), (7, 7)]
    assert_matches_single_node(spark, pairs, fixed_iters=4)


def test_networkx_parity_converged(spark):
    """tol-mode run vs networkx's own power iteration on a strongly
    connected digraph (ring + chords guarantees convergence)."""
    n = 60
    pairs = [(i, (i + 1) % n) for i in range(n)]
    pairs += [(i, (i + 7) % n) for i in range(0, n, 3)]
    pairs += [(i, (i + 13) % n) for i in range(0, n, 5)]
    nx_scores = nx.eigenvector_centrality(
        nx.DiGraph(pairs), max_iter=500, tol=1e-10
    )
    res = eigenvector_centrality(
        spark, edges_df(spark, pairs), tol=1e-10, max_iter=500
    )
    assert res.converged
    got = {r["vertex"]: r["score"] for r in res.scores.collect()}
    assert set(got) == set(nx_scores)
    gv = np.array([got[v] for v in sorted(got)])
    ev = np.array([nx_scores[v] for v in sorted(got)])
    assert np.allclose(gv, ev, rtol=1e-5, atol=1e-8), np.abs(gv - ev).max()


def test_star_graph_authority(spark):
    """Hub-and-spoke pointing at a center: the center dominates; leaves
    that only point in stay equal by symmetry."""
    pairs = [(i, 0) for i in range(1, 9)]
    res = eigenvector_centrality(spark, edges_df(spark, pairs), fixed_iters=8)
    got = {r["vertex"]: r["score"] for r in res.scores.collect()}
    assert got[0] == max(got.values())
    leaf_vals = [got[i] for i in range(1, 9)]
    assert max(leaf_vals) - min(leaf_vals) < 1e-12


def test_empty_graph(spark):
    e = edges_df(spark, []).limit(0)
    res = eigenvector_centrality(spark, e)
    assert res.converged
    assert res.scores.count() == 0
    assert res.num_iters == 0


def test_convergence_metrics(spark):
    n = 40
    pairs = [(i, (i + 1) % n) for i in range(n)] + [(i, (i + 3) % n) for i in range(n)]
    res = eigenvector_centrality(spark, edges_df(spark, pairs), tol=1e-9)
    assert res.converged
    assert res.num_iters >= 1
    # every completed iteration's movement was folded in by its successor
    # (or the closing action); the last recorded errors are tiny
    errs = [m["l1_err"] for m in res.metrics if m["l1_err"] is not None]
    assert errs and errs[-1] < n * 1e-6
    # movement is (eventually) decreasing
    assert errs[-1] <= errs[0] + 1e-12


def test_single_node_oracle_is_l2_normalized():
    pairs = [(0, 1), (1, 2), (2, 0), (0, 2)]
    x = eigenvector_single_node(pairs, fixed_iters=6)
    assert abs(math.fsum(v * v for v in x.values()) - 1.0) < 1e-12
