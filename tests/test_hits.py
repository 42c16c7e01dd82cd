"""HITS parity vs the single-node Kleinberg recurrence (fixed contract in
operators/hits.py docstring): allclose 1e-6 on ER digraphs, deterministic
fixed-iteration path (the driver-gate shape), L1-normalized outputs."""

from __future__ import annotations

import networkx as nx
import numpy as np

from connected_components_3d_spark.operators.hits import hits, hits_single_node


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def assert_hits_matches(spark, pairs, **kw):
    expected = hits_single_node(pairs, **kw)
    res = hits(spark, edges_df(spark, pairs), **kw)
    got = {r["vertex"]: (r["auth"], r["hub"]) for r in res.scores.collect()}
    assert set(got) == set(expected)
    ga = np.array([got[v][0] for v in sorted(got)])
    gh = np.array([got[v][1] for v in sorted(got)])
    ea = np.array([expected[v][0] for v in sorted(got)])
    eh = np.array([expected[v][1] for v in sorted(got)])
    assert np.allclose(ga, ea, rtol=1e-6, atol=1e-9), np.abs(ga - ea).max()
    assert np.allclose(gh, eh, rtol=1e-6, atol=1e-9), np.abs(gh - eh).max()
    # L1 normalization: each score vector is a distribution
    assert abs(ga.sum() - 1.0) < 1e-9
    assert abs(gh.sum() - 1.0) < 1e-9
    return res


def test_random_er_directed(spark):
    g = nx.gnp_random_graph(200, 0.02, seed=11, directed=True)
    assert_hits_matches(spark, list(g.edges()), fixed_iters=5)


def test_converged_er(spark):
    g = nx.gnp_random_graph(120, 0.04, seed=5, directed=True)
    res = assert_hits_matches(spark, list(g.edges()), tol=1e-8)
    assert res.converged


def test_star(spark):
    # hub-and-spoke: spokes point at 0 → vertex 0 takes all authority,
    # spokes share hub mass equally
    pairs = [(i, 0) for i in range(1, 40)]
    res = assert_hits_matches(spark, pairs, fixed_iters=3)
    got = {r["vertex"]: r for r in res.scores.collect()}
    assert abs(got[0]["auth"] - 1.0) < 1e-12
    assert abs(got[1]["hub"] - 1.0 / 39) < 1e-12
    assert got[0]["hub"] == 0.0


def test_duplicate_edges_collapse(spark):
    pairs = [(1, 2), (2, 3), (3, 1)]
    a = hits(spark, edges_df(spark, pairs), fixed_iters=4).scores.collect()
    b = hits(spark, edges_df(spark, pairs * 3), fixed_iters=4).scores.collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_empty(spark):
    res = hits(spark, edges_df(spark, []), fixed_iters=2)
    assert res.scores.count() == 0
    assert res.converged


def test_zero_fixed_iters_counts_zero(spark):
    res = hits(spark, edges_df(spark, [(1, 2), (2, 3)]), fixed_iters=0)
    assert res.num_iters == 0
    got = {r["vertex"]: (r["auth"], r["hub"]) for r in res.scores.collect()}
    assert got == {v: (0.0, 1.0 / 3) for v in (1, 2, 3)}  # initial state
