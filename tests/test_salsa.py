"""SALSA parity vs the single-node Lempel–Moran recurrence (fixed contract
in operators/salsa.py docstring): allclose 1e-6 on ER digraphs, stochastic
mass preservation (auth/hub each sum to 1 over their support sets), the
known indeg-proportional fixpoint on a strongly-connected co-citation
structure, and tol-mode convergence."""

from __future__ import annotations

import networkx as nx
import numpy as np

from connected_components_3d_spark.operators.salsa import (
    salsa,
    salsa_single_node,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def assert_salsa_matches(spark, pairs, fixed_iters=5):
    expected = salsa_single_node(pairs, fixed_iters=fixed_iters)
    res = salsa(spark, edges_df(spark, pairs), fixed_iters=fixed_iters)
    got = {r["vertex"]: (r["auth"], r["hub"]) for r in res.scores.collect()}
    assert set(got) == set(expected)
    ga = np.array([got[v][0] for v in sorted(got)])
    gh = np.array([got[v][1] for v in sorted(got)])
    ea = np.array([expected[v][0] for v in sorted(got)])
    eh = np.array([expected[v][1] for v in sorted(got)])
    assert np.allclose(ga, ea, rtol=1e-6, atol=1e-9), np.abs(ga - ea).max()
    assert np.allclose(gh, eh, rtol=1e-6, atol=1e-9), np.abs(gh - eh).max()
    # both chains are stochastic: mass exactly preserved (no normalizer)
    assert abs(ga.sum() - 1.0) < 1e-9
    assert abs(gh.sum() - 1.0) < 1e-9
    return res


def test_random_er_directed(spark):
    g = nx.gnp_random_graph(200, 0.02, seed=7, directed=True)
    assert_salsa_matches(spark, list(g.edges()), fixed_iters=5)


def test_star(spark):
    # spokes → 0: single authority takes all auth mass; spokes split hub
    # mass evenly and are a symmetric hub chain (uniform from iteration 0)
    pairs = [(i, 0) for i in range(1, 30)]
    res = assert_salsa_matches(spark, pairs, fixed_iters=3)
    got = {r["vertex"]: r for r in res.scores.collect()}
    assert abs(got[0]["auth"] - 1.0) < 1e-12
    assert got[0]["hub"] == 0.0
    assert abs(got[1]["hub"] - 1.0 / 29) < 1e-12


def test_indeg_proportional_fixpoint(spark):
    # complete bipartite 3×4 (hubs 0-2 → auths 10-13): the authority chain
    # mixes in one step; stationary auth ∝ indeg ⇒ uniform over the 4
    # authorities here. SALSA's famous TKC-effect resistance.
    pairs = [(u, v) for u in range(3) for v in range(10, 14)]
    res = salsa(spark, edges_df(spark, pairs), fixed_iters=2)
    got = {r["vertex"]: r for r in res.scores.collect()}
    for v in range(10, 14):
        assert abs(got[v]["auth"] - 0.25) < 1e-12
    for u in range(3):
        assert abs(got[u]["hub"] - 1.0 / 3) < 1e-12


def test_disconnected_components_keep_local_mass(spark):
    # two disjoint stars: SALSA (unlike HITS) does NOT collapse all mass
    # onto the larger community — per-component auth mass stays at the
    # uniform start's split, the TKC argument from the paper
    pairs = [(i, 0) for i in range(1, 5)] + [(i, 100) for i in range(101, 103)]
    res = assert_salsa_matches(spark, pairs, fixed_iters=4)
    got = {r["vertex"]: r for r in res.scores.collect()}
    assert abs(got[0]["auth"] - 0.5) < 1e-12
    assert abs(got[100]["auth"] - 0.5) < 1e-12


def test_duplicate_edges_collapse(spark):
    pairs = [(1, 2), (2, 3), (3, 1)]
    a = salsa(spark, edges_df(spark, pairs), fixed_iters=4).scores.collect()
    b = salsa(
        spark, edges_df(spark, pairs + pairs), fixed_iters=4
    ).scores.collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_converged_mode(spark):
    g = nx.gnp_random_graph(80, 0.06, seed=3, directed=True)
    res = salsa(spark, edges_df(spark, list(g.edges())), tol=1e-10)
    assert res.converged
    assert res.num_iters >= 1
    got = res.scores.toPandas()
    assert abs(got["auth"].sum() - 1.0) < 1e-9
    assert abs(got["hub"].sum() - 1.0) < 1e-9


def test_empty_graph(spark):
    res = salsa(spark, edges_df(spark, []), fixed_iters=3)
    assert res.scores.count() == 0
    assert res.converged
