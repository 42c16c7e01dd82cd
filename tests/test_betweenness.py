"""Betweenness parity: exact (all-sources) vs networkx
``betweenness_centrality(normalized=False)`` on directed graphs, batched
sampled sources vs the single-node Brandes replay, diamond sigma counting,
zero-fill, and hygiene (dups/self-loops)."""

from __future__ import annotations

import networkx as nx
import numpy as np

from connected_components_3d_spark.operators.betweenness import (
    betweenness_centrality,
    betweenness_single_node,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def collect_scores(res):
    return {r["vertex"]: r["betweenness"] for r in res.scores.collect()}


def assert_close(got: dict, expected: dict):
    assert set(got) == set(expected)
    gv = np.array([got[v] for v in sorted(got)])
    ev = np.array([expected[v] for v in sorted(got)])
    assert np.allclose(gv, ev, rtol=1e-9, atol=1e-9), np.abs(gv - ev).max()


def test_exact_matches_networkx_directed(spark):
    g = nx.gnp_random_graph(60, 0.08, seed=17, directed=True)
    res = betweenness_centrality(spark, edges_df(spark, list(g.edges())))
    assert res.converged
    assert_close(
        collect_scores(res), nx.betweenness_centrality(g, normalized=False)
    )


def test_diamond_sigma_counting(spark):
    # two equal-length s→t routes: each interior vertex carries half a path
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    res = betweenness_centrality(spark, edges_df(spark, pairs))
    got = collect_scores(res)
    expected = betweenness_single_node(pairs)
    assert_close(got, expected)
    assert abs(got[1] - got[2]) < 1e-12  # symmetric halves
    assert got[3] > got[1]  # the merge vertex carries every s→4 path


def test_sampled_sources_match_single_node(spark):
    g = nx.gnp_random_graph(80, 0.06, seed=23, directed=True)
    pairs = list(g.edges()) + pairs_dups(g)
    sources = [0, 7, 19]
    sdf = spark.createDataFrame([(s,) for s in sources], "vertex long")
    res = betweenness_centrality(spark, edges_df(spark, pairs), sdf)
    assert_close(
        collect_scores(res),
        betweenness_single_node(pairs, sources=sources),
    )


def pairs_dups(g):
    e = list(g.edges())
    return e[:10] + [(v, v) for v in list(g.nodes())[:3]]


def test_path_graph_closed_form(spark):
    # directed path 0→1→…→5: bc[v] = v·(5−v) (sources before × sinks after)
    pairs = [(i, i + 1) for i in range(5)]
    res = betweenness_centrality(spark, edges_df(spark, pairs))
    got = collect_scores(res)
    assert got == {v: float(v * (5 - v)) for v in range(6)}


def test_zero_fill_isolated_direction(spark):
    # star out-edges only: no vertex is interior to any path → all zeros
    pairs = [(0, i) for i in range(1, 6)]
    got = collect_scores(betweenness_centrality(spark, edges_df(spark, pairs)))
    assert set(got) == set(range(6))
    assert all(v == 0.0 for v in got.values())
