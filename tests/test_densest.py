"""Densest-subgraph parity vs the single-node integer-exact peel, the
3-approximation guarantee against a brute-force optimum, and planted-clique
recovery."""

from __future__ import annotations

from itertools import combinations

import networkx as nx

from connected_components_3d_spark.operators.densest import (
    densest_subgraph,
    densest_subgraph_single_node,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def assert_densest_matches(spark, pairs):
    vs, ne, nv = densest_subgraph_single_node(pairs)
    res = densest_subgraph(spark, edges_df(spark, pairs))
    got = {r["vertex"] for r in res.vertices.collect()}
    assert got == vs
    assert (res.num_edges, res.num_vertices) == (ne, nv)
    return res


def brute_max_density(pairs, max_n=12):
    """Exact densest subgraph by enumeration (small fixtures only)."""
    g = nx.Graph()
    g.add_edges_from((a, b) for a, b in pairs if a != b)
    best = 0.0
    nodes = list(g.nodes())
    assert len(nodes) <= max_n
    for k in range(1, len(nodes) + 1):
        for sub in combinations(nodes, k):
            se = g.subgraph(sub).number_of_edges()
            best = max(best, se / k)
    return best


def test_planted_clique_recovered(spark):
    # sparse background + a 8-clique: the clique is the densest iterate
    g = nx.random_labeled_tree(60, seed=3)
    pairs = list(g.edges())
    clique = list(range(100, 108))
    pairs += [(a, b) for a, b in combinations(clique, 2)]
    pairs += [(0, 100)]  # attach it
    res = assert_densest_matches(spark, pairs)
    got = {r["vertex"] for r in res.vertices.collect()}
    assert set(clique) <= got
    assert res.density >= (8 - 1) / 2 / 3  # ≥ OPT/3 (clique density 3.5)


def test_three_approx_guarantee_small(spark):
    g = nx.gnp_random_graph(11, 0.35, seed=9)
    pairs = list(g.edges())
    res = assert_densest_matches(spark, pairs)
    opt = brute_max_density(pairs)
    assert res.density >= opt / 3 - 1e-12


def test_random_graph_parity(spark):
    g = nx.gnp_random_graph(150, 0.04, seed=21)
    res = assert_densest_matches(spark, list(g.edges()))
    assert res.num_rounds >= 1


def test_clique_is_its_own_densest(spark):
    pairs = [(a, b) for a, b in combinations(range(6), 2)]
    res = assert_densest_matches(spark, pairs)
    assert {r["vertex"] for r in res.vertices.collect()} == set(range(6))
    assert res.num_edges == 15 and res.num_vertices == 6


def test_empty_graph(spark):
    res = densest_subgraph(spark, edges_df(spark, [(1, 1)]))
    assert res.num_vertices == 0 and res.vertices.count() == 0
