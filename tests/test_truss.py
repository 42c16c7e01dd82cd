"""k-truss parity vs networkx ``k_truss`` (same Cohen-2008 contract:
every edge of the k-truss has ≥ k−2 triangles inside it), support-value
verification against a brute-force common-neighbor count, peel-progress
sanity, and edge cases (k=2 identity, empty truss, duplicate/self-loop
hygiene)."""

from __future__ import annotations

import networkx as nx

from connected_components_3d_spark.operators.truss import k_truss


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def nx_truss_edges(pairs, k):
    g = nx.Graph()
    g.add_edges_from((a, b) for a, b in pairs if a != b)
    t = nx.k_truss(g, k)
    return {(min(a, b), max(a, b)) for a, b in t.edges()}


def brute_support(edge_set):
    adj = {}
    for a, b in edge_set:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return {
        (a, b): len(adj[a] & adj[b]) for a, b in edge_set
    }


def assert_truss_matches(spark, pairs, k):
    res = k_truss(spark, edges_df(spark, pairs), k)
    got = {(r["src"], r["dst"]): r["support"] for r in res.truss.collect()}
    expected_edges = nx_truss_edges(pairs, k)
    assert set(got) == expected_edges
    # support values: common-neighbor counts inside the converged truss
    for e, s in brute_support(expected_edges).items():
        assert got[e] == s
        assert s >= k - 2
    return res


def test_er_graph_k3_k4(spark):
    g = nx.gnp_random_graph(120, 0.08, seed=13)
    pairs = list(g.edges())
    assert_truss_matches(spark, pairs, 3)
    assert_truss_matches(spark, pairs, 4)


def test_clique_with_tail(spark):
    # 6-clique + pendant path: the 4-truss is exactly the clique (every
    # clique edge has 4 common neighbors), the tail peels in round 1
    clique = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    tail = [(5, 10), (10, 11), (11, 12)]
    res = assert_truss_matches(spark, clique + tail, 4)
    assert res.num_rounds >= 1
    assert res.converged
    got = {(r["src"], r["dst"]) for r in res.truss.collect()}
    assert got == {(i, j) for i in range(6) for j in range(i + 1, 6)}


def test_cascading_peel(spark):
    # two triangles sharing an edge: the shared structure is a 3-truss but
    # NOT a 4-truss — dropping the outer edges must cascade to everything
    pairs = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    res = assert_truss_matches(spark, pairs, 4)
    assert res.truss.count() == 0
    assert res.num_rounds >= 1


def test_k2_is_identity(spark):
    pairs = [(0, 1), (1, 2), (5, 6)]
    res = assert_truss_matches(spark, pairs, 2)
    assert res.num_rounds == 0
    assert res.truss.count() == 3


def test_duplicates_and_self_loops(spark):
    tri = [(0, 1), (1, 2), (0, 2)]
    noisy = tri + [(1, 0), (2, 2), (0, 1)]
    a = sorted(map(tuple, k_truss(spark, edges_df(spark, tri), 3).truss.collect()))
    b = sorted(map(tuple, k_truss(spark, edges_df(spark, noisy), 3).truss.collect()))
    assert a == b


def test_empty_graph(spark):
    res = k_truss(spark, edges_df(spark, []), 3)
    assert res.truss.count() == 0
    assert res.converged
