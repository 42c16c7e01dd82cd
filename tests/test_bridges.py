"""Bridge / 2-edge-connected-component parity vs networkx
(operators/bridges.py): adversarial small shapes (paths, cycles, barbells,
theta graphs, trees with chords), random graphs, duplicate/self-loop
hygiene, and partition invariance."""

from __future__ import annotations

import networkx as nx

from connected_components_3d_spark.operators.bridges import bridges


def edges_df(spark, pairs, parts=None):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )
    if parts:
        df = df.repartition(parts)
    return df


def nx_ref(pairs):
    g = nx.Graph()
    g.add_edges_from((a, b) for a, b in pairs if a != b)
    bri = {tuple(sorted(e)) for e in nx.bridges(g)}
    # 2ECC = components after removing bridges
    h = g.copy()
    h.remove_edges_from(bri)
    comp = {}
    for cc in nx.connected_components(h):
        mn = min(cc)
        for v in cc:
            comp[v] = mn
    return bri, comp


def assert_matches(spark, pairs, parts=None):
    res = bridges(spark, edges_df(spark, pairs, parts))
    got_b = {(r["u"], r["v"]) for r in res.bridges.collect()}
    got_c = {r["vertex"]: r["component"] for r in res.two_edge_components.collect()}
    ref_b, ref_c = nx_ref(pairs)
    assert got_b == ref_b
    assert got_c == ref_c
    assert res.num_bridges == len(ref_b)
    return res


def test_path_all_bridges(spark):
    assert_matches(spark, [(i, i + 1) for i in range(10)])


def test_cycle_no_bridges(spark):
    res = assert_matches(spark, [(i, (i + 1) % 8) for i in range(8)])
    assert res.num_bridges == 0


def test_barbell(spark):
    # two triangles joined by a 3-edge path: the path edges are bridges
    tri1 = [(0, 1), (1, 2), (0, 2)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    path = [(2, 5), (5, 6), (6, 10)]
    res = assert_matches(spark, tri1 + tri2 + path)
    assert res.num_bridges == 3


def test_theta_graph(spark):
    # two vertices joined by three disjoint paths — no bridges anywhere
    p1 = [(0, 1), (1, 9)]
    p2 = [(0, 2), (2, 3), (3, 9)]
    p3 = [(0, 4), (4, 5), (5, 6), (6, 9)]
    res = assert_matches(spark, p1 + p2 + p3)
    assert res.num_bridges == 0


def test_tree_with_one_chord(spark):
    # star-of-paths tree; one chord creates exactly one cycle
    tree = [(0, 1), (1, 2), (2, 3), (0, 4), (4, 5), (5, 6), (0, 7)]
    chord = [(3, 6)]
    assert_matches(spark, tree + chord)


def test_random_gnm(spark):
    for seed in (3, 17, 42):
        g = nx.gnm_random_graph(120, 150, seed=seed)
        assert_matches(spark, list(g.edges()))


def test_random_sparse_forest_like(spark):
    g = nx.gnm_random_graph(150, 110, seed=9)  # below the giant threshold
    assert_matches(spark, list(g.edges()))


def test_disconnected_mixture(spark):
    ring = [(i, (i + 1) % 5) for i in range(5)]
    path = [(100, 101), (101, 102)]
    clique = [(a, b) for a in range(200, 204) for b in range(a + 1, 204)]
    assert_matches(spark, ring + path + clique)


def test_duplicates_and_self_loops(spark):
    # parallel rows and self-loops collapse to simple-graph semantics
    pairs = [(0, 1), (1, 0), (0, 1), (1, 1), (1, 2), (2, 1)]
    res = assert_matches(spark, pairs)
    assert res.num_bridges == 2  # 0-1 and 1-2 both bridges


def test_single_edge(spark):
    res = assert_matches(spark, [(7, 9)])
    assert res.num_bridges == 1


def test_empty(spark):
    res = bridges(spark, edges_df(spark, []) if False else
                  spark.createDataFrame([], "src long, dst long"))
    assert res.bridges.count() == 0
    assert res.two_edge_components.count() == 0


def test_partition_invariance(spark):
    g = nx.gnm_random_graph(90, 110, seed=23)
    pairs = list(g.edges())
    r2 = bridges(spark, edges_df(spark, pairs, parts=2))
    r16 = bridges(spark, edges_df(spark, pairs, parts=16))
    assert sorted(map(tuple, r2.bridges.collect())) == sorted(
        map(tuple, r16.bridges.collect())
    )
    assert sorted(map(tuple, r2.two_edge_components.collect())) == sorted(
        map(tuple, r16.two_edge_components.collect())
    )


def test_deep_chain_with_ring_tail(spark):
    # deep BFS tree exercises multi-level lifting (K > 2)
    chain = [(i, i + 1) for i in range(40)]
    ring = [(40 + i, 40 + (i + 1) % 6) for i in range(6)]
    link = [(40, 41)]
    # ring vertices 40..45; chain joins at 40
    pairs = chain + ring
    assert_matches(spark, pairs)
