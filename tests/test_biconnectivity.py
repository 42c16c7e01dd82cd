"""Articulation-point / biconnected-component parity vs networkx
(operators/biconnectivity.py): adversarial small shapes (paths, cycles,
stars, barbells, theta graphs, blocks sharing cut vertices, trees with
chords), random graphs, duplicate/self-loop hygiene, deep chains (binary
lifting), and partition invariance."""

from __future__ import annotations

import networkx as nx

from connected_components_3d_spark.operators.biconnectivity import biconnected


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
    artic = set(nx.articulation_points(g))
    blocks = {
        frozenset(tuple(sorted(e)) for e in comp)
        for comp in nx.biconnected_component_edges(g)
    }
    return artic, blocks


def got_blocks(res):
    """edge_blocks rows → set of frozensets of canonical edges, grouped by
    the block's canonical representative edge."""
    by_rep: dict[tuple, set] = {}
    for r in res.edge_blocks.collect():
        by_rep.setdefault((r["bu"], r["bv"]), set()).add((r["u"], r["v"]))
    # the representative must be the lexicographically smallest member
    for rep, members in by_rep.items():
        assert rep == min(members)
    return {frozenset(v) for v in by_rep.values()}


def assert_matches(spark, pairs, parts=None):
    res = biconnected(spark, edges_df(spark, pairs, parts))
    ref_a, ref_b = nx_ref(pairs)
    got_a = {r["vertex"] for r in res.articulation_points.collect()}
    assert got_a == ref_a
    assert got_blocks(res) == ref_b
    assert res.num_articulation_points == len(ref_a)
    assert res.num_blocks == len(ref_b)
    return res


def test_single_edge(spark):
    res = assert_matches(spark, [(0, 1)])
    assert res.num_articulation_points == 0
    assert res.num_blocks == 1


def test_path_every_inner_vertex_cuts(spark):
    res = assert_matches(spark, [(i, i + 1) for i in range(8)])
    assert res.num_articulation_points == 7  # all inner vertices
    assert res.num_blocks == 8  # every edge its own block


def test_cycle_one_block_no_cuts(spark):
    res = assert_matches(spark, [(i, (i + 1) % 9) for i in range(9)])
    assert res.num_articulation_points == 0
    assert res.num_blocks == 1


def test_star_center_cuts(spark):
    res = assert_matches(spark, [(0, i) for i in range(1, 7)])
    assert res.num_articulation_points == 1
    assert res.num_blocks == 6


def test_triangle_with_pendant(spark):
    assert_matches(spark, [(0, 1), (1, 2), (0, 2), (2, 9)])


def test_two_triangles_sharing_a_vertex(spark):
    res = assert_matches(
        spark, [(0, 1), (1, 2), (0, 2), (0, 3), (3, 4), (0, 4)]
    )
    assert res.num_articulation_points == 1  # the shared vertex
    assert res.num_blocks == 2


def test_barbell(spark):
    # two triangles joined by a 3-edge path: path edges are single-edge
    # blocks, path vertices + attachment vertices are articulation points
    tri1 = [(0, 1), (1, 2), (0, 2)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    path = [(2, 5), (5, 6), (6, 10)]
    assert_matches(spark, tri1 + tri2 + path)


def test_theta_graph_single_block(spark):
    # two hubs joined by three internally-disjoint 2-paths — biconnected
    res = assert_matches(
        spark, [(0, 1), (1, 5), (0, 2), (2, 5), (0, 3), (3, 5)]
    )
    assert res.num_articulation_points == 0
    assert res.num_blocks == 1


def test_cycle_with_chord(spark):
    assert_matches(spark, [(i, (i + 1) % 6) for i in range(6)] + [(0, 3)])


def test_ancestor_back_edge_chain(spark):
    # path 0..5 plus chord (1,4): the middle is one block, the ends cut
    res = assert_matches(
        spark, [(i, i + 1) for i in range(5)] + [(1, 4)]
    )
    assert res.num_articulation_points == 2  # vertices 1 and 4
    assert res.num_blocks == 3


def test_deep_chain_exercises_lifting(spark):
    # 70-vertex path with one long chord — depth ≈ 64 forces several
    # binary-lifting levels in the LCA and the lift-to-depth walk
    pairs = [(i, i + 1) for i in range(69)] + [(3, 66)]
    assert_matches(spark, pairs)


def test_disconnected_components(spark):
    pairs = (
        [(0, 1), (1, 2), (0, 2)]  # triangle
        + [(10, 11), (11, 12)]  # path
        + [(20, 21), (21, 22), (22, 20), (22, 23)]  # triangle + pendant
    )
    assert_matches(spark, pairs)


def test_hygiene_self_loops_duplicates_orientation(spark):
    pairs = [(0, 1), (1, 0), (1, 1), (1, 2), (2, 0), (2, 0), (2, 3)]
    res = assert_matches(spark, pairs)
    assert res.num_articulation_points == 1  # vertex 2
    assert res.num_blocks == 2


def test_random_graph_parity(spark):
    import random

    rng = random.Random(404)
    n = 40
    pairs = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(70)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    assert_matches(spark, pairs)


def test_random_sparse_many_cuts(spark):
    import random

    rng = random.Random(77)
    # a tree plus a few chords — lots of articulation points
    pairs = [(i, rng.randrange(i)) for i in range(1, 35)]
    pairs += [(3, 30), (8, 22)]
    assert_matches(spark, pairs)


def test_partition_invariance(spark):
    pairs = (
        [(i, (i + 1) % 10) for i in range(10)]
        + [(0, 5), (2, 12), (12, 13), (13, 2)]
    )
    r1 = biconnected(spark, edges_df(spark, pairs, parts=1))
    r7 = biconnected(spark, edges_df(spark, pairs, parts=7))
    a1 = {r["vertex"] for r in r1.articulation_points.collect()}
    a7 = {r["vertex"] for r in r7.articulation_points.collect()}
    assert a1 == a7
    assert got_blocks(r1) == got_blocks(r7)


def test_empty_input(spark):
    res = biconnected(spark, edges_df(spark, [(1, 1)]))  # only a self-loop
    assert res.articulation_points.count() == 0
    assert res.edge_blocks.count() == 0
    assert res.num_blocks == 0
