"""MIS parity vs the sequential-greedy single-node reference, independence
and maximality properties, seed sensitivity, and hygiene."""

from __future__ import annotations

import networkx as nx
import pytest

from connected_components_3d_spark.operators.mis import (
    maximal_independent_set,
    maximal_independent_set_single_node,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def assert_mis_matches(spark, pairs, seed=42):
    expected = maximal_independent_set_single_node(pairs, seed=seed)
    res = maximal_independent_set(spark, edges_df(spark, pairs), seed=seed)
    got = {r["vertex"] for r in res.mis.collect()}
    assert got == expected
    # independence: no edge inside the set; maximality: every outside
    # vertex has a neighbour inside
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    verts = {x for p in es for x in p}
    assert not any(u in got and v in got for u, v in es)
    for v in verts - got:
        assert any(
            (v == u and w in got) or (v == w and u in got) for u, w in es
        )
    return res


def test_path_and_star(spark):
    assert_mis_matches(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    # star: either the hub alone or all leaves
    res = assert_mis_matches(spark, [(0, i) for i in range(1, 8)])
    assert res.num_rounds >= 1


def test_random_graph_parity(spark):
    g = nx.gnp_random_graph(120, 0.06, seed=11)
    assert_mis_matches(spark, list(g.edges()))


def test_tree_parity_and_rounds(spark):
    g = nx.random_labeled_tree(200, seed=7)
    res = assert_mis_matches(spark, list(g.edges()))
    # local-min greedy needs >1 round on any graph with a key-descending
    # path of length 2 — certain at this size
    assert res.num_rounds >= 2


def test_seed_changes_set(spark):
    g = nx.gnp_random_graph(60, 0.12, seed=3)
    pairs = list(g.edges())
    a = assert_mis_matches(spark, pairs, seed=42)
    b = assert_mis_matches(spark, pairs, seed=7)
    got_a = {r["vertex"] for r in a.mis.collect()}
    got_b = {r["vertex"] for r in b.mis.collect()}
    assert got_a != got_b  # both valid MIS, different greedy orders


def test_duplicates_self_loops_direction(spark):
    pairs = [(1, 2), (2, 1), (1, 2), (3, 3), (2, 3)]
    expected = maximal_independent_set_single_node(pairs)
    res = maximal_independent_set(spark, edges_df(spark, pairs))
    assert {r["vertex"] for r in res.mis.collect()} == expected
    # vertex 3's self-loop is dropped; 3 is adjacent only to 2


def test_empty_graph(spark):
    res = maximal_independent_set(spark, edges_df(spark, [(5, 5)]))
    # only a self-loop: hygiene drops it, the vertex set of the simple
    # graph is derived from surviving edges -> empty
    assert res.mis.count() == 0 and res.num_rounds == 0


def test_bad_vertex_range_rejected(spark):
    with pytest.raises(ValueError, match="2\\^31"):
        maximal_independent_set(spark, edges_df(spark, [(-1, 2)]))
