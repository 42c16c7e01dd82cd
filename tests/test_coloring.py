"""Greedy-coloring parity vs the sequential single-node reference,
properness, colour-count bounds, and hygiene."""

from __future__ import annotations

import networkx as nx
import pytest

from connected_components_3d_spark.operators.coloring import (
    greedy_coloring,
    greedy_coloring_single_node,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def assert_coloring_matches(spark, pairs, seed=42):
    expected = greedy_coloring_single_node(pairs, seed=seed)
    res = greedy_coloring(spark, edges_df(spark, pairs), seed=seed)
    got = {r["vertex"]: r["color"] for r in res.colors.collect()}
    assert got == expected
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    assert not any(got[u] == got[v] for u, v in es)  # proper
    assert res.num_colors == (max(got.values()) + 1 if got else 0)
    return res


def test_path_triangle_star(spark):
    assert_coloring_matches(spark, [(1, 2), (2, 3), (3, 4)])
    res = assert_coloring_matches(spark, [(1, 2), (2, 3), (1, 3)])
    assert res.num_colors == 3  # triangle needs 3
    assert_coloring_matches(spark, [(0, i) for i in range(1, 9)])


def test_bipartite_two_colors_bound(spark):
    g = nx.bipartite.random_graph(25, 20, 0.2, seed=4)
    left = {n for n, d in g.nodes(data=True) if d["bipartite"] == 0}
    pairs = [
        (u, v + 1000) if u in left else (v, u + 1000) for u, v in g.edges()
    ]
    res = assert_coloring_matches(spark, pairs)
    # greedy on bipartite is not always 2, but ≤ Δ+1 always
    maxdeg = max(
        sum(1 for p in pairs for x in p if x == v)
        for v in {x for p in pairs for x in p}
    )
    assert res.num_colors <= maxdeg + 1


def test_random_graph_parity_and_rounds(spark):
    g = nx.gnp_random_graph(120, 0.06, seed=17)
    res = assert_coloring_matches(spark, list(g.edges()))
    assert res.num_rounds >= 2


def test_duplicates_self_loops(spark):
    pairs = [(1, 2), (2, 1), (1, 2), (3, 3), (2, 3)]
    expected = greedy_coloring_single_node(pairs)
    res = greedy_coloring(spark, edges_df(spark, pairs))
    assert {r["vertex"]: r["color"] for r in res.colors.collect()} == expected


def test_empty_graph(spark):
    res = greedy_coloring(spark, edges_df(spark, [(7, 7)]))
    assert res.colors.count() == 0 and res.num_colors == 0


def test_bad_vertex_range_rejected(spark):
    with pytest.raises(ValueError, match="2\\^31"):
        greedy_coloring(spark, edges_df(spark, [(1, 2**31)]))
