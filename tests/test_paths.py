"""Shortest-path extraction (operators/paths.py): networkx length parity
+ path validity + canonical (lexicographically-least) tie-breaking,
unreachable targets, trivial source=target, guard rails."""

from __future__ import annotations

import networkx as nx
import pytest

from connected_components_3d_spark.operators.paths import extract_path


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def test_random_digraph_length_parity_and_validity(spark):
    g = nx.gnp_random_graph(60, 0.08, seed=41, directed=True)
    eset = set(g.edges())
    e = edges_df(spark, list(eset))
    hit = 0
    for target in [7, 23, 42]:
        try:
            exp_len = nx.shortest_path_length(g, 0, target)
        except nx.NetworkXNoPath:
            continue
        hit += 1
        res = extract_path(spark, e, 0, target)
        assert res.found and res.dist == exp_len
        assert len(res.vertices) == exp_len + 1
        assert res.vertices[0] == 0 and res.vertices[-1] == target
        for u, v in zip(res.vertices, res.vertices[1:]):
            assert (u, v) in eset  # every hop is a real edge
    assert hit >= 2  # the fixture must actually exercise the operator


def test_canonical_tie_break(spark):
    """Diamond 0→{1,2}→3: both paths are shortest; pred(3) = min(1, 2)."""
    res = extract_path(spark, edges_df(spark, [(0, 1), (0, 2), (1, 3), (2, 3)]), 0, 3)
    assert res.vertices == [0, 1, 3]


def test_unreachable_and_trivial(spark):
    e = edges_df(spark, [(0, 1), (2, 3)])
    res = extract_path(spark, e, 0, 3)
    assert not res.found and res.dist is None and res.vertices == []
    assert res.path.count() == 0
    triv = extract_path(spark, e, 0, 0)
    assert triv.found and triv.dist == 0 and triv.vertices == [0]


def test_directedness_respected(spark):
    res = extract_path(spark, edges_df(spark, [(1, 0)]), 0, 1)
    assert not res.found  # edge points the wrong way


def test_max_path_len_guard(spark):
    chain = [(i, i + 1) for i in range(6)]
    with pytest.raises(AssertionError, match="max_path_len"):
        extract_path(spark, edges_df(spark, chain), 0, 6, max_path_len=3)
