"""Borůvka MSF parity vs a Kruskal union-find single-node reference,
networkx total-weight agreement, forest/spanning properties, hygiene."""

from __future__ import annotations

import networkx as nx
import pytest

from connected_components_3d_spark.operators.msf import (
    minimum_spanning_forest,
    minimum_spanning_forest_single_node,
)


def edges_df(spark, triples):
    return spark.createDataFrame(
        [(int(a), int(b), int(w)) for a, b, w in triples],
        "src long, dst long, weight long",
    )


def assert_msf_matches(spark, triples):
    expected = minimum_spanning_forest_single_node(triples)
    res = minimum_spanning_forest(spark, edges_df(spark, triples))
    got = sorted(
        (r["u"], r["v"], r["weight"]) for r in res.forest.collect()
    )
    assert got == expected
    assert res.num_edges == len(expected)
    assert res.total_weight == sum(w for _, _, w in expected)
    return res


def test_triangle_and_square(spark):
    res = assert_msf_matches(spark, [(1, 2, 5), (2, 3, 3), (1, 3, 4)])
    assert res.total_weight == 7  # drops the max edge of the cycle
    assert_msf_matches(
        spark, [(1, 2, 1), (2, 3, 2), (3, 4, 3), (4, 1, 4), (1, 3, 10)]
    )


def test_random_weighted_parity_and_nx_weight(spark):
    g = nx.gnp_random_graph(80, 0.08, seed=13)
    triples = [
        (u, v, ((u * 7919 + v * 104729) % 1000) + 1) for u, v in g.edges()
    ]
    res = assert_msf_matches(spark, triples)
    # networkx agrees on total weight (MSF weight is tie-independent)
    wg = nx.Graph()
    for u, v, w in triples:
        wg.add_edge(u, v, weight=w)
    nx_w = sum(
        d["weight"] for _, _, d in nx.minimum_spanning_edges(wg, data=True)
    )
    assert res.total_weight == nx_w
    # spanning forest: same component structure as the input graph
    assert res.num_edges == wg.number_of_nodes() - nx.number_connected_components(wg)


def test_weight_ties_resolved_lexicographically(spark):
    # all weights equal: MSF = unique forest under (w, u, v) order
    triples = [(1, 2, 7), (2, 3, 7), (1, 3, 7), (3, 4, 7), (2, 4, 7)]
    assert_msf_matches(spark, triples)


def test_disconnected_forest(spark):
    triples = [(1, 2, 3), (2, 3, 1), (1, 3, 2), (10, 11, 5), (11, 12, 4), (10, 12, 6)]
    res = assert_msf_matches(spark, triples)
    assert res.num_edges == 4  # two trees of 2 edges each


def test_parallel_edges_and_self_loops(spark):
    triples = [(1, 2, 9), (2, 1, 3), (1, 2, 5), (2, 2, 1), (2, 3, 4)]
    res = assert_msf_matches(spark, triples)
    assert res.total_weight == 7  # min parallel weight 3 + edge 4


def test_already_a_tree(spark):
    g = nx.random_labeled_tree(40, seed=5)
    triples = [(u, v, (u + v) % 50 + 1) for u, v in g.edges()]
    res = assert_msf_matches(spark, triples)
    assert res.num_edges == 39  # every forest edge survives


def test_float_weights_rejected(spark):
    from pyspark.sql import functions as F

    df = edges_df(spark, [(1, 2, 3)]).withColumn("weight", F.lit(2.5))
    with pytest.raises(ValueError, match="integer weight"):
        minimum_spanning_forest(spark, df)


def test_empty_graph(spark):
    res = minimum_spanning_forest(spark, edges_df(spark, [(4, 4, 1)]))
    assert res.num_edges == 0 and res.forest.count() == 0
