"""Butterfly-count parity vs a single-node reference and networkx-built
bicliques; cross-side total agreement; hub-cap semantics."""

from __future__ import annotations

import networkx as nx
import pytest

from connected_components_3d_spark.operators.butterfly import (
    butterflies,
    butterflies_single_node,
    butterfly_total,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def bipartite_pairs(nl=40, nr=30, p=0.15, seed=5):
    g = nx.bipartite.random_graph(nl, nr, p, seed=seed)
    left = {n for n, d in g.nodes(data=True) if d["bipartite"] == 0}
    return [
        (u, v + 1000) if u in left else (v, u + 1000) for u, v in g.edges()
    ]


def assert_butterflies_match(spark, pairs, side="dst", max_fanout=256):
    expected = butterflies_single_node(pairs, side=side, max_fanout=max_fanout)
    got = {
        r["vertex"]: r["butterflies"]
        for r in butterflies(
            spark, edges_df(spark, pairs), side=side, max_fanout=max_fanout
        ).collect()
    }
    assert got == expected
    return got


def test_single_butterfly(spark):
    pairs = [(1, 10), (1, 11), (2, 10), (2, 11)]
    got = assert_butterflies_match(spark, pairs)
    assert got == {10: 1, 11: 1}
    assert butterfly_total(spark, edges_df(spark, pairs)) == 1
    # complete 3x3 biclique: C(3,2)^2 = 9 butterflies
    k33 = [(a, b) for a in (1, 2, 3) for b in (10, 11, 12)]
    assert butterfly_total(spark, edges_df(spark, k33)) == 9


def test_random_bipartite_parity_both_sides(spark):
    pairs = bipartite_pairs()
    assert_butterflies_match(spark, pairs, side="dst")
    assert_butterflies_match(spark, pairs, side="src")
    # the same butterflies counted from either side
    e = edges_df(spark, pairs)
    assert butterfly_total(spark, e, side="dst") == butterfly_total(
        spark, e, side="src"
    )


def test_hub_cap_excludes_generator(spark):
    # source 1 has degree 5 > cap 4: all its wedges vanish
    pairs = [(1, 10 + i) for i in range(5)] + [(2, 10), (2, 11), (3, 10), (3, 11)]
    got = assert_butterflies_match(spark, pairs, max_fanout=4)
    assert got == {10: 1, 11: 1}  # only the 2/3 wedge pair survives


def test_duplicates_and_direction(spark):
    pairs = [(1, 10), (1, 10), (1, 11), (2, 10), (2, 11), (2, 11)]
    got = assert_butterflies_match(spark, pairs)
    assert got == {10: 1, 11: 1}


def test_bad_side_rejected(spark):
    with pytest.raises(ValueError, match="bad side"):
        butterflies(spark, edges_df(spark, [(1, 2)]), side="left")
