"""k-core parity vs networkx and the single-node peeling reference
(operators/kcore.py): exact vertex set + in-core degrees, empty-core and
low-k edge cases, convergence flag."""

from __future__ import annotations

import networkx as nx
import pytest

from connected_components_3d_spark.operators.kcore import (
    k_core,
    k_core_single_node,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def assert_kcore_matches(spark, pairs, k):
    res = k_core(spark, edges_df(spark, pairs), k)
    got = {r["vertex"]: r["kcore_deg"] for r in res.core.collect()}
    ref = k_core_single_node(pairs, k)
    assert got == ref
    assert res.converged
    # independent oracle: networkx (k>=1: k_core of the simple graph)
    g = nx.Graph()
    g.add_edges_from((a, b) for a, b in pairs if a != b)
    core = nx.k_core(g, k)
    assert set(got) == {v for v in core.nodes if core.degree(v) > 0}
    assert got == {v: core.degree(v) for v in got}
    return res


def test_random_gnp(spark):
    g = nx.gnp_random_graph(300, 0.012, seed=7)
    assert_kcore_matches(spark, list(g.edges()), 3)


def test_deep_peeling_chain_of_cliques(spark):
    # cliques of size 4 strung on a path: the path peels away round by
    # round, the cliques survive as the 3-core
    pairs = []
    for c in range(5):
        base = 100 * c
        pairs += [
            (base + i, base + j) for i in range(4) for j in range(i + 1, 4)
        ]
        if c:
            pairs.append((100 * (c - 1), base))  # bridge (degree-1 after peel)
    res = assert_kcore_matches(spark, pairs, 3)
    assert res.num_rounds >= 1


def test_empty_core(spark):
    # a tree has no 2-core
    g = nx.random_labeled_tree(40, seed=3)
    res = k_core(spark, edges_df(spark, list(g.edges())), 2)
    assert res.core.count() == 0
    assert res.core.columns == ["vertex", "kcore_deg"]
    assert res.converged


def test_k1_and_duplicates_and_self_loops(spark):
    pairs = [(1, 2), (2, 1), (2, 2), (2, 3), (4, 4)]
    got = {
        r["vertex"]: r["kcore_deg"]
        for r in k_core(spark, edges_df(spark, pairs), 1).core.collect()
    }
    assert got == {1: 1, 2: 2, 3: 1}  # simple graph 1-2-3; self-loops gone


def test_negative_k_raises(spark):
    with pytest.raises(ValueError):
        k_core(spark, edges_df(spark, [(1, 2)]), -1)
