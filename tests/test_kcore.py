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
    # 4-cliques (the surviving 3-core) plus a depth-3 complete binary tree
    # hanging off clique 0: parallel peeling at k=3 removes the tree LEVEL
    # BY LEVEL (leaves first, then their now-degree-1 parents, ...), so the
    # peel provably takes multiple rounds before the cliques remain
    pairs = []
    for c in range(5):
        base = 100 * c
        pairs += [
            (base + i, base + j) for i in range(4) for j in range(i + 1, 4)
        ]
        if c:
            pairs.append((100 * (c - 1), base))  # clique-to-clique bridge
    # binary tree: node t has children 2t+1, 2t+2 (ids offset by 1000);
    # root (t=0) also linked into clique 0 — every tree vertex peels
    pairs.append((0, 1000))
    for t in range(7):  # internal nodes of a 15-vertex complete binary tree
        pairs += [(1000 + t, 1000 + 2 * t + 1), (1000 + t, 1000 + 2 * t + 2)]
    res = assert_kcore_matches(spark, pairs, 3)
    # leaves, then depth-2 nodes, then depth-1, then the root: ≥ 4 rounds
    assert res.num_rounds >= 4


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


def test_core_numbers_random(spark):
    from connected_components_3d_spark.operators.kcore import core_numbers

    g = nx.gnp_random_graph(250, 0.02, seed=9)
    pairs = [e for e in g.edges()]
    res = core_numbers(spark, edges_df(spark, pairs))
    got = {r["vertex"]: r["core"] for r in res.cores.collect()}
    ref = nx.core_number(nx.Graph(pairs))
    assert got == ref
    assert res.converged
    assert res.max_core == max(ref.values())


def test_core_numbers_star_center_isolated_remainder(spark):
    from connected_components_3d_spark.operators.kcore import core_numbers

    # star: the center survives the round that removes every leaf and is
    # then invisible to the degree table (degree 0) — it must still be
    # assigned core 1 via the active-vertex anti-join
    pairs = [(0, i) for i in range(1, 6)]
    res = core_numbers(spark, edges_df(spark, pairs))
    got = {r["vertex"]: r["core"] for r in res.cores.collect()}
    assert got == {v: 1 for v in range(6)}


def test_core_numbers_mixed_structure(spark):
    from connected_components_3d_spark.operators.kcore import core_numbers

    # 5-clique (core 4) + triangle (core 2) + pendant path (core 1),
    # bridged; duplicate and self-loop edges must be ignored
    pairs = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    pairs += [(10, 11), (11, 12), (12, 10), (0, 10)]
    pairs += [(20, 21), (21, 22), (4, 20), (4, 20), (7, 7)]
    res = core_numbers(spark, edges_df(spark, pairs))
    got = {r["vertex"]: r["core"] for r in res.cores.collect()}
    ref = nx.core_number(nx.Graph((a, b) for a, b in pairs if a != b))
    assert got == ref
    assert res.max_core == 4


def test_core_numbers_empty(spark):
    from connected_components_3d_spark.operators.kcore import core_numbers

    res = core_numbers(spark, edges_df(spark, []))
    assert res.cores.count() == 0
    assert res.cores.columns == ["vertex", "core"]
    assert res.converged
