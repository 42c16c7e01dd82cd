"""Balanced k-way partitioning parity: Spark vs the single-node replay of
the Spinner-score determinism contract (operators/partitioning.py
docstring), planted-structure recovery (ring of cliques with k = #cliques
stays clique-pure), soft balance under slack, edge-cut improvement over the
hash init, degenerates, validation."""

from __future__ import annotations

import networkx as nx
import pytest

from connected_components_3d_spark.operators.partitioning import (
    balanced_partitioning,
    balanced_partitioning_single_node,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def assert_partition_match(spark, pairs, k=4, fixed_rounds=5, **kw):
    expected = balanced_partitioning_single_node(
        pairs, k, fixed_rounds=fixed_rounds, **kw
    )
    res = balanced_partitioning(
        spark, edges_df(spark, pairs), k, fixed_rounds=fixed_rounds, **kw
    )
    got = {
        r["vertex"]: r["part"] for r in res.assignment.collect()
    }
    assert got == expected
    return res


def test_random_graph_parity(spark):
    g = nx.gnp_random_graph(90, 0.06, seed=17)
    assert_partition_match(spark, list(g.edges()), k=4, fixed_rounds=4)


def test_directed_input_and_self_loops_parity(spark):
    g = nx.gnp_random_graph(60, 0.08, seed=23, directed=True)
    pairs = list(g.edges()) + [(5, 5), (7, 7)]
    assert_partition_match(spark, pairs, k=3, fixed_rounds=5)


def ring_of_cliques(n_cliques=6, size=6):
    pairs = []
    for b in range(n_cliques):
        vs = [b * size + i for i in range(size)]
        pairs += [(a, c) for i, a in enumerate(vs) for c in vs[i + 1 :]]
        pairs.append((vs[0], ((b + 1) % n_cliques) * size))
    return pairs


def test_cliques_stay_pure(spark):
    """With k = #cliques and enough rounds, every clique ends up internally
    homogeneous (locality recovered), regardless of which part each clique
    lands in."""
    pairs = ring_of_cliques(6, 6)
    res = assert_partition_match(spark, pairs, k=6, fixed_rounds=8)
    got = {r["vertex"]: r["part"] for r in res.assignment.collect()}
    impure = [
        b
        for b in range(6)
        if len({got[b * 6 + i] for i in range(6)}) != 1
    ]
    assert impure == []
    # cut restricted to the 6 ring bridges at most
    assert res.edge_cut <= 6


def test_balance_soft_bound(spark):
    """Loads stay within ~2× the capacity on a graph with no planted
    structure (the soft-penalty regime — Spinner's own guarantee shape)."""
    g = nx.gnp_random_graph(120, 0.08, seed=5)
    res = assert_partition_match(spark, list(g.edges()), k=4, fixed_rounds=6)
    assert sum(res.loads.values()) == 120
    assert max(res.loads.values()) <= 2 * res.capacity


def test_cut_improves_over_init(spark):
    """fixed_rounds=6 yields a cut no worse than the raw hash init
    (fixed_rounds sweeps only move on strict improvement)."""
    pairs = ring_of_cliques(8, 5)
    e = edges_df(spark, pairs)
    init = balanced_partitioning(spark, e, 4, fixed_rounds=1)
    final = balanced_partitioning(spark, e, 4, fixed_rounds=8)
    assert final.edge_cut <= init.edge_cut


def test_empty_graph(spark):
    res = balanced_partitioning(spark, edges_df(spark, []), 4)
    assert res.assignment.count() == 0
    assert res.edge_cut == 0 and res.loads == {}


def test_validation(spark):
    with pytest.raises(Exception, match="\\[0, 2\\^30\\)"):
        balanced_partitioning(spark, edges_df(spark, [(-1, 2)]), 4)
    with pytest.raises(AssertionError):
        balanced_partitioning(spark, edges_df(spark, [(0, 1)]), 1)
