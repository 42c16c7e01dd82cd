"""Incremental CC parity: updating a canonical min-id labeling with an edge
batch must equal a full CC run over the union (operators/incremental.py
correctness argument), including brand-new vertices, intra-component
batches, self-loops, and chained merges."""

from __future__ import annotations

import networkx as nx

from connected_components_3d_spark.operators.cc import connected_components
from connected_components_3d_spark.operators.incremental import (
    incremental_components,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def full_labels(pairs):
    g = nx.Graph()
    g.add_edges_from(pairs)
    return sorted(
        (v, min(comp)) for comp in nx.connected_components(g) for v in comp
    )


def assert_incremental_matches(spark, old_pairs, new_pairs):
    base = connected_components(
        spark, edges_df(spark, old_pairs), method="hashmin"
    ).components
    res = incremental_components(spark, base, edges_df(spark, new_pairs))
    got = sorted(
        (r["vertex"], r["component"]) for r in res.components.collect()
    )
    assert got == full_labels(old_pairs + [
        (a, b) for a, b in new_pairs if a != b
    ])
    return res


def test_random_merge_parity(spark):
    g1 = nx.gnp_random_graph(150, 0.015, seed=4)
    g2 = nx.gnp_random_graph(150, 0.01, seed=8)  # same id space: merges
    assert_incremental_matches(spark, list(g1.edges()), list(g2.edges()))


def test_new_vertices_join_components(spark):
    old = [(0, 1), (1, 2), (10, 11)]
    # 100/101 brand new, chained onto old component of 0; 200 new + isolated
    # pair with 201
    new = [(2, 100), (100, 101), (200, 201)]
    res = assert_incremental_matches(spark, old, new)
    comp = dict(
        (r["vertex"], r["component"]) for r in res.components.collect()
    )
    assert comp[101] == 0 and comp[201] == 200


def test_intra_component_and_self_loop_batch(spark):
    """A delta that merges nothing (edges inside one old component +
    self-loops) must return the assignment unchanged."""
    old = [(0, 1), (1, 2), (2, 3)]
    res = assert_incremental_matches(spark, old, [(0, 3), (1, 1)])
    assert res.num_supersteps == 0


def test_chained_merges_across_batch(spark):
    """One batch stringing MANY old components together (the merge chain the
    delta-graph CC must traverse, not a single hash-min step)."""
    old = [(10 * i, 10 * i + 1) for i in range(12)]  # 12 two-vertex comps
    new = [(10 * i + 1, 10 * (i + 1)) for i in range(11)]  # chain them all
    res = assert_incremental_matches(spark, old, new)
    comps = {r["component"] for r in res.components.collect()}
    assert comps == {0}
