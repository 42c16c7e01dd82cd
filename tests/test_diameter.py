"""Double-sweep diameter lower bound (operators/diameter.py): exactness
on trees, known shapes, tie-break determinism, component scoping."""

from __future__ import annotations

import networkx as nx
import pytest

from connected_components_3d_spark.operators.diameter import (
    diameter_double_sweep,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def test_path_and_cycle(spark):
    res = diameter_double_sweep(spark, edges_df(spark, [(i, i + 1) for i in range(9)]))
    assert (res.u, res.ecc_u, res.v, res.ecc_v, res.lower_bound) == (
        0, 9, 9, 9, 9,
    )
    res = diameter_double_sweep(
        spark, edges_df(spark, [(i, (i + 1) % 10) for i in range(10)])
    )
    assert res.lower_bound == 5  # C10 diameter
    assert res.u == 0 and res.v == 5


def test_exact_on_random_trees(spark):
    # double sweep is EXACT on trees
    for seed in (3, 11):
        t = nx.random_labeled_tree(40, seed=seed)
        res = diameter_double_sweep(spark, edges_df(spark, t.edges()))
        assert res.lower_bound == nx.diameter(t)


def test_bound_and_summary_row(spark):
    g = nx.barbell_graph(5, 4)
    res = diameter_double_sweep(spark, edges_df(spark, g.edges()))
    assert res.lower_bound == nx.diameter(g)
    row = res.summary.collect()[0]
    assert (row["u"], row["v"], row["w"]) == (res.u, res.v, res.w)
    assert row["lower_bound"] == res.lower_bound
    # bound never exceeds the true diameter
    assert res.lower_bound <= nx.diameter(g)


def test_start_override_and_component_scope(spark):
    pairs = [(0, 1), (1, 2)] + [(10, 11), (11, 12), (12, 13)]
    res = diameter_double_sweep(spark, edges_df(spark, pairs))
    assert res.lower_bound == 2  # u=0's component only
    res2 = diameter_double_sweep(spark, edges_df(spark, pairs), start=10)
    assert res2.lower_bound == 3
    with pytest.raises(ValueError):
        diameter_double_sweep(spark, edges_df(spark, []).limit(0))
