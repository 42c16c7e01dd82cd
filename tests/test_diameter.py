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


def test_ifub_exact_diameter(spark):
    from connected_components_3d_spark.operators.diameter import (
        diameter_exact,
    )
    import random

    # shapes + random connected graphs: exact must equal networkx diameter
    graphs = [
        nx.path_graph(10),
        nx.cycle_graph(11),
        nx.barbell_graph(4, 3),
    ]
    for seed in (5, 21):
        rng = random.Random(seed)
        g = nx.Graph()
        g.add_edges_from((i, i + 1) for i in range(19))  # spine: connected
        g.add_edges_from(
            (rng.randrange(20), rng.randrange(20)) for _ in range(15)
        )
        g.remove_edges_from(nx.selfloop_edges(g))
        graphs.append(g)
    for g in graphs:
        res = diameter_exact(spark, edges_df(spark, g.edges()))
        assert res.exact, (res.diameter, res.upper_bound, res.num_bfs)
        assert res.diameter == nx.diameter(g)
        u, w = res.witness
        assert nx.shortest_path_length(g, u, w) == res.diameter
    # budget exhaustion degrades to bounds, never wrong answers
    c = nx.cycle_graph(12)
    res = diameter_exact(spark, edges_df(spark, c.edges()), max_bfs=3)
    assert not res.exact
    assert res.diameter <= nx.diameter(c) <= res.upper_bound
