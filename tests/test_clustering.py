"""Clustering coefficients (operators/clustering.py) vs networkx."""

from __future__ import annotations

import networkx as nx
import pytest

from connected_components_3d_spark.operators.clustering import (
    local_clustering,
    transitivity,
)


def _nx_graph(seed: int, n: int = 60, p: float = 0.12) -> nx.Graph:
    return nx.gnp_random_graph(n, p, seed=seed)


@pytest.mark.parametrize("seed", [7, 21])
def test_local_clustering_networkx_parity(spark, seed):
    g = _nx_graph(seed)
    edges = spark.createDataFrame(list(g.edges()), "src long, dst long")
    got = {
        r["vertex"]: (r["deg"], r["n_tri"], r["lcc"])
        for r in local_clustering(spark, edges).collect()
    }
    want_cc = nx.clustering(g)
    want_tri = nx.triangles(g)
    # isolated vertices don't appear in an edge table
    exp = {v for v in g.nodes if g.degree(v) > 0}
    assert set(got) == exp
    for v in exp:
        deg, n_tri, lcc = got[v]
        assert deg == g.degree(v)
        assert n_tri == want_tri[v]
        assert lcc == pytest.approx(want_cc[v], abs=1e-8)


def test_transitivity_networkx_parity(spark):
    g = _nx_graph(3)
    edges = spark.createDataFrame(list(g.edges()), "src long, dst long")
    row = transitivity(spark, edges).collect()[0]
    n_tri = sum(nx.triangles(g).values()) // 3
    assert row["n_triangles"] == n_tri
    assert row["transitivity"] == pytest.approx(nx.transitivity(g), abs=1e-8)


def test_directed_input_symmetrized_and_self_loops_dropped(spark):
    # triangle given only as directed arcs + a self loop + a dup edge
    rows = [(1, 2), (2, 3), (3, 1), (3, 1), (2, 2), (1, 4)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {r["vertex"]: r for r in local_clustering(spark, edges).collect()}
    assert got[1]["n_tri"] == 1 and got[1]["deg"] == 3
    assert got[1]["lcc"] == pytest.approx(1 / 3, abs=1e-8)
    assert got[4]["deg"] == 1 and got[4]["lcc"] == 0.0
    assert got[2]["deg"] == 2  # self-loop dropped


def test_wedge_free_graph(spark):
    edges = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    row = transitivity(spark, edges).collect()[0]
    assert row["n_triangles"] == 0
    assert row["n_wedges"] == 0
    assert row["transitivity"] == 0.0
