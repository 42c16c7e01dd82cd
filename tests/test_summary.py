"""Graph summary (operators/summary.py): networkx parity on every
column, largest-component seeding, degenerates."""

from __future__ import annotations

import networkx as nx

from connected_components_3d_spark.operators.summary import graph_summary


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def test_summary_matches_networkx(spark):
    import random

    rng = random.Random(23)
    pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(70)]
    pairs += [(100, 101), (101, 102)]  # a second small component
    g = nx.Graph()
    g.add_edges_from((a, b) for a, b in pairs if a != b)
    res = graph_summary(spark, edges_df(spark, pairs))
    row = res.summary.collect()[0]
    assert row["n_vertices"] == g.number_of_nodes()
    assert row["n_edges"] == g.number_of_edges()
    comps = list(nx.connected_components(g))
    assert row["n_components"] == len(comps)
    big = max(comps, key=len)
    assert row["largest_size"] == len(big)
    assert abs(row["largest_frac"] - len(big) / g.number_of_nodes()) < 1e-12
    tris = sum(nx.triangles(g).values()) // 3
    assert row["n_triangles"] == tris
    assert abs(row["transitivity"] - round(nx.transitivity(g), 8)) < 1e-8
    # diameter bound: seeded in the LARGEST component, ≤ its true diameter
    d_big = nx.diameter(g.subgraph(big))
    assert 0 < row["diameter_lb"] <= d_big


def test_summary_empty(spark):
    res = graph_summary(spark, edges_df(spark, []).limit(0))
    row = res.summary.collect()[0]
    assert row["n_vertices"] == 0 and row["n_edges"] == 0
