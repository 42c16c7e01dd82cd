"""Assortativity parity vs networkx ``degree_assortativity_coefficient``
and community-metrics parity vs networkx ``modularity`` + hand-checked
conductance."""

from __future__ import annotations

import networkx as nx
import pytest

from connected_components_3d_spark.operators.assortativity import (
    degree_assortativity,
)
from connected_components_3d_spark.operators.modularity import (
    community_metrics,
    modularity,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def asg_df(spark, mapping):
    return spark.createDataFrame(
        [(int(v), int(c)) for v, c in mapping.items()],
        "vertex long, community long",
    )


def test_assortativity_networkx_parity(spark):
    for seed in (3, 9):
        g = nx.gnp_random_graph(50, 0.1, seed=seed)
        got = degree_assortativity(spark, edges_df(spark, g.edges())).collect()[0]
        assert got["r"] == pytest.approx(
            nx.degree_assortativity_coefficient(g), abs=1e-9
        )
        assert got["n_edges"] == g.number_of_edges()
    # star: maximally disassortative, r = -1
    star = [(0, i) for i in range(1, 6)]
    got = degree_assortativity(spark, edges_df(spark, star)).collect()[0]
    assert got["r"] == pytest.approx(-1.0)
    # degree-regular (triangle): zero variance → NULL
    tri = [(0, 1), (1, 2), (0, 2)]
    assert degree_assortativity(spark, edges_df(spark, tri)).collect()[0]["r"] is None


def test_modularity_networkx_parity(spark):
    g = nx.gnp_random_graph(40, 0.15, seed=11)
    pairs = list(g.edges())
    comms = {v: v % 4 for v in g}
    q = modularity(spark, edges_df(spark, pairs), asg_df(spark, comms))
    nxq = nx.community.modularity(
        g, [{v for v in g if v % 4 == k} for k in range(4)]
    )
    assert q == pytest.approx(nxq, abs=1e-9)


def test_community_metrics_two_cliques_bridge(spark):
    # two 4-cliques joined by one bridge
    c1 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    c2 = [(i, j) for i in range(10, 14) for j in range(i + 1, 14) if j >= 10]
    pairs = c1 + c2 + [(3, 10)]
    mapping = {v: 0 for v in range(4)}
    mapping.update({v: 1 for v in range(10, 14)})
    rows = {
        r["community"]: r
        for r in community_metrics(
            spark, edges_df(spark, pairs), asg_df(spark, mapping)
        ).collect()
    }
    m = 13
    for c in (0, 1):
        assert rows[c]["n_vertices"] == 4
        assert rows[c]["internal_edges"] == 6
        assert rows[c]["degree_sum"] == 13
        assert rows[c]["cut_edges"] == 1
        assert rows[c]["conductance"] == pytest.approx(1 / 13)
        assert rows[c]["contribution"] == pytest.approx(
            6 / m - (13 / (2 * m)) ** 2
        )
    q = sum(r["contribution"] for r in rows.values())
    g = nx.Graph(pairs)
    assert q == pytest.approx(
        nx.community.modularity(g, [set(range(4)), set(range(10, 14))]),
        abs=1e-9,
    )


def test_unassigned_vertices_are_singletons(spark):
    pairs = [(0, 1), (2, 3)]
    rows = {
        r["community"]: r
        for r in community_metrics(
            spark, edges_df(spark, pairs), asg_df(spark, {0: 7, 1: 7})
        ).collect()
    }
    assert set(rows) == {7, 2, 3}
    assert rows[7]["internal_edges"] == 1 and rows[7]["cut_edges"] == 0
    assert rows[2]["cut_edges"] == 1 and rows[2]["internal_edges"] == 0
    # whole-graph community: conductance undefined → NULL
    whole = community_metrics(
        spark,
        edges_df(spark, [(0, 1)]),
        asg_df(spark, {0: 5, 1: 5}),
    ).collect()[0]
    assert whole["conductance"] is None
