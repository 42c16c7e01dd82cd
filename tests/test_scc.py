"""SCC parity vs networkx strongly_connected_components
(operators/scc.py): random digraphs, bowtie shapes, cycles with tendrils,
DAGs (all singletons), determinism across partition counts."""

from __future__ import annotations

import networkx as nx

from connected_components_3d_spark.operators.scc import (
    strongly_connected_components,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def nx_scc(pairs):
    g = nx.DiGraph()
    g.add_edges_from((a, b) for a, b in pairs if a != b)
    ref = {}
    for comp in nx.strongly_connected_components(g):
        m = min(comp)
        for v in comp:
            ref[v] = m
    return ref


def assert_scc_matches(spark, pairs):
    res = strongly_connected_components(spark, edges_df(spark, pairs))
    got = {r["vertex"]: r["component"] for r in res.components.collect()}
    assert got == nx_scc(pairs)
    assert res.converged
    return res


def test_random_gnp_digraph(spark):
    g = nx.gnp_random_graph(200, 0.012, seed=11, directed=True)
    assert_scc_matches(spark, list(g.edges()))


def test_bowtie(spark):
    # IN -> core cycle -> OUT, plus tendrils: the canonical web shape
    core = [(i, (i + 1) % 6) for i in range(6)]  # SCC {0..5}
    in_part = [(100, 0), (101, 100), (102, 0)]
    out_part = [(3, 200), (200, 201)]
    tendril = [(101, 300)]
    res = assert_scc_matches(spark, core + in_part + out_part + tendril)
    # trim must have handled every non-core vertex; one coloring round max
    assert res.num_outer_rounds <= 2


def test_dag_all_singletons(spark):
    g = nx.gnp_random_graph(80, 0.05, seed=5, directed=True)
    dag = [(u, v) for u, v in g.edges() if u < v]
    assert_scc_matches(spark, dag)


def test_two_cycles_sharing_no_vertex_plus_bridge(spark):
    c1 = [(i, (i + 1) % 5) for i in range(5)]
    c2 = [(10 + i, 10 + (i + 1) % 4) for i in range(4)]
    assert_scc_matches(spark, c1 + c2 + [(2, 10)])


def test_nested_cycles_force_multiple_outer_rounds(spark):
    # two touching directed cycles sharing vertex 0 form ONE SCC; a
    # separate cycle reachable from it must wait for the next harvest
    a = [(0, 1), (1, 2), (2, 0), (0, 3), (3, 4), (4, 0)]
    b = [(2, 20), (20, 21), (21, 22), (22, 20)]
    assert_scc_matches(spark, a + b)


def test_partition_invariance(spark):
    g = nx.gnp_random_graph(120, 0.02, seed=29, directed=True)
    pairs = list(g.edges())
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        a = assert_scc_matches(spark, pairs)
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = assert_scc_matches(spark, pairs)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    ga = {r["vertex"]: r["component"] for r in a.components.collect()}
    gb = {r["vertex"]: r["component"] for r in b.components.collect()}
    assert ga == gb


def test_self_loop_only_vertex_is_singleton(spark):
    # v=9's only edge is 9->9: networkx keeps it as the SCC {9}; so do we
    pairs = [(1, 2), (2, 1), (9, 9), (2, 3)]
    got = {
        r["vertex"]: r["component"]
        for r in strongly_connected_components(
            spark, edges_df(spark, pairs)
        ).components.collect()
    }
    g = nx.DiGraph()
    g.add_edges_from(pairs)  # networkx keeps self-loops; semantics agree
    ref = {}
    for comp in nx.strongly_connected_components(g):
        m = min(comp)
        for v in comp:
            ref[v] = m
    assert got == ref
    assert got[9] == 9


def test_empty_and_self_loop_only_graphs(spark):
    res = strongly_connected_components(spark, edges_df(spark, []))
    assert res.components.count() == 0
    assert res.components.columns == ["vertex", "component"]
    assert res.converged
    res2 = strongly_connected_components(spark, edges_df(spark, [(5, 5)]))
    got = {r["vertex"]: r["component"] for r in res2.components.collect()}
    assert got == {5: 5}


def test_max_outer_exhaustion_raises(spark):
    import pytest

    # a 2-cycle feeding a second 2-cycle: the forward coloring paints BOTH
    # with col=1, round 1 harvests only {1,2}, so max_outer=1 cannot finish
    # -> must raise, never return a partial map
    pairs = [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3)]
    with pytest.raises(RuntimeError, match="max_outer"):
        strongly_connected_components(spark, edges_df(spark, pairs), max_outer=1)
