"""Bowtie decomposition (operators/bowtie.py): handcrafted all-six-region
graph with exact expectations, networkx-derived oracle parity on random
digraphs, degenerate inputs."""

from __future__ import annotations

import networkx as nx
import pytest

from connected_components_3d_spark.operators.bowtie import bowtie


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def nx_bowtie(pairs):
    g = nx.DiGraph()
    g.add_edges_from((a, b) for a, b in pairs if a != b)
    g.add_nodes_from(a for a, b in pairs if a == b)
    if not g.nodes:
        return {}
    sccs = list(nx.strongly_connected_components(g))
    core = max(sccs, key=lambda s: (len(s), -min(s)))
    v0 = next(iter(core))
    r_out = nx.descendants(g, v0) | core
    r_in = nx.ancestors(g, v0) | core
    in_set, out_set = r_in - core, r_out - core
    fwd_in = set().union(
        *({v} | nx.descendants(g, v) for v in in_set)
    ) if in_set else set()
    bwd_out = set().union(
        *({v} | nx.ancestors(g, v) for v in out_set)
    ) if out_set else set()
    tube = (fwd_in & bwd_out) - core - in_set - out_set
    weak = nx.node_connected_component(g.to_undirected(), v0)
    out = {}
    for v in g.nodes:
        out[v] = (
            "CORE" if v in core
            else "IN" if v in in_set
            else "OUT" if v in out_set
            else "TUBE" if v in tube
            else "TENDRIL" if v in weak
            else "DISCONNECTED"
        )
    return out


ALL_SIX = [
    (1, 2), (2, 3), (3, 1),          # CORE cycle
    (10, 1), (11, 10),               # IN chain
    (3, 20), (20, 21),               # OUT chain
    (10, 30), (30, 20),              # TUBE bypassing the core
    (11, 40),                        # tendril off IN
    (41, 21),                        # tendril into OUT
    (50, 51),                        # disconnected
]


def test_all_six_regions(spark):
    res = bowtie(spark, edges_df(spark, ALL_SIX))
    got = {r["vertex"]: r["region"] for r in res.regions.collect()}
    assert got == {
        1: "CORE", 2: "CORE", 3: "CORE",
        10: "IN", 11: "IN",
        20: "OUT", 21: "OUT",
        30: "TUBE",
        40: "TENDRIL", 41: "TENDRIL",
        50: "DISCONNECTED", 51: "DISCONNECTED",
    }
    assert got == nx_bowtie(ALL_SIX)
    assert res.core_component == 1
    assert res.region_counts == {
        "CORE": 3, "IN": 2, "OUT": 2, "TUBE": 1,
        "TENDRIL": 2, "DISCONNECTED": 2,
    }


@pytest.mark.parametrize("seed,n,p", [(5, 60, 0.03), (9, 120, 0.015)])
def test_random_digraph_matches_networkx(spark, seed, n, p):
    g = nx.gnp_random_graph(n, p, seed=seed, directed=True)
    pairs = list(g.edges())
    got = {
        r["vertex"]: r["region"]
        for r in bowtie(spark, edges_df(spark, pairs)).regions.collect()
    }
    assert got == nx_bowtie(pairs)


def test_pure_cycle_is_all_core(spark):
    res = bowtie(spark, edges_df(spark, [(1, 2), (2, 3), (3, 1)]))
    got = {r["vertex"]: r["region"] for r in res.regions.collect()}
    assert got == {1: "CORE", 2: "CORE", 3: "CORE"}


def test_dag_core_is_min_id_singleton(spark):
    res = bowtie(spark, edges_df(spark, [(2, 3), (1, 3)]))
    got = {r["vertex"]: r["region"] for r in res.regions.collect()}
    # all SCCs singleton -> core = vertex 1; 3 is its OUT; 2 is weakly
    # connected (points into OUT) -> TENDRIL
    assert got == {1: "CORE", 3: "OUT", 2: "TENDRIL"}
    assert got == nx_bowtie([(2, 3), (1, 3)])


def test_empty_graph(spark):
    res = bowtie(spark, edges_df(spark, []))
    assert res.regions.count() == 0 and res.region_counts == {}


def test_self_loop_only_vertex(spark):
    got = {
        r["vertex"]: r["region"]
        for r in bowtie(spark, edges_df(spark, [(7, 7), (1, 2), (2, 1)]))
        .regions.collect()
    }
    assert got == {1: "CORE", 2: "CORE", 7: "DISCONNECTED"}
