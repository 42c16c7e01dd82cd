from __future__ import annotations

import pytest

from connected_components_3d_spark.operators.condense import condense
from connected_components_3d_spark.operators.scc import (
    strongly_connected_components,
)
from connected_components_3d_spark.operators.topo import topo_levels

nx = pytest.importorskip("networkx")


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(s), int(d)) for s, d in pairs], "src long, dst long"
    )


def _nx_levels(pairs):
    """Longest-path level per vertex via DP over a topological order."""
    g = nx.DiGraph()
    g.add_edges_from(pairs)
    lev = {}
    for v in nx.topological_sort(g):
        lev[v] = max((lev[u] + 1 for u in g.predecessors(v)), default=0)
    return lev


DIAMOND = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)]


def test_diamond_levels(spark):
    res = topo_levels(spark, _edges(spark, DIAMOND))
    got = {r["vertex"]: r["level"] for r in res.levels.collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3}
    assert res.converged and res.num_rounds == 4


def test_networkx_parity_random_dag(spark):
    import random

    rng = random.Random(7)
    # forward-only edges on 60 vertices => DAG; varied fan-in/out
    pairs = sorted(
        {
            (a, a + rng.randint(1, 9))
            for a in range(1, 60)
            for _ in range(3)
            if a + 9 <= 70
        }
    )
    res = topo_levels(spark, _edges(spark, pairs))
    got = {r["vertex"]: r["level"] for r in res.levels.collect()}
    assert got == _nx_levels(pairs)


def test_level_is_longest_path_not_bfs_depth(spark):
    # 1->4 direct, plus 1->2->3->4: BFS depth of 4 is 1, longest path is 3
    res = topo_levels(spark, _edges(spark, [(1, 4), (1, 2), (2, 3), (3, 4)]))
    got = {r["vertex"]: r["level"] for r in res.levels.collect()}
    assert got[4] == 3


def test_cycle_raises_and_partial_mode(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (0, 1)]  # cycle 1-2-3 + tail
    with pytest.raises(ValueError, match="not a DAG"):
        topo_levels(spark, _edges(spark, pairs))
    res = topo_levels(spark, _edges(spark, pairs), on_cycle="partial")
    assert not res.converged
    got = {r["vertex"]: r["level"] for r in res.levels.collect()}
    # only the acyclic prefix (vertex 0) peels; 4 hangs off the cycle
    assert got == {0: 0}


def test_self_loop_is_a_cycle(spark):
    with pytest.raises(ValueError, match="not a DAG"):
        topo_levels(spark, _edges(spark, [(1, 1), (1, 2)]))


def test_parallel_edges_collapse(spark):
    res = topo_levels(spark, _edges(spark, [(1, 2), (1, 2), (2, 3)]))
    got = {r["vertex"]: r["level"] for r in res.levels.collect()}
    assert got == {1: 0, 2: 1, 3: 2}


def test_empty_input(spark):
    res = topo_levels(spark, _edges(spark, []))
    assert res.levels.count() == 0
    assert res.converged and res.num_rounds == 0
    assert [f.name for f in res.levels.schema.fields] == ["vertex", "level"]


def test_condensation_composition(spark):
    # two 3-cycles chained: condensation is a 2-vertex DAG, levels 0 and 1
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4)]
    e = _edges(spark, pairs)
    comps = strongly_connected_components(spark, e).components
    dag = condense(e, comps).selectExpr(
        "src_comp AS src", "dst_comp AS dst"
    )
    res = topo_levels(spark, dag)
    got = {r["vertex"]: r["level"] for r in res.levels.collect()}
    comp = {r["vertex"]: r["component"] for r in comps.collect()}
    assert got[comp[1]] == 0 and got[comp[4]] == 1


def test_bad_on_cycle_rejected(spark):
    with pytest.raises(ValueError, match="on_cycle"):
        topo_levels(spark, _edges(spark, [(1, 2)]), on_cycle="nope")


def test_max_rounds_exhaustion_raises(spark):
    with pytest.raises(RuntimeError, match="max_rounds"):
        topo_levels(
            spark, _edges(spark, [(1, 2), (2, 3), (3, 4)]), max_rounds=1
        )
