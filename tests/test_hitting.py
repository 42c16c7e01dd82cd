"""Truncated hitting time parity: Spark vs the single-node replay of the
Sarkar–Moore recurrence (operators/hitting.py docstring), closed-form
checks on deterministic chains, seed/dangling/unreachable boundary cases,
bounds, validation."""

from __future__ import annotations

import math

import networkx as nx
import pytest

from connected_components_3d_spark.operators.hitting import (
    truncated_hitting_time,
    truncated_hitting_time_single_node,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def seeds_df(spark, vs):
    return spark.createDataFrame([(int(v),) for v in vs], "vertex long")


def assert_hitting_match(spark, pairs, seeds, horizon=8):
    expected = truncated_hitting_time_single_node(
        pairs, seeds, horizon=horizon
    )
    res = truncated_hitting_time(
        spark, edges_df(spark, pairs), seeds_df(spark, seeds), horizon=horizon
    )
    got = {r["vertex"]: r["h"] for r in res.times.collect()}
    assert set(got) == set(expected)
    for v in got:
        assert math.isclose(got[v], expected[v], rel_tol=0, abs_tol=1e-9), (
            v,
            got[v],
            expected[v],
        )
    return got


def test_random_digraph_parity(spark):
    g = nx.gnp_random_graph(80, 0.06, seed=19, directed=True)
    assert_hitting_match(spark, list(g.edges()), seeds=[0, 1, 2], horizon=6)


def test_chain_closed_form(spark):
    """Deterministic chain k→k−1→…→0 with seed 0: h(k) = min(k, T)."""
    pairs = [(i + 1, i) for i in range(10)]
    got = assert_hitting_match(spark, pairs, seeds=[0], horizon=6)
    for k in range(11):
        assert got[k] == float(min(k, 6))


def test_seed_dangling_unreachable(spark):
    # 0→1 (1 dangling non-seed), 2 isolated seed, 3→4→3 cycle never hits
    pairs = [(0, 1), (3, 4), (4, 3)]
    got = assert_hitting_match(spark, pairs, seeds=[1, 2], horizon=5)
    assert got[1] == 0.0 and got[2] == 0.0
    assert got[0] == 1.0
    assert got[3] == 5.0 and got[4] == 5.0  # unreachable pins at horizon


def test_bounds_and_monotone_in_horizon(spark):
    g = nx.gnp_random_graph(50, 0.05, seed=3, directed=True)
    pairs = list(g.edges())
    h4 = truncated_hitting_time_single_node(pairs, [0], horizon=4)
    h8 = truncated_hitting_time_single_node(pairs, [0], horizon=8)
    for v in h4:
        assert 0.0 <= h4[v] <= 4.0
        assert h8[v] >= h4[v] - 1e-12  # deeper horizon only raises h
    assert_hitting_match(spark, pairs, seeds=[0], horizon=4)


def test_branching_average(spark):
    """1 → {0, 2}, 2 dangling, seed 0: E[min(τ, 3)] from 1 is
    ½·1 + ½·3 = 2 (half the walks hit in one step, half get stuck at the
    dangling vertex and pin at the horizon)."""
    got = assert_hitting_match(spark, [(1, 0), (1, 2)], seeds=[0], horizon=3)
    assert got[1] == 2.0 and got[2] == 3.0


def test_validation(spark):
    with pytest.raises(AssertionError):
        truncated_hitting_time(
            spark, edges_df(spark, [(0, 1)]), seeds_df(spark, [0]), horizon=0
        )
