"""Personalized-PageRank parity vs the single-node random-walk-with-restart
recurrence (operators/ppr.py docstring): allclose 1e-6, mass conservation,
seed-concentration sanity, fixed-iteration determinism."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pytest

from connected_components_3d_spark.operators.ppr import (
    personalized_pagerank,
    ppr_single_node,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def seeds_df(spark, seeds):
    return spark.createDataFrame([(int(s),) for s in seeds], "vertex long")


def assert_ppr_matches(spark, pairs, seeds, **kw):
    expected = ppr_single_node(pairs, seeds, **kw)
    res = personalized_pagerank(
        spark, edges_df(spark, pairs), seeds_df(spark, seeds), **kw
    )
    got = {r["vertex"]: r["rank"] for r in res.ranks.collect()}
    assert set(got) == set(expected)
    a = np.array([got[v] for v in sorted(got)])
    b = np.array([expected[v] for v in sorted(got)])
    assert np.allclose(a, b, rtol=1e-6, atol=1e-9), np.abs(a - b).max()
    assert abs(a.sum() - 1.0) < 1e-9  # restart returns ALL mass to seeds
    return res


def test_random_er_directed(spark):
    g = nx.gnp_random_graph(250, 0.015, seed=13, directed=True)
    assert_ppr_matches(spark, list(g.edges()), seeds=[0, 1, 2], fixed_iters=5)


def test_converged_with_dangling(spark):
    g = nx.gnp_random_graph(150, 0.03, seed=23, directed=True)
    pairs = [(u, v) for u, v in g.edges() if u >= 30]  # 30 dangling-ish seeds
    res = assert_ppr_matches(spark, pairs, seeds=[40, 41], tol=1e-8)
    assert res.converged


def test_mass_concentrates_near_seed(spark):
    # two disjoint cycles; seeding one leaves the other with zero rank
    c1 = [(i, (i + 1) % 10) for i in range(10)]
    c2 = [(100 + i, 100 + (i + 1) % 10) for i in range(10)]
    res = personalized_pagerank(
        spark, edges_df(spark, c1 + c2), seeds_df(spark, [0]), fixed_iters=8
    )
    got = {r["vertex"]: r["rank"] for r in res.ranks.collect()}
    assert sum(v for k, v in got.items() if k >= 100) == 0.0
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_seed_outside_graph_ignored_and_all_outside_raises(spark):
    pairs = [(1, 2), (2, 3)]
    # 99 is not a vertex: ignored, personalization falls on {1}
    a = assert_ppr_matches(spark, pairs, seeds=[1, 99], fixed_iters=4)
    assert a.converged
    with pytest.raises(ValueError):
        personalized_pagerank(
            spark, edges_df(spark, pairs), seeds_df(spark, [99]), fixed_iters=2
        )


def test_zero_fixed_iters_counts_zero(spark):
    res = personalized_pagerank(
        spark, edges_df(spark, [(1, 2), (2, 3)]), seeds_df(spark, [1]),
        fixed_iters=0,
    )
    assert res.num_iters == 0
    got = {r["vertex"]: r["rank"] for r in res.ranks.collect()}
    assert got == {1: 1.0, 2: 0.0, 3: 0.0}  # the seed teleport vector
