"""SimRank parity: single-node Jeh–Widom reference, networkx, closed
forms, hub-cap determinism (operators/simrank.py contract)."""

from __future__ import annotations

import networkx as nx
import pytest

from connected_components_3d_spark.operators.simrank import (
    simrank,
    simrank_single_node,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def pairs_of(res):
    return {(r["a"], r["b"]): r["score"] for r in res.similarities.collect()}


def assert_parity(spark, pairs, c=0.8, k=3):
    res = simrank(spark, edges_df(spark, pairs), c=c, fixed_iters=k)
    got = pairs_of(res)
    ref = {
        (a, b): v
        for (a, b), v in simrank_single_node(list(pairs), c, k).items()
        if a < b and v > 0.0
    }
    assert set(got) == set(ref)
    for ab in ref:
        assert got[ab] == pytest.approx(ref[ab], abs=1e-12), ab
    return got


def test_parity_random_digraph(spark):
    g = nx.gnp_random_graph(40, 0.10, seed=7, directed=True)
    got = assert_parity(spark, list(g.edges()), c=0.8, k=3)
    assert got  # the fixture must exercise nonzero off-diagonal pairs


def test_parity_varied_in_degrees(spark):
    # shared-parent fan: varied |I(v)| exercises the normalizer
    pairs = [(0, 2), (1, 2), (0, 3), (1, 3), (2, 4), (3, 4), (0, 4)]
    assert_parity(spark, pairs, c=0.6, k=4)


def test_networkx_parity_of_reference():
    # the Spark kernel is k-matched exactly against simrank_single_node
    # (tests above); here the reference itself is pinned to networkx's
    # converged fixed point, closing the chain Spark ≡ reference ≡ networkx
    g = nx.gnp_random_graph(25, 0.15, seed=3, directed=True)
    mine = simrank_single_node(list(g.edges()), 0.8, 200)
    want = nx.simrank_similarity(
        g, importance_factor=0.8, max_iterations=1000, tolerance=1e-9
    )
    for a in g:
        for b in g:
            # nx's tolerance bounds per-iteration MOVEMENT, not distance
            # to the fixed point (residual ~ tol/(1-C)); 1e-5 covers it
            assert mine.get((a, b), 0.0) == pytest.approx(
                want[a][b], abs=1e-5
            ), (a, b)


def test_tree_closed_form(spark):
    # parent→child two-level tree: leaves under the same parent score C,
    # cousins (same grandparent, different parent) score C^2 at k>=2
    pairs = [(0, 1), (0, 2), (1, 10), (1, 11), (2, 20), (2, 21)]
    res = simrank(spark, edges_df(spark, pairs), c=0.8, fixed_iters=2)
    got = pairs_of(res)
    assert got[(10, 11)] == pytest.approx(0.8)
    assert got[(20, 21)] == pytest.approx(0.8)
    assert got[(1, 2)] == pytest.approx(0.8)
    for cousin in [(10, 20), (10, 21), (11, 20), (11, 21)]:
        assert got[cousin] == pytest.approx(0.8 * 0.8), cousin
    # the roots' children list never reaches back to 0: no pair with 0
    assert not any(0 in ab for ab in got)


def test_duplicate_edges_collapse(spark):
    pairs = [(0, 2), (1, 2), (0, 3), (1, 3)]
    base = pairs_of(simrank(spark, edges_df(spark, pairs), fixed_iters=2))
    dup = pairs_of(
        simrank(spark, edges_df(spark, pairs * 3), fixed_iters=2)
    )
    assert base == dup


def test_hub_cap_loose_equals_exact_and_is_deterministic(spark):
    g = nx.gnp_random_graph(30, 0.2, seed=11, directed=True)
    e = edges_df(spark, g.edges())
    exact = pairs_of(simrank(spark, e, fixed_iters=2))
    capped_loose = pairs_of(simrank(spark, e, fixed_iters=2, max_out_degree=1000))
    # the cap's window changes partial-sum order → last-ulp float drift
    assert set(exact) == set(capped_loose)
    for ab in exact:
        assert capped_loose[ab] == pytest.approx(exact[ab], abs=1e-12), ab
    t1 = pairs_of(simrank(spark, e, fixed_iters=2, max_out_degree=2))
    t2 = pairs_of(simrank(spark, e, fixed_iters=2, max_out_degree=2))
    assert t1 == t2  # deterministic bottom-k selection (bit-identical rerun)
    assert set(t1) <= set(exact)  # capping only removes evidence paths


def test_empty_and_validation(spark):
    e = edges_df(spark, [])
    res = simrank(spark, e, fixed_iters=2)
    assert res.similarities.count() == 0 and res.num_iters == 0
    with pytest.raises(ValueError):
        simrank(spark, e, c=1.0)
    with pytest.raises(ValueError):
        simrank(spark, e, fixed_iters=0)
    with pytest.raises(ValueError):
        simrank(spark, e, max_out_degree=0)
