"""Triangle counting vs networkx (FIXTURES.md §4/§5)."""

from __future__ import annotations

import networkx as nx

from connected_components_3d_spark.operators.triangles import (
    triangle_count,
    triangles_per_edge,
    triangles_per_vertex,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def test_two_cliques(spark):
    pairs = [(i, j) for i in range(10) for j in range(i + 1, 10)]
    pairs += [(100 + i, 100 + j) for i in range(10) for j in range(i + 1, 10)]
    pairs.append((5, 105))  # bridge participates in no triangle
    e = edges_df(spark, pairs)
    assert triangle_count(e) == 2 * 120  # 2 * C(10,3)
    per_edge = {(r.src, r.dst): r.n_tri for r in triangles_per_edge(e).collect()}
    assert per_edge[(5, 105)] == 0
    assert per_edge[(0, 1)] == 8  # within K10 every edge closes with 8 vertices


def test_random_vs_networkx(spark):
    g = nx.gnp_random_graph(150, 0.08, seed=42)
    e = edges_df(spark, list(g.edges()))
    want_v = nx.triangles(g)
    got_v = {r.vertex: r.n_tri for r in triangles_per_vertex(e).collect()}
    assert got_v == {v: c for v, c in want_v.items()}
    assert triangle_count(e) == sum(want_v.values()) // 3
    # per-edge: n_tri(u,v) == |N(u) ∩ N(v)|
    got_e = {(r.src, r.dst): r.n_tri for r in triangles_per_edge(e).collect()}
    for (u, v), c in got_e.items():
        assert c == len(set(g[u]) & set(g[v])), (u, v)
    assert set(got_e) == {(min(u, v), max(u, v)) for u, v in g.edges()}


def test_directed_duplicate_input_ok(spark):
    # duplicates + both directions + self loops must not change counts
    pairs = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
    e = edges_df(spark, pairs)
    assert triangle_count(e) == 1
    got = {(r.src, r.dst): r.n_tri for r in triangles_per_edge(e).collect()}
    assert got == {(1, 2): 1, (2, 3): 1, (1, 3): 1}


# --- DOULION sampled estimator -------------------------------------------


def test_doulion_full_probability_is_exact(spark):
    import networkx as nx

    from connected_components_3d_spark.operators.triangles import (
        triangle_count,
        triangle_count_doulion,
    )

    g = nx.gnp_random_graph(60, 0.15, seed=31)
    e = spark.createDataFrame(
        [(int(a), int(b)) for a, b in g.edges()], "src long, dst long"
    )
    n_e, n_t, est = triangle_count_doulion(e, (1, 1))
    assert n_e == g.number_of_edges()
    assert n_t == triangle_count(e) == est


def test_doulion_sample_matches_predicate_replay(spark):
    """The sampled count equals networkx triangles over the edges the mix
    predicate keeps — the exact-replay contract the gate row relies on."""
    import networkx as nx

    from connected_components_3d_spark.operators.triangles import (
        triangle_count_doulion,
    )

    M, A, seed = 2147483647, 1103515245, 42
    g = nx.gnp_random_graph(80, 0.2, seed=33)
    pairs = [(min(a, b), max(a, b)) for a, b in g.edges()]
    e = spark.createDataFrame(pairs, "src long, dst long")
    num, den = 2, 3
    kept = [
        (a, b)
        for a, b in pairs
        if (((seed * A + a) % M) * A + b) % M % den < num
    ]
    h = nx.Graph(kept)
    exp_tri = sum(nx.triangles(h).values()) // 3
    n_e, n_t, est = triangle_count_doulion(e, (num, den))
    assert n_e == len(kept)
    assert n_t == exp_tri
    assert est == exp_tri * (den / num) ** 3


def test_doulion_estimator_in_range(spark):
    """On a triangle-rich graph the p=1/2 estimate lands within a loose
    factor of the exact count (concentration sanity, not a proof)."""
    import networkx as nx

    from connected_components_3d_spark.operators.triangles import (
        triangle_count,
        triangle_count_doulion,
    )

    g = nx.gnp_random_graph(70, 0.3, seed=35)
    e = spark.createDataFrame(
        [(int(a), int(b)) for a, b in g.edges()], "src long, dst long"
    )
    exact = triangle_count(e)
    _, _, est = triangle_count_doulion(e, (1, 2))
    assert exact > 100
    assert 0.5 * exact < est < 2.0 * exact


def test_doulion_rejects_out_of_range_ids(spark):
    import pytest

    from connected_components_3d_spark.operators.triangles import (
        triangle_count_doulion,
    )

    e = spark.createDataFrame([(-5, 3), (3, 7)], "src long, dst long")
    with pytest.raises(ValueError, match=r"\[0, 2\^31\)"):
        triangle_count_doulion(e, (1, 2))
    e2 = spark.createDataFrame([(2, 2**31 + 9)], "src long, dst long")
    with pytest.raises(ValueError, match=r"\[0, 2\^31\)"):
        triangle_count_doulion(e2, (1, 2))
