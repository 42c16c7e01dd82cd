"""Neighborhood function (operators/neighborhood.py): exact r-ball counts
vs a networkx BFS oracle; HyperBall HLL estimate within a relative-error
bound of exact on the same graph; radius-0 degeneracy."""

from __future__ import annotations

import networkx as nx
import pytest

from connected_components_3d_spark.operators.neighborhood import (
    hyperball,
    neighborhood_exact,
)
from connected_components_3d_spark.operators.reciprocity import reciprocity


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def nx_balls(pairs, radius):
    g = nx.DiGraph()
    g.add_edges_from((a, b) for a, b in pairs if a != b)
    return {
        v: 1 + sum(1 for u, d in nx.single_source_shortest_path_length(
            g, v, cutoff=radius).items() if u != v)
        for v in g.nodes
    }


def test_exact_matches_bfs(spark):
    g = nx.gnp_random_graph(150, 0.02, seed=17, directed=True)
    pairs = list(g.edges())
    for r in (0, 1, 3):
        got = {
            row["vertex"]: row["ball_count"]
            for row in neighborhood_exact(spark, edges_df(spark, pairs), r)
            .collect()
        }
        assert got == nx_balls(pairs, r), f"radius {r}"


def test_hyperball_close_to_exact(spark):
    g = nx.gnp_random_graph(400, 0.008, seed=31, directed=True)
    pairs = list(g.edges())
    exact = nx_balls(pairs, 3)
    est = {
        row["vertex"]: row["ball_count"]
        for row in hyperball(spark, edges_df(spark, pairs), 3, lgk=12)
        .collect()
    }
    assert set(est) == set(exact)
    # 2^12 registers → ~1.6% standard error; allow generous slack plus an
    # absolute floor for tiny balls (integer rounding)
    for v, ex in exact.items():
        assert abs(est[v] - ex) <= max(2, 0.08 * ex), (v, ex, est[v])


def test_hyperball_deterministic(spark):
    g = nx.gnp_random_graph(100, 0.03, seed=41, directed=True)
    e = list(g.edges())
    a = sorted(hyperball(spark, edges_df(spark, e), 2).collect())
    b = sorted(hyperball(spark, edges_df(spark, e), 2).collect())
    assert a == b


def test_negative_radius_raises(spark):
    with pytest.raises(ValueError):
        neighborhood_exact(spark, edges_df(spark, [(1, 2)]), -1)
    with pytest.raises(ValueError):
        hyperball(spark, edges_df(spark, [(1, 2)]), -2)


def test_reciprocity_small(spark):
    pairs = [(1, 2), (2, 1), (1, 3), (3, 4), (4, 3), (3, 1), (5, 5), (1, 2)]
    got = {
        r["vertex"]: (r["out_deg"], r["recip_deg"], r["reciprocity"])
        for r in reciprocity(spark, edges_df(spark, pairs)).collect()
    }
    # simple digraph: 1→2,2→1,1→3,3→1,3→4,4→3 ; 5's self-loop dropped
    assert got == {
        1: (2, 2, 1.0),
        2: (1, 1, 1.0),
        3: (2, 2, 1.0),
        4: (1, 1, 1.0),
    }


def test_reciprocity_none_returned(spark):
    got = {
        r["vertex"]: (r["out_deg"], r["recip_deg"], r["reciprocity"])
        for r in reciprocity(spark, edges_df(spark, [(1, 2), (2, 3)]))
        .collect()
    }
    assert got == {1: (1, 0, 0.0), 2: (1, 0, 0.0)}


def test_neighborhood_function_matches_bfs_fold(spark):
    from connected_components_3d_spark.operators.neighborhood import (
        neighborhood_function,
    )

    g = nx.gnp_random_graph(120, 0.03, seed=5, directed=True)
    pairs = list(g.edges())
    got = {
        r["r"]: r["n_pairs"]
        for r in neighborhood_function(spark, edges_df(spark, pairs), 3)
        .collect()
    }
    for r in range(4):
        assert got[r] == sum(nx_balls(pairs, r).values())


def test_neighborhood_function_hyperball_close(spark):
    from connected_components_3d_spark.operators.neighborhood import (
        neighborhood_function,
    )

    g = nx.gnp_random_graph(200, 0.02, seed=29, directed=True)
    pairs = list(g.edges())
    exact = {
        r["r"]: r["n_pairs"]
        for r in neighborhood_function(spark, edges_df(spark, pairs), 2)
        .collect()
    }
    est = {
        r["r"]: r["n_pairs"]
        for r in neighborhood_function(
            spark, edges_df(spark, pairs), 2, method="hyperball", lgk=12
        ).collect()
    }
    for r in range(3):
        assert abs(est[r] - exact[r]) <= 0.05 * exact[r] + 2


def test_effective_diameter_sym_path(spark):
    from connected_components_3d_spark.operators.neighborhood import (
        effective_diameter,
    )

    # symmetric path on 8 vertices: diameter 7; N(r) = sum over v of
    # |{u: d(u,v) <= r}| is exactly computable
    n = 8
    pairs = [(i, i + 1) for i in range(n - 1)] + [
        (i + 1, i) for i in range(n - 1)
    ]
    res = effective_diameter(
        spark, edges_df(spark, pairs), alpha=1.0, max_radius=32
    )
    assert res.converged
    assert res.effective_diameter == 7.0
    # interpolated quantile: reproduce from the operator's own N(r) fold,
    # independently recomputed via BFS
    ref_nf = [sum(nx_balls(pairs, r).values()) for r in range(9)]
    assert [x[1] for x in res.nf] == ref_nf[: len(res.nf)]
    res9 = effective_diameter(
        spark, edges_df(spark, pairs), alpha=0.9, max_radius=32
    )
    target = 0.9 * ref_nf[-1]
    r0 = max(r for r in range(9) if ref_nf[r] < target)
    expect = r0 + (target - ref_nf[r0]) / (ref_nf[r0 + 1] - ref_nf[r0])
    assert abs(res9.effective_diameter - expect) < 1e-9


def test_effective_diameter_alpha_validation(spark):
    from connected_components_3d_spark.operators.neighborhood import (
        effective_diameter,
    )

    with pytest.raises(ValueError):
        effective_diameter(spark, edges_df(spark, [(1, 2)]), alpha=1.5)


# --- exact eccentricity ----------------------------------------------------


def test_eccentricity_networkx_parity(spark):
    import networkx as nx

    from connected_components_3d_spark.operators.neighborhood import (
        eccentricity_exact,
    )

    g = nx.gnp_random_graph(60, 0.06, seed=43)
    e = spark.createDataFrame(
        [(int(a), int(b)) for a, b in g.edges()], "src long, dst long"
    )
    got = {
        r["vertex"]: r["ecc"] for r in eccentricity_exact(spark, e).collect()
    }
    for comp in nx.connected_components(g):
        sub = g.subgraph(comp)
        if sub.number_of_edges() == 0:
            continue  # isolated vertices don't appear in the edge table
        exp = nx.eccentricity(sub)
        for v, ev in exp.items():
            assert got[v] == ev, (v, got[v], ev)


def test_eccentricity_closed_forms(spark):
    from connected_components_3d_spark.operators.neighborhood import (
        eccentricity_exact,
    )

    # path 0-1-2-3-4: ecc = [4,3,2,3,4]; star center 10: ecc 1, leaves 2
    pairs = [(i, i + 1) for i in range(4)] + [(10, 20 + i) for i in range(4)]
    e = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["vertex"]: r["ecc"] for r in eccentricity_exact(spark, e).collect()
    }
    assert [got[i] for i in range(5)] == [4, 3, 2, 3, 4]
    assert got[10] == 1 and all(got[20 + i] == 2 for i in range(4))


def test_eccentricity_max_radius_lower_bound(spark):
    from connected_components_3d_spark.operators.neighborhood import (
        eccentricity_exact,
    )

    pairs = [(i, i + 1) for i in range(9)]  # path, true max ecc 9
    e = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["vertex"]: r["ecc"]
        for r in eccentricity_exact(spark, e, max_radius=3).collect()
    }
    assert max(got.values()) == 3  # truncated: a valid lower bound
