"""Rich-club coefficient parity with the single-node reference and with
networkx, plus hygiene and closed-form cases (operators/richclub.py)."""

from __future__ import annotations

import random

import networkx as nx

from connected_components_3d_spark.operators.richclub import (
    rich_club,
    rich_club_single_node,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def assert_parity(spark, pairs):
    got = {
        r["k"]: (r["n_nodes"], r["n_edges"], r["phi"])
        for r in rich_club(edges_df(spark, pairs)).collect()
    }
    want = rich_club_single_node(pairs)
    assert set(got) == set(want)
    for k in want:
        assert got[k][:2] == want[k][:2], (k, got[k], want[k])
        assert abs(got[k][2] - want[k][2]) < 1e-9, k
    return got


def test_random_graph_parity_and_networkx(spark):
    g = nx.gnp_random_graph(80, 0.08, seed=3)
    pairs = list(g.edges())
    got = assert_parity(spark, pairs)
    nxrc = nx.rich_club_coefficient(g, normalized=False)
    # networkx emits k=0..max_deg-1 where >1 node qualifies; ours emits
    # observed degrees with N_k >= 2 — compare on the intersection
    common = set(got) & set(nxrc)
    assert common
    for k in common:
        assert abs(got[k][2] - nxrc[k]) < 1e-6, k


def test_star_plus_core(spark):
    # K4 core (degrees >= 3) with 4 pendants on vertex 0
    core = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    pend = [(0, 10 + i) for i in range(4)]
    got = assert_parity(spark, core + pend)
    # k=1: rich set = K4 vertices (deg 3,3,3,7) -> 6 edges, phi=1
    assert got[1] == (4, 6, 1.0)


def test_hygiene_and_phi_bounds(spark):
    rng = random.Random(5)
    pairs = [(rng.randrange(0, 30), rng.randrange(0, 30)) for _ in range(150)]
    pairs += [(b, a) for a, b in pairs[:40]]  # reversed dupes
    got = assert_parity(spark, pairs)
    for _, (_, _, phi) in got.items():
        assert 0.0 <= phi <= 1.0


def test_clique_is_all_ones(spark):
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    got = assert_parity(spark, k5)
    # only degree 4 observed; N_4 = 0 < 2 -> empty output
    assert got == {}
