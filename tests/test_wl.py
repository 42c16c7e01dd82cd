"""1-WL color refinement parity and invariances (operators/wl.py)."""

from __future__ import annotations

import random

import pytest

from connected_components_3d_spark.operators.wl import (
    wl_colors,
    wl_colors_single_node,
    wl_signature,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def spark_colors(spark, pairs, rounds):
    res = wl_colors(spark, edges_df(spark, pairs), rounds=rounds)
    return {r["vertex"]: r["color"] for r in res.colors.collect()}


def test_random_parity_vs_single_node(spark):
    rng = random.Random(11)
    pairs = [(rng.randrange(60), rng.randrange(60)) for _ in range(150)]
    for rounds in (0, 1, 3):
        assert spark_colors(spark, pairs, rounds) == wl_colors_single_node(
            pairs, rounds
        )


def test_round0_is_degree_classes(spark):
    # star: center degree 4, leaves degree 1
    pairs = [(0, i) for i in range(1, 5)]
    got = spark_colors(spark, pairs, 0)
    assert len({got[i] for i in range(1, 5)}) == 1
    assert got[0] != got[1]


def test_path_refinement_distinguishes_depth(spark):
    # P5: round 1 separates true ends, middle, and off-middle vertices
    pairs = [(i, i + 1) for i in range(4)]
    got = spark_colors(spark, pairs, 1)
    assert got[0] == got[4] and got[1] == got[3]
    assert len({got[0], got[1], got[2]}) == 3


def test_relabel_invariant_signature(spark):
    rng = random.Random(5)
    pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(80)]
    perm = list(range(30))
    rng.shuffle(perm)
    relabeled = [(perm[a], perm[b]) for a, b in pairs]
    s1 = wl_signature(spark, edges_df(spark, pairs), rounds=2).collect()[0]
    s2 = wl_signature(spark, edges_df(spark, relabeled), rounds=2).collect()[0]
    assert s1["signature"] == s2["signature"]
    assert s1["n_classes"] == s2["n_classes"]
    assert s1["n_vertices"] == s2["n_vertices"]


def test_wl_expressiveness_boundary(spark):
    # C6 vs two triangles is THE classic 1-WL blind spot: both 2-regular on
    # 6 vertices, so every round keeps one uniform color — signatures MUST
    # collide (documents the operator's (well-known) limitation honestly)
    c6 = [(i, (i + 1) % 6) for i in range(6)]
    tri2 = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]
    s1 = wl_signature(spark, edges_df(spark, c6), rounds=2).collect()[0]
    s2 = wl_signature(spark, edges_df(spark, tri2), rounds=2).collect()[0]
    assert s1["signature"] == s2["signature"]
    # ...while a non-regular non-isomorphic pair with the SAME degree
    # sequence separates: star+edge vs path P4 both have degrees (1,1,1,2)…
    # use (1,1,2,2,2) graphs: C4+pendant vs P5-with-triangle
    g1 = [(0, 1), (1, 2), (2, 3), (3, 0), (3, 4)]  # C4 with a pendant
    g2 = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]  # triangle with a P2 tail
    def deg_multiset(pairs):
        d = {}
        for a, b in pairs:
            d[a] = d.get(a, 0) + 1
            d[b] = d.get(b, 0) + 1
        return sorted(d.values())

    assert deg_multiset(g1) == deg_multiset(g2)  # round 0 can't separate
    t1 = wl_signature(spark, edges_df(spark, g1), rounds=2).collect()[0]
    t2 = wl_signature(spark, edges_df(spark, g2), rounds=2).collect()[0]
    assert t1["signature"] != t2["signature"]


def test_partition_invariance(spark):
    rng = random.Random(3)
    pairs = [(rng.randrange(40), rng.randrange(40)) for _ in range(100)]
    base = spark_colors(spark, pairs, 2)
    df = edges_df(spark, pairs).repartition(7)
    res = wl_colors(spark, df, rounds=2)
    got = {r["vertex"]: r["color"] for r in res.colors.collect()}
    assert got == base


def test_self_loop_and_direction(spark):
    # self-loop counts once; direction is ignored (symmetrized)
    got = spark_colors(spark, [(1, 1), (1, 2), (2, 1)], 1)
    want = wl_colors_single_node([(1, 1), (1, 2)], 1)
    assert got == want


def test_validation():
    with pytest.raises(ValueError):
        wl_colors(None, None, rounds=-1)
