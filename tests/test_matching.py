"""Maximal-matching properties and exact parity with the sequential greedy
over the deterministic priority order (operators/matching.py contract)."""

from __future__ import annotations

import networkx as nx
import pytest

from connected_components_3d_spark.operators.matching import (
    maximal_matching,
    maximal_matching_single_node,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def assert_matching(spark, pairs, seed=42):
    res = maximal_matching(spark, edges_df(spark, pairs), seed=seed)
    got = sorted((r["u"], r["v"]) for r in res.matching.collect())
    # exact parity: the handshake computes the sequential greedy
    assert got == maximal_matching_single_node(pairs, seed=seed)
    # matching property: every vertex at most once
    flat = [x for uv in got for x in uv]
    assert len(flat) == len(set(flat))
    # maximality: every input edge has a matched endpoint
    used = set(flat)
    for a, b in pairs:
        if a != b:
            assert a in used or b in used, (a, b)
    return res, got


def test_random_graph(spark):
    g = nx.gnp_random_graph(120, 0.05, seed=6)
    res, got = assert_matching(spark, list(g.edges()))
    assert res.num_rounds >= 1 and got


def test_star_matches_one_edge(spark):
    # a star can match exactly one edge, whichever the priority picks
    res, got = assert_matching(spark, [(0, i) for i in range(1, 9)])
    assert len(got) == 1 and got[0][0] == 0


def test_path_and_seed_sensitivity(spark):
    pairs = [(i, i + 1) for i in range(30)]
    _, a = assert_matching(spark, pairs, seed=1)
    _, b = assert_matching(spark, pairs, seed=2)
    assert a != b  # different priorities pick different maximal matchings


def test_direction_duplicates_self_loops_ignored(spark):
    pairs = [(1, 2), (2, 1), (2, 2), (2, 3), (3, 4), (4, 3)]
    res, got = assert_matching(spark, pairs)
    # path 1-2-3-4: either the middle edge alone or the two outer edges —
    # both are maximal; which one depends on the priority order
    assert got == [(2, 3)] or got == [(1, 2), (3, 4)]


def test_empty_graph(spark):
    res = maximal_matching(spark, edges_df(spark, []).limit(0))
    assert res.matching.count() == 0 and res.num_rounds == 0


def test_negative_id_rejected(spark):
    with pytest.raises(Exception, match="\\[0, 2\\^31\\)"):
        maximal_matching(spark, edges_df(spark, [(-3, 1)]))
