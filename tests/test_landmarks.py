"""Landmark distance sketch parity and estimator bounds
(operators/landmarks.py)."""

from __future__ import annotations

import random

import networkx as nx
import pytest

from connected_components_3d_spark.operators.landmarks import (
    estimate_distances,
    landmark_distances,
)


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def sketch_dict(res):
    return {
        (r["vertex"], r["landmark"]): r["dist"]
        for r in res.distances.collect()
    }


def test_parity_vs_networkx_undirected(spark):
    rng = random.Random(23)
    pairs = list({(rng.randrange(40), rng.randrange(40)) for _ in range(70)})
    lms = [0, 7, 13]
    res = landmark_distances(spark, edges_df(spark, pairs), lms)
    g = nx.Graph(pairs)
    g.add_nodes_from(lms)
    want = {}
    for l in lms:
        if l in g:
            for v, d in nx.single_source_shortest_path_length(g, l).items():
                if (v, l) != (l, l) or True:
                    want[(v, l)] = d
    # drop self-loop-only isolated artifacts: operator's vertex set is edge
    # endpoints ∪ landmarks (a landmark always reaches itself at dist 0)
    got = sketch_dict(res)
    assert got == {k: v for k, v in want.items()}
    assert res.converged


def test_parity_vs_networkx_directed(spark):
    rng = random.Random(29)
    pairs = list({(rng.randrange(30), rng.randrange(30)) for _ in range(50)})
    lms = [1, 4]
    res = landmark_distances(
        spark, edges_df(spark, pairs), lms, direction="out"
    )
    g = nx.DiGraph(pairs)
    g.add_nodes_from(lms)
    want = {}
    for l in lms:
        for v, d in nx.single_source_shortest_path_length(g, l).items():
            want[(v, l)] = d
    assert sketch_dict(res) == want


def test_estimator_sandwich(spark):
    rng = random.Random(31)
    # connected-ish: ring + chords
    n = 25
    pairs = [(i, (i + 1) % n) for i in range(n)] + [
        (rng.randrange(n), rng.randrange(n)) for _ in range(12)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    lms = [0, 5, 11, 17]
    res = landmark_distances(spark, edges_df(spark, pairs), lms)
    g = nx.Graph(pairs)
    queries = [(rng.randrange(n), rng.randrange(n)) for _ in range(30)]
    qdf = spark.createDataFrame(queries, "src long, dst long").distinct()
    est = estimate_distances(res.distances, qdf).collect()
    assert len(est) == qdf.count()  # connected graph: every pair estimated
    for r in est:
        true = nx.shortest_path_length(g, r["src"], r["dst"])
        assert r["lower"] <= true <= r["upper"], (r, true)
        assert r["n_common"] == len(lms)
        if r["src"] in lms or r["dst"] in lms:
            assert r["lower"] == true == r["upper"]  # landmark endpoint: exact


def test_cross_component_pairs_absent(spark):
    pairs = [(1, 2), (2, 3), (10, 11)]
    res = landmark_distances(spark, edges_df(spark, pairs), [1])
    qdf = spark.createDataFrame(
        [(2, 3), (2, 10)], "src long, dst long"
    )
    est = {(r["src"], r["dst"]) for r in
           estimate_distances(res.distances, qdf).collect()}
    assert est == {(2, 3)}  # 10 shares no landmark with 2


def test_max_radius_truncation(spark):
    pairs = [(i, i + 1) for i in range(10)]
    res = landmark_distances(spark, edges_df(spark, pairs), [0], max_radius=3)
    assert not res.converged and res.rounds == 3
    got = sketch_dict(res)
    assert got == {(i, 0): i for i in range(4)}


def test_validation(spark):
    with pytest.raises(ValueError):
        landmark_distances(spark, None, [])
    with pytest.raises(ValueError):
        landmark_distances(spark, None, [1], max_radius=-1)
    with pytest.raises(ValueError):
        landmark_distances(
            spark, edges_df(spark, [(1, 2)]), [1], direction="sideways"
        )
