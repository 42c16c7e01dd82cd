"""Link-prediction score parity vs networkx (jaccard_coefficient,
adamic_adar_index, resource_allocation_index, preferential_attachment),
candidate-set semantics (non-adjacent, min_common), hub-cap determinism,
and degenerates."""

from __future__ import annotations

import math

import networkx as nx
import pytest

from connected_components_3d_spark.operators.linkpred import link_prediction


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def collect_scores(spark, pairs, **kw):
    df = link_prediction(spark, edges_df(spark, pairs), **kw)
    return {
        (r["src"], r["dst"]): r.asDict() for r in df.collect()
    }


def test_networkx_parity(spark):
    g = nx.gnp_random_graph(60, 0.08, seed=5)
    pairs = list(g.edges())
    got = collect_scores(spark, pairs)
    # candidate set: non-adjacent pairs with >= 1 common neighbor
    expected_pairs = {
        (min(u, v), max(u, v))
        for u in g for v in g
        if u < v and not g.has_edge(u, v)
        and len(list(nx.common_neighbors(g, u, v))) >= 1
    }
    assert set(got) == expected_pairs
    ebunch = sorted(expected_pairs)
    for fn, key in [
        (nx.jaccard_coefficient, "jaccard"),
        (nx.adamic_adar_index, "aa"),
        (nx.resource_allocation_index, "ra"),
        (nx.preferential_attachment, "pa"),
    ]:
        for u, v, score in fn(g, ebunch):
            assert got[(u, v)][key] == pytest.approx(score, rel=1e-12), (
                key, u, v,
            )
    for (u, v), row in got.items():
        assert row["cn"] == len(list(nx.common_neighbors(g, u, v)))


def test_min_common_filters(spark):
    # square 0-1-2-3: diagonals share exactly 2 neighbors
    sq = [(0, 1), (1, 2), (2, 3), (3, 0)]
    got = collect_scores(spark, sq, min_common=2)
    assert set(got) == {(0, 2), (1, 3)}
    assert got[(0, 2)]["cn"] == 2
    assert got[(0, 2)]["jaccard"] == 1.0  # N(0)=N(2)={1,3}
    assert got[(0, 2)]["aa"] == pytest.approx(2 / math.log(2))
    assert got[(0, 2)]["ra"] == pytest.approx(1.0)
    assert got[(0, 2)]["pa"] == 4


def test_hub_cap_deterministic(spark):
    # star hub 100 with leaves 0..9: uncapped → C(10,2) pairs; cap 4 keeps
    # the 4 smallest leaves → C(4,2) pairs
    star = [(100, i) for i in range(10)]
    full = collect_scores(spark, star)
    assert len(full) == 45
    capped = collect_scores(spark, star, max_fanout=4)
    assert set(capped) == {(i, j) for i in range(4) for j in range(i + 1, 4)}
    # wdeg stays the TRUE hub degree under the cap
    assert capped[(0, 1)]["aa"] == pytest.approx(1 / math.log(10))


def test_adjacent_pairs_excluded_and_empty(spark):
    tri = [(0, 1), (1, 2), (0, 2)]
    got = collect_scores(spark, tri)
    assert got == {}  # all 2-hop pairs are already edges
    assert collect_scores(spark, []) == {}
