"""Single-linkage clustering via MSF cut (operators/linkage.py):
threshold cut ≡ components of the thresholded graph (the Gower–Ross
fact, checked against networkx CC), k-cut via python Kruskal replay,
singleton handling, validation."""

from __future__ import annotations

import networkx as nx
import pytest

from connected_components_3d_spark.operators.linkage import single_linkage


def edges_df(spark, triples):
    return spark.createDataFrame(
        [(int(a), int(b), int(w)) for a, b, w in triples],
        "src long, dst long, weight long",
    )


def random_weighted(seed=13, n=40, m=120):
    import random

    rng = random.Random(seed)
    seen = set()
    out = []
    while len(out) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a == b:
            continue
        key = (min(a, b), max(a, b))
        if key in seen:
            continue
        seen.add(key)
        out.append((key[0], key[1], rng.randrange(1, 1000)))
    return out


def clusters_of(df):
    got = {}
    for r in df.collect():
        got.setdefault(r["cluster"], set()).add(r["vertex"])
    return {frozenset(s) for s in got.values()}


def test_threshold_equals_threshold_components(spark):
    triples = random_weighted()
    df = edges_df(spark, triples)
    for t in (100, 400, 999):
        res = single_linkage(spark, df, height=t)
        g = nx.Graph()
        g.add_nodes_from({x for a, b, _ in triples for x in (a, b)})
        g.add_edges_from((a, b) for a, b, w in triples if w <= t)
        assert clusters_of(res.clusters) == {
            frozenset(c) for c in nx.connected_components(g)
        }


def kruskal_kcut(triples, k):
    """python replay: unique MSF under (w,u,v), drop k-1 heaviest."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    canon = {}
    for a, b, w in triples:
        key = (min(a, b), max(a, b))
        canon[key] = min(canon.get(key, (1 << 62,)), (w, *key))
    forest = []
    for w, u, v in sorted(canon.values()):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            forest.append((w, u, v))
    forest.sort(reverse=True)
    kept = forest[k - 1 :]
    g = nx.Graph()
    g.add_nodes_from({x for a, b, _ in triples for x in (a, b)})
    g.add_edges_from((u, v) for _, u, v in kept)
    return {frozenset(c) for c in nx.connected_components(g)}


def test_k_cut(spark):
    triples = random_weighted(seed=29)
    df = edges_df(spark, triples)
    for k in (1, 2, 5):
        res = single_linkage(spark, df, k=k)
        assert clusters_of(res.clusters) == kruskal_kcut(triples, k)
        assert res.num_clusters == len(kruskal_kcut(triples, k))


def test_singletons_and_validation(spark):
    df = edges_df(spark, [(0, 1, 5), (2, 3, 100)])
    res = single_linkage(spark, df, height=10)
    assert clusters_of(res.clusters) == {
        frozenset({0, 1}), frozenset({2}), frozenset({3}),
    }
    assert res.cut_edges == 1
    with pytest.raises(ValueError):
        single_linkage(spark, df)
    with pytest.raises(ValueError):
        single_linkage(spark, df, height=1, k=2)
    with pytest.raises(ValueError):
        single_linkage(spark, df, k=0)
