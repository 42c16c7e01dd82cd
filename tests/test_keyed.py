"""Keyed-vertex CC adapter (operators/keyed.py): networkx parity on string
graphs, canonical min-key labels independent of the internal id assignment,
host-graph composition."""

from __future__ import annotations

import random

import networkx as nx

from connected_components_3d_spark.operators.keyed import (
    connected_components_keyed,
    host_components,
    vertex_dictionary,
)


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _nx_min_key_components(pairs):
    g = nx.Graph()
    g.add_edges_from(pairs)
    want = {}
    for comp in nx.connected_components(g):
        lab = min(comp)
        for v in comp:
            want[v] = lab
    return want


def _collect(res):
    return {r["vertex"]: r["component"] for r in res.components.collect()}


def test_string_cc_matches_networkx(spark):
    rng = random.Random(7)
    pairs = sorted(
        {
            (f"host-{rng.randrange(40)}.example", f"host-{rng.randrange(40)}.example")
            for _ in range(60)
        }
    )
    got = _collect(connected_components_keyed(spark, _df(spark, pairs)))
    assert got == _nx_min_key_components(pairs)


def test_keyed_labels_are_min_key_not_internal_id(spark):
    # keys chosen so lexicographic min ('aa') differs from insertion order
    pairs = [("zz", "mm"), ("mm", "aa"), ("q1", "q2")]
    got = _collect(connected_components_keyed(spark, _df(spark, pairs)))
    assert got == {"zz": "aa", "mm": "aa", "aa": "aa", "q1": "q1", "q2": "q1"}


def test_keyed_deterministic_across_runs(spark):
    pairs = sorted(
        {(f"u{a}", f"u{b}") for a in range(12) for b in (a + 1, (a * 5) % 12)}
    )
    a = _collect(connected_components_keyed(spark, _df(spark, pairs)))
    b = _collect(connected_components_keyed(spark, _df(spark, pairs)))
    assert a == b


def test_dictionary_is_consistent_and_dense_free(spark):
    pairs = [("x", "y"), ("y", "z")]
    d = vertex_dictionary(_df(spark, pairs))
    rows = d.collect()
    assert {r["key"] for r in rows} == {"x", "y", "z"}
    assert len({r["vid"] for r in rows}) == 3  # unique ids


def test_host_components_groups_hosts(spark):
    # two host clusters; intra-host edge must not connect anything
    rows = [
        ("https://a.com/1", "https://b.com/x"),
        ("https://b.com/2", "https://a.com/y"),
        ("https://c.com/1", "https://d.com/x"),
        ("https://c.com/2", "https://C.COM/self"),  # intra, dropped
    ]
    df = spark.createDataFrame(rows, "src_url string, dst_url string")
    got = _collect(host_components(spark, df))
    assert got == {
        "a.com": "a.com",
        "b.com": "a.com",
        "c.com": "c.com",
        "d.com": "c.com",
    }


def test_keyed_hashmin_matches_blockuf(spark):
    pairs = sorted(
        {(f"n{a}", f"n{(a * 7 + 3) % 25}") for a in range(25)}
    )
    a = _collect(connected_components_keyed(spark, _df(spark, pairs), method="blockuf"))
    b = _collect(connected_components_keyed(spark, _df(spark, pairs), method="hashmin"))
    assert a == b


def test_pagerank_keyed_matches_single_node(spark):
    """Keyed PageRank = the long-id single-node oracle composed with the
    key mapping (scores are id-free, so any dictionary assignment gives
    identical ranks)."""
    from connected_components_3d_spark.operators.keyed import pagerank_keyed
    from connected_components_3d_spark.operators.pagerank import (
        pagerank_single_node,
    )

    pairs = [("u1", "u2"), ("u2", "u3"), ("u3", "u1"), ("u4", "u1"),
             ("u5", "u1"), ("u5", "u4")]
    names = sorted({x for p in pairs for x in p})
    idx = {n: i for i, n in enumerate(names)}
    want = pagerank_single_node(
        [(idx[a], idx[b]) for a, b in pairs], fixed_iters=4
    )
    df = _df(spark, pairs)
    res = pagerank_keyed(spark, df, fixed_iters=4)
    got = {r["vertex"]: r["rank"] for r in res.ranks.collect()}
    assert set(got) == set(names)
    for n in names:
        assert abs(got[n] - want[idx[n]]) < 1e-9, n
