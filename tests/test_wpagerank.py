"""Weighted PageRank (operators/wpagerank.py): single-node parity,
multigraph weight collapsing, unweighted degeneracy, host composition."""

from __future__ import annotations

import random

import numpy as np
import pytest

from connected_components_3d_spark.operators.pagerank import (
    pagerank_single_node,
)
from connected_components_3d_spark.operators.wpagerank import (
    host_pagerank,
    weighted_pagerank,
    weighted_pagerank_single_node,
)


def _df(spark, triples):
    return spark.createDataFrame(triples, "src long, dst long, weight double")


def _assert_matches(spark, triples, **kw):
    want = weighted_pagerank_single_node(triples, **kw)
    res = weighted_pagerank(spark, _df(spark, triples), **kw)
    got = {r["vertex"]: r["rank"] for r in res.ranks.collect()}
    assert set(got) == set(want)
    a = np.array([got[v] for v in sorted(got)])
    b = np.array([want[v] for v in sorted(got)])
    assert np.allclose(a, b, rtol=1e-6, atol=1e-9), np.abs(a - b).max()
    assert abs(a.sum() - 1.0) < 1e-9
    return res


def _rand_triples(seed, n=200, v=30):
    rng = random.Random(seed)
    seen = {}
    for _ in range(n):
        seen[(rng.randrange(v), rng.randrange(v))] = round(
            rng.uniform(0.5, 9.5), 3
        )
    return [(s, d, w) for (s, d), w in seen.items()]


@pytest.mark.parametrize("seed", [3, 17])
def test_random_weighted_converged(spark, seed):
    res = _assert_matches(spark, _rand_triples(seed))
    assert res.converged


def test_dangling_and_fixed_iters(spark):
    triples = [(1, 2, 2.0), (2, 3, 1.0), (4, 1, 5.0)]  # 3 is dangling
    res = _assert_matches(spark, triples, fixed_iters=7)
    assert res.num_iters == 7


def test_duplicate_edges_sum_weights(spark):
    dup = [(1, 2, 1.0), (1, 2, 2.0), (2, 1, 3.0), (1, 3, 3.0)]
    merged = [(1, 2, 3.0), (2, 1, 3.0), (1, 3, 3.0)]
    ra = weighted_pagerank(spark, _df(spark, dup), fixed_iters=6)
    rb = weighted_pagerank(spark, _df(spark, merged), fixed_iters=6)
    ga = {r["vertex"]: r["rank"] for r in ra.ranks.collect()}
    gb = {r["vertex"]: r["rank"] for r in rb.ranks.collect()}
    assert ga == pytest.approx(gb, abs=1e-12)


def test_uniform_weights_match_unweighted_pagerank(spark):
    pairs = [(s, d) for s, d, _ in _rand_triples(8)]
    want = pagerank_single_node(pairs, fixed_iters=8)
    got = {
        r["vertex"]: r["rank"]
        for r in weighted_pagerank(
            spark, _df(spark, [(s, d, 1.0) for s, d in pairs]), fixed_iters=8
        ).ranks.collect()
    }
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-6, abs=1e-9)


def test_nonpositive_weights_dropped(spark):
    triples = [(1, 2, 1.0), (1, 3, 0.0), (1, 4, -2.0), (2, 1, 1.0)]
    res = weighted_pagerank(spark, _df(spark, triples), fixed_iters=4)
    verts = {r["vertex"] for r in res.ranks.collect()}
    assert verts == {1, 2}


def test_host_pagerank_composition(spark):
    # a.com splits its out-weight 2:1 between b.com and c.com, plus an
    # intra-host link that must NOT count
    rows = [
        ("https://a.com/1", "https://b.com/x"),
        ("https://a.com/2", "https://b.com/y"),
        ("https://a.com/4", "https://c.com/q"),
        ("https://a.com/3", "https://A.COM/other"),  # intra, dropped
        ("https://b.com/1", "https://a.com/z"),
    ]
    df = spark.createDataFrame(rows, "src_url string, dst_url string")
    res = host_pagerank(spark, df, fixed_iters=10)
    got = {r["vertex"]: r["rank"] for r in res.ranks.collect()}
    want = weighted_pagerank_single_node(
        [("a.com", "b.com", 2.0), ("a.com", "c.com", 1.0), ("b.com", "a.com", 1.0)],
        fixed_iters=10,
    )
    assert got == pytest.approx(want, abs=1e-12)
    assert got["b.com"] > got["c.com"]  # 2:1 out-weight split
