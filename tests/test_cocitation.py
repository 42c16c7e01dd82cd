"""Co-citation / bibliographic coupling (operators/cocitation.py) vs a
pure-python fold, incl. the hub fan-out cap and jaccard consistency."""

from __future__ import annotations

import random
from collections import defaultdict
from itertools import combinations

import pytest

from connected_components_3d_spark.operators.cocitation import (
    bibliographic_coupling,
    cocitation,
)


def _py_cocitation(edges, min_count=1, max_fanout=256):
    out = defaultdict(set)
    for s, d in edges:
        if s != d:
            out[s].add(d)
    gen = {s: ds for s, ds in out.items() if len(ds) <= max_fanout}
    ind = defaultdict(set)
    for s, ds in gen.items():
        for d in ds:
            ind[d].add(s)
    common = defaultdict(int)
    for s, ds in gen.items():
        for a, b in combinations(sorted(ds), 2):
            common[(a, b)] += 1
    res = {}
    for (a, b), c in common.items():
        if c >= min_count:
            j = c / (len(ind[a]) + len(ind[b]) - c)
            res[(a, b)] = (c, round(j, 8))
    return res


def _rand_edges(seed, n=300, v=40):
    rng = random.Random(seed)
    return list(
        {(rng.randrange(v), rng.randrange(v)) for _ in range(n)}
    )


@pytest.mark.parametrize("seed", [11, 42])
def test_cocitation_matches_python_fold(spark, seed):
    edges = _rand_edges(seed)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["a"], r["b"]): (r["common"], r["jaccard"])
        for r in cocitation(spark, df, min_count=2).collect()
    }
    want = _py_cocitation(edges, min_count=2)
    assert got == {
        k: (c, pytest.approx(j, abs=1e-8)) for k, (c, j) in want.items()
    }


def test_hub_cap_excludes_generator(spark):
    # hub 0 links to 1..10 (fanout 10); normal sources 100,101 link to {1,2}
    edges = [(0, i) for i in range(1, 11)] + [
        (100, 1),
        (100, 2),
        (101, 1),
        (101, 2),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    capped = {
        (r["a"], r["b"]): r["common"]
        for r in cocitation(spark, df, max_fanout=5).collect()
    }
    # hub dropped: only (1,2) from the two normal sources survives
    assert capped == {(1, 2): 2}
    full = {
        (r["a"], r["b"]): r["common"]
        for r in cocitation(spark, df, max_fanout=256).collect()
    }
    assert full[(1, 2)] == 3
    assert len(full) == 45  # C(10,2) hub pairs, (1,2) merged with normals


def test_bibliographic_coupling_is_transposed_cocitation(spark):
    edges = _rand_edges(5, n=150, v=25)
    df = spark.createDataFrame(edges, "src long, dst long")
    bc = {
        (r["a"], r["b"]): (r["common"], r["jaccard"])
        for r in bibliographic_coupling(spark, df).collect()
    }
    want = _py_cocitation([(d, s) for s, d in edges])
    assert bc == {
        k: (c, pytest.approx(j, abs=1e-8)) for k, (c, j) in want.items()
    }


def test_empty_and_selfloop_only(spark):
    df = spark.createDataFrame([(1, 1)], "src long, dst long")
    assert cocitation(spark, df).count() == 0
