"""Degree distribution + power-law MLE (operators/degree.py) vs plain
python folds; integer-exact log2 bucketing at power-of-two boundaries."""

from __future__ import annotations

import math
import random
from collections import Counter, defaultdict

import pytest

from connected_components_3d_spark.operators.degree import (
    degree_distribution,
    powerlaw_alpha,
)


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _rand_edges(seed, n=300, v=60):
    rng = random.Random(seed)
    return sorted({(rng.randrange(v), rng.randrange(v)) for _ in range(n)})


def _py_degrees(pairs, direction):
    out_d, in_d = Counter(), Counter()
    verts = set()
    for s, d in pairs:
        out_d[s] += 1
        in_d[d] += 1
        verts.update((s, d))
    if direction == "out":
        return {v: out_d[v] for v in verts}
    if direction == "in":
        return {v: in_d[v] for v in verts}
    return {v: out_d[v] + in_d[v] for v in verts}


def _py_hist(degs):
    buckets = defaultdict(list)
    for d in degs.values():
        buckets[d.bit_length() - 1 if d > 0 else -1].append(d)
    n = len(degs)
    return {
        b: (min(ds), max(ds), len(ds), round(len(ds) / n, 8))
        for b, ds in buckets.items()
    }


@pytest.mark.parametrize("direction", ["out", "in", "total"])
def test_histogram_matches_python(spark, direction):
    pairs = _rand_edges(11)
    got = {
        r["bucket"]: (r["min_deg"], r["max_deg"], r["n_vertices"], r["frac"])
        for r in degree_distribution(
            spark, _df(spark, pairs), direction=direction
        ).collect()
    }
    assert got == _py_hist(_py_degrees(pairs, direction))


def test_power_of_two_boundary_buckets(spark):
    # vertex 1 has out-degree exactly 8 (bucket 3, NOT 2), vertex 2 degree 4
    pairs = [(1, 100 + i) for i in range(8)] + [(2, 200 + i) for i in range(4)]
    rows = {
        r["bucket"]: r
        for r in degree_distribution(
            spark, _df(spark, pairs), direction="out"
        ).collect()
    }
    assert rows[3]["min_deg"] == 8 and rows[3]["n_vertices"] == 1
    assert rows[2]["min_deg"] == 4 and rows[2]["n_vertices"] == 1
    # the 12 sink vertices have out-degree 0 → bucket −1
    assert rows[-1]["n_vertices"] == 12


def test_powerlaw_alpha_matches_python(spark):
    pairs = _rand_edges(23, n=500, v=50)
    d_min = 3
    degs = [d for d in _py_degrees(pairs, "total").values() if d >= d_min]
    lsum = sum(math.log(d / (d_min - 0.5)) for d in degs)
    want = round(1.0 + len(degs) / lsum, 8)
    row = powerlaw_alpha(
        spark, _df(spark, pairs), direction="total", d_min=d_min
    ).collect()[0]
    assert row["n_tail"] == len(degs)
    assert row["alpha"] == pytest.approx(want, abs=1e-7)


def test_powerlaw_empty_tail(spark):
    row = powerlaw_alpha(
        spark, _df(spark, [(1, 2), (2, 3)]), d_min=100
    ).collect()[0]
    assert row["n_tail"] == 0 and row["alpha"] == 0.0
