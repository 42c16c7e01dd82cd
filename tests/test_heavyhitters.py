"""Exact 2-pass heavy hitters (operators/heavyhitters.py): exact-output
parity vs a plain Counter, MG superset guarantee, partition invariance,
degenerates."""

from __future__ import annotations

from collections import Counter

import pytest

from connected_components_3d_spark.operators.heavyhitters import (
    heavy_hitters,
)


def make_rows(seed=5, n=4000):
    import random

    rng = random.Random(seed)
    # skewed: few hot values + long tail
    vals = []
    for _ in range(n):
        r = rng.random()
        if r < 0.30:
            vals.append("hot1")
        elif r < 0.45:
            vals.append("hot2")
        elif r < 0.52:
            vals.append("warm")
        else:
            vals.append(f"tail{rng.randrange(2000)}")
    return vals


def exact_hh(vals, phi):
    import math

    thr = math.floor(phi * len(vals)) + 1
    return {v: c for v, c in Counter(vals).items() if c >= thr}


def test_exact_and_partition_invariant(spark):
    vals = make_rows()
    for parts in (1, 13):
        df = spark.createDataFrame(
            [(v,) for v in vals], "value string"
        ).repartition(parts)
        res = heavy_hitters(spark, df, "value", phi=0.05)
        got = {r["value"]: r["cnt"] for r in res.hitters.collect()}
        assert got == exact_hh(vals, 0.05)
        assert res.n == len(vals)
        # candidate union stays small: <= partitions * ceil(1/phi)
        assert res.num_candidates <= parts * 20 + 20


def test_threshold_semantics(spark):
    # 10 a's, 5 b's, 1 c in 16 rows; phi=0.3 → thr=floor(4.8)+1=5
    vals = ["a"] * 10 + ["b"] * 5 + ["c"]
    df = spark.createDataFrame([(v,) for v in vals], "value string")
    res = heavy_hitters(spark, df, "value", phi=0.3)
    got = {r["value"]: r["cnt"] for r in res.hitters.collect()}
    assert got == {"a": 10, "b": 5}
    assert res.threshold == 5


def test_degenerates(spark):
    df = spark.createDataFrame([(None,), ("x",)], "value string")
    res = heavy_hitters(spark, df, "value", phi=0.5)
    got = {r["value"]: r["cnt"] for r in res.hitters.collect()}
    assert got == {"x": 1} and res.n == 1  # NULL ignored
    empty = spark.createDataFrame([], "value string")
    res0 = heavy_hitters(spark, empty, "value", phi=0.5)
    assert res0.hitters.count() == 0 and res0.n == 0
    with pytest.raises(ValueError):
        heavy_hitters(spark, df, "value", phi=1.5)
