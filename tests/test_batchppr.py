"""Batch PPR (operators/batchppr.py): per-group parity with the
single-group operator, sparse-support semantics, convergence mode,
validation."""

from __future__ import annotations

import pytest

from connected_components_3d_spark.operators.batchppr import (
    batch_personalized_pagerank,
)
from connected_components_3d_spark.operators.ppr import personalized_pagerank


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def seeds_df(spark, pairs):
    return spark.createDataFrame(
        [(int(v), int(g)) for v, g in pairs], "vertex long, grp long"
    )


def graph(seed=17, n=50, m=200):
    import random

    rng = random.Random(seed)
    return list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})


def test_groups_match_single_operator(spark):
    pairs = [(a, b) for a, b in graph() if a != b]
    df = edges_df(spark, pairs)
    groups = {0: [0, 1, 2], 1: [10, 11], 2: [25]}
    sd = seeds_df(spark, [(v, g) for g, vs in groups.items() for v in vs])
    res = batch_personalized_pagerank(spark, df, sd, fixed_iters=4)
    assert res.num_groups == 3
    got: dict = {g: {} for g in groups}
    for r in res.ranks.collect():
        got[r["grp"]][r["vertex"]] = r["rank"]
        assert r["rank"] > 0  # sparse contract
    for g, vs in groups.items():
        single = personalized_pagerank(
            spark,
            df,
            spark.createDataFrame([(v,) for v in vs], "vertex long"),
            fixed_iters=4,
        )
        ref = {
            r["vertex"]: r["rank"] for r in single.ranks.collect()
            if r["rank"] > 0
        }
        assert set(got[g]) == set(ref)
        assert all(abs(got[g][v] - ref[v]) < 1e-12 for v in ref)


def test_convergence_mode_and_mass(spark):
    pairs = [(a, b) for a, b in graph(seed=3) if a != b]
    df = edges_df(spark, pairs)
    sd = seeds_df(spark, [(0, 0), (1, 0), (5, 1)])
    res = batch_personalized_pagerank(spark, df, sd, tol=1e-9)
    assert res.converged
    mass: dict = {}
    for r in res.ranks.collect():
        mass[r["grp"]] = mass.get(r["grp"], 0.0) + r["rank"]
    for g, s in mass.items():
        assert abs(s - 1.0) < 1e-6  # probability mass per group


def test_invalid_group_raises(spark):
    df = edges_df(spark, [(0, 1)])
    sd = seeds_df(spark, [(0, 0), (999, 1)])  # group 1 has no graph seed
    with pytest.raises(ValueError):
        batch_personalized_pagerank(spark, df, sd, fixed_iters=1)


def test_empty_graph(spark):
    df = edges_df(spark, []).limit(0)
    sd = seeds_df(spark, [(0, 0)])
    res = batch_personalized_pagerank(spark, df, sd, fixed_iters=1)
    assert res.ranks.count() == 0 and res.converged
