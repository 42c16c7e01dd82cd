"""Grouped quantiles (operators/quantiles.py): exact path vs numpy
linear-interpolation quantiles, approx path rank-error envelope,
partition invariance, validation."""

from __future__ import annotations

import math

import numpy as np
import pytest

from connected_components_3d_spark.operators.quantiles import (
    grouped_quantiles,
)


def data_df(spark, parts=4):
    M, A = 2147483647, 1103515245
    rows = [
        (f"g{i % 3}", ((i * A + 7) % M) % 1000 / 10.0) for i in range(600)
    ]
    return spark.createDataFrame(rows, "k string, v double").repartition(
        parts
    )


def test_exact_matches_numpy(spark):
    d = data_df(spark)
    probs = [0.0, 0.25, 0.5, 0.9, 1.0]
    got = {
        (r["k"], r["p"]): r["q"]
        for r in grouped_quantiles(d, ["k"], "v", probs).collect()
    }
    rows = [(r["k"], r["v"]) for r in d.collect()]
    for g in ("g0", "g1", "g2"):
        vals = np.array(sorted(v for k, v in rows if k == g))
        for p in probs:
            exp = float(np.quantile(vals, p))  # linear interpolation
            assert math.isclose(got[(g, p)], exp, abs_tol=1e-9), (g, p)


def test_partition_invariance_exact(spark):
    probs = [0.5, 0.9]
    a = sorted(
        map(tuple, grouped_quantiles(data_df(spark, 1), ["k"], "v", probs).collect())
    )
    b = sorted(
        map(tuple, grouped_quantiles(data_df(spark, 16), ["k"], "v", probs).collect())
    )
    assert a == b


def test_approx_rank_error_envelope(spark):
    d = data_df(spark)
    got = {
        (r["k"], r["p"]): r["q"]
        for r in grouped_quantiles(
            d, ["k"], "v", [0.5], method="approx", accuracy=100
        ).collect()
    }
    rows = [(r["k"], r["v"]) for r in d.collect()]
    for g in ("g0", "g1", "g2"):
        vals = sorted(v for k, v in rows if k == g)
        q = got[(g, 0.5)]
        rank = sum(1 for v in vals if v <= q) / len(vals)
        assert abs(rank - 0.5) <= 0.05  # GK guarantee at accuracy=100 is 1%


def test_validation(spark):
    with pytest.raises(AssertionError):
        grouped_quantiles(data_df(spark), [], "v")
    with pytest.raises(AssertionError):
        grouped_quantiles(data_df(spark), ["k"], "v", [1.5])
