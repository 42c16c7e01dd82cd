"""Distributed PCA / covariance parity: numpy reference, gram ≡ exploded,
projection geometry (operators/pca.py contract)."""

from __future__ import annotations

import numpy as np
import pytest

from connected_components_3d_spark.operators.pca import (
    covariance_matrix,
    pca,
)


def vecs_df(spark, X):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    )


def rand_X(n=200, d=12, seed=0):
    rng = np.random.default_rng(seed)
    # correlated columns so the spectrum is non-trivial
    base = rng.normal(size=(n, d))
    mix = rng.normal(size=(d, d)) * 0.5 + np.eye(d)
    return (base @ mix).astype(np.float32)


def cov_of(df_cov, d):
    m = np.zeros((d, d))
    for r in df_cov.collect():
        m[r["i"], r["j"]] = r["cov"]
    return m


def np_cov(X):
    Xd = X.astype(np.float64)
    mu = Xd.mean(axis=0)
    return (Xd.T @ Xd) / len(Xd) - np.outer(mu, mu)


def test_covariance_gram_matches_numpy(spark):
    X = rand_X()
    got = cov_of(covariance_matrix(spark, vecs_df(spark, X)), X.shape[1])
    assert np.allclose(got, np_cov(X), atol=1e-10)
    assert np.allclose(got, got.T, atol=0)  # emitted symmetric


def test_covariance_gram_equals_exploded(spark):
    X = rand_X(n=80, d=6, seed=3)
    df = vecs_df(spark, X)
    g = cov_of(covariance_matrix(spark, df, method="gram"), 6)
    e = cov_of(covariance_matrix(spark, df, method="exploded"), 6)
    assert np.allclose(g, e, atol=1e-12)


def test_covariance_partition_invariance(spark):
    X = rand_X(n=150, d=8, seed=5)
    df = vecs_df(spark, X)
    one = cov_of(covariance_matrix(spark, df.coalesce(1)), 8)
    many = cov_of(covariance_matrix(spark, df.repartition(17)), 8)
    assert np.allclose(one, many, atol=1e-12)


def test_pca_matches_numpy_eigh(spark):
    X = rand_X(n=300, d=10, seed=7)
    res = pca(spark, vecs_df(spark, X), k=4)
    cov = np_cov(X)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    want_vals = evals[order]
    assert np.allclose(res.explained_variance, want_vals, atol=1e-9)
    for r, col in enumerate(order):
        v = evecs[:, col]
        m = np.argmax(np.abs(v))
        if v[m] < 0:
            v = -v
        assert np.allclose(res.components[r], v, atol=1e-8), r


def test_projection_geometry(spark):
    X = rand_X(n=250, d=9, seed=11)
    res = pca(spark, vecs_df(spark, X), k=3)
    pcs = {r["vec_id"]: r["pc"] for r in res.projected.collect()}
    P = np.array([pcs[i] for i in range(len(X))])
    # projected coordinates are centered and their variance is the eigenvalue
    assert np.allclose(P.mean(axis=0), 0.0, atol=1e-9)
    assert np.allclose(P.var(axis=0), res.explained_variance, atol=1e-9)
    # parity with a direct numpy projection
    mu = np.array(res.mean)
    C = np.array(res.components)
    assert np.allclose(P, (X.astype(np.float64) - mu) @ C.T, atol=1e-9)


def test_validation(spark):
    X = rand_X(n=20, d=4, seed=1)
    df = vecs_df(spark, X)
    with pytest.raises(ValueError):
        pca(spark, df, k=0)
    with pytest.raises(ValueError):
        pca(spark, df, k=5)
    with pytest.raises(ValueError):
        covariance_matrix(spark, df, method="nope")
    ragged = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError):
        covariance_matrix(spark, ragged)
