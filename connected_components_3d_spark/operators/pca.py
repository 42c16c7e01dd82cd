"""Distributed PCA over an embedding column — the one-pass moment-sketch
pattern every 100 TB feature pipeline uses: each partition folds its rows
into a (count, Σx, ΣxxT) partial with a vectorized numpy kernel
(mapInPandas, Arrow-batched), the d-sized/d²-sized partials combine with a
JVM-side element-keyed aggregation (NO driver collect of data, no
rows×d² explode), and only the final d×d covariance — a few thousand
doubles — reaches the driver for the eigendecomposition. Projection then
streams back over the data with the k×d component matrix closed over by a
second vectorized kernel. Data amplification is partitions·d², not
rows·d²; everything row-sized stays distributed.

Semantics (fixed, deterministic — replayed by the numpy pytest parity and
the DuckDB exploded-SQL gate oracle ``embedding_covariance``):

  population (biased) covariance, float64 accumulation over the
  float32 column:   cov[i,j] = Σxᵢxⱼ/n − (Σxᵢ/n)·(Σxⱼ/n)
  eigh on the symmetric covariance; components ordered by descending
  eigenvalue; sign fixed so each component's largest-|·| coordinate is
  positive (the deterministic convention sklearn calls svd_flip);
  projection = (x − μ) · Vᵀ.

``method='exploded'`` is the pure-SQL covariance alternative (posexplode
twice + groupBy — Catalyst-native but rows·d² amplified); pytest pins it
equal to the gram path, and the gate row runs the gram path against the
DuckDB exploded replay.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class PCAResult:
    mean: list[float]  # d
    components: list[list[float]]  # k × d, sign-fixed, by descending eigval
    explained_variance: list[float]  # k eigenvalues
    projected: DataFrame  # (<id_col>, pc: array<double> length k)


def _dim_of(df: DataFrame, col: str) -> int:
    dims = (
        df.select(F.size(F.col(col)).alias("d"))
        .agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        .collect()[0]
    )
    if dims["lo"] is None:
        return 0
    if dims["lo"] != dims["hi"]:
        raise ValueError(
            f"pca: ragged embedding column ({dims['lo']} != {dims['hi']})"
        )
    return int(dims["lo"])


def _moments(df: DataFrame, col: str, d: int) -> tuple[int, np.ndarray, np.ndarray]:
    """One distributed pass → (n, Σx [d], ΣxxT [d×d]) — partial numpy Gram
    per partition, element-keyed JVM sum across partitions."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(d, dtype=np.float64)
        ss = np.zeros((d, d), dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[col].to_numpy()).astype(np.float64, copy=False)
            n += x.shape[0]
            s += x.sum(axis=0)
            ss += x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
            )

    partials = df.select(col).mapInPandas(
        fold, "n long, s array<double>, ss array<double>"
    )
    # element-keyed combine: ≤ partitions·(d²+d) rows, never driver-side
    folded = (
        partials.select(
            "n",
            F.posexplode(F.concat(F.col("s"), F.col("ss"))).alias("idx", "v"),
        )
        .groupBy("idx")
        .agg(F.sum("v").alias("v"), F.sum(F.when(F.col("idx") == 0, F.col("n"))).alias("n"))
    )
    rows = folded.collect()  # d²+d scalars — the only driver transfer
    total_n = 0
    flat = np.zeros(d + d * d, dtype=np.float64)
    for r in rows:
        flat[r["idx"]] = r["v"]
        if r["idx"] == 0 and r["n"] is not None:
            total_n = int(r["n"])
    return total_n, flat[:d], flat[d:].reshape(d, d)


def covariance_matrix(
    spark: SparkSession,
    df: DataFrame,
    col: str = "embedding",
    *,
    method: str = "gram",
) -> DataFrame:
    """Population covariance of the array column as (i:int, j:int,
    cov:double) rows — d² of them. ``gram`` = partial-numpy scale path;
    ``exploded`` = Catalyst-native posexplode² replay (pytest-pinned
    equal; rows·d² amplified, the small-d/debug path)."""
    if method not in ("gram", "exploded"):
        raise ValueError(f"covariance_matrix: unknown method {method!r}")
    d = _dim_of(df, col)
    if d == 0:
        return spark.createDataFrame([], "i int, j int, cov double")
    if method == "exploded":
        xx = df.select(F.col(col).cast("array<double>").alias("x")).select(
            F.posexplode("x").alias("i", "xi"), F.col("x")
        ).select("i", "xi", F.posexplode("x").alias("j", "xj"))
        n = df.count()
        return (
            xx.groupBy("i", "j")
            .agg(F.sum(F.col("xi") * F.col("xj")).alias("ss"),
                 F.sum("xi").alias("si"), F.sum("xj").alias("sj"))
            .select(
                F.col("i").cast("int"),
                F.col("j").cast("int"),
                (
                    F.col("ss") / n - (F.col("si") / n) * (F.col("sj") / n)
                ).alias("cov"),
            )
        )
    n, s, ss = _moments(df, col, d)
    cov = ss / n - np.outer(s / n, s / n)
    out = [
        (i, j, float(cov[i, j])) for i in range(d) for j in range(d)
    ]
    return spark.createDataFrame(out, "i int, j int, cov double")


def pca(
    spark: SparkSession,
    df: DataFrame,
    *,
    col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 2,
) -> PCAResult:
    """Project every row onto the top-k principal components."""
    d = _dim_of(df, col)
    if d == 0:
        raise ValueError("pca: empty input")
    if not 1 <= k <= d:
        raise ValueError(f"pca: k must be in [1, {d}], got {k}")
    n, s, ss = _moments(df, col, d)
    mu = s / n
    cov = ss / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k × d
    # svd_flip determinism: dominant coordinate of each component positive
    for r in range(k):
        m = np.argmax(np.abs(comps[r]))
        if comps[r, m] < 0:
            comps[r] = -comps[r]
    comps = np.ascontiguousarray(comps)
    mu_b = mu.copy()

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[col].to_numpy()).astype(np.float64, copy=False)
            pc = (x - mu_b) @ comps.T  # rows × k
            yield pd.DataFrame({id_col: pdf[id_col], "pc": list(map(list, pc))})

    projected = df.select(id_col, col).mapInPandas(
        project, f"{id_col} long, pc array<double>"
    )
    return PCAResult(
        mean=mu.tolist(),
        components=comps.tolist(),
        explained_variance=[float(evals[i]) for i in order],
        projected=projected,
    )
