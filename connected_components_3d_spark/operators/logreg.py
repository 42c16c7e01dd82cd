"""Distributed logistic-regression training — full-batch gradient descent
over a feature table, the in-pipeline classifier trainer a webtext corpus
uses for quality / spam scoring once heuristic features
(functions/text.py, operators/hostfeatures.py) exist and a few labels are
available (the fastText-/CCNet-style quality-filter training loop, minus
the external ML stack).

Model and contract (the single-node oracle and the DuckDB chained-CTE gate
oracle replay it; floats rounded at the gate boundary only):

    p_i      = sigmoid(w · x_i + b)
    grad_w_j = Σ_i (p_i − y_i)·x_ij / n  + l2·w_j
    grad_b   = Σ_i (p_i − y_i) / n
    w ← w − lr·grad_w,  b ← b − lr·grad_b        (fixed ``iters`` steps,
                                                  w = 0, b = 0 start)

Per iteration the ONLY distributed work is one aggregate of k+2 sums
(k feature-gradient terms, the bias term, and the log-loss) over the
cached feature table — the weights live on the driver (k+1 scalars, the
scalars-only rule), enter the plan as literals, and the whole per-row
computation (dot product, sigmoid, per-feature products) is native
column expressions inside one whole-stage-codegen span. Shuffle per iter
= partial-aggregate rows only (partitions × (k+2) doubles). Exactly the
PageRank loop shape with a k-wide aggregate instead of a vertex-keyed one;
at 10^12 rows the cost is one scan per iteration of a cached columnar
table.

Float caveat: partial-sum reassociation differs across engines/partition
counts at ~1e-16 per step and compounds through the weight trajectory;
the gate row rounds the final weights to 6 decimals (10 iterations —
drift stays < 1e-10 in practice; the pytest parity bound is 1e-9).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class LogRegResult:
    weights: list[float]  # per feature_cols order
    bias: float
    loss: float  # mean log-loss at the final weights (pre-update)
    iters: int
    metrics: list[dict] = field(default_factory=list)


def logistic_regression(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    *,
    lr: float = 0.5,
    iters: int = 10,
    l2: float = 0.0,
) -> LogRegResult:
    """Train by full-batch GD over ``df`` (numeric ``feature_cols``,
    ``label_col`` ∈ {0, 1}) — see module docstring for the exact
    recurrence."""
    assert feature_cols and 1 <= iters <= 1000 and lr > 0 and l2 >= 0
    k = len(feature_cols)
    d = df.select(
        *[F.col(c).cast("double").alias(f"x{j}") for j, c in enumerate(feature_cols)],
        F.col(label_col).cast("double").alias("y"),
    ).persist()
    n = d.count()
    assert n > 0, "empty training table"
    w = [0.0] * k
    b = 0.0
    loss = float("nan")
    metrics: list[dict] = []
    for it in range(1, iters + 1):
        t0 = time.time()
        margin = F.lit(b)
        for j in range(k):
            margin = margin + F.lit(w[j]) * F.col(f"x{j}")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
        resid = p - F.col("y")
        eps = F.lit(1e-12)
        agg = d.agg(
            *[F.sum(resid * F.col(f"x{j}")).alias(f"g{j}") for j in range(k)],
            F.sum(resid).alias("gb"),
            F.sum(
                -(
                    F.col("y") * F.log(p + eps)
                    + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - p + eps)
                )
            ).alias("ll"),
        ).collect()[0]
        loss = float(agg["ll"]) / n
        w = [
            w[j] - lr * (float(agg[f"g{j}"]) / n + l2 * w[j])
            for j in range(k)
        ]
        b = b - lr * (float(agg["gb"]) / n)
        metrics.append(
            {"iter": it, "loss": round(loss, 8),
             "wall_s": round(time.time() - t0, 4)}
        )
    d.unpersist()
    return LogRegResult(w, b, loss, iters, metrics)


def logistic_regression_single_node(
    rows: list[tuple],
    k: int,
    *,
    lr: float = 0.5,
    iters: int = 10,
    l2: float = 0.0,
) -> tuple[list[float], float]:
    """Single-node reference — the pytest parity oracle (rows are
    (x_0..x_{k-1}, y) tuples; same recurrence, sums in row order)."""
    n = len(rows)
    w = [0.0] * k
    b = 0.0
    for _ in range(iters):
        g = [0.0] * k
        gb = 0.0
        for r in rows:
            m = b + sum(w[j] * r[j] for j in range(k))
            p = 1.0 / (1.0 + math.exp(-m))
            resid = p - r[k]
            for j in range(k):
                g[j] += resid * r[j]
            gb += resid
        w = [w[j] - lr * (g[j] / n + l2 * w[j]) for j in range(k)]
        b = b - lr * (gb / n)
    return w, b


def predict_proba(df: DataFrame, feature_cols, weights, bias):
    """Score ``df`` with a trained model — one native-expression column
    (the deployment half: train once, score 10^12 rows map-only)."""
    margin = F.lit(float(bias))
    for c, w in zip(feature_cols, weights):
        margin = margin + F.lit(float(w)) * F.col(c).cast("double")
    return df.withColumn(
        "proba", F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    )
