"""Label spreading — semi-supervised soft-label diffusion over the
symmetrically-normalized adjacency (Zhou, Bousquet, Lal, Weston,
Schölkopf NeurIPS 2003, "Learning with Local and Global Consistency"):

    F_{t+1} = α · S · F_t + (1−α) · Y,   S = D^{−1/2} W D^{−1/2}

the soft/continuous counterpart of the engine's hard-label LPA (O8) and
the multi-class generalization of its seeded single-score kernels
(TrustRank, PPR): seed vertices carry known classes, every other vertex
accumulates per-class scores from its neighbours, and the fixpoint
balances graph smoothness against seed fidelity. On a link graph this is
topic/spam/language propagation from a labelled subset — the classic
webspam-demotion companion to TrustRank.

Semantics (fixed, deterministic — replayed by the single-node reference
and the DuckDB chained-CTE gate oracle):

  undirected simple graph: input (src,dst) is symmetrized + deduped,
  self-loops dropped; d(v) = degree in that graph
  S(u,v) = 1/√(d(u)·d(v)) on each undirected edge
  Y(v,c) = 1 for seed rows (vertex v labelled class c), else 0
  F_0 = Y;   F_{t+1}(v,c) = α·Σ_{u~v} S(u,v)·F_t(u,c) + (1−α)·Y(v,c)
  fixed_iters=k runs exactly k iterations (gate path, ROUND 8);
  otherwise stop when Σ_{v,c} |ΔF| < tol·|F rows| (α<1 contracts, so the
  fixpoint is unique).

State is SPARSE — (vertex, label, score) rows exist only where a class
has reached a vertex — which is exactly the scalable representation: the
per-class frontier grows with diffusion reach, never |V|×|classes| rows
for classes that never touch a region of the graph.

Scale shape: the weighted edge cache (src-partitioned + sorted, weights
attached ONCE via two degree joins) is laid down before the loop and
never re-shuffles; per iteration the state side joins it, aggregates by
(dst, label) — key cardinality = active (vertex,class) pairs — then
left-joins the V-sized seed table. One scalar action per iteration in
convergence mode; none in fixed mode (the pagerank-family envelope).
"""

from __future__ import annotations

import gc
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class SpreadResult:
    scores: DataFrame  # (vertex:long, label:long, score:double)
    num_iters: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _truncate(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def label_spreading(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    *,
    alpha: float = 0.8,
    tol: float = 1.0e-6,
    max_iter: int = 50,
    fixed_iters: int | None = None,
) -> SpreadResult:
    """Soft multi-class label diffusion from ``seeds`` (vertex, label) over
    the symmetrized simple graph of ``edges`` (src, dst). Returns sparse
    per-(vertex, label) scores; argmax per vertex is the prediction
    (ties: smallest label — apply downstream when needed)."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(
            f"label_spreading: alpha must be in (0,1), got {alpha}"
        )
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.col("src").cast("long").alias("u"),
            F.col("dst").cast("long").alias("v"),
        )
    )
    sym = und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    deg = sym.groupBy("u").agg(F.count("*").alias("d"))
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # weights attached once; the cache never re-shuffles in the loop
    e_w = (
        sym.join(deg, "u")
        .join(
            deg.select(F.col("u").alias("v"), F.col("d").alias("dv")), "v"
        )
        .select(
            "u",
            "v",
            (1.0 / F.sqrt(F.col("d") * F.col("dv"))).alias("w"),
        )
        .repartition(p, "u")
        .sortWithinPartitions("u")
        .persist()
    )
    e_w.count()
    y = _truncate(
        seeds.select(
            F.col("vertex").cast("long"),
            F.col("label").cast("long"),
        )
        .distinct()
        .withColumn("y", F.lit(1.0))
    )
    state = y.select("vertex", "label", F.col("y").alias("score"))
    metrics: list[dict] = []
    converged = False
    completed = 0
    iters = fixed_iters if fixed_iters is not None else max_iter
    for it in range(iters):
        t0 = time.time()
        spread = (
            e_w.join(
                state.select(
                    F.col("vertex").alias("u"), "label", "score"
                ),
                "u",
            )
            .groupBy(F.col("v").alias("vertex"), "label")
            .agg(F.sum(F.col("w") * F.col("score")).alias("nbr"))
        )
        nxt = (
            spread.join(y, ["vertex", "label"], "full")
            .select(
                "vertex",
                "label",
                (
                    F.lit(float(alpha)) * F.coalesce("nbr", F.lit(0.0))
                    + F.lit(1.0 - float(alpha))
                    * F.coalesce("y", F.lit(0.0))
                ).alias("score"),
            )
        )
        if fixed_iters is None:
            delta = (
                nxt.join(
                    state.select(
                        "vertex", "label", F.col("score").alias("old")
                    ),
                    ["vertex", "label"],
                    "full",
                )
                .agg(
                    F.sum(
                        F.abs(
                            F.coalesce("score", F.lit(0.0))
                            - F.coalesce("old", F.lit(0.0))
                        )
                    ).alias("e"),
                    F.count("*").alias("n"),
                )
                .collect()[0]
            )
            state = _truncate(nxt)
            completed += 1
            err, nrows = delta["e"] or 0.0, delta["n"] or 1
            metrics.append(
                {"iter": it, "l1_err": err, "wall_s": round(time.time() - t0, 4)}
            )
            if err < tol * nrows:
                converged = True
                break
        else:
            state = _truncate(nxt)
            completed += 1
            metrics.append(
                {"iter": it, "wall_s": round(time.time() - t0, 4)}
            )
        gc.collect()
    if fixed_iters is not None:
        converged = True
    e_w.unpersist()
    return SpreadResult(state, completed, converged, metrics)


def label_spreading_single_node(
    pairs: list[tuple[int, int]],
    seeds: list[tuple[int, int]],
    *,
    alpha: float = 0.8,
    tol: float = 1.0e-6,
    max_iter: int = 50,
    fixed_iters: int | None = None,
) -> dict[tuple[int, int], float]:
    """Single-node reference (module docstring contract; sparse dict)."""
    import math
    from collections import defaultdict

    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    y = {(int(v), int(c)): 1.0 for v, c in seeds}
    f = dict(y)
    iters = fixed_iters if fixed_iters is not None else max_iter
    for _ in range(iters):
        nxt: dict[tuple[int, int], float] = defaultdict(float)
        for (u, c), s in f.items():
            for v in adj.get(u, ()):
                nxt[(v, c)] += s / math.sqrt(len(adj[u]) * len(adj[v]))
        out = {}
        keys = set(nxt) | set(y)
        for k in keys:
            out[k] = alpha * nxt.get(k, 0.0) + (1 - alpha) * y.get(k, 0.0)
        err = sum(
            abs(out.get(k, 0.0) - f.get(k, 0.0)) for k in set(out) | set(f)
        )
        f = out
        if fixed_iters is None and err < tol * max(len(f), 1):
            break
    return f
