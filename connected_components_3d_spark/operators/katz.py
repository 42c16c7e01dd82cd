"""Katz centrality — the attenuated-walk-count centrality
x = Σ_j αʲ(Aᵀ)ʲ·β𝟙 (Katz 1953): each vertex scores the number of walks
ending at it, damped α per hop. The link-analysis lineage sits between raw
in-degree (α→0) and eigenvector centrality (α→1/λ_max); unlike PageRank it
does NOT normalize by out-degree, so a page's endorsement is not diluted by
how many other links it emits — the other classical citation/link model,
completing the centrality suite (degree, harmonic/closeness, PageRank, PPR,
TrustRank, HITS, SALSA, eigenvector).

Semantics (fixed, deterministic — replayed exactly by the single-node
reference, the networkx pytest parity, and the DuckDB chained-CTE gate
oracle):

  simple-graph: duplicate (src,dst) pairs collapse (DISTINCT)
  V = {src} ∪ {dst};  x_0[v] = β
  iteration i ≥ 1:  x_i[v] = β + α · Σ_{u→v} x_{i-1}[u]
  fixed_iters=k runs exactly k iterations — x_k is the k-term truncated
  Katz series (the SQL-oracle parity path, hash-exact after ROUND(…,8));
  otherwise stop when Σ_v |x_i[v] − x_{i-1}[v]| < |V|·tol (guaranteed for
  α < 1/λ_max; callers pick α — the default 0.1 converges on graphs with
  λ_max < 10).

Unlike eigenvector.py there is NO per-iteration normalizer, so the fixed
iteration body needs no load-bearing action at all: the only per-iteration
job is the eager lineage truncation, and in convergence mode the L1
movement rides the same carried-``prev`` fold eigenvector.py documents
(one scalar action, checked one generation late, returns identically).

Scale shape (SURVEY.md §4.3, the pagerank.py/eigenvector.py envelope): one
persisted src-partitioned+sorted edge cache; per iteration the V-row score
side re-shuffles into a sort-merge join against the static E-row cache,
then a vertex-keyed partial+final agg — per-iteration shuffle volume is
vertex-sized. Int-packing halves id width when the range allows.
"""

from __future__ import annotations

import gc
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .edges import vertices


@dataclass
class KatzResult:
    scores: DataFrame  # (vertex:long, score:double)
    num_iters: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _truncate(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def katz_centrality(
    spark: SparkSession,
    edges: DataFrame,
    *,
    alpha: float = 0.1,
    beta: float = 1.0,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    fixed_iters: int | None = None,
) -> KatzResult:
    """Katz centrality over the DIRECTED edge table ``(src, dst)``.

    ``fixed_iters`` disables the convergence test and yields the k-term
    truncated Katz series — the driver-gate path (`katz_bipartite`)."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"katz_centrality: alpha must be in (0,1), got {alpha}")
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    rng = edges.agg(
        F.min(F.least("src", "dst")).alias("lo"),
        F.max(F.greatest("src", "dst")).alias("hi"),
    ).collect()[0]
    packed = (
        rng["lo"] is not None
        and rng["lo"] >= -2147483648
        and rng["hi"] <= 2147483647
    )
    if packed:
        edges = edges.select(
            F.col("src").cast("int").alias("src"),
            F.col("dst").cast("int").alias("dst"),
        )
    e = edges.select("src", "dst").distinct()
    e_fwd = e.repartition(p, "src").sortWithinPartitions("src").persist()
    verts = _truncate(vertices(e_fwd))
    n = verts.count()
    if n == 0:
        empty = verts.select(
            F.col("vertex").cast("long").alias("vertex"),
            F.lit(0.0).alias("score"),
        )
        return KatzResult(empty, 0, True)
    n_edges = e_fwd.count()

    # prev carries the generation BEFORE the standing one so convergence
    # mode can fold Σ|Δx| into a single late-checked action (eigenvector.py
    # action-budget contract); prev = x at start ⇒ first fold is 0
    scores = _truncate(
        verts.select(
            "vertex",
            F.lit(float(beta)).alias("score"),
            F.lit(float(beta)).alias("prev"),
        )
    )

    iters = fixed_iters if fixed_iters is not None else max_iter
    metrics: list[dict] = []
    converged = False
    completed = 0
    for it in range(iters):
        t0 = time.time()
        contrib = (
            e_fwd.join(
                scores.select(F.col("vertex").alias("_sv"), "score"),
                e_fwd.src == F.col("_sv"),
            )
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.sum("score").alias("in_sum"))
        )
        nxt = scores.join(contrib, "vertex", "left").select(
            "vertex",
            (
                F.lit(float(beta))
                + F.lit(float(alpha)) * F.coalesce("in_sum", F.lit(0.0))
            ).alias("score"),
            F.col("score").alias("prev"),
        )
        scores = _truncate(nxt)
        completed += 1
        wall = time.time() - t0
        gc.collect()
        metrics.append(
            {
                "iter": it,
                "wall_s": round(wall, 4),
                "edges_per_sec": round(n_edges / wall, 1) if wall > 0 else None,
            }
        )
        if fixed_iters is None:
            # prev in the STANDING table is the x the last join consumed;
            # its movement vs the generation before rides this one action
            err = (
                scores.agg(
                    F.sum(F.abs(F.col("score") - F.col("prev"))).alias("e")
                ).collect()[0]["e"]
                or 0.0
            )
            metrics[-1]["l1_err"] = err
            if err < n * tol:
                converged = True
                break
    if fixed_iters is not None:
        converged = True
    e_fwd.unpersist()
    out = scores.select(
        F.col("vertex").cast("long").alias("vertex") if packed else F.col("vertex"),
        "score",
    )
    return KatzResult(out, completed, converged, metrics)


def katz_single_node(
    pairs: list[tuple[int, int]],
    *,
    alpha: float = 0.1,
    beta: float = 1.0,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    fixed_iters: int | None = None,
) -> dict[int, float]:
    """Single-node reference (module docstring contract; pure float64)."""
    succ: dict[int, set[int]] = {}
    nodes: set[int] = set()
    for u, v in pairs:
        nodes.add(u)
        nodes.add(v)
        succ.setdefault(u, set()).add(v)
    n = len(nodes)
    if n == 0:
        return {}
    x = {v: float(beta) for v in nodes}
    iters = fixed_iters if fixed_iters is not None else max_iter
    for _ in range(iters):
        xlast = x
        acc = {v: 0.0 for v in nodes}
        for u, outs in succ.items():
            for v in outs:
                acc[v] += xlast[u]
        x = {v: float(beta) + float(alpha) * acc[v] for v in nodes}
        if fixed_iters is None and sum(
            abs(x[v] - xlast[v]) for v in nodes
        ) < n * tol:
            break
    return x
