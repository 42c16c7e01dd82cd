"""Eigenvector centrality: power iteration on the (shifted) adjacency
transpose — the classic spectral centrality that completes the engine's
centrality suite (degree, harmonic/closeness, PageRank, personalized PR,
TrustRank, HITS, SALSA).

Semantics (fixed, deterministic — the contract the single-node oracle, the
networkx pytest parity, and the DuckDB chained-CTE gate oracle all replay
exactly; this is networkx ``eigenvector_centrality``'s published pure-Python
recurrence, Bonacich 1987 power iteration with the +I shift that guarantees
convergence on bipartite/periodic graphs without moving the principal
eigenvector):

  simple-graph: duplicate (src,dst) pairs collapse (DISTINCT)
  V = {src} ∪ {dst};  x_0[v] = 1/|V|
  iteration i ≥ 1:
    xr_i[v] = x_{i-1}[v] + Σ_{u→v} x_{i-1}[u]     (the (I + Aᵀ)x step)
    x_i[v]  = xr_i[v] / ||xr_i||_2                 (L2 normalization)
  fixed_iters=k runs exactly k iterations (the SQL-oracle parity path);
  otherwise stop when Σ_v |x_i[v] - x_{i-1}[v]| < |V|·tol.

Action budget — ONE scalar action per iteration (the pattern hits.py
documents): the L2 normalizer Σ xr² is load-bearing (it gates the update),
and the convergence error rides the NEXT iteration's normalizer action
instead of a pass of its own — scores carries the previous generation in a
``prev`` column, so iteration i's aggregate returns both Σ xr_i² and
Σ|x_{i-1} − x_{i-2}|; when the latter is under tolerance the loop returns
x_{i-1}, exactly what a bottom-of-iteration check at i−1 would have
returned (one speculative edge-join aggregate is spent on the final
iteration; one action per iteration is saved on every other).

Scale shape (SURVEY.md §4.3): only the in-edge orientation is hot, so ONE
persisted edge cache is laid down — hash-partitioned + sorted by ``src`` —
and each iteration's sort-merge join re-shuffles only the V-row score side,
never the E-row edge side. Per-iteration shuffle volume is vertex-sized
(partial+final agg output), the PageRank kernel's per-iteration shape.
Int-packing mirrors pagerank.py: int32 ids halve cache and shuffle key
width when the id range allows.
"""

from __future__ import annotations

import gc
import math
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .edges import vertices


@dataclass
class EigenvectorResult:
    scores: DataFrame  # (vertex:long, score:double)
    num_iters: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _truncate(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def eigenvector_centrality(
    spark: SparkSession,
    edges: DataFrame,
    *,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    fixed_iters: int | None = None,
) -> EigenvectorResult:
    """Eigenvector centrality over the DIRECTED edge table ``(src, dst)``.

    Returns per-vertex L2-normalized scores (Σ score² = 1 whenever the
    graph is non-empty). ``fixed_iters`` disables the convergence test —
    the driver-gate path where DuckDB replays the same k chained
    iterations and the comparison is hash-exact after ROUND(…, 8).
    """
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
        return EigenvectorResult(empty, 0, True)
    n_edges = e_fwd.count()

    # scores carries the PREVIOUS generation so iteration i's normalizer
    # action can fold in Σ|Δx| of the generation step that produced it
    # (module docstring). prev = x at start ⇒ the first fold is 0.
    scores = _truncate(
        verts.select(
            "vertex",
            F.lit(1.0 / n).alias("score"),
            F.lit(1.0 / n).alias("prev"),
        )
    )

    iters = fixed_iters if fixed_iters is not None else max_iter
    metrics: list[dict] = []
    converged = False
    completed = 0
    for it in range(iters):
        t0 = time.time()
        # (I + Aᵀ)x: in-edge sum of current scores over the persisted
        # src-partitioned cache (only the V-row score side re-shuffles),
        # plus the vertex's own score (the +I shift)
        contrib = (
            e_fwd.join(
                scores.select(F.col("vertex").alias("_sv"), "score"),
                e_fwd.src == F.col("_sv"),
            )
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.sum("score").alias("in_sum"))
        )
        raw = scores.join(contrib, "vertex", "left").select(
            "vertex",
            F.col("score").alias("old"),
            F.col("prev"),
            (F.col("score") + F.coalesce("in_sum", F.lit(0.0))).alias("xr"),
        )
        raw = _truncate(raw)
        # ONE action: the L2 normalizer of THIS step + the L1 movement of
        # the PREVIOUS step (both generations sit in raw's carried columns)
        row = raw.agg(
            F.sum(F.col("xr") * F.col("xr")).alias("sq"),
            F.sum(F.abs(F.col("old") - F.col("prev"))).alias("err"),
        ).collect()[0]
        norm = math.sqrt(row["sq"] or 0.0)
        err_prev = row["err"] or 0.0
        if metrics:
            metrics[-1]["l1_err"] = err_prev
        if fixed_iters is None and it > 0 and err_prev < n * tol:
            # the previous generation already moved less than tolerance:
            # the scores standing NOW are what a bottom-of-iteration check
            # would have returned
            converged = True
            break
        if norm == 0.0:
            # possible only if every xr is 0, i.e. an empty vertex set
            # (handled above); guard against silent NULL-division anyway
            converged = True
            break
        scores = _truncate(
            raw.select(
                "vertex",
                (F.col("xr") / F.lit(norm)).alias("score"),
                F.col("old").alias("prev"),
            )
        )
        completed += 1
        wall = time.time() - t0
        gc.collect()
        metrics.append(
            {
                "iter": it,
                "l1_err": None,  # patched by the NEXT iteration's fold
                "wall_s": round(wall, 4),
                "edges_per_sec": round(n_edges / wall, 1) if wall > 0 else None,
            }
        )
    if fixed_iters is not None:
        converged = True
    elif not converged and completed > 0:
        # max_iter exhausted: the final generation's movement was never
        # folded — one closing action decides convergence (parity with a
        # bottom-of-iteration check)
        err_last = (
            scores.agg(
                F.sum(F.abs(F.col("score") - F.col("prev"))).alias("e")
            ).collect()[0]["e"]
            or 0.0
        )
        metrics[-1]["l1_err"] = err_last
        converged = err_last < n * tol
    e_fwd.unpersist()
    out = scores.select(
        F.col("vertex").cast("long").alias("vertex") if packed else F.col("vertex"),
        "score",
    )
    return EigenvectorResult(out, completed, converged, metrics)


def eigenvector_single_node(
    pairs: list[tuple[int, int]],
    *,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    fixed_iters: int | None = None,
) -> dict[int, float]:
    """Single-node reference — the pytest parity oracle (same contract as
    the module docstring; pure Python float64). networkx's own
    ``eigenvector_centrality`` implements this exact recurrence, so tests
    also compare against it directly where it converges."""
    succ: dict[int, set[int]] = {}
    nodes: set[int] = set()
    for u, v in pairs:
        nodes.add(u)
        nodes.add(v)
        succ.setdefault(u, set()).add(v)
    n = len(nodes)
    if n == 0:
        return {}
    x = {v: 1.0 / n for v in nodes}
    iters = fixed_iters if fixed_iters is not None else max_iter
    for _ in range(iters):
        xlast = x
        xr = dict(xlast)
        for u, outs in succ.items():
            for v in outs:
                xr[v] += xlast[u]
        norm = math.sqrt(sum(val * val for val in xr.values()))
        if norm == 0.0:
            break
        x = {v: xr[v] / norm for v in nodes}
        if fixed_iters is None and sum(
            abs(x[v] - xlast[v]) for v in nodes
        ) < n * tol:
            break
    return x
